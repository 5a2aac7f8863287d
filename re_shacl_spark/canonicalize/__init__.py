from re_shacl_spark.canonicalize.cc import connected_components  # noqa: F401
from re_shacl_spark.canonicalize.rewrite import canonicalize_triples  # noqa: F401
