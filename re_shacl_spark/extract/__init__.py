from re_shacl_spark.extract.html import extract_text  # noqa: F401
from re_shacl_spark.extract.mentions import detect_mentions  # noqa: F401
from re_shacl_spark.extract.emit import emit_triples  # noqa: F401
