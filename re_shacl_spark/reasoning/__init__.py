from re_shacl_spark.reasoning.tbox import TBoxIndex, extract_tbox  # noqa: F401
