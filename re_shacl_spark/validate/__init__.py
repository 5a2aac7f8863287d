from re_shacl_spark.validate.shapes import NodeShape, PropertyConstraint, compile_shapes  # noqa: F401
from re_shacl_spark.validate.engine import validate, ValidationReport  # noqa: F401
