from duckpipe_spark.operators.result import LONG_SCHEMA, assemble_result

__all__ = ["LONG_SCHEMA", "assemble_result"]
