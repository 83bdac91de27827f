"""duckpipe-spark: a PySpark-native analytics engine with the query and
data-processing capabilities of ncc-airhealth/duckpipe, re-architected for
Spark (DataFrame/Catalyst) execution at cluster scale.
"""

__version__ = "0.1.0"

from duckpipe_spark.session import get_spark

__all__ = ["get_spark"]
