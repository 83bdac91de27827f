"""Query catalog: importing this package registers all queries."""

from duckpipe_spark.queries import events_q, relational, relational_ext, spatial_proxy  # noqa: F401

try:  # text/dedup/similarity modules are added incrementally
    from duckpipe_spark.queries import text_q  # noqa: F401
except ImportError:
    pass
try:
    from duckpipe_spark.queries import dedup_q  # noqa: F401
except ImportError:
    pass
try:
    from duckpipe_spark.queries import similarity_q  # noqa: F401
except ImportError:
    pass
try:
    from duckpipe_spark.queries import multimodal_q  # noqa: F401
except ImportError:
    pass
try:
    from duckpipe_spark.queries import geo_q  # noqa: F401
except ImportError:
    pass
try:
    from duckpipe_spark.queries import sampling_q  # noqa: F401
except ImportError:
    pass
try:
    from duckpipe_spark.queries import corpus_q  # noqa: F401
except ImportError:
    pass

from duckpipe_spark.queries.base import REGISTRY, oracle_queries, spark_queries

__all__ = ["REGISTRY", "spark_queries", "oracle_queries"]
