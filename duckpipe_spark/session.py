"""SparkSession factory tuned for the duckpipe-spark engine.

Replaces the reference's DuckDB connection management
(`duckpipe/duckdb_utils.py:52-79`, `duckpipe/core.py:64-66`): instead of
per-worker in-memory DuckDB connections with `PRAGMA threads` / `SET
memory_limit`, we configure one SparkSession and let the scheduler own
parallelism.

Scale notes (100 TB / 1000 executors):
- AQE on: runtime partition coalescing, skew-join splitting, and
  dynamic join-strategy switching replace any hand-tuned chunking.
- Arrow on: every pandas-UDF boundary (the geometry kernels) moves
  columnar batches, not pickled rows.
- `spark.sql.shuffle.partitions` is only the pre-AQE upper bound; on a
  real cluster set it ~2-3x total cores and let AQE coalesce.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "duckpipe-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Create (or reuse) a SparkSession with engine defaults."""
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        shuffle_partitions = DEFAULT_SHUFFLE_PARTITIONS

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # --- optimizer / runtime ---
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # AQE's 64 MB advisory target is tuned for cluster-scale inputs; at
        # local-bench scale it coalesces every exchange to 3-4 partitions and
        # strands 28 of 32 cores (measured 1.7x on the triangle query). 8 MB
        # is the interleaved-sweep optimum on this box (1m starves
        # shuffle-heavy multi-join queries with task overhead; 64m starves
        # wide aggregations of parallelism). A cluster deploy sets
        # SPARK_GRAFT_ADVISORY_PARTITION=64m (or larger) per its task sizing.
        .config(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            os.environ.get("SPARK_GRAFT_ADVISORY_PARTITION", "8m"),
        )
        .config(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize",
            os.environ.get("SPARK_GRAFT_MIN_PARTITION", "512k"),
        )
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # --- Arrow for pandas-UDF geometry kernels & toPandas ---
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "20000")
        # --- deterministic timestamp semantics vs the DuckDB oracle ---
        .config("spark.sql.session.timeZone", "UTC")
        # events.parquet carries TIMESTAMP(NANOS); read as long, convert in loader
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # --- scan sizing: at 100 TB this bounds task input, not file count ---
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
