"""Result sinks — beyond-reference capability (SURVEY.md §2.1 S6 note: the
reference only returns a pandas DataFrame; a 100 TB pipeline needs durable,
re-partitionable outputs).

Scale design:
* `write_partitioned` — hive-style partition directories so downstream scans
  prune partitions (e.g. per-year exposure variables, per-language corpora).
* `write_bucketed` — pre-shuffled bucketed tables: two tables bucketed by the
  same key join WITHOUT a shuffle (the co-located join the reference can't
  express at all). Requires a metastore table (saveAsTable).
* `coalesced_single_file` — small-result convenience export.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    mode: str = "overwrite",
    max_records_per_file: int | None = 5_000_000,
) -> None:
    w = df.write.mode(mode)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    w.partitionBy(*partition_by).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: str,
    n_buckets: int = 32,
    sort_by: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed managed table: later equi-joins/aggregations on
    `bucket_by` read co-located buckets and skip the shuffle entirely."""
    w = df.write.mode(mode).bucketBy(n_buckets, bucket_by)
    if sort_by:
        w = w.sortBy(sort_by)
    w.saveAsTable(table, format="parquet")


def coalesced_single_file(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.coalesce(1).write.mode(mode).parquet(path)


def salt_column(key, n_salts: int = 16):
    """Salting helper for skewed keys: spread one hot key over `n_salts`
    sub-keys, aggregate twice (salted partial → final). Use when AQE's
    skew-join splitting isn't applicable (e.g. skewed groupBy keys)."""
    return F.concat_ws("#", key.cast("string"), (F.rand(seed=7) * n_salts).cast("int").cast("string"))


def salted_count(df: DataFrame, key: str, n_salts: int = 16) -> DataFrame:
    """Two-phase skew-safe count per key: groupBy(salted) partial counts,
    then groupBy(key) final sum. Same result as a direct groupBy-count, but
    no single reducer receives a hot key's entire row set."""
    salted = df.withColumn("_salted", salt_column(F.col(key), n_salts))
    partial = salted.groupBy("_salted").count()
    return (
        partial.withColumn(key, F.split(F.col("_salted"), "#")[0])
        .groupBy(key)
        .agg(F.sum("count").alias("count"))
    )
