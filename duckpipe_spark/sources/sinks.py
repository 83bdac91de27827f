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


def write_spatially_clustered(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    n_files: int = 32,
    order: int = 16,
    mode: str = "overwrite",
) -> None:
    """Write points clustered by Hilbert key: range-partition on the curve
    distance so each output file covers a compact region. Parquet min/max
    column stats on x/y then let any bbox-filtered scan skip most files —
    the write-side complement of the reference's `ST_Hilbert` ORDER BY
    (`Clustering.py:174-178`), applied to the storage layout instead of the
    chunk queue. The global bounds come from one cheap agg over the input."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from duckpipe_spark.geo.hilbert import hilbert_key

    b = df.agg(
        F.min(x_col).alias("x0"), F.min(y_col).alias("y0"),
        F.max(x_col).alias("x1"), F.max(y_col).alias("y1"),
    ).collect()[0]
    x0, y0, x1, y1 = float(b.x0), float(b.y0), float(b.x1), float(b.y1)

    # no annotations: postponed-evaluation strings (future-annotations) break
    # the UDF signature parser; explicit SCALAR form instead
    def _hk_fn(xs, ys):
        return pd.Series(hilbert_key(xs.values, ys.values, x0, y0, x1, y1, order))

    _hk = pandas_udf(_hk_fn, "bigint")

    (
        df.withColumn("_hk", _hk(F.col(x_col), F.col(y_col)))
        .repartitionByRange(n_files, "_hk")
        .sortWithinPartitions("_hk")
        .drop("_hk")
        .write.mode(mode)
        .parquet(path)
    )


def write_clustered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 32,
    mode: str = "overwrite",
) -> None:
    """Write clustered by arbitrary key columns: range-partition across
    files, sort within files. Every parquet row group then covers a
    narrow key interval, so min/max column statistics let a key-filtered
    scan skip almost all row groups at read time — the generic (non-geo)
    sibling of `write_spatially_clustered`, and the cheap two-thirds of a
    Z-order layout (for ONE dominant filter column, a plain sort beats
    interleaving). At 100 TB this is the difference between a point query
    reading ~1/n_rowgroups of the table and reading all of it; the
    skip-fraction is pinned by `tests/test_sinks.py`."""
    (
        df.repartitionByRange(n_files, *[F.col(c) for c in cols])
        .sortWithinPartitions(*cols)
        .write.mode(mode)
        .parquet(path)
    )
