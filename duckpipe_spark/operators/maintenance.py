"""Table-maintenance operators — beyond-reference engine completeness.

The reference hands results back as pandas and leaves storage management to
the user; a pipeline that owns 100 TB of parquet needs three more verbs:

* `table_stats` — per-column statistics in ONE scan (null count, exact
  distinct count, min/max). This is the input to every size-based planner
  decision (broadcast thresholds, bucket counts, skew detection) and the
  freshness check a mixture owner runs after each ingest.
* `merge_upsert` — keyed last-writer-wins merge of an updates batch into a
  base snapshot (the batch form of a Delta/Iceberg MERGE): updates replace,
  unmatched base rows survive. One anti-join, no driver state.
* `compact_small_files` — rewrite a directory of too-many-small-files into
  ~target-sized files. Small files are the classic 100 TB failure mode
  (every file = one task + one open + one footer read); compaction fixes it.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def table_stats(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Per-column stats in one pass → (column, n_rows, n_nulls, n_distinct,
    min_v, max_v), numeric min/max cast to double (exact for integers under
    2^53, which covers every key column).

    Scale shape: one aggregate branch per column, unioned. A single
    multi-column agg would plan an Expand that replicates every row once
    per DISTINCT column (4 columns → 4× shuffle volume); per-column
    branches instead each scan ONE column (columnar pruning makes the
    re-scan nearly free) and run an ordinary two-phase distinct aggregate.
    NULLs are excluded from n_distinct (SQL semantics) so both engines
    agree."""
    cols = columns or [c for c, t in df.dtypes if t in ("bigint", "int", "double", "float")]
    parts = []
    for c in cols:
        parts.append(
            df.select(F.col(c)).agg(
                F.lit(c).alias("column"),
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.col(c).isNull().cast("bigint")).alias("n_nulls"),
                F.countDistinct(c).alias("n_distinct"),
                F.min(F.col(c).cast("double")).alias("min_v"),
                F.max(F.col(c).cast("double")).alias("max_v"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    key: str | list[str],
    broadcast_updates: bool = True,
) -> DataFrame:
    """Last-writer-wins keyed merge: every key present in ``updates`` takes
    the updates row; all other base rows pass through. The batch equivalent
    of `MERGE INTO base USING updates ON key WHEN MATCHED THEN UPDATE WHEN
    NOT MATCHED THEN INSERT`.

    Plan: one left-anti join on the key + a union. With
    ``broadcast_updates=True`` (default — correct for incremental loads,
    where the updates batch is orders of magnitude smaller than the
    snapshot) the distinct update-key set is broadcast and the base side is
    never shuffled, so a daily merge reads the snapshot once and writes it
    once. The hint is unconditional when set: a caller merging a LARGE
    updates batch must pass ``broadcast_updates=False`` to let the planner
    choose (AQE still converts to broadcast at runtime if the key set turns
    out small) — force-broadcasting a huge key set OOMs the driver."""
    keys = [key] if isinstance(key, str) else list(key)
    key_set = updates.select(*keys).distinct()
    if broadcast_updates:
        key_set = F.broadcast(key_set)
    survivors = base.join(key_set, keys, "left_anti")
    return updates.unionByName(survivors)


def compact_small_files(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    target_file_mb: int = 512,
    fmt: str = "parquet",
) -> int:
    """Rewrite ``in_path`` into ~``target_file_mb`` files at ``out_path``;
    returns the chosen file count. Sizing uses the source's on-disk bytes
    (footer-aware listing via the Hadoop FS API, so it works for any
    supported filesystem, not just local paths)."""
    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    conf = jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(in_path)
    fs = p.getFileSystem(conf)
    total = fs.getContentSummary(p).getLength()
    n_files = max(1, int(total // (target_file_mb * 1024 * 1024)) + (1 if total % (target_file_mb * 1024 * 1024) else 0))
    df = spark.read.format(fmt).load(in_path)
    # repartition (round-robin) rather than coalesce: coalesce can collapse
    # the upstream parallelism of whatever computed the files
    df.repartition(n_files).write.mode("overwrite").format(fmt).save(out_path)
    return n_files


def column_histogram(
    df: DataFrame, col: str, lo: float, hi: float, nbins: int = 20
) -> DataFrame:
    """Equi-width value histogram → (bucket, n) with out-of-range values
    clamped into the edge buckets — the one-pass distribution profile used
    to pick salting factors and spot skewed keys before they melt a
    reducer. Bucket math is a single float expression evaluated identically
    on any engine (width is a Python-folded constant)."""
    width = (float(hi) - float(lo)) / int(nbins)
    b = F.floor((F.col(col).cast("double") - float(lo)) / width).cast("bigint")
    bucket = F.least(F.greatest(b, F.lit(0)), F.lit(int(nbins) - 1))
    return (
        df.where(F.col(col).isNotNull())
        .groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
