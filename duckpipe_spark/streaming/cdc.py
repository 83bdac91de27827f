"""Streaming CDC apply: merge a change stream into a keyed snapshot.

The missing half of `operators.maintenance.merge_upsert`: a change-data
stream (inserts + updates keyed on `key`) continuously folded into a
durable parquet snapshot via `foreachBatch`. Each micro-batch:

1. dedupes the batch to its latest row per key (last event wins, ordered
   by `order_col` — a CDC batch can carry several updates for one key),
2. `merge_upsert`s it into the current snapshot (one broadcast anti-join;
   the snapshot never shuffles),
3. atomically swaps the snapshot directory (write to `<path>.tmp`, then
   re-point — parquet has no transactional overwrite; a table format like
   Iceberg/Delta would replace step 3 at production scale, the merge plan
   in step 2 is identical there).

Exactly-once across restarts comes from the checkpoint: foreachBatch
re-delivers a failed batch with the same batch_id, and the swap is
idempotent for a replayed batch.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from duckpipe_spark.operators.maintenance import merge_upsert


def latest_per_key(batch: DataFrame, key: str, order_col: str) -> DataFrame:
    """Collapse a CDC batch to one row per key: highest `order_col` wins,
    deterministic via the (order desc, key) window rank."""
    w = Window.partitionBy(key).orderBy(F.col(order_col).desc())
    return (
        batch.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def apply_cdc_stream(
    stream: DataFrame,
    snapshot_path: str,
    key: str,
    order_col: str,
    checkpoint: str,
) -> "pyspark.sql.streaming.StreamingQuery":  # noqa: F821
    """Start a foreachBatch query that folds `stream` into the snapshot at
    `snapshot_path`. Returns the StreamingQuery (caller awaits/stops)."""
    spark = stream.sparkSession

    def _apply(batch: DataFrame, batch_id: int) -> None:
        apply_cdc_batch(spark, batch, snapshot_path, key, order_col)

    return (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def apply_cdc_batch(
    spark: SparkSession,
    batch: DataFrame,
    snapshot_path: str,
    key: str,
    order_col: str,
) -> None:
    """One merge cycle (also directly callable for batch backfills)."""
    updates = latest_per_key(batch, key, order_col)
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(snapshot_path)
    fs = path.getFileSystem(conf)
    if fs.exists(path):
        base = spark.read.parquet(snapshot_path)
        merged = merge_upsert(base, updates.select(*base.columns), key)
    else:
        merged = updates
    tmp = snapshot_path.rstrip("/") + ".tmp"
    # materialize BEFORE touching the live snapshot (merged reads from it)
    merged.write.mode("overwrite").parquet(tmp)
    tmp_path = jvm.org.apache.hadoop.fs.Path(tmp)
    if fs.exists(path):
        fs.delete(path, True)
    fs.rename(tmp_path, path)
