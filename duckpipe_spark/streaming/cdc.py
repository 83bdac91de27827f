"""Streaming CDC apply: merge a change stream into a keyed snapshot.

The missing half of `operators.maintenance.merge_upsert`: a change-data
stream (inserts + updates keyed on `key`) continuously folded into a
durable parquet snapshot via `foreachBatch`. Each micro-batch:

1. dedupes the batch to its latest row per key (last event wins, ordered
   by `order_col` — a CDC batch can carry several updates for one key),
2. `merge_upsert`s it into the current snapshot (one broadcast anti-join;
   the snapshot never shuffles),
3. swaps the snapshot directory crash-safely: write to `<path>.tmp`,
   demote live to `<path>.old`, promote tmp, drop old. A table format
   like Iceberg/Delta would replace step 3 at production scale; the
   merge plan in step 2 is identical there.

Exactly-once across restarts comes from the checkpoint plus swap
recovery: foreachBatch re-delivers a failed batch with the same
batch_id, and `_recover_snapshot` first rolls the directory state
forward (or back) to a consistent snapshot, so a crash at ANY point of
the swap never loses previously merged state:

* crash while writing tmp      → live untouched; incomplete tmp (no
  `_SUCCESS` marker) is discarded on replay.
* crash between demote+promote → live missing, complete tmp present;
  replay promotes tmp (the swap finishes), then merges on top.
* crash before dropping old    → live present; stale old/tmp removed.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from duckpipe_spark.operators.maintenance import merge_upsert


def latest_per_key(
    batch: DataFrame, key: str, order_col: str, tiebreak: list[str] | None = None
) -> DataFrame:
    """Collapse a CDC batch to one row per key: highest ``order_col`` wins.

    Determinism: ``order_col`` alone does not order rows that carry the
    SAME order value for one key (e.g. two updates in the same source
    transaction), so the window adds a tie-break — ``tiebreak`` columns if
    given, else every remaining column in name order, descending — making
    the winner a pure function of the batch contents regardless of
    partitioning or task order."""
    tb = tiebreak if tiebreak is not None else sorted(c for c in batch.columns if c not in (key, order_col))
    w = Window.partitionBy(key).orderBy(
        F.col(order_col).desc(), *[F.col(c).desc_nulls_last() for c in tb]
    )
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


def _fs_and_paths(spark: SparkSession, snapshot_path: str):
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    P = jvm.org.apache.hadoop.fs.Path
    live = P(snapshot_path)
    base = snapshot_path.rstrip("/")
    tmp, old = P(base + ".tmp"), P(base + ".old")
    success = P(base + ".tmp/_SUCCESS")
    return live.getFileSystem(conf), live, tmp, old, success


def _recover_snapshot(fs, live, tmp, old, success) -> None:
    """Roll the snapshot directories to a consistent state before reading.

    A completely-written tmp is detected by its `_SUCCESS` marker (the
    Hadoop committer writes it only after the job commits)."""
    if fs.exists(live):
        # crash after promote but before cleanup — drop stale artifacts
        if fs.exists(old):
            fs.delete(old, True)
        if fs.exists(tmp):
            fs.delete(tmp, True)
        return
    if fs.exists(tmp) and fs.exists(success):
        # swap was interrupted between demote and promote: finish it
        fs.rename(tmp, live)
        if fs.exists(old):
            fs.delete(old, True)
        return
    if fs.exists(old):
        # tmp incomplete/missing: roll back to the pre-swap snapshot
        if fs.exists(tmp):
            fs.delete(tmp, True)
        fs.rename(old, live)
        return
    if fs.exists(tmp):
        # first-ever batch crashed mid-write: discard the partial output
        fs.delete(tmp, True)


def apply_cdc_batch(
    spark: SparkSession,
    batch: DataFrame,
    snapshot_path: str,
    key: str,
    order_col: str,
) -> None:
    """One merge cycle (also directly callable for batch backfills)."""
    updates = latest_per_key(batch, key, order_col)
    fs, live, tmp, old, success = _fs_and_paths(spark, snapshot_path)
    _recover_snapshot(fs, live, tmp, old, success)
    if fs.exists(live):
        base = spark.read.parquet(snapshot_path)
        merged = merge_upsert(base, updates.select(*base.columns), key)
    else:
        merged = updates
    # materialize BEFORE touching the live snapshot (merged reads from it)
    merged.write.mode("overwrite").parquet(snapshot_path.rstrip("/") + ".tmp")
    # crash-safe swap: live is demoted (not deleted) until tmp is promoted
    if fs.exists(live):
        fs.rename(live, old)
    fs.rename(tmp, live)
    if fs.exists(old):
        fs.delete(old, True)
