"""Structured Streaming surface (SURVEY.md §2.13 — beyond-reference).

The reference is batch-only; the engine adds the streaming operators a
training-data pipeline needs on an event feed: watermarked tumbling/sliding
window rollups, built-in session windows, and a custom stateful sessionizer
via ``applyInPandasWithState`` (the extension point for operators Spark lacks
natively).

Every transformation here works identically on a batch DataFrame (Spark's
unified API) — the batch twins are oracle-checked in
``queries/events_q.py``; streaming-specific behavior (incremental processing,
late-data handling, state timeouts) is covered by ``tests/test_streaming.py``
with file sources and memory sinks.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)

SESSION_GAP = "30 minutes"
SESSION_GAP_US = 30 * 60 * 1_000_000


def read_event_stream(spark: SparkSession, path: str, max_files_per_trigger: int = 10) -> DataFrame:
    """File-based event stream (one new parquet file per micro-batch in
    tests; the same code takes a Kafka source in production)."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def windowed_rollup(
    events: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling/sliding window aggregation — the streaming twin
    of `events_hourly_rollup`. Late events beyond the watermark are dropped;
    state for closed windows is purged automatically."""
    ev = events.withWatermark("ts", watermark)
    win = F.window("ts", window, slide) if slide else F.window("ts", window)
    return ev.groupBy(win.alias("w"), "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("sum_value"),
    ).select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        "event_type",
        "n_events",
        "sum_value",
    )


def session_windows(
    events: DataFrame, gap: str = SESSION_GAP, watermark: str | None = "2 hours"
) -> DataFrame:
    """Built-in gap-based session windows per user. With a watermark,
    sessions are finalized (and state evicted) once event time passes
    session_end + watermark — required for append mode; pass watermark=None
    for complete-mode parity with batch."""
    ev = events.withWatermark("ts", watermark) if watermark else events
    return ev.groupBy("user_id", F.session_window("ts", gap).alias("w")).agg(
        F.count(F.lit(1)).alias("n_events")
    ).select(
        "user_id",
        F.col("w.start").alias("session_start"),
        F.col("w.end").alias("session_end"),
        "n_events",
    )


def dedup_event_stream(
    events: DataFrame, keys: list[str] | None = None, watermark: str = "2 hours"
) -> DataFrame:
    """Streaming exact dedup: drop repeated (key) rows within the watermark
    horizon — the streaming twin of `functions.dedup.exact_dedup_groups`,
    with bounded state (old keys are purged once the watermark passes)."""
    ev = events.withWatermark("ts", watermark)
    return ev.dropDuplicatesWithinWatermark(keys or ["event_id"])


_STATE_SCHEMA = "start_us long, last_us long, n long"
_OUT_SCHEMA = "user_id bigint, session_start timestamp, session_end timestamp, n_events bigint"


def _session_fn(
    key: tuple[Any, ...],
    pdf_iter: Iterator[pd.DataFrame],
    state: GroupState,
    flush_timeout_ms: int = 600_000,
) -> Iterator[pd.DataFrame]:
    """Custom stateful sessionizer: closes a session when the event gap
    exceeds SESSION_GAP or the state times out."""
    (user_id,) = key
    if state.hasTimedOut:
        if state.exists:
            start_us, last_us, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_end": [pd.Timestamp(last_us, unit="us")],
                    "n_events": [n],
                }
            )
        return

    # normalize to microseconds regardless of the Arrow-delivered resolution
    # (Spark 4 / pandas 2 hand micro-batches over as datetime64[us]; older
    # stacks used datetime64[ns] — casting to [us] first makes both exact)
    ts_us = (
        pd.concat([pdf["ts"] for pdf in pdf_iter])
        .sort_values()
        .astype("datetime64[us]")
        .astype("int64")
    )
    closed = []
    if state.exists:
        start_us, last_us, n = state.get
    else:
        start_us = last_us = int(ts_us.iloc[0])
        n = 0
    for t in ts_us:
        t = int(t)
        if n > 0 and t - last_us > SESSION_GAP_US:
            closed.append((user_id, start_us, last_us, n))
            start_us, n = t, 0
        last_us = max(last_us, t)
        n += 1
    state.update((start_us, last_us, n))
    # flush sessions idle for flush_timeout_ms of processing time
    state.setTimeoutDuration(flush_timeout_ms)
    if closed:
        yield pd.DataFrame(
            {
                "user_id": [c[0] for c in closed],
                "session_start": [pd.Timestamp(c[1], unit="us") for c in closed],
                "session_end": [pd.Timestamp(c[2], unit="us") for c in closed],
                "n_events": [c[3] for c in closed],
            }
        )


def sessionize_stateful(
    events: DataFrame, flush_timeout_ms: int = 600_000
) -> DataFrame:
    """`applyInPandasWithState` sessionization — the template for custom
    stateful operators the built-ins can't express (emits a session only
    once it is closed by a gap or a processing-time timeout).

    ``flush_timeout_ms`` is the processing-time idle flush (default 10
    min). CONTRACT (found r12 when the suite started asserting
    awaitTermination's return): ProcessingTimeTimeout is incompatible
    with ``trigger(availableNow)`` termination — Spark keeps the query
    alive for pending timeouts, so an availableNow run looks hung for a
    full flush interval (or forever). Run this operator on a
    processing-time trigger (the production shape) and stop it
    explicitly once the sink is drained; pass a small flush for
    bounded-drain test/backfill runs."""
    import functools

    return events.groupBy("user_id").applyInPandasWithState(
        functools.partial(_session_fn, flush_timeout_ms=flush_timeout_ms),
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def enrich_with_dimension(
    events: DataFrame,
    dim: DataFrame,
    stream_key: str = "user_id",
    dim_key: str = "c_custkey",
    dim_cols: tuple[str, ...] = ("c_mktsegment", "c_nationkey"),
) -> DataFrame:
    """Stream-static enrichment join: each micro-batch hash-joins against the
    broadcast dimension snapshot — no state store, no watermark needed (the
    static side is re-resolvable per batch, so a dim refresh is picked up on
    the next trigger). Left join keeps events with no dim row.

    At scale the dim is the broadcast side; the stream never shuffles."""
    d = dim.select(F.col(dim_key).alias(stream_key), *[F.col(c) for c in dim_cols])
    return events.join(F.broadcast(d), stream_key, "left")


def join_click_purchase_streams(
    clicks: DataFrame,
    purchases: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked stream-stream interval join: each click joins purchases by
    the same user within [click.ts - window, click.ts]. Both sides carry
    watermarks and the join condition bounds event time in both directions,
    so Spark can evict join state — the requirement for an unbounded run.
    Inner semantics (clicks with no purchase in range are dropped)."""
    c = (
        clicks.withWatermark("ts", watermark)
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id"),
            F.col("ts").alias("click_ts"),
        )
    )
    p = (
        purchases.withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
    )
    return c.join(
        p,
        F.expr(
            f"user_id = p_user_id AND purchase_ts >= click_ts - INTERVAL {window} "
            "AND purchase_ts <= click_ts"
        ),
    ).select("click_id", "user_id", "click_ts", "purchase_ts", "purchase_value")


# ---------------------------------------------------------------------------
# transformWithState — Spark 4's typed stateful-processor API (successor to
# applyInPandasWithState): named state variables, TTL, timers. Implemented
# alongside the GroupState sessionizer so both extension points are covered.
# ---------------------------------------------------------------------------


def running_totals_stateful(events: DataFrame) -> DataFrame:
    """Per-user running (n_events, sum_value) maintained in a ValueState and
    re-emitted each micro-batch — the streaming twin of
    ``groupBy(user).agg(count, sum)``, converging to the batch aggregate
    once the stream drains.

    Scale: state is one tuple per user (bounded by user cardinality, not
    event volume), partitioned on the group key; RocksDB-backed state store
    keeps per-executor state off-heap and incremental-checkpointed.

    Runtime requirements (cluster-side): the RocksDB state store provider
    (`spark.sql.streaming.stateStore.providerClass`) and the `protobuf`
    package — transformWithState's Python↔JVM state server speaks protobuf.
    The pytest twin auto-skips where protobuf isn't installed; the
    `applyInPandasWithState` sessionizer above has no such dependency."""
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    totals_schema = StructType(
        [StructField("n", LongType()), StructField("s", DoubleType())]
    )

    class _RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", totals_schema)

        def handleInputRows(self, key, rows, timerValues):  # noqa: ANN001
            prev = self._totals.get() if self._totals.exists() else None
            n = int(prev[0]) if prev is not None else 0
            s = float(prev[1]) if prev is not None else 0.0
            for pdf in rows:
                n += len(pdf)
                s += float(pdf["value"].sum())
            self._totals.update((n, s))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "sum_value": [s]}
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_RunningTotals(),
        outputStructType="user_id bigint, n_events bigint, sum_value double",
        outputMode="Update",
        timeMode="None",
    )
