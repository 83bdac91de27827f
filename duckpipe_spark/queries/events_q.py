"""Event-table operators: batch analogs of the streaming surface
(SURVEY.md §2.13) plus window-function sessionization.

The same tumbling-window aggregation is available as a true Structured
Streaming job in ``duckpipe_spark.streaming``; here it runs in batch so the
DuckDB oracle can verify the semantics.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from duckpipe_spark.queries.base import register
from duckpipe_spark.sources.tables import load_table

_HOURLY_ORACLE = """
SELECT
  strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
  event_type,
  count(*) AS n_events,
  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_value,
  count(DISTINCT user_id) AS n_users
FROM events
GROUP BY 1, 2
"""


@register("events_hourly_rollup", _HOURLY_ORACLE, "tumbling-window rollup, batch analog of streaming agg")
def events_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # exact integer-cents sum: order-independent, bit-identical vs oracle
            (F.sum(F.round(F.col("value") * 100).cast("bigint")).cast("double") / 100.0).alias(
                "sum_value"
            ),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


_SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 min in microseconds

_SESSIONIZE_ORACLE = f"""
WITH flagged AS (
  SELECT
    user_id,
    CASE
      WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           > {_SESSION_GAP_US}
        OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      THEN 1 ELSE 0
    END AS new_session
  FROM events
)
SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions, count(*) AS n_events
FROM flagged
GROUP BY user_id
"""


@register("sessionize_users", _SESSIONIZE_ORACLE, "gap-based sessionization via lag + cumulative flag")
def sessionize_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # interval arithmetic works for both TIMESTAMP and TIMESTAMP_NTZ ts
    # (unix_micros would reject NTZ), so the query is storage-type-agnostic
    prev_ts = F.lag(F.col("ts")).over(w)
    new_session = F.when(
        prev_ts.isNull() | ((F.col("ts") - prev_ts) > F.expr("INTERVAL 30 MINUTES")), 1
    ).otherwise(0)
    return (
        ev.withColumn("new_session", new_session)
        .groupBy("user_id")
        .agg(F.sum("new_session").alias("n_sessions"), F.count(F.lit(1)).alias("n_events"))
    )


_JSON_ORACLE = """
SELECT
  event_type,
  CAST(sum(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
  count(*) AS n
FROM events
GROUP BY event_type
"""


@register("events_json_extract", _JSON_ORACLE, "semi-structured JSON property extraction + agg")
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn("k", F.get_json_object("props", "$.k").cast("bigint"))
        .groupBy("event_type")
        .agg(F.sum("k").alias("sum_k"), F.count(F.lit(1)).alias("n"))
    )


_SESSION_WINDOW_ORACLE = f"""
WITH flagged AS (
  SELECT
    user_id, ts, event_id,
    CASE
      WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           > {_SESSION_GAP_US}
        OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      THEN 1 ELSE 0
    END AS new_session
  FROM events
),
sess AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
)
SELECT
  user_id,
  strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
  strftime(max(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S.%f') AS session_end,
  count(*) AS n_events
FROM sess
GROUP BY user_id, sid
"""


@register("events_session_window", _SESSION_WINDOW_ORACLE,
          "built-in session_window (batch twin of the streaming sessionizer)")
def events_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckpipe_spark.streaming.events import session_windows

    ev = load_table(spark, sf_dir, "events")
    out = session_windows(ev, watermark=None)
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    return out.select(
        "user_id",
        F.date_format("session_start", fmt).alias("session_start"),
        F.date_format("session_end", fmt).alias("session_end"),
        "n_events",
    )


_QUANTILE_ORACLE = """
SELECT
  event_type,
  round(quantile_cont(value, 0.5), 4) AS p50,
  round(quantile_cont(value, 0.95), 4) AS p95,
  count(*) AS n
FROM events
GROUP BY event_type
"""


@register("events_value_quantiles", _QUANTILE_ORACLE,
          "grouped quantiles via applyInPandas (custom grouped-map operator)")
def events_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas grouped-map operator: per-group numpy quantiles with
    linear interpolation (same definition as quantile_cont). This is the
    extension template for per-group logic the built-ins can't express."""
    import numpy as np
    import pandas as pd

    ev = load_table(spark, sf_dir, "events")

    def quantiles(pdf: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(pdf["value"].to_numpy())
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "p50": [round(float(np.quantile(v, 0.5)), 4)],
                "p95": [round(float(np.quantile(v, 0.95)), 4)],
                "n": [len(v)],
            }
        )

    return ev.groupBy("event_type").applyInPandas(
        quantiles, "event_type string, p50 double, p95 double, n bigint"
    )


# --- JSON property extraction (beyond reference: SURVEY.md §2.8 notes the
# reference uses no JSON functions; event payloads at pipeline scale do) ----

_PROPS_ORACLE = """
SELECT event_type,
       count(*) AS n_events,
       CAST(sum(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       min(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
       max(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
       CAST(sum(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS DOUBLE) / count(*) AS avg_k
FROM events
GROUP BY event_type
"""


@register(
    "events_props_rollup",
    _PROPS_ORACLE,
    "JSON payload extraction + rollup (get_json_object stays in codegen)",
)
def events_props_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured payload handling: extract a JSON field JVM-side with
    ``get_json_object`` (no Python in the row path) and aggregate. The
    average is computed as one exact integer sum divided once, so it is
    bit-identical across engines regardless of row order."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("bigint")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(k).alias("sum_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
        (F.sum(k).cast("double") / F.count(F.lit(1))).alias("avg_k"),
    )


_SALTED_ORACLE = """
SELECT event_type, count(*) AS n FROM events GROUP BY event_type
"""


@register(
    "events_salted_counts",
    _SALTED_ORACLE,
    "skew-safe two-phase salted aggregation equals the direct group count",
)
def events_salted_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key mitigation under the hard gate: the salted two-phase count
    (16 sub-keys per key, partial then final aggregate) must equal a plain
    groupBy count exactly — salting redistributes work, never results."""
    from duckpipe_spark.sources.sinks import salted_count

    ev = load_table(spark, sf_dir, "events")
    return salted_count(ev, "event_type").select("event_type", F.col("count").alias("n"))


_SLIDING_ORACLE = """
WITH expanded AS (
  SELECT time_bucket(INTERVAL '30 minutes', ts) - k * INTERVAL '30 minutes' AS window_start,
         event_type, value
  FROM events, unnest([0, 1]) AS u(k)
)
SELECT strftime(window_start, '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       count(*) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_value
FROM expanded
GROUP BY 1, 2
"""


@register(
    "events_sliding_rollup",
    _SLIDING_ORACLE,
    "sliding-window rollup (1h window / 30min slide), batch twin of the streaming agg",
)
def events_sliding_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each event lands in window/slide = 2 overlapping windows; Spark's
    built-in F.window handles the expansion natively (the oracle replays it
    with an explicit unnest). Exact integer-cents sum as everywhere."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(F.round(F.col("value") * 100).cast("bigint")).cast("double") / 100.0).alias(
                "sum_value"
            ),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


_FUNNEL_ORACLE = """
WITH first_click AS (
  SELECT user_id, min(ts) AS t0 FROM events WHERE event_type = 'click' GROUP BY user_id
),
converted AS (
  SELECT DISTINCT f.user_id
  FROM first_click f JOIN events e
    ON e.user_id = f.user_id
   AND e.event_type = 'purchase'
   AND e.ts >= f.t0 AND e.ts <= f.t0 + INTERVAL 1 HOUR
)
SELECT 'click' AS step, count(*) AS n_users FROM first_click
UNION ALL
SELECT 'click>purchase_1h' AS step, count(*) AS n_users FROM converted
"""


@register(
    "events_funnel",
    _FUNNEL_ORACLE,
    "ordered conversion funnel: first click -> purchase within 1h, per-step user counts",
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-funnel analytics: anchor each user at their FIRST click, then
    count users with a purchase inside the following hour. One aggregate on
    user_id + one equi-join with an interval predicate — the join keys on
    user_id, so at scale it is a co-partitioned join, never a range
    explosion."""
    ev = load_table(spark, sf_dir, "events")
    first_click = (
        ev.where(F.col("event_type") == "click").groupBy("user_id").agg(F.min("ts").alias("t0"))
    )
    purchases = ev.where(F.col("event_type") == "purchase").select("user_id", "ts")
    converted = (
        first_click.join(purchases, "user_id")
        .where((F.col("ts") >= F.col("t0")) & (F.col("ts") <= F.col("t0") + F.expr("INTERVAL 1 HOUR")))
        .select("user_id")
        .distinct()
    )
    a = first_click.agg(F.lit("click").alias("step"), F.count(F.lit(1)).alias("n_users"))
    b = converted.agg(F.lit("click>purchase_1h").alias("step"), F.count(F.lit(1)).alias("n_users"))
    return a.unionByName(b)


_RETENTION_ORACLE = """
WITH firsts AS (
  SELECT user_id, date_trunc('day', min(ts)) AS cohort FROM events GROUP BY user_id
),
activity AS (
  SELECT DISTINCT e.user_id, f.cohort,
         CAST(datediff('day', f.cohort, date_trunc('day', e.ts)) AS BIGINT) AS day_offset
  FROM events e JOIN firsts f USING (user_id)
)
SELECT strftime(cohort, '%Y-%m-%d') AS cohort, day_offset, count(*) AS n_users
FROM activity GROUP BY cohort, day_offset
"""


@register(
    "events_retention_cohorts",
    _RETENTION_ORACLE,
    "retention matrix: users by first-seen day x active-day offset",
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: bucket each user by first-seen day, count distinct
    users active at each day offset. Two shuffles (first-seen agg on
    user_id, distinct + count on the cohort pair) — both on high-cardinality
    keys, no window over the whole table."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(F.date_trunc("day", F.min("ts")).alias("cohort"))
    activity = (
        ev.select("user_id", F.date_trunc("day", "ts").alias("day"))
        .join(firsts, "user_id")
        .select("user_id", "cohort", F.datediff("day", "cohort").cast("bigint").alias("day_offset"))
        .distinct()
    )
    return (
        activity.groupBy(F.date_format("cohort", "yyyy-MM-dd").alias("cohort"), "day_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


_TRANSITIONS_ORACLE = """
WITH ordered AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
  FROM events
)
SELECT event_type AS from_type, next_type AS to_type, count(*) AS n
FROM ordered WHERE next_type IS NOT NULL
GROUP BY 1, 2
"""


@register(
    "events_transition_matrix",
    _TRANSITIONS_ORACLE,
    "per-user event-sequence transition counts (Markov matrix of the event stream)",
)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence mining: consecutive event-type pairs within each user's
    timeline — the first-order Markov transition matrix behind journey
    analysis. One window (shuffle on user_id) + one pair aggregation; never
    a self-join on the event table."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("next_type", F.lead("event_type").over(w))
        .where(F.col("next_type").isNotNull())
        .groupBy(F.col("event_type").alias("from_type"), F.col("next_type").alias("to_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


_DAU_WAU_ORACLE = """
WITH user_days AS (
  SELECT DISTINCT user_id, date_trunc('day', ts) AS d FROM events
),
expanded AS (
  SELECT user_id, d + k * INTERVAL 1 DAY AS window_day
  FROM user_days, unnest(range(0, 7)) AS u(k)
),
wau AS (
  SELECT window_day, count(DISTINCT user_id) AS wau FROM expanded GROUP BY window_day
),
dau AS (
  SELECT d AS window_day, count(*) AS dau FROM user_days GROUP BY d
)
SELECT strftime(w.window_day, '%Y-%m-%d') AS day,
       COALESCE(dau, 0) AS dau, wau
FROM wau w LEFT JOIN dau USING (window_day)
"""


@register(
    "events_dau_wau",
    _DAU_WAU_ORACLE,
    "rolling engagement: daily actives + trailing-7-day actives per day",
)
def events_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/WAU without a per-day self-join: each (user, active-day) pair
    expands into the 7 future window-days it contributes to (explode of a
    7-element sequence — linear, not quadratic), then one distinct count
    per window day. The trailing window whose anchor day had no events
    still reports its WAU (dau coalesced to 0)."""
    ev = load_table(spark, sf_dir, "events")
    user_days = ev.select("user_id", F.date_trunc("day", "ts").alias("d")).distinct()
    expanded = user_days.select(
        "user_id",
        F.explode(
            F.sequence(F.lit(0), F.lit(6))
        ).alias("k"),
        "d",
    ).select("user_id", F.expr("d + make_interval(0, 0, 0, k)").alias("window_day"))
    wau = expanded.groupBy("window_day").agg(F.countDistinct("user_id").alias("wau"))
    dau = user_days.groupBy(F.col("d").alias("window_day")).agg(F.count(F.lit(1)).alias("dau"))
    return (
        wau.join(dau, "window_day", "left")
        .select(
            F.date_format("window_day", "yyyy-MM-dd").alias("day"),
            F.coalesce("dau", F.lit(0)).alias("dau"),
            "wau",
        )
    )


_GAP_FILL_ORACLE = """
WITH daily AS (
  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS d,
         count(*) AS n, CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1, 2
),
spans AS (
  SELECT user_id, d, n, cents,
         lead(d) OVER (PARTITION BY user_id ORDER BY d) AS next_d
  FROM daily
),
exploded AS (
  SELECT user_id, d, n, cents,
         unnest(generate_series(0, CASE WHEN next_d IS NULL THEN 0
                                        ELSE datediff('day', d, next_d) - 1 END)) AS g
  FROM spans
)
SELECT
  user_id,
  strftime(d + g * INTERVAL 1 DAY, '%Y-%m-%d') AS day,
  CAST(CASE WHEN g = 0 THEN n ELSE 0 END AS BIGINT) AS n_events,
  CAST(cents AS DOUBLE) / 100.0 AS value_filled,
  CAST(CASE WHEN g = 0 THEN 0 ELSE 1 END AS INT) AS is_filled
FROM exploded
"""


@register(
    "events_gap_fill",
    _GAP_FILL_ORACLE,
    "time-series resample: per-user daily spine with last-observation-carried-forward",
)
def events_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-fill / LOCF resample WITHOUT a calendar-spine join: each observed
    (user, day) row knows its successor via one `lead` window, and explodes
    into the gap days it covers — the filled rows inherit the row's own
    value, so last-observation-carried-forward holds by construction.

    Scale shape: one groupBy (daily rollup), one window + explode on the
    same user-keyed partitioning, zero joins, zero driver state. A spine
    table (`sequence(min,max)` cross user) plus `last(ignorenulls)` would
    shuffle the spine AND the data; this plan touches each observation
    once and its output is linear in calendar coverage. The cents-integer
    sum keeps the filled value bit-identical across engines."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("d")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("cents"),
    )
    w = Window.partitionBy("user_id").orderBy("d")
    spans = daily.withColumn("next_d", F.lead("d").over(w))
    gap = F.when(F.col("next_d").isNull(), F.lit(0)).otherwise(
        F.datediff("next_d", "d") - 1
    )
    return (
        spans.select(
            "user_id", "d", "n", "cents", F.explode(F.sequence(F.lit(0), gap)).alias("g")
        )
        .select(
            "user_id",
            F.date_format(F.date_add("d", F.col("g")), "yyyy-MM-dd").alias("day"),
            F.when(F.col("g") == 0, F.col("n")).otherwise(F.lit(0)).cast("bigint").alias("n_events"),
            (F.col("cents").cast("double") / 100.0).alias("value_filled"),
            F.when(F.col("g") == 0, F.lit(0)).otherwise(F.lit(1)).cast("int").alias("is_filled"),
        )
    )


_PURCHASE_WINDOW_ORACLE = """
WITH p AS (
  SELECT event_id AS purchase_id, ts AS lo, ts + INTERVAL 1 HOUR AS hi
  FROM events WHERE event_type = 'purchase'
),
c AS (SELECT ts FROM events WHERE event_type = 'click')
SELECT p.purchase_id, count(c.ts) AS n_clicks
FROM p LEFT JOIN c ON c.ts >= p.lo AND c.ts < p.hi
GROUP BY 1
"""


@register(
    "events_purchase_window_clicks",
    _PURCHASE_WINDOW_ORACLE,
    "1-D interval join via bin-bucketed range_join: clicks inside each purchase's 1h window",
)
def events_purchase_window_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count site-wide clicks landing in the hour after each purchase.

    Exercises `operators.range_join` — the bin-bucketed interval join. The
    naive plan for this query is a BroadcastNestedLoopJoin over
    |purchases|x|clicks| (DuckDB's IEJoin handles it natively; OSS Spark has
    no inequality-join operator). With 1h intervals and a 1h bin width each
    interval explodes to exactly 2 bin rows, so the join is a plain shuffled
    equi-join on the bin id with a residual containment filter — linear in
    input plus output, AQE-skew-splittable, whole-stage-codegen'd.

    LEFT semantics (purchases with zero clicks) come from a zero-fill
    against the purchase skeleton after the inner range join + count — the
    repo's standard J6 pattern.
    """
    from duckpipe_spark.operators.range_join import range_join

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("lo"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("hi"),
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("ts").alias("click_ts")
    )
    matched = range_join(
        clicks,
        purchases,
        "click_ts",
        "lo",
        "hi",
        bin_width=3600 * 1_000_000,  # 1h of microseconds = the interval length
        closed="left",
    )
    counts = matched.groupBy("purchase_id").agg(F.count(F.lit(1)).alias("n_clicks"))
    return (
        purchases.select("purchase_id")
        .join(counts, "purchase_id", "left")
        .select(
            "purchase_id",
            F.coalesce(F.col("n_clicks"), F.lit(0)).cast("bigint").alias("n_clicks"),
        )
    )


_SALTED_JOIN_ORACLE = """
SELECT c.c_mktsegment AS segment,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(round(e.value * 100) AS BIGINT)) AS BIGINT) AS value_cents
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY 1
"""


@register(
    "events_salted_join",
    _SALTED_JOIN_ORACLE,
    "skew-safe replicated-salt equi-join equals the plain join exactly",
)
def events_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-side events join the customer dim through `operators.skew.
    salted_join` (8-way key split): the hot-key-proof plan must produce
    byte-identical aggregates to the plain join the oracle runs. The events
    table concentrates all traffic on ~150 user ids — exactly the key-domain
    shape where an unsalted shuffle join reduces on a handful of reducers."""
    from duckpipe_spark.operators.skew import salted_join

    ev = load_table(spark, sf_dir, "events").select("user_id", "value")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    joined = salted_join(ev, cust, "user_id", salts=8)
    return joined.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("value_cents"),
    )


_ZSCORE_ORACLE = """
WITH c AS (
  SELECT user_id, event_id, CAST(round(value * 100) AS BIGINT) AS cents, ts FROM events
), w AS (
  SELECT user_id, event_id, cents,
         CAST(sum(cents) OVER win AS BIGINT) AS s1,
         CAST(sum(cents * cents) OVER win AS BIGINT) AS s2,
         count(*) OVER win AS n
  FROM c
  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
), z AS (
  SELECT user_id, event_id,
         (CAST(cents AS DOUBLE) - CAST(s1 AS DOUBLE) / n)
           / sqrt(CASE WHEN (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n) / (n - 1) > 0
                       THEN (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n) / (n - 1)
                  END) AS z_score
  FROM w WHERE n >= 10
)
SELECT user_id, event_id, z_score FROM z WHERE abs(z_score) > 3
"""


@register(
    "events_anomaly_zscore",
    _ZSCORE_ORACLE,
    "rolling z-score outliers over a 20-event trailing window per user",
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flag events whose value sits >3 trailing standard deviations from the
    user's last 20 events (frame excludes the current row, min 10 priors).

    Cross-engine float exactness: the window aggregates are INTEGER sums of
    cents (S1, S2, n) — order-independent and bit-identical on any engine —
    and the z-score is one fixed IEEE-double expression over those integers,
    so Spark and DuckDB produce the same 64-bit result (correctly-rounded
    ops on identical operands), not merely close ones. Zero/negative
    variance (cancellation) yields NULL → filtered, identically, on both
    sides.

    Scale shape: one shuffle on user_id, one in-partition sort, no joins —
    the same cost envelope as any per-key sessionization at 100 TB."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.select(
        "user_id",
        "event_id",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        "ts",
    )
    win = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-20, -1)
    )
    w = c.select(
        "user_id",
        "event_id",
        "cents",
        F.sum("cents").over(win).alias("s1"),
        F.sum(F.col("cents") * F.col("cents")).over(win).alias("s2"),
        F.count(F.lit(1)).over(win).alias("n"),
    ).where(F.col("n") >= 10)
    var = "(CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n) / (n - 1)"
    z = w.select(
        "user_id",
        "event_id",
        F.expr(
            f"(CAST(cents AS DOUBLE) - CAST(s1 AS DOUBLE) / n)"
            f" / sqrt(CASE WHEN {var} > 0 THEN {var} END)"
        ).alias("z_score"),
    )
    return z.where(F.abs(F.col("z_score")) > 3)


_OHLC_ORACLE = """
WITH w AS (
  SELECT date_trunc('hour', ts) AS h, value,
         row_number() OVER (PARTITION BY date_trunc('hour', ts)
                            ORDER BY ts, event_id) AS rn_a,
         row_number() OVER (PARTITION BY date_trunc('hour', ts)
                            ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM events
)
SELECT strftime(h, '%Y-%m-%d %H:%M:%S') AS hour,
       CAST(count(*) AS BIGINT) AS n_events,
       min(CASE WHEN rn_a = 1 THEN value END) AS open,
       max(value) AS high,
       min(value) AS low,
       min(CASE WHEN rn_d = 1 THEN value END) AS close
FROM w GROUP BY 1
"""


@register(
    "events_ohlc_bars",
    _OHLC_ORACLE,
    "OHLC downsampling bars: first/last via tie-broken windows, no float arithmetic",
)
def events_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly open/high/low/close bars over the event value stream — the
    canonical time-series downsampling shape. Open/close are elected by
    row_number over the total (ts, event_id) order (first/last would be
    partition-order-dependent); every output value is an UNTRANSFORMED
    input double, so the cross-engine hash is exact with zero float
    arithmetic. One shuffle on the hour bucket; the two windows share its
    partitioning."""
    ev = load_table(spark, sf_dir, "events")
    h = F.date_trunc("hour", "ts")
    wa = Window.partitionBy(h).orderBy(F.col("ts").asc(), F.col("event_id").asc())
    wd = Window.partitionBy(h).orderBy(F.col("ts").desc(), F.col("event_id").desc())
    w = ev.select(
        h.alias("h"),
        "value",
        F.row_number().over(wa).alias("rn_a"),
        F.row_number().over(wd).alias("rn_d"),
    )
    return w.groupBy(F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.min(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close"),
    )
