"""Parquet/CSV/cloud source layer.

Reference equivalents: direct `FROM '{path}.parquet'` scans inside generated
SQL (`duckpipe/calculator/AirportDistanceCalculator.py:42,82`), CSV example
ingest (`test/example.py:19`), and R2/S3 `httpfs` secrets
(`duckpipe/core.py:87-115`). Here every source is a Spark DataFrameReader so
Catalyst keeps predicate pushdown / column pruning / partition pruning.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


# Session-scoped scan memo: a DataFrame is an immutable plan, so the same
# (session, dir, table) triple can hand back one object — this is catalog
# metadata caching (each spark.read.parquet re-reads footers over Py4J,
# ~0.1-0.2 s of driver latency per call that a real engine's catalog
# amortizes). Weak-keyed on the session so ended sessions release entries.
import weakref

_SCAN_MEMO: "weakref.WeakKeyDictionary[SparkSession, dict]" = weakref.WeakKeyDictionary()


def _freshness_token(path: str) -> float:
    """Cheap staleness guard for the scan memo: the parquet directory's
    mtime (a rewrite replaces/touches the directory). Non-local paths
    (s3a:// etc.) return 0 — object stores don't rewrite in place here and
    a remote stat per load would cost what the memo saves."""
    import os

    try:
        return os.path.getmtime(path)
    except OSError:
        return 0.0


def invalidate_scan_memo(spark: SparkSession | None = None) -> None:
    """Drop memoized scans (for ``spark``, or every session when None) —
    call after overwriting parquet a memoized plan may point at."""
    if spark is None:
        _SCAN_MEMO.clear()
    else:
        _SCAN_MEMO.pop(spark, None)


def spread_small_scan(df: DataFrame) -> DataFrame:
    """Guide §2.5 "input skew" fix: a parquet file with a single row group
    scans as ONE task no matter how it is split, so every expression between
    the scan and the first exchange — tokenize/explode/hash pipelines that
    dominate the text operators — runs on one core while the rest idle.
    Round-robin repartition to the session default parallelism when the
    planned scan has fewer partitions than that.

    Scale-adaptive by construction: at 100 TB the input has thousands of
    splits, ``parts >= defaultParallelism`` holds, and this is a no-op — the
    exchange only exists in the regime where it wins (small/badly-laid-out
    inputs). Determinism: keyless repartition sorts rows within each input
    partition first (``spark.sql.execution.sortBeforeRepartition``, on by
    default), so the row→partition assignment is reproducible and retry-safe;
    all downstream operators are partition-count invariant (pinned by the
    partition-invariance test suite and the DuckDB oracle hashes).

    Apply SURGICALLY, not blanket: a measured bench sweep with every
    documents/embeddings scan spread showed the exchange + extra scheduled
    stage LOSES on the many short queries whose scan-stage fusion
    (scan→compute→partial-agg in one task) already bounds their cost, and
    wins only where serialized per-row compute dominates (the bigram-LM
    hashing passes: doc_lm_quality best-rep 2.69 → 2.06 s at sf0.1)."""
    spark = df.sparkSession
    n = spark.sparkContext.defaultParallelism
    try:
        parts = df.rdd.getNumPartitions()
    except Exception:  # pragma: no cover - exotic plans; spreading is optional
        return df
    return df.repartition(n) if parts < n else df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one parquet table. Filters/projections applied by callers are
    pushed into the scan by Catalyst (verify via .explain → PushedFilters).
    Repeated loads of the same table in one session return the same
    DataFrame object (plan reuse, not data caching — nothing is pinned).
    The memo key carries the directory mtime, so a regenerated/overwritten
    table gets a fresh scan (stale entries would otherwise return plans
    over deleted part files); `invalidate_scan_memo` force-clears."""
    memo = _SCAN_MEMO.setdefault(spark, {})
    path = f"{sf_dir}/{name}.parquet"
    key = (sf_dir, name, _freshness_token(path))
    if key in memo:
        return memo[key]
    if name == "events":
        # Older events.parquet layouts store ts as INT64 TIMESTAMP(NANOS),
        # which Spark rejects unless nanosAsLong is on (current layouts use
        # timestamp[us] and ignore it). The conf is runtime-settable, so set
        # it here rather than at session build — load_table must work on any
        # plain SparkSession, not just ours. NOTE this is intentionally NOT
        # restored after the read: Spark consults it again lazily at job
        # execution, so resetting it would break the very scan it enables.
        # Session-wide effect: subsequent nanos-timestamp parquet reads in
        # this session also come back as long instead of erroring.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    # events.ts is TIMESTAMP(NANOS) in parquet; Spark reads it as long nanos
    # (spark.sql.legacy.parquet.nanosAsLong). Truncate to micros like DuckDB.
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # integer DIV: `/` would go through double and lose exactness >2^53 ns
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    memo[key] = df
    return df


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLE_NAMES)}


def register_views(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> None:
    """Register temp views so operators can also be expressed via spark.sql."""
    for n, df in load_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(n)


def read_csv_points(spark: SparkSession, path: str) -> DataFrame:
    """CSV ingest, mirrors reference `test/example.py:19`."""
    return spark.read.csv(path, header=True, inferSchema=True)


def configure_s3(
    spark: SparkSession,
    access_key: str,
    secret_key: str,
    endpoint: str | None = None,
    ssl: bool = True,
) -> None:
    """Cloud object store access — replaces DuckDB `CREATE SECRET` replay
    (`duckpipe/core.py:103-114`). Set once on the session; executors
    inherit. ``ssl=False`` targets http endpoints (localstack/minio-style
    test servers — the e2e harness in tests/test_sinks.py uses it)."""
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    hconf.set("fs.s3a.access.key", access_key)
    hconf.set("fs.s3a.secret.key", secret_key)
    if endpoint:
        hconf.set("fs.s3a.endpoint", endpoint)
    hconf.set("fs.s3a.path.style.access", "true")
    if not ssl:
        hconf.set("fs.s3a.connection.ssl.enabled", "false")


# --- format-generic IO (beyond reference: the reference is parquet-only; a
# production corpus pipeline ingests JSONL dumps and exports ORC/CSV too) ---

_FORMATS = ("parquet", "orc", "json", "csv")

DOCS_JSONL_SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"


def read_any(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: str | None = None,
    **options,
) -> DataFrame:
    """Format-generic scan. ALWAYS pass an explicit schema for json/csv at
    scale: schema inference runs a full extra pass over the data (at 100 TB
    that is a second 100 TB read before the first real job starts).
    parquet/orc carry their schema in the footer, so none is needed."""
    if fmt not in _FORMATS:
        raise ValueError(f"fmt must be one of {_FORMATS}, got {fmt!r}")
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    elif fmt in ("json", "csv"):
        reader = reader.option("inferSchema", "true")
    if fmt == "csv":
        reader = reader.option("header", options.pop("header", "true"))
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def write_any(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    **options,
) -> None:
    """Format-generic sink (same partitioning semantics for every format)."""
    if fmt not in _FORMATS:
        raise ValueError(f"fmt must be one of {_FORMATS}, got {fmt!r}")
    w = df.write.format(fmt).mode(mode)
    if fmt == "csv":
        w = w.option("header", options.pop("header", "true"))
    for k, v in options.items():
        w = w.option(k, v)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(path)


def read_jsonl_docs(spark: SparkSession, path: str, schema: str = DOCS_JSONL_SCHEMA) -> DataFrame:
    """JSONL corpus ingest (one JSON document per line — the interchange
    format of every public web-scale text dump). Explicit schema: malformed
    lines land in nulls rather than failing the scan (PERMISSIVE mode), and
    no inference pass is needed."""
    return spark.read.schema(schema).json(path)
