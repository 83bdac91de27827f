"""Dataset-splitting, sampling, and sequence-packing operators for
training-data pipelines (SURVEY.md §2.14 extension — the reference has no
sampling surface at all; these are the ops a 100 TB corpus pipeline needs
between curation and training).

Design constraints shared by every operator here:

- **Deterministic and engine-portable.** Assignments derive from a Lehmer
  multiplicative-congruential hash computed in plain BIGINT arithmetic
  (two rounds of ``x -> (x * g) mod 2147483647``), which both Spark and
  DuckDB evaluate bit-identically — no reliance on engine-private hash
  functions (Spark's xxhash64 and DuckDB's hash() disagree), no RNG state.
  Re-running on the same table always yields the same split, so train/test
  membership is stable across runs, engines, and cluster sizes.
- **Shuffle-minimal.** The split is a pure per-row projection (no shuffle).
  Stratified sampling and packing shuffle once on the stratum key, and the
  per-stratum window sort parallelizes across strata.
- **Scale-safe integer ranges.** Ids are reduced mod 2147483647 before the
  multiply, so the intermediate product stays < 2^47 — no BIGINT overflow
  for any 64-bit id.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

# Lehmer / Park-Miller constants (public-domain classic MCG)
_M = 2147483647  # 2^31 - 1 (Mersenne prime)
_G1 = 48271
_G2 = 16807


def lehmer_hash_col(id_col: Column) -> Column:
    """Two-round multiplicative-congruential hash of a BIGINT id.

    ``h = ((((id mod M) + M) mod M + 1) * G1 mod M) * G2 mod M`` — the +1
    keeps 0 out of the fixed point at 0; the double-mod makes negative ids
    well-defined identically in Spark and ANSI SQL (both define % as
    remainder-with-dividend-sign, so we canonicalize first).
    """
    x = ((id_col.cast("bigint") % _M + _M) % _M) + 1
    h1 = (x * _G1) % _M
    return (h1 * _G2) % _M


def lehmer_hash_sql(id_expr: str) -> str:
    """The identical hash as ANSI SQL text (for DuckDB oracles)."""
    x = f"(((CAST({id_expr} AS BIGINT) % {_M}) + {_M}) % {_M} + 1)"
    return f"((({x} * {_G1}) % {_M}) * {_G2}) % {_M}"


def with_hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: tuple[int, int, int] = (80, 10, 10),
    names: tuple[str, str, str] = ("train", "val", "test"),
) -> DataFrame:
    """Deterministic train/val/test assignment: bucket = hash(id) mod 100.

    A pure projection — no shuffle, no RNG, no driver state; membership is a
    function of the id alone, so late-arriving data lands in stable splits
    (the property that matters for dedup-across-split hygiene at 100 TB).
    """
    w_train, w_val, _ = weights
    bucket = lehmer_hash_col(F.col(id_col)) % 100
    split = (
        F.when(bucket < w_train, names[0])
        .when(bucket < w_train + w_val, names[1])
        .otherwise(names[2])
    )
    return df.withColumn("bucket", bucket).withColumn("split", split)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    k: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Exactly-k-per-stratum deterministic sample.

    Rows are ranked inside each stratum by the Lehmer hash of their id (a
    deterministic stand-in for a uniform draw) with the id itself as the
    tiebreak, and the top k survive. One shuffle on the stratum key; the
    rank window never sees more than one stratum per partition, so skew is
    bounded by the largest stratum (salt upstream if a stratum dominates).
    """
    h = lehmer_hash_col(F.col(id_col))
    w = Window.partitionBy(strata_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.withColumn("sample_rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("sample_rank") <= k)
    )


def mixture_resample(
    df: DataFrame,
    weights: dict[str, int],
    strata_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic downsampling to a target domain/language mixture.

    Given integer target ``weights`` per stratum (e.g. ``{"en": 6, "de": 2,
    "es": 1, "fr": 1}``), keep the largest corpus whose stratum proportions
    hit the target exactly without upsampling: the scale is
    ``S = min over strata of count_l / weight_l`` and each stratum keeps its
    ``floor(weight_l · S)`` hash-smallest rows (Lehmer order, id tiebreak) —
    the binding stratum is taken (nearly) whole, every other stratum is
    downsampled to match. Strata not in ``weights`` are dropped.

    Scale shape: the per-stratum counts are one map-side-combinable
    aggregate collapsed to a single broadcast row (the global scale), and
    membership is a rank window partitioned by stratum — one shuffle on the
    stratum key, identical to ``stratified_sample``; determinism comes from
    the same Lehmer order, so re-runs, engines, and cluster sizes agree on
    the exact kept set (stable membership is what makes mixture experiments
    reproducible at 100 TB).
    """
    spark = df.sparkSession
    wdf = F.broadcast(
        spark.createDataFrame(
            [(s, int(w)) for s, w in sorted(weights.items())], f"{strata_col} string, w int"
        )
    )
    counts = df.join(wdf, strata_col).groupBy(strata_col, "w").agg(
        F.count(F.lit(1)).alias("c")
    )
    scale = counts.agg(
        F.min(F.col("c").cast("double") / F.col("w")).alias("s")
    )
    targets = counts.crossJoin(F.broadcast(scale)).select(
        strata_col, F.floor(F.col("w") * F.col("s")).cast("bigint").alias("target_n")
    )
    h = lehmer_hash_col(F.col(id_col))
    w_rank = Window.partitionBy(strata_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.join(F.broadcast(targets), strata_col)
        .withColumn("sample_rank", F.row_number().over(w_rank).cast("bigint"))
        .where(F.col("sample_rank") <= F.col("target_n"))
        .drop("target_n")
    )


def pack_sequences(
    df: DataFrame,
    token_col: str,
    budget: int,
    partition_col: str,
    order_col: str = "doc_id",
) -> DataFrame:
    """Concat-and-chunk sequence packing (GPT-style document packing).

    Documents are laid end-to-end in ``order_col`` order within each
    ``partition_col`` stream; ``pack_id`` is the index of the fixed-size
    token block (``budget`` tokens) in which the document *starts*:
    ``pack_id = floor(exclusive_prefix_sum(tokens) / budget)``.

    The exclusive prefix sum is one window aggregate per stream — a single
    shuffle on the stream key, sort parallel across streams. The streams
    (here: language) are what makes this scale: a global pack order would
    serialize the window into one partition, per-stream packing keeps all
    executors busy and is what a real pipeline does anyway (one packed
    shard family per language/domain).
    """
    w = (
        Window.partitionBy(partition_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefix = F.coalesce(F.sum(token_col).over(w), F.lit(0))
    return df.withColumn("pack_id", F.floor(prefix / budget).cast("bigint"))


def length_bucketed_packing(
    df: DataFrame,
    token_col: str,
    budget: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Length-grouped packing (HF ``group_by_length`` shape): documents
    bucket by ``floor(log2(tokens))`` so sequences of similar length pack
    together — near-uniform fill with minimal padding waste — then
    ``pack_sequences`` runs per bucket. length_bucket is integer bit-math
    (63 − leading-zero-count via a compare chain would be overkill: the
    doc lengths here fit a small CASE-free formula ``length(bin())``-style;
    we use the portable ``floor(ln)``-free variant: bucket = bit length of
    the token count, i.e. the unique b with 2^(b-1) <= n < 2^b, computed
    by string length of the binary representation — exact integers on
    both engines).

    One shuffle on the bucket key (bounded: ~log2(max doc length)
    buckets; the window sort parallelizes across buckets — salt the
    bucket with a shard prefix if one bucket dominates a real corpus)."""
    clash = {"length_bucket", "pack_id"} & set(df.columns)
    if clash:
        raise ValueError(
            f"length_bucketed_packing reserves column names {sorted(clash)}; "
            "rename them first"
        )
    # bit_length(n) via conv → binary string length: exact integer math
    bucket = F.length(F.conv(F.col(token_col).cast("string"), 10, 2)).cast("bigint")
    out = df.withColumn("length_bucket", bucket)
    return pack_sequences(out, token_col, budget, "length_bucket", order_col=id_col)


def epoch_order(
    df: DataFrame,
    epoch: int,
    n_shards: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-epoch deterministic reshuffle: epoch e's training order is the
    Lehmer hash of ``id + e·LARGE_PRIME`` — a DIFFERENT pseudo-random
    permutation every epoch (multi-epoch training wants fresh order, not
    a replay), each a pure function of (id, epoch): resumable, engine-
    portable, no RNG state to checkpoint. Output adds (epoch, shard,
    pos): shard = epoch-hash mod n_shards, pos = rank within shard.

    Same scale shape as ``shard_and_order``: projection + one rank
    window partitioned by shard."""
    clash = {"epoch", "shard", "pos", "_h"} & set(df.columns)
    if clash:
        raise ValueError(
            f"epoch_order reserves column names {sorted(clash)}; rename them first"
        )
    h = lehmer_hash_col(F.col(id_col) + epoch * 1_000_003)
    w = Window.partitionBy("shard").orderBy("_h", id_col)
    return (
        df.withColumn("_h", h)
        .withColumn("epoch", F.lit(epoch).cast("bigint"))
        .withColumn("shard", (F.col("_h") % n_shards).cast("bigint"))
        .withColumn("pos", (F.row_number().over(w) - 1).cast("bigint"))
        .drop("_h")
    )


def temperature_resample(
    df: DataFrame,
    budget: int,
    strata_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Temperature-balanced downsampling (the multilingual data-balancing
    scheme of mT5/XLM-R, at T=2): stratum ``l`` gets a share of ``budget``
    proportional to sqrt(count_l) — flattening the head strata and
    boosting the tail relative to natural proportions — capped at its
    actual count, with membership in deterministic Lehmer order.

    T=2 specifically because IEEE-754 sqrt is exactly rounded on every
    engine, so ``floor(sqrt(c))`` is the same BIGINT everywhere; shares are
    then computed in pure integer arithmetic (``budget·s_l DIV S``), which
    makes the kept set bit-reproducible — a fractional temperature would
    route through ``pow``, whose last-ulp behavior is libm-dependent.

    Scale shape: identical to ``mixture_resample`` — one tiny aggregate
    broadcast back, one rank window per stratum."""
    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("c"))
    s_col = F.floor(F.sqrt(F.col("c").cast("double"))).cast("bigint")
    sized = counts.select(strata_col, "c", s_col.alias("_sq"))
    total = sized.agg(F.sum("_sq").alias("_tot"))
    targets = sized.crossJoin(F.broadcast(total)).select(
        strata_col,
        F.least(
            F.col("c"), F.expr(f"CAST({int(budget)} AS BIGINT) * _sq DIV _tot")
        ).alias("target_n"),
    )
    h = lehmer_hash_col(F.col(id_col))
    w_rank = Window.partitionBy(strata_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.join(F.broadcast(targets), strata_col)
        .withColumn("sample_rank", F.row_number().over(w_rank).cast("bigint"))
        .where(F.col("sample_rank") <= F.col("target_n"))
        .drop("target_n")
    )


def priority_sample(
    df: DataFrame,
    weight_col: str,
    id_col: str,
    k: int,
) -> DataFrame:
    """Weighted sampling without replacement, exactly k rows: priority
    sampling (Ohlsson's sequential Poisson / Duffield-Lund-Thorup).
    Each row gets priority = weight / u with u a uniform draw; the k
    highest priorities form a weighted-inclusion sample with strong
    estimator properties — the standard one-pass weighted sampler.

    Determinism: u comes from the id's middle-square mod-prime mix (no
    rand()), and the priority is one fixed IEEE expression
    ``w·(P+1)/(h+1)`` — division by the shifted hash, monotone-equivalent
    to w/u — so the kept set, like every sampler in this module, is a
    pure function of the data and bit-reproducible against the SQL
    oracle.

    Scale shape: the ORDER BY priority LIMIT k plans as
    TakeOrderedAndProject — per-partition top-k then a k-row merge on the
    driver side of the exchange, never a global sort. Weights must be
    positive.

    The computed ``priority`` column is RETAINED in the output (it is the
    inclusion-probability evidence an estimator downstream needs); the
    name is reserved — same contract as range_join's ``_BIN`` and
    salted_join's ``_SALT``. ``id_col`` must be UNIQUE per row: it seeds
    the uniform draw AND breaks priority ties, so duplicated ids with
    different payloads would make the cut partition-order-dependent
    (sampled_quantiles escapes this by adding its value to the order; a
    generic row sampler has no single value column to add)."""
    from duckpipe_spark.functions.sketches import HLL_P

    if "priority" in df.columns:
        raise ValueError(
            "priority_sample reserves the column name 'priority'; rename it first"
        )

    h1 = f"pmod(769 * {id_col} + 12582917, {HLL_P})"
    h2 = f"pmod({h1} * {h1} + {h1}, {HLL_P})"
    prio = (
        f"(CAST({weight_col} AS DOUBLE) * CAST({HLL_P + 1} AS DOUBLE))"
        f" / CAST({h2} + 1 AS DOUBLE)"
    )
    return (
        df.withColumn("priority", F.expr(prio))
        .orderBy(F.col("priority").desc(), F.col(id_col))
        .limit(k)
    )


def shard_and_order(
    df: DataFrame,
    id_col: str,
    n_shards: int,
) -> DataFrame:
    """Deterministic global shuffle + shard assignment — the dataloader
    prep step (WebDataset/tfrecord sharding): every row gets
    ``shard = hash(id) mod n_shards`` and ``pos`` = its 0-based rank
    within the shard by (hash, id). The hash order IS the training-order
    shuffle: id-adjacent documents (same crawl, same source) land in
    different shards at scattered positions, and the assignment is a pure
    function of the data — re-running on late-arriving or re-partitioned
    data reproduces it exactly (same property as `with_hash_split`,
    which this composes with for split-then-shard layouts).

    Scale shape: the hash/shard columns are a shuffle-free projection;
    the only exchange is the rank window partitioned by shard. Shard
    count is the parallelism dial — dataloader deployments use hundreds
    to thousands of shards (one per reader), which is exactly the
    partitioning a cluster wants; a HANDFUL of shards over a huge corpus
    would concentrate the sort the way any low-cardinality window does
    (see sketches.sampled_quantiles for the two-phase escape when the
    group count is genuinely small).

    ``id_col`` must be unique per row — it seeds the hash and breaks
    ties, the same contract as `priority_sample`."""
    from pyspark.sql import Window

    if n_shards < 1:
        raise ValueError("shard_and_order needs n_shards >= 1")
    clash = {"shard", "pos", "__h"} & set(df.columns)
    if clash:
        raise ValueError(
            f"shard_and_order reserves column names {sorted(clash)}; rename them first"
        )
    h = lehmer_hash_col(F.col(id_col))
    out = df.withColumn("__h", h).withColumn(
        "shard", (F.col("__h") % n_shards).cast("int")
    )
    w = Window.partitionBy("shard").orderBy("__h", id_col)
    return (
        out.withColumn("pos", (F.row_number().over(w) - 1).cast("bigint"))
        .drop("__h")
    )
