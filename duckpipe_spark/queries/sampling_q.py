"""Sampling / splitting / packing queries over `documents` with exact DuckDB
oracles (SURVEY.md §2.14 extension — see functions/sampling.py for the
engine-portability and scale notes).

Every assignment is verified PER ROW (the result carries one row per
document, not just group counts), so the oracle hash-match proves the exact
split/sample/pack membership, not merely its distribution.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from duckpipe_spark.functions.sampling import (
    lehmer_hash_sql,
    pack_sequences,
    stratified_sample,
    with_hash_split,
)
from duckpipe_spark.queries.base import register
from duckpipe_spark.sources.tables import load_table

_H = lehmer_hash_sql("doc_id")

# ---------------------------------------------------------------------------
# deterministic hash split — train/val/test membership per document
# ---------------------------------------------------------------------------

_SPLIT_ORACLE = f"""
SELECT
  doc_id,
  ({_H}) % 100 AS bucket,
  CASE WHEN ({_H}) % 100 < 80 THEN 'train'
       WHEN ({_H}) % 100 < 90 THEN 'val'
       ELSE 'test' END AS split
FROM documents
"""


@register(
    "doc_hash_split",
    _SPLIT_ORACLE,
    "deterministic train/val/test hash split (pure projection, no shuffle)",
)
def doc_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return with_hash_split(docs, id_col="doc_id").select("doc_id", "bucket", "split")


# ---------------------------------------------------------------------------
# stratified sample — exactly k per language, deterministic
# ---------------------------------------------------------------------------

_STRAT_K = 50

_STRAT_ORACLE = f"""
SELECT doc_id, lang, sample_rank FROM (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang ORDER BY {_H} ASC, doc_id ASC)
           AS sample_rank
  FROM documents
) WHERE sample_rank <= {_STRAT_K}
"""


@register(
    "doc_stratified_sample",
    _STRAT_ORACLE,
    "exactly-k-per-language deterministic stratified sample (hash-ordered rank)",
)
def doc_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return stratified_sample(docs, "lang", _STRAT_K, id_col="doc_id").select(
        "doc_id", "lang", "sample_rank"
    )


# ---------------------------------------------------------------------------
# sequence packing — concat-and-chunk block assignment per language stream
# ---------------------------------------------------------------------------

_PACK_BUDGET = 2048

_PACK_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, lang, len(string_split_regex(trim(text), '\\s+')) AS n_tokens
  FROM documents
)
SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(floor(
         coalesce(sum(n_tokens) OVER (
           PARTITION BY lang ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         / {_PACK_BUDGET}) AS BIGINT) AS pack_id
FROM toks
"""


@register(
    "doc_pack_sequences",
    _PACK_ORACLE,
    "GPT-style concat-and-chunk sequence packing (per-language exclusive prefix sum)",
    bench=True,
)
def doc_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "lang",
        F.size(F.split(F.trim("text"), r"\s+")).cast("bigint").alias("n_tokens"),
    )
    return pack_sequences(
        toks, token_col="n_tokens", budget=_PACK_BUDGET, partition_col="lang"
    ).select("doc_id", "lang", "n_tokens", "pack_id")


# ---------------------------------------------------------------------------
# top-k n-grams per language — corpus-statistics aggregation
# ---------------------------------------------------------------------------

_TOP_BIGRAMS_K = 5

_BIGRAM_ORACLE = f"""
WITH toks AS (
  SELECT lang, string_split_regex(trim(lower(text)), '\\s+') AS t FROM documents
), grams AS (
  SELECT lang, unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i + 1]))
           AS bigram
  FROM toks
), counted AS (
  SELECT lang, bigram, count(*) AS n FROM grams GROUP BY lang, bigram
)
SELECT lang, bigram, n, rk FROM (
  SELECT lang, bigram, n,
         row_number() OVER (PARTITION BY lang ORDER BY n DESC, bigram ASC) AS rk
  FROM counted
) WHERE rk <= {_TOP_BIGRAMS_K}
"""


@register(
    "lang_top_bigrams",
    _BIGRAM_ORACLE,
    "top-k bigrams per language (explode -> two-level agg -> deterministic rank)",
    bench=True,
)
def lang_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus n-gram statistics. Scale shape: the explode multiplies rows by
    ~tokens-per-doc, but the (lang, bigram) count is map-side combinable so
    the shuffle carries only distinct bigrams; the rank window then runs on
    the already-aggregated (small) relation."""
    docs = load_table(spark, sf_dir, "documents")
    t = F.split(F.trim(F.lower("text")), r"\s+")
    # guard: Spark's sequence(1, 0) is a DESCENDING [1, 0], not empty like
    # DuckDB's range(1, 1) — single-token docs must yield no bigrams
    bigrams = F.when(
        F.size("_t") >= 2,
        F.expr(
            "transform(sequence(1, size(_t) - 1),"
            " i -> concat(element_at(_t, i), ' ', element_at(_t, i + 1)))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = docs.withColumn("_t", t).select("lang", F.explode(bigrams).alias("bigram"))
    counted = grams.groupBy("lang", "bigram").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("lang").orderBy(F.col("n").desc(), F.col("bigram").asc())
    return (
        counted.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rk") <= _TOP_BIGRAMS_K)
    )


# ---------------------------------------------------------------------------
# temperature-balanced resampling (T=2, integer-exact shares)
# ---------------------------------------------------------------------------

_TEMP_BUDGET = 300

_TEMP_ORACLE = f"""
WITH counts AS (
  SELECT lang, count(*) AS c FROM documents GROUP BY lang
),
sized AS (
  SELECT lang, c, CAST(floor(sqrt(CAST(c AS DOUBLE))) AS BIGINT) AS s FROM counts
),
tot AS (SELECT CAST(sum(s) AS BIGINT) AS total_s FROM sized),
targets AS (
  SELECT lang, least(c, CAST({_TEMP_BUDGET} AS BIGINT) * sized.s // total_s) AS target_n
  FROM sized, tot
),
ranked AS (
  SELECT d.*, t.target_n,
         row_number() OVER (
           PARTITION BY d.lang
           ORDER BY ({lehmer_hash_sql('d.doc_id')}) ASC, d.doc_id ASC
         ) AS sample_rank
  FROM documents d JOIN targets t USING (lang)
)
SELECT doc_id, text, lang, source, n_chars, CAST(sample_rank AS BIGINT) AS sample_rank
FROM ranked WHERE sample_rank <= target_n
"""


@register(
    "doc_temperature_resample",
    _TEMP_ORACLE,
    "sqrt-temperature (T=2) mixture balancing with integer-exact shares",
)
def doc_temperature_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckpipe_spark.functions.sampling import temperature_resample

    return temperature_resample(load_table(spark, sf_dir, "documents"), _TEMP_BUDGET)


_PRIORITY_ORACLE = """
WITH pr AS (
  SELECT doc_id, n_chars,
         (CAST(n_chars AS DOUBLE) * CAST(1000000008 AS DOUBLE))
           / CAST((((769 * doc_id + 12582917) % 1000000007)
                   * ((769 * doc_id + 12582917) % 1000000007)
                   + ((769 * doc_id + 12582917) % 1000000007)) % 1000000007 + 1 AS DOUBLE)
           AS priority
  FROM documents
)
SELECT doc_id, n_chars, priority FROM pr
ORDER BY priority DESC, doc_id LIMIT 100
"""


@register(
    "doc_priority_sample",
    _PRIORITY_ORACLE,
    "weighted sampling without replacement: deterministic priority top-k",
)
def doc_priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-100 length-weighted document sample via priority sampling
    (`functions.sampling.priority_sample`) — long documents are
    proportionally more likely to survive, the draw is a pure function of
    doc_id (hash-derived uniform, no rand()), and the float priorities
    hash-match the oracle bit for bit. Plans as TakeOrderedAndProject,
    never a global sort."""
    from duckpipe_spark.functions.sampling import priority_sample

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return priority_sample(docs, "n_chars", "doc_id", 100)


# ---------------------------------------------------------------------------
# deterministic global shuffle + shard assignment (dataloader prep)
# ---------------------------------------------------------------------------

_SHARDS = 8

_SHARD_ORACLE = f"""
SELECT doc_id,
       CAST(({_H}) % {_SHARDS} AS INT) AS shard,
       CAST(row_number() OVER (
              PARTITION BY ({_H}) % {_SHARDS}
              ORDER BY ({_H}), doc_id
            ) - 1 AS BIGINT) AS pos
FROM documents
"""


@register(
    "doc_train_shards",
    _SHARD_ORACLE,
    "deterministic global shuffle + shard/position assignment (dataloader prep)",
)
def doc_train_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WebDataset-style training-order prep: every document gets a shard
    (hash mod N) and a position within it (rank by hash — the shuffle).
    Membership and order are pure functions of the data, so late-arriving
    docs and re-runs reproduce the same layout; per-row oracle-verified
    like the rest of the sampling family."""
    from duckpipe_spark.functions.sampling import shard_and_order

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return shard_and_order(docs, "doc_id", _SHARDS).select("doc_id", "shard", "pos")


# ---------------------------------------------------------------------------
# length-bucketed packing + per-epoch deterministic reshuffle
# ---------------------------------------------------------------------------

_LBP_BUDGET = 512

_LBP_ORACLE = f"""
WITH toks AS (
  SELECT doc_id,
         CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens
  FROM documents
),
b AS (
  SELECT doc_id, n_tokens,
         CAST(length(bin(n_tokens)) AS BIGINT) AS length_bucket
  FROM toks
)
SELECT doc_id, n_tokens, length_bucket,
       CAST(floor(
         coalesce(sum(n_tokens) OVER (
           PARTITION BY length_bucket ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         / {_LBP_BUDGET}) AS BIGINT) AS pack_id
FROM b
"""


@register(
    "doc_length_bucketed_pack",
    _LBP_ORACLE,
    "length-grouped packing: log2 length buckets, per-bucket prefix-sum packing",
)
def doc_length_bucketed_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HF group_by_length shape: similar-length docs pack together for
    near-uniform fill. Bucket = bit length of the token count (exact
    integer via binary-string length on both engines)."""
    from duckpipe_spark.functions.sampling import length_bucketed_packing

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.size(F.split(F.trim("text"), r"\s+")).cast("bigint").alias("n_tokens"),
    )
    return length_bucketed_packing(toks, "n_tokens", _LBP_BUDGET).select(
        "doc_id", "n_tokens", "length_bucket", "pack_id"
    )


_EPOCH = 2
_EPOCH_SHARDS = 4
_EPOCH_H = lehmer_hash_sql(f"doc_id + {_EPOCH} * 1000003")

_EPOCH_ORACLE = f"""
WITH h AS (
  SELECT doc_id, lang, ({_EPOCH_H}) AS eh FROM documents
)
SELECT doc_id, lang, CAST({_EPOCH} AS BIGINT) AS epoch,
       CAST(eh % {_EPOCH_SHARDS} AS BIGINT) AS shard,
       CAST(row_number() OVER (
              PARTITION BY eh % {_EPOCH_SHARDS} ORDER BY eh, doc_id
            ) - 1 AS BIGINT) AS pos
FROM h
"""


@register(
    "doc_epoch_order",
    _EPOCH_ORACLE,
    "per-epoch deterministic reshuffle: epoch-keyed Lehmer permutation + shard rank",
)
def doc_epoch_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-epoch training order: epoch e permutes by hash(id + e·P) — a
    fresh deterministic shuffle per epoch, resumable with no RNG state."""
    from duckpipe_spark.functions.sampling import epoch_order

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return epoch_order(docs, epoch=_EPOCH, n_shards=_EPOCH_SHARDS).select(
        "doc_id", "lang", "epoch", "shard", "pos"
    )
