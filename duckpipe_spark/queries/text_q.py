"""Text-analysis queries over `documents` with exact DuckDB oracles.

The Spark side calls the engine library (`duckpipe_spark.functions.text`);
the oracle SQL is generated from the same constants so both engines compute
identical integers/doubles (see the determinism notes in relational.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from duckpipe_spark.functions.text import (
    BPE_ISH_REGEX,
    LANG_MARKERS,
    PUNCT_CLASS,
    STOPWORDS,
    fingerprint_col,
    quality_score_col,
    with_language_guess,
    with_token_stats,
)
from duckpipe_spark.functions.sampling import lehmer_hash_sql
from duckpipe_spark.queries.base import register
from duckpipe_spark.sources.tables import load_table

_STOP_SQL = ", ".join(f"'{w}'" for w in STOPWORDS)

_TOKEN_STATS_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, text, string_split_regex(trim(text), '\\s+') AS t FROM documents
)
SELECT
  doc_id,
  len(t) AS n_tokens,
  len(list_distinct(t)) AS n_uniq_tokens,
  CAST(len(list_filter(t, x -> x IN ({_STOP_SQL}))) AS DOUBLE) / len(t) AS stop_ratio,
  CAST(length(regexp_replace(text, '{PUNCT_CLASS}', '', 'g')) AS DOUBLE) / length(text) AS punct_ratio,
  CAST(length(regexp_replace(trim(text), '\\s+', '', 'g')) AS DOUBLE) / len(t) AS avg_token_len,
  len(regexp_extract_all(text, '{BPE_ISH_REGEX}')) AS n_bpe_tokens
FROM toks
"""


@register("doc_token_stats", _TOKEN_STATS_ORACLE, "token counting + quality ratios (text analysis)")
def doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return with_token_stats(load_table(spark, sf_dir, "documents"))


_lang_counts_sql = {
    lang: f"len(list_filter(t, x -> x IN ({', '.join(chr(39) + w + chr(39) for w in words)})))"
    for lang, words in LANG_MARKERS.items()
}
_LANG_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
),
c AS (
  SELECT doc_id, {_lang_counts_sql['en']} AS en, {_lang_counts_sql['de']} AS de,
         {_lang_counts_sql['es']} AS es, {_lang_counts_sql['fr']} AS fr
  FROM toks
)
SELECT doc_id,
  CASE
    WHEN en > 0 AND en >= de AND en >= es AND en >= fr THEN 'en'
    WHEN de > 0 AND de >= es AND de >= fr THEN 'de'
    WHEN es > 0 AND es >= fr THEN 'es'
    WHEN fr > 0 THEN 'fr'
    ELSE 'und'
  END AS lang_guess
FROM c
"""


@register("doc_language_guess", _LANG_ORACLE, "marker-stopword language ID heuristic")
def doc_language_guess(spark: SparkSession, sf_dir: str) -> DataFrame:
    return with_language_guess(load_table(spark, sf_dir, "documents"))


_QUALITY_ORACLE = f"""
WITH s AS (
  SELECT
    doc_id,
    len(string_split_regex(trim(text), '\\s+')) AS n,
    CAST(length(regexp_replace(trim(text), '\\s+', '', 'g')) AS DOUBLE)
      / len(string_split_regex(trim(text), '\\s+')) AS avg_len,
    CAST(length(regexp_replace(text, '{PUNCT_CLASS}', '', 'g')) AS DOUBLE) / length(text) AS punct_ratio
  FROM documents
)
SELECT doc_id,
  (
    (CASE WHEN n >= 10 AND n <= 1000 THEN 1.0 ELSE 0.0 END)
    + (CASE WHEN avg_len >= 2.0 AND avg_len <= 12.0 THEN 1.0 ELSE 0.0 END)
    + (CASE WHEN punct_ratio <= 0.1 THEN 1.0 ELSE 0.0 END)
  ) / 3.0 AS quality
FROM s
"""


@register("doc_quality_score", _QUALITY_ORACLE, "surface-statistics document quality score")
def doc_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", quality_score_col(F.col("text")).alias("quality"))


_FINGERPRINT_ORACLE = """
SELECT
  md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp,
  min(doc_id) AS canonical_id,
  count(*) AS n_dups
FROM documents
GROUP BY 1
"""


@register("doc_fingerprint_dedup", _FINGERPRINT_ORACLE, "exact dedup via normalized-content fingerprint (hash-groupBy)")
def doc_fingerprint_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckpipe_spark.functions.dedup import exact_dedup_groups

    return exact_dedup_groups(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# TF-IDF top terms — corpus-relative term weighting without float log():
# score = tf * n_docs / df is order-equivalent to tf * (n_docs/df) and stays
# IEEE-exact across engines (single double division, no transcendentals)
# ---------------------------------------------------------------------------

_TFIDF_K = 3

_TFIDF_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS term
  FROM documents
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term
), df AS (
  SELECT term, count(*) AS df FROM tf GROUP BY term
), n AS (
  SELECT count(*) AS n_docs FROM documents
)
SELECT doc_id, term, score, rk FROM (
  SELECT tf.doc_id, tf.term,
         CAST(tf.tf AS DOUBLE) * n.n_docs / df.df AS score,
         row_number() OVER (
           PARTITION BY tf.doc_id
           ORDER BY CAST(tf.tf AS DOUBLE) * n.n_docs / df.df DESC, tf.term ASC
         ) AS rk
  FROM tf JOIN df USING (term) CROSS JOIN n
) WHERE rk <= {_TFIDF_K}
"""


@register(
    "doc_tfidf_topterms",
    _TFIDF_ORACLE,
    "per-document top-k TF-IDF terms (two-level agg + broadcast scalar + rank)",
)
def doc_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale shape: tf is a map-side-combinable agg on (doc, term); df
    reaggregates the (already small) tf relation by term; the corpus size is
    a single-row aggregate broadcast with crossJoin (never collected to the
    driver); the rank window partitions by doc_id (high cardinality, fully
    parallel)."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    score = F.col("tf").cast("double") * F.col("n_docs") / F.col("df")
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("term").asc())
    return (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n))
        .withColumn("score", score)
        .withColumn("rk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rk") <= _TFIDF_K)
        .select("doc_id", "term", "score", "rk")
    )


# ---------------------------------------------------------------------------
# per-language quality percentile — relative-rank quality gating
# (percent_rank = (rank-1)/(n-1) is exact integer→double math, portable)
# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# tokenizer vocabulary + document encoding — the id sequences a training
# pipeline feeds to packing/shard-writing (OOV id 0, ids 1..V by frequency)
# ---------------------------------------------------------------------------

_VOCAB_SIZE = 24

_VOCAB_SQL = f"""toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
),
tf AS (
  SELECT unnest(t) AS token FROM toks
),
vocab AS (
  SELECT token, token_id, n_occurrences FROM (
    SELECT token, count(*) AS n_occurrences,
           row_number() OVER (ORDER BY count(*) DESC, token ASC) AS token_id
    FROM tf GROUP BY token
  ) WHERE token_id <= {_VOCAB_SIZE}
)"""

_VOCAB_ORACLE = f"""
WITH {_VOCAB_SQL}
SELECT token, token_id, n_occurrences FROM vocab
"""


@register(
    "doc_vocab",
    _VOCAB_ORACLE,
    "frequency-ranked tokenizer vocabulary (ids 1..V, OOV reserved 0)",
)
def doc_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckpipe_spark.functions.text import build_vocab

    return build_vocab(load_table(spark, sf_dir, "documents"), _VOCAB_SIZE)


_ENCODE_ORACLE = f"""
WITH {_VOCAB_SQL},
pos AS (
  SELECT doc_id, t, unnest(range(1, len(t) + 1)) AS i FROM toks
),
tok AS (
  SELECT doc_id, i - 1 AS pos, t[i] AS token FROM pos
)
SELECT doc_id, pos, COALESCE(v.token_id, 0) AS token_id
FROM tok LEFT JOIN vocab v USING (token)
"""


@register(
    "doc_encoded",
    _ENCODE_ORACLE,
    "documents encoded to vocabulary id sequences (broadcast vocab join, OOV→0)",
)
def doc_encoded(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckpipe_spark.functions.text import build_vocab, encode_docs

    docs = load_table(spark, sf_dir, "documents")
    return encode_docs(docs, build_vocab(docs, _VOCAB_SIZE))


# ---------------------------------------------------------------------------
# PII scrubbing — regexes restricted to the Java∩RE2 subset so the scrubbed
# text is byte-identical across engines
# ---------------------------------------------------------------------------


def _pii_oracle() -> str:
    from duckpipe_spark.functions.text import PII_PATTERNS

    counts = ",\n  ".join(
        f"len(regexp_extract_all(text, '{p}')) AS n_{name}"
        for name, p in PII_PATTERNS.items()
    )
    scrubbed = "text"
    for p in PII_PATTERNS.values():
        scrubbed = f"regexp_replace({scrubbed}, '{p}', '<PII>', 'g')"
    return f"""
SELECT doc_id,
  {counts},
  {scrubbed} AS text_scrubbed
FROM documents
"""


@register(
    "doc_pii_scrub",
    _pii_oracle(),
    "PII redaction: email/phone/long-digit spans → <PII>, per-class counts",
)
def doc_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckpipe_spark.functions.text import scrub_pii

    return scrub_pii(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# per-language quality percentile — relative-rank quality gating
# (percent_rank = (rank-1)/(n-1) is exact integer→double math, portable)
# ---------------------------------------------------------------------------

_QPCT_ORACLE = f"""
WITH s AS (
  SELECT
    doc_id,
    lang,
    len(string_split_regex(trim(text), '\\s+')) AS n,
    CAST(length(regexp_replace(trim(text), '\\s+', '', 'g')) AS DOUBLE)
      / len(string_split_regex(trim(text), '\\s+')) AS avg_len,
    CAST(length(regexp_replace(text, '{PUNCT_CLASS}', '', 'g')) AS DOUBLE) / length(text) AS punct_ratio
  FROM documents
), q AS (
  SELECT doc_id, lang,
    (
      (CASE WHEN n >= 10 AND n <= 1000 THEN 1.0 ELSE 0.0 END)
      + (CASE WHEN avg_len >= 2.0 AND avg_len <= 12.0 THEN 1.0 ELSE 0.0 END)
      + (CASE WHEN punct_ratio <= 0.1 THEN 1.0 ELSE 0.0 END)
    ) / 3.0 AS quality
  FROM s
)
SELECT doc_id, lang, quality, pr FROM (
  SELECT doc_id, lang, quality,
         percent_rank() OVER (PARTITION BY lang ORDER BY quality ASC, doc_id ASC) AS pr
  FROM q
) WHERE pr >= 0.5
"""


@register(
    "doc_quality_percentile",
    _QPCT_ORACLE,
    "keep docs above the per-language median quality (percent_rank window gate)",
)
def doc_quality_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative (per-stratum) quality gating — the robust form of a fixed
    threshold when quality distributions differ across languages. One
    shuffle on lang; the window sort parallelizes across languages."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    q = docs.select("doc_id", "lang", quality_score_col(F.col("text")).alias("quality"))
    w = Window.partitionBy("lang").orderBy(F.col("quality").asc(), F.col("doc_id").asc())
    return (
        q.withColumn("pr", F.percent_rank().over(w))
        .where(F.col("pr") >= 0.5)
        .select("doc_id", "lang", "quality", "pr")
    )


# --- language-ID evaluation: confusion matrix vs labeled ground truth ------

_LANG_CONFUSION_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, lang, string_split_regex(trim(text), '\\s+') AS t FROM documents
),
c AS (
  SELECT doc_id, lang, {_lang_counts_sql['en']} AS en, {_lang_counts_sql['de']} AS de,
         {_lang_counts_sql['es']} AS es, {_lang_counts_sql['fr']} AS fr
  FROM toks
),
guessed AS (
  SELECT lang AS true_lang,
    CASE
      WHEN en > 0 AND en >= de AND en >= es AND en >= fr THEN 'en'
      WHEN de > 0 AND de >= es AND de >= fr THEN 'de'
      WHEN es > 0 AND es >= fr THEN 'es'
      WHEN fr > 0 THEN 'fr'
      ELSE 'und'
    END AS guessed_lang
  FROM c
)
SELECT true_lang, guessed_lang, count(*) AS n
FROM guessed GROUP BY true_lang, guessed_lang
"""


@register(
    "lang_id_confusion",
    _LANG_CONFUSION_ORACLE,
    "language-ID evaluation: confusion matrix of guesses vs labeled lang",
)
def lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier evaluation in-engine (same pattern as the ANN recall
    operators): cross-tabulate the heuristic guess against the corpus's
    labeled language — one scan, one shuffle on the (true, guessed) pair."""
    docs = load_table(spark, sf_dir, "documents")
    guessed = with_language_guess(docs).join(
        docs.select("doc_id", F.col("lang").alias("true_lang")), "doc_id"
    )
    return (
        guessed.groupBy("true_lang", F.col("lang_guess").alias("guessed_lang"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


from duckpipe_spark.functions.text import gopher_quality_flags  # noqa: E402

_GOPHER_ORACLE = f"""
WITH base AS (
  SELECT doc_id, text,
         string_split_regex(trim(text), '\\s+') AS w,
         list_filter(string_split(text, chr(10)), x -> trim(x) <> '') AS lines
  FROM documents
),
m AS (
  SELECT doc_id,
    CAST(len(w) AS BIGINT) AS n_words,
    CAST(length(regexp_replace(trim(text), '\\s+', '', 'g')) AS DOUBLE) / len(w) AS mean_word_len,
    CAST(len(list_filter(string_split(text, ''), c -> c = '#'))
         + len(regexp_extract_all(text, '\\.\\.\\.|…')) AS DOUBLE) / len(w) AS symbol_ratio,
    CASE WHEN len(lines) = 0 THEN 0.0
         ELSE CAST(len(list_filter(lines, x -> left(trim(x), 1) IN ('-', '*', '•'))) AS DOUBLE) / len(lines) END AS bullet_line_frac,
    CASE WHEN len(lines) = 0 THEN 0.0
         ELSE CAST(len(list_filter(lines, x -> regexp_matches(trim(x), '(\\.\\.\\.|…)$'))) AS DOUBLE) / len(lines) END AS ellipsis_line_frac,
    CAST(len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE) / len(w) AS alpha_word_frac,
    CAST(len(list_filter(w, x -> x IN ({_STOP_SQL}))) AS BIGINT) AS n_stopwords,
    len(lines) AS n_lines
  FROM base
)
SELECT doc_id, n_words, mean_word_len, symbol_ratio, bullet_line_frac,
  ellipsis_line_frac, alpha_word_frac, n_stopwords,
  (n_words >= 50 AND n_words <= 100000) AS rule_word_count,
  (mean_word_len >= 3.0 AND mean_word_len <= 10.0) AS rule_mean_word_len,
  (symbol_ratio <= 0.1) AS rule_symbol_ratio,
  (n_lines = 0 OR bullet_line_frac <= 0.9) AS rule_bullet_lines,
  (n_lines = 0 OR ellipsis_line_frac <= 0.3) AS rule_ellipsis_lines,
  (alpha_word_frac >= 0.8) AS rule_alpha_words,
  (n_stopwords >= 2) AS rule_stopwords,
  ((n_words >= 50 AND n_words <= 100000) AND (mean_word_len >= 3.0 AND mean_word_len <= 10.0)
   AND (symbol_ratio <= 0.1) AND (n_lines = 0 OR bullet_line_frac <= 0.9)
   AND (n_lines = 0 OR ellipsis_line_frac <= 0.3) AND (alpha_word_frac >= 0.8)
   AND (n_stopwords >= 2)) AS gopher_pass
FROM m
"""


@register(
    "doc_gopher_quality",
    _GOPHER_ORACLE,
    "Gopher quality-rule battery (Rae et al. 2021) as one shuffle-free projection",
    bench=True,  # r8: every r7 family ratio-tracked round-over-round (VERDICT r7 item 8)
)
def doc_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return gopher_quality_flags(load_table(spark, sf_dir, "documents"))


from duckpipe_spark.functions.text import chunk_documents  # noqa: E402

_CHUNK_MAX, _CHUNK_STRIDE = 64, 48

_CHUNK_ORACLE = f"""
WITH base AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(text), '\\s+'), w -> w <> '') AS t
  FROM documents
)
SELECT doc_id,
  CAST(s // {_CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
  CAST(s AS BIGINT) AS start_token,
  CAST(len(list_slice(t, s + 1, s + {_CHUNK_MAX})) AS BIGINT) AS n_chunk_tokens,
  array_to_string(list_slice(t, s + 1, s + {_CHUNK_MAX}), ' ') AS chunk_text
FROM (SELECT doc_id, t, unnest(range(0, len(t), {_CHUNK_STRIDE})) AS s FROM base)
"""


@register(
    "doc_chunks",
    _CHUNK_ORACLE,
    "overlapping context-window chunking (pure projection + explode)",
    bench=True,  # r8: every r7 family ratio-tracked round-over-round (VERDICT r7 item 8)
)
def doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    return chunk_documents(
        load_table(spark, sf_dir, "documents"), max_tokens=_CHUNK_MAX, stride=_CHUNK_STRIDE
    )


from duckpipe_spark.functions.dedup import POLY_BASE, POLY_MOD  # noqa: E402
from duckpipe_spark.functions.text import feature_hash_embed  # noqa: E402

_EMBED_DIM = 64

_FEATURE_HASH_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS w FROM documents
),
h AS (
  SELECT doc_id, list_reduce(
    list_prepend(CAST(0 AS BIGINT), list_transform(string_split(w, ''), c -> CAST(ascii(c) AS BIGINT))),
    (acc, x) -> (acc * {POLY_BASE} + x) % {POLY_MOD}
  ) AS wh
  FROM toks WHERE w <> ''
)
SELECT doc_id,
  CAST(wh % {_EMBED_DIM} AS INT) AS j,
  CAST(sum(1 - 2 * ((wh // {_EMBED_DIM}) % 2)) AS BIGINT) AS v
FROM h
GROUP BY 1, 2
"""


@register(
    "doc_feature_hash_embed",
    _FEATURE_HASH_ORACLE,
    "feature-hashing document vectors (hashing trick; all-integer, exploded)",
    bench=True,  # r8: every r7 family ratio-tracked round-over-round (VERDICT r7 item 8)
)
def doc_feature_hash_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NOT spread: a paired r14 sweep measured scan-spread neutral here
    # (min 0.932 → 0.935 s at sf0.1) — kept fused per guide §1.2
    return feature_hash_embed(load_table(spark, sf_dir, "documents"), dim=_EMBED_DIM)


from duckpipe_spark.functions.text import bm25_topk  # noqa: E402

_BM25_K = 10
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_QUERIES = [
    (0, ["spark", "join"]),
    (1, ["hash", "table", "scan"]),
    (2, ["stream", "window"]),
    (3, ["vector", "group", "fast"]),
]

_BM25_QT_VALUES = ", ".join(
    f"({qid}, '{t}')" for qid, terms in _BM25_QUERIES for t in terms
)

# float determinism: the non-log Robertson idf keeps every factor rational
# in exact integer aggregates; the Spark side mirrors this expression tree
# token for token, and the per-(query, doc) sum is an ordered left fold
# over term-sorted contributions (the dot-product pattern) rounded to 6 dp
# before ranking.
#
# Parameterized on k so the hybrid-RRF oracle (similarity_q.py) can reuse
# the exact same scoring tree at a wider candidate depth.
def _bm25_oracle(k: int) -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS term
  FROM documents
),
dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM toks GROUP BY doc_id),
qt(query_id, term) AS (VALUES {_BM25_QT_VALUES}),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM toks
  WHERE term IN (SELECT term FROM qt) GROUP BY doc_id, term
),
dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(dl) AS BIGINT) AS total_dl
  FROM dl
),
contrib AS (
  SELECT q.query_id, t.doc_id, t.term,
         ((s.n_docs - d.df + 0.5) / (d.df + 0.5))
           * (t.tf * {_BM25_K1 + 1.0!r})
           / (t.tf + {_BM25_K1!r} * ({1.0 - _BM25_B!r} + {_BM25_B!r} * l.dl
                / (CAST(s.total_dl AS DOUBLE) / s.n_docs))) AS c
  FROM tf t
  JOIN qt q USING (term)
  JOIN dfq d USING (term)
  JOIN dl l USING (doc_id)
  CROSS JOIN stats s
)
SELECT query_id, CAST(rk AS INT) AS rank, doc_id, score FROM (
  SELECT query_id, doc_id, score,
         row_number() OVER (
           PARTITION BY query_id ORDER BY score DESC, doc_id ASC
         ) AS rk
  FROM (
    SELECT query_id, doc_id,
           round(list_reduce(
             list_prepend(CAST(0.0 AS DOUBLE), list(c ORDER BY term)),
             (acc, x) -> acc + x
           ), 6) AS score
    FROM contrib GROUP BY query_id, doc_id
  )
) WHERE rk <= {int(k)}
"""


_BM25_ORACLE = _bm25_oracle(_BM25_K)


@register(
    "doc_bm25_topk",
    _BM25_ORACLE,
    "BM25 ranked retrieval for keyword queries (hard-negative mining shape)",
)
def doc_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bm25_topk(
        load_table(spark, sf_dir, "documents"),
        _BM25_QUERIES,
        k=_BM25_K,
        k1=_BM25_K1,
        b=_BM25_B,
    )


# --- BM25 serve path through a DISK index artifact (VERDICT r10 item 6) -----


def _bm25_index_artifact(spark: SparkSession, sf_dir: str) -> str:
    """Write-once BM25 index artifact on disk for ``sf_dir``'s corpus,
    keyed by corpus mtime (a regenerated parquet rebuilds the index rather
    than serving a stale one) — the same contract as bpe_q's
    ``_tokenizer_artifact``. Completeness check is stats.parquet's
    _SUCCESS marker, which ``save_bm25_index`` writes LAST."""
    import os

    from duckpipe_spark.functions.text import save_bm25_index

    corpus = os.path.join(sf_dir, "documents.parquet")
    try:
        mt = os.stat(corpus).st_mtime_ns
    except OSError:
        mt = -1
    root = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        ".artifacts",
    )
    tag = f"{os.path.basename(os.path.abspath(sf_dir))}_{mt}"
    path = os.path.join(root, f"bm25_index_{tag}")
    if not os.path.exists(os.path.join(path, "stats.parquet", "_SUCCESS")):
        save_bm25_index(load_table(spark, sf_dir, "documents"), path)
    return path


@register(
    "doc_bm25_artifact_topk",
    _BM25_ORACLE,
    "BM25 retrieval THROUGH a persisted parquet index artifact (serve contract)",
)
def doc_bm25_artifact_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VERDICT r10 item 6 — the third trained-artifact family's serve row
    (LM and DSIR already have theirs; the tokenizer's is
    doc_bpe_artifact_encode): the df/dl/postings/stats index is built and
    persisted ONCE, then scoring runs ENTIRELY off the loaded artifact —
    no corpus scan in the plan. Reusing doc_bm25_topk's oracle pins the
    save→load round trip as value-preserving on the full corpus (the
    bpe-artifact precedent: index-served scores must be bit-identical to
    corpus-derived scores, which subsumes checking the artifact tables
    themselves)."""
    from duckpipe_spark.functions.text import bm25_topk_from_index

    path = _bm25_index_artifact(spark, sf_dir)
    return bm25_topk_from_index(
        spark, path, _BM25_QUERIES, k=_BM25_K, k1=_BM25_K1, b=_BM25_B
    )


# --- fill-in-the-middle (FIM) pretraining transform --------------------------

_FIM_RATE = 50
_FIM_H = lehmer_hash_sql("doc_id")
_FIM_H2 = lehmer_hash_sql("doc_id + 1000003")

_FIM_ORACLE = f"""
WITH b AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(text), '\\s+'), w -> w <> '') AS t,
         ({_FIM_H}) AS h1, ({_FIM_H2}) AS h2
  FROM documents
),
c AS (
  SELECT doc_id, t, len(t) AS n, h1,
         least(h1 % (len(t) + 1), h2 % (len(t) + 1)) AS lo,
         greatest(h1 % (len(t) + 1), h2 % (len(t) + 1)) AS hi
  FROM b
)
SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
       (h1 % 100) < {_FIM_RATE} AS fim_applied,
       CASE WHEN (h1 % 100) < {_FIM_RATE}
            THEN '<PRE> ' || coalesce(array_to_string(list_slice(t, 1, lo), ' '), '')
                 || ' <SUF> ' || coalesce(array_to_string(list_slice(t, hi + 1, n), ' '), '')
                 || ' <MID> ' || coalesce(array_to_string(list_slice(t, lo + 1, hi), ' '), '')
            ELSE coalesce(array_to_string(t, ' '), '') END AS fim_text
FROM c
"""


@register(
    "doc_fim_transform",
    _FIM_ORACLE,
    "fill-in-the-middle PSM transform at a 50% deterministic rate (Bavarian'22)",
)
def doc_fim_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure-projection FIM: hash-selected docs emit <PRE>/<SUF>/<MID> PSM
    order with hash-derived cut points; the rest pass through. The
    pretraining transform that adds infilling capability."""
    from duckpipe_spark.functions.text import fim_transform

    return fim_transform(load_table(spark, sf_dir, "documents"), fim_rate_pct=_FIM_RATE)
