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
