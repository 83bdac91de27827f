"""End-to-end corpus curation: the composition layer that turns the §2.14
operator family (text quality, exact dedup, MinHash-LSH near-dup) into a
training-data pipeline over a `documents`-shaped table.

Stages (each one a lazy DataFrame transformation — a single action runs the
whole pipeline through Catalyst):

1. text stats + quality score + language guess (codegen column expressions)
2. quality gate (min tokens, max token length, quality threshold, language)
3. exact dedup: keep the smallest doc_id per normalized fingerprint
4. near-dup removal: MinHash-LSH candidates → exact Jaccard verify →
   connected via "keep the smallest id of each candidate pair" (one LSH
   generation, one verify join — at 100 TB the candidate set is the only
   quadratic-ish object and it's bounded by band collisions, never N²)

Returns the curated corpus plus per-stage drop counts for audit.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from duckpipe_spark.functions.dedup import (
    exact_dedup_groups,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
)
from duckpipe_spark.functions.text import (
    quality_score_col,
    with_language_guess,
    with_token_stats,
)


def decontamination_stats(
    docs: DataFrame,
    k: int = 5,
    bench_bucket_min: int = 90,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination: per *training* document, how many of its
    distinct word-``k``-gram hashes also occur in any *benchmark* document.

    The benchmark/train membership is the deterministic Lehmer hash split
    (``sampling.with_hash_split`` semantics): bucket = hash(id) mod 100,
    benchmark = bucket ≥ ``bench_bucket_min`` — the same stable assignment
    the split operator produces, so decontamination composes with it without
    materializing a membership table.

    Scale shape: one shingle-hash projection over the scan (no shuffle), the
    benchmark n-gram set is ``distinct`` over the benchmark slice only (by
    construction a small fraction of the corpus — the side you'd broadcast at
    100 TB, hinted here), and the hit count is an equi-join on the hash plus
    a map-side-combinable count. Never compares documents pairwise.

    Returns every train doc with ≥ k tokens:
    (doc_id, n_ngrams, n_shared, contamination).
    """
    from duckpipe_spark.functions.dedup import shingle_hashes
    from duckpipe_spark.functions.sampling import lehmer_hash_col

    hv = shingle_hashes(docs, text_col, id_col, k)
    bucket = lehmer_hash_col(F.col("id")) % 100
    hv = hv.withColumn("_b", bucket)
    bench_hv = hv.where(F.col("_b") >= bench_bucket_min).select("hv").distinct()
    train = hv.where(F.col("_b") < bench_bucket_min).select("id", "hv")
    sizes = train.groupBy("id").agg(F.count(F.lit(1)).alias("n_ngrams"))
    hits = (
        train.join(F.broadcast(bench_hv), "hv")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    n_shared = F.coalesce("n_shared", F.lit(0)).cast("bigint")
    return (
        sizes.join(hits, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.col("n_ngrams").cast("bigint").alias("n_ngrams"),
            n_shared.alias("n_shared"),
            (n_shared.cast("double") / F.col("n_ngrams")).alias("contamination"),
        )
    )


def boilerplate_stats(
    docs: DataFrame,
    k: int = 3,
    min_docs: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Cross-document boilerplate detection: a word-``k``-gram is boilerplate
    when it occurs in ≥ ``min_docs`` distinct documents (headers, footers,
    license blurbs — the lines C4/RefinedWeb-style pipelines strip). Reports
    per document what fraction of its distinct k-grams are boilerplate.

    Scale shape: the n-gram document frequency is one map-side-combinable
    count over the exploded (already per-doc-distinct) hash rows — the same
    shuffle the TF-IDF ``df`` relation pays — and the per-doc hit count
    re-joins on the hash key. The boilerplate *set* (df ≥ min_docs) is tiny
    relative to the corpus (heavy-hitter tail), the natural broadcast side.

    Returns every doc with ≥ k tokens:
    (doc_id, n_ngrams, n_boiler, boiler_frac).
    """
    from duckpipe_spark.functions.dedup import shingle_hashes

    hv = shingle_hashes(docs, text_col, id_col, k)
    boiler = (
        hv.groupBy("hv")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") >= min_docs)
        .select("hv")
    )
    sizes = hv.groupBy("id").agg(F.count(F.lit(1)).alias("n_ngrams"))
    hits = (
        hv.join(F.broadcast(boiler), "hv")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_boiler"))
    )
    n_boiler = F.coalesce("n_boiler", F.lit(0)).cast("bigint")
    return (
        sizes.join(hits, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.col("n_ngrams").cast("bigint").alias("n_ngrams"),
            n_boiler.alias("n_boiler"),
            (n_boiler.cast("double") / F.col("n_ngrams")).alias("boiler_frac"),
        )
    )


@dataclass
class CurationReport:
    corpus: DataFrame
    n_input: int
    n_after_quality: int
    n_after_exact: int
    n_after_neardup: int

    def summary(self) -> str:
        return (
            f"input={self.n_input}  quality_pass={self.n_after_quality}  "
            f"exact_unique={self.n_after_exact}  final={self.n_after_neardup}"
        )


def curate_corpus(
    docs: DataFrame,
    min_tokens: int = 10,
    min_quality: float = 0.3,
    languages: tuple[str, ...] | None = None,
    jaccard_threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
    collect_counts: bool = True,
) -> CurationReport:
    """Run the full curation pipeline; with ``collect_counts=False`` nothing
    is executed (pure lazy composition) and the counts are -1."""
    docs = docs.select(id_col, text_col)

    # 1-2: stats + quality gate (stats/lang return (id, metrics) — join back)
    stats = with_token_stats(docs, text_col, id_col).select(id_col, "n_tokens")
    lang = with_language_guess(docs, text_col, id_col)
    scored = (
        docs.withColumn("quality", quality_score_col(F.col(text_col)))
        .join(stats, id_col)
        .join(lang, id_col)
    )
    gated = scored.where(
        (F.col("n_tokens") >= min_tokens) & (F.col("quality") >= min_quality)
    )
    if languages is not None:
        gated = gated.where(F.col("lang_guess").isin(*languages))
    gated = gated.select(id_col, text_col).cache()

    # 3: exact dedup — keep the canonical (min) id of each fingerprint group
    canon = exact_dedup_groups(gated, text_col, id_col).select(
        F.col("canonical_id").alias(id_col)
    )
    exact_unique = gated.join(canon, id_col, "left_semi").cache()

    # 4: near-dup removal — LSH candidates, exact-Jaccard verify, drop the
    # larger id of every confirmed pair (deterministic survivor rule)
    sigs = minhash_signatures(exact_unique, text_col, id_col)
    cands = lsh_candidate_pairs(sigs)
    verified = (
        ngram_jaccard_pairs(exact_unique, text_col, id_col, threshold=jaccard_threshold)
        .join(cands, ["id_a", "id_b"], "left_semi")
    )
    losers = verified.select(F.col("id_b").alias(id_col)).distinct()
    final = exact_unique.join(losers, id_col, "left_anti")

    if collect_counts:
        report = CurationReport(
            corpus=final,
            n_input=docs.count(),
            n_after_quality=gated.count(),
            n_after_exact=exact_unique.count(),
            n_after_neardup=final.count(),
        )
    else:
        report = CurationReport(final, -1, -1, -1, -1)
    return report
