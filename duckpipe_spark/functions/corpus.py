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
