"""End-to-end data-selection walk-through: the "which documents do we
train on" layer composed over the driver testdata.

    PYTHONPATH=. python examples/data_selection.py [sf_dir]

Stages (each is one operator from duckpipe_spark.functions.selection):
  1. train a bigram LM on the in-domain slice, score every document
     (CCNet shape) and bucket per-language head/middle/tail;
  2. DSIR hashed-unigram importance weights toward the same target;
  3. resolve near-duplicate clusters keeping the highest-QUALITY member
     (not min-id);
  4. prune the most-prototypical quarter of every embedding cluster
     (SSL-prototypes);
  5. intersect: a document survives selection if it is its cluster's
     best member AND sits in the LM head/middle buckets — then report
     the funnel.

Everything composes lazily — one action at the end computes the funnel.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

import pyspark.sql.functions as F  # noqa: E402


def main() -> None:
    from duckpipe_spark.functions.selection import (
        dedup_keep_best,
        dsir_scores,
        lm_quality_score,
        prototype_prune,
    )
    from duckpipe_spark.session import get_spark
    from duckpipe_spark.sources.tables import load_table

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"
    )
    spark = get_spark("data-selection-example")
    docs = load_table(spark, sf_dir, "documents")
    embs = load_table(spark, sf_dir, "embeddings")
    target = F.col("lang") == "en"

    t0 = time.perf_counter()
    from pyspark.sql import Window

    lm = lm_quality_score(docs, target)
    w = Window.partitionBy("lang").orderBy(F.col("lm_score").desc(), F.col("id").asc())
    buckets = (
        lm.join(docs.select(F.col("doc_id").alias("id"), "lang"), "id")
        .withColumn("lm_bucket", F.ntile(3).over(w))
    )
    dsir = dsir_scores(docs, target)
    best = dedup_keep_best(docs)
    pruned = prototype_prune(embs, k=8, iters=2)

    selected = (
        best.where("is_kept")
        .join(buckets.where("lm_bucket <= 2").select("id"), best.doc_id == F.col("id"))
        .select("doc_id")
    )
    funnel = {
        "docs": docs.count(),
        "dedup_survivors": best.where("is_kept").count(),
        "lm_head_middle": buckets.where("lm_bucket <= 2").count(),
        "selected": selected.count(),
        "embeddings": embs.count(),
        "prototype_kept": pruned.where("is_kept").count(),
        "mean_dsir_of_selected": round(
            dsir.join(selected, dsir.id == selected.doc_id)
            .agg(F.avg("dsir_score"))
            .collect()[0][0],
            6,
        ),
    }
    print({"sf_dir": sf_dir, "elapsed_s": round(time.perf_counter() - t0, 2), **funnel})


if __name__ == "__main__":
    main()
