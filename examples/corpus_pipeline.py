"""Training-data corpus curation over the synthetic documents table —
quality gate → exact dedup → MinHash-LSH near-dup removal, one lazy plan.

    PYTHONPATH=. python examples/corpus_pipeline.py [sf_dir]
"""

import sys

sys.path.insert(0, ".")

from duckpipe_spark.functions.corpus import curate_corpus
from duckpipe_spark.session import get_spark
from duckpipe_spark.sources.tables import load_table

if __name__ == "__main__":
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("corpus-pipeline")
    docs = load_table(spark, sf_dir, "documents")

    from duckpipe_spark.functions.corpus import remove_duplicate_spans, source_rollup

    print("== per-source curation dashboard ==")
    source_rollup(docs).orderBy("source").show(5)

    print("== duplicate-span removal (Lee et al. 2021 style) ==")
    spans = remove_duplicate_spans(docs, window=10)
    spans.selectExpr(
        "count(*) AS n_docs",
        "sum(n_spans) AS total_spans",
        "sum(n_dropped) AS dropped_spans",
    ).show()

    report = curate_corpus(docs, min_tokens=5, min_quality=0.2, jaccard_threshold=0.8)
    print(report.summary())
    report.corpus.show(5, truncate=60)
