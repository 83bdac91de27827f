"""End-to-end tokenizer + training-prep demo over the documents table:

  quality gate (Gopher rules) → boilerplate strip → contamination mask
  → BPE merge learning → id-sequence encode → context-window chunking
  → tokenizer-aware packing → deterministic shards

Every stage is the library operator the oracle catalog verifies; this
script just chains them the way a pre-training data run would.

    PYTHONPATH=. python examples/tokenizer_pipeline.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import pyspark.sql.functions as F  # noqa: E402

from duckpipe_spark.functions.bpe import (  # noqa: E402
    bpe_encode_ids,
    bpe_token_counts,
    learn_bpe_merges,
)
from duckpipe_spark.functions.corpus import (  # noqa: E402
    mask_contaminated_spans,
    strip_boilerplate_lines,
)
from duckpipe_spark.functions.sampling import pack_sequences, shard_and_order  # noqa: E402
from duckpipe_spark.functions.text import chunk_documents, gopher_quality_flags  # noqa: E402
from duckpipe_spark.session import get_spark  # noqa: E402


def main(sf_dir: str) -> None:
    spark = get_spark()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # 1. quality gate: Gopher rule battery (relaxed word floor for the
    # synthetic corpus, everything else at paper defaults)
    flags = gopher_quality_flags(docs)
    gated = docs.join(
        flags.where(
            F.col("rule_mean_word_len")
            & F.col("rule_symbol_ratio")
            & F.col("rule_alpha_words")
        ).select("doc_id"),
        "doc_id",
        "left_semi",
    )
    print(f"gate: {docs.count()} -> {gated.count()} docs")

    # 2. boilerplate lines stripped corpus-wide, then benchmark
    # contamination masked span-by-span on the train split
    stripped = strip_boilerplate_lines(gated).select(
        "doc_id", F.col("clean_text").alias("text")
    )
    masked = mask_contaminated_spans(stripped).select(
        "doc_id", F.col("clean_text").alias("text")
    )
    print(f"decontaminated train docs: {masked.count()}")

    # 3. tokenizer: learn merges on the cleaned train corpus
    merges = learn_bpe_merges(masked, n_merges=8)
    print("merges:")
    merges.show(truncate=False)

    # 4. encode + chunk + pack + shard
    ids = bpe_encode_ids(masked, merges)
    print(f"encoded token ids: {ids.count()}")
    chunks = chunk_documents(masked, max_tokens=128, stride=96)
    print(f"chunks: {chunks.count()}")
    counted = bpe_token_counts(masked, merges)
    packed = pack_sequences(
        counted.withColumn("stream", F.lit("all")), "n_bpe_tokens", 512, "stream"
    )
    print(f"packs: {packed.select('pack_id').distinct().count()}")
    shards = shard_and_order(counted.select("doc_id"), "doc_id", 8)
    shards.groupBy("shard").count().orderBy("shard").show()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
