"""Partition-invariance property tests.

A distributed operator is only correct at scale if its result is a pure
function of the DATA, not of how the data happens to be partitioned: at
1000 executors the partitioning is different every run. Each test runs an
operator on the natural scan and on an adversarial repartition (17-way
round-robin, which also scrambles row order within partitions) and asserts
bit-identical results via the same canonicalization the oracle gate uses.

These pin the determinism claims made throughout the codebase: exact
integer sums, (value, id) tie-breaks, order-independent hash elections.
"""

import pytest

from duckpipe_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE
from tests.oracle_harness import canonicalize


def _canon(df):
    return canonicalize(df.toPandas())


def _docs(spark):
    return load_table(spark, SF_SMOKE, "documents")


def _embs(spark):
    return load_table(spark, SF_SMOKE, "embeddings")


def op_token_stats(spark, scramble):
    from duckpipe_spark.functions.text import with_token_stats

    return with_token_stats(scramble(_docs(spark)))


def op_minhash(spark, scramble):
    from duckpipe_spark.functions.dedup import minhash_signatures

    return minhash_signatures(scramble(_docs(spark)))


def op_simhash(spark, scramble):
    from duckpipe_spark.functions.dedup import simhash

    return simhash(scramble(_docs(spark)))


def op_exact_dedup(spark, scramble):
    from duckpipe_spark.functions.dedup import exact_dedup_groups

    return exact_dedup_groups(scramble(_docs(spark)))


def op_span_dedup(spark, scramble):
    from duckpipe_spark.functions.corpus import remove_duplicate_spans

    return remove_duplicate_spans(scramble(_docs(spark)))


def op_source_rollup(spark, scramble):
    from duckpipe_spark.functions.corpus import source_rollup

    return source_rollup(scramble(_docs(spark)))


def op_dup_components(spark, scramble):
    from duckpipe_spark.functions.dedup import (
        connected_components,
        lsh_candidate_pairs,
        minhash_signatures,
    )

    return connected_components(lsh_candidate_pairs(minhash_signatures(scramble(_docs(spark)))))


def op_pack_sequences(spark, scramble):
    import pyspark.sql.functions as F

    from duckpipe_spark.functions.sampling import pack_sequences

    toks = scramble(_docs(spark)).select(
        "doc_id",
        "lang",
        F.size(F.split(F.trim("text"), r"\s+")).cast("bigint").alias("n_tokens"),
    )
    return pack_sequences(toks, token_col="n_tokens", budget=2048, partition_col="lang")


def op_pq_codes(spark, scramble):
    from duckpipe_spark.functions.similarity import pq_codes

    return pq_codes(scramble(_embs(spark)))


def op_kmeans(spark, scramble):
    from duckpipe_spark.functions.similarity import kmeans_cells

    return kmeans_cells(scramble(_embs(spark)))


def op_column_stats(spark, scramble):
    from duckpipe_spark.operators.maintenance import table_stats

    return table_stats(
        scramble(load_table(spark, SF_SMOKE, "lineitem")),
        ["l_orderkey", "l_quantity", "l_extendedprice"],
    )


def op_histogram(spark, scramble):
    from duckpipe_spark.operators.maintenance import column_histogram

    return column_histogram(
        scramble(load_table(spark, SF_SMOKE, "lineitem")), "l_extendedprice", 0.0, 80000.0, 16
    )


def op_sessionize(spark, scramble):
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    ev = scramble(load_table(spark, SF_SMOKE, "events"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag(F.col("ts")).over(w)
    flag = F.when(
        prev_ts.isNull() | ((F.col("ts") - prev_ts) > F.expr("INTERVAL 30 MINUTES")), 1
    ).otherwise(0)
    return (
        ev.withColumn("ns", flag)
        .groupBy("user_id")
        .agg(F.sum("ns").alias("n_sessions"), F.count(F.lit(1)).alias("n_events"))
    )


def op_temperature_resample(spark, scramble):
    from duckpipe_spark.functions.sampling import temperature_resample

    return temperature_resample(scramble(_docs(spark)), 100)


def op_incremental_dedup(spark, scramble):
    import pyspark.sql.functions as F

    from duckpipe_spark.functions.dedup import dedup_against_corpus

    docs = scramble(_docs(spark))
    return dedup_against_corpus(
        docs.where(F.col("doc_id") % 2 == 1), docs.where(F.col("doc_id") % 2 == 0)
    )


def op_lsh_recall(spark, scramble):
    from duckpipe_spark.functions.similarity import N_PLANES, lsh_recall

    return lsh_recall(scramble(_embs(spark)), [0, 1, 2, 3, 4], 5, n_planes=N_PLANES)


def op_int8_quant(spark, scramble):
    from duckpipe_spark.functions.similarity import scalar_quantize_int8

    return scalar_quantize_int8(scramble(_embs(spark)))


def op_gap_fill(spark, scramble):
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    # mirrors queries.events_q.events_gap_fill with a scrambled input scan
    ev = scramble(load_table(spark, SF_SMOKE, "events"))
    daily = ev.groupBy("user_id", F.to_date(F.date_trunc("day", "ts")).alias("d")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("cents"),
    )
    w = Window.partitionBy("user_id").orderBy("d")
    spans = daily.withColumn("next_d", F.lead("d").over(w))
    gap = F.when(F.col("next_d").isNull(), F.lit(0)).otherwise(F.datediff("next_d", "d") - 1)
    return spans.select(
        "user_id", "d", "n", "cents", F.explode(F.sequence(F.lit(0), gap)).alias("g")
    ).select(
        "user_id",
        F.date_format(F.date_add("d", F.col("g")), "yyyy-MM-dd").alias("day"),
        F.when(F.col("g") == 0, F.col("n")).otherwise(F.lit(0)).cast("bigint").alias("n_events"),
        (F.col("cents").cast("double") / 100.0).alias("value_filled"),
    )


def op_range_join(spark, scramble):
    import pyspark.sql.functions as F

    from duckpipe_spark.operators.range_join import range_join

    ev = scramble(load_table(spark, SF_SMOKE, "events"))
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("lo"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("hi"),
    )
    clicks = ev.where(F.col("event_type") == "click").select(F.col("ts").alias("click_ts"))
    m = range_join(clicks, purchases, "click_ts", "lo", "hi", bin_width=3600 * 1_000_000)
    return m.groupBy("purchase_id").agg(F.count(F.lit(1)).alias("n_clicks"))


def op_salted_join(spark, scramble):
    import pyspark.sql.functions as F

    from duckpipe_spark.operators.skew import salted_join

    ev = scramble(load_table(spark, SF_SMOKE, "events")).select("user_id", "value")
    cust = load_table(spark, SF_SMOKE, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    return salted_join(ev, cust, "user_id", salts=4).groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("cents"),
    )


def op_triangles(spark, scramble):
    import pyspark.sql.functions as F

    from duckpipe_spark.functions.graph import cooccurrence_edges, triangle_count

    li = scramble(load_table(spark, SF_SMOKE, "lineitem"))
    tris = triangle_count(cooccurrence_edges(li, "l_orderkey", "l_partkey"))
    return tris.groupBy("a").agg(F.count(F.lit(1)).alias("n"))


def op_anomaly_zscore(spark, scramble):
    # mirrors queries.events_q.events_anomaly_zscore on a scrambled scan
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    ev = scramble(load_table(spark, SF_SMOKE, "events"))
    c = ev.select(
        "user_id", "event_id", F.round(F.col("value") * 100).cast("bigint").alias("cents"), "ts"
    )
    win = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-20, -1)
    w = c.select(
        "user_id", "event_id", "cents",
        F.sum("cents").over(win).alias("s1"),
        F.sum(F.col("cents") * F.col("cents")).over(win).alias("s2"),
        F.count(F.lit(1)).over(win).alias("n"),
    ).where(F.col("n") >= 10)
    var = "(CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n) / (n - 1)"
    z = w.select(
        "user_id", "event_id",
        F.expr(
            f"(CAST(cents AS DOUBLE) - CAST(s1 AS DOUBLE) / n)"
            f" / sqrt(CASE WHEN {var} > 0 THEN {var} END)"
        ).alias("z_score"),
    )
    return z.where(F.abs(F.col("z_score")) > 3)


def op_lsh_join(spark, scramble):
    import pyspark.sql.functions as F

    from duckpipe_spark.functions.dedup import lsh_join

    docs = _docs(spark)
    return lsh_join(
        scramble(docs.where(F.col("doc_id") % 7 != 3)),
        scramble(docs.where(F.col("doc_id") % 7 == 3)),
        min_jaccard_pct=20,
    )


def op_sampled_quantiles(spark, scramble):
    import pyspark.sql.functions as F

    from duckpipe_spark.functions.sketches import sampled_quantiles

    li = scramble(load_table(spark, SF_SMOKE, "lineitem")).select(
        "l_returnflag",
        F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)").alias("cents"),
        F.expr("l_orderkey * 8 + l_linenumber").alias("rid"),
    )
    return sampled_quantiles(li, "cents", "rid", ["l_returnflag"], k=64)


def op_bloom_probe(spark, scramble):
    import pyspark.sql.functions as F

    from duckpipe_spark.functions.sketches import bloom_build, bloom_probe

    li = scramble(load_table(spark, SF_SMOKE, "orders"))
    members = li.where(F.col("o_custkey") % 5 == 0).select(F.col("o_custkey").alias("k")).distinct()
    probes = li.select(F.col("o_custkey").alias("k")).distinct()
    return bloom_probe(bloom_build(members, "k"), probes, "k")


def op_video_frame_sample(spark, scramble):
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from duckpipe_spark.functions.jpeg import encode_jpeg_gray
    from duckpipe_spark.functions.mp4 import build_mjpeg_mp4
    from duckpipe_spark.functions.multimodal import sample_video_frames

    docs = scramble(_docs(spark).select("doc_id"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = [
                build_mjpeg_mp4(
                    [
                        encode_jpeg_gray(
                            np.full((16, 16), (int(d) * 31 + j * 17) % 256, np.uint8),
                            quality=95,
                        )
                        for j in range(2 + int(d) % 6)
                    ],
                    fps=4,
                )
                for d in pdf["doc_id"]
            ]
            yield pd.DataFrame({"blob_id": pdf["doc_id"], "blob": blobs})

    return sample_video_frames(docs.mapInPandas(gen, "blob_id bigint, blob binary"), every=2)


def op_train_shards(spark, scramble):
    from duckpipe_spark.functions.sampling import shard_and_order

    return shard_and_order(scramble(_docs(spark)).select("doc_id"), "doc_id", 8)


def op_curation_pipeline(spark, scramble):
    # the end-to-end composition: six chained operators, three window
    # functions, two hash elections — the hardest partition-invariance
    # surface in the catalog (every stage's determinism must compose)
    from duckpipe_spark.functions.corpus import curation_pipeline

    return curation_pipeline(scramble(_docs(spark)))


def op_mask_contaminated(spark, scramble):
    # masked-span sets are collect_set consumed order-insensitively
    # (array_contains + size); the bench set and hits are pure functions
    # of the data
    from duckpipe_spark.functions.corpus import mask_contaminated_spans

    return mask_contaminated_spans(scramble(_docs(spark)))


def op_strip_boilerplate(spark, scramble):
    from duckpipe_spark.functions.corpus import strip_boilerplate_lines

    return strip_boilerplate_lines(scramble(_docs(spark)), min_docs=2)


def op_gopher(spark, scramble):
    from duckpipe_spark.functions.text import gopher_quality_flags

    return gopher_quality_flags(scramble(_docs(spark)))


def op_chunks(spark, scramble):
    from duckpipe_spark.functions.text import chunk_documents

    return chunk_documents(scramble(_docs(spark)))


def op_bpe_encode_ids(spark, scramble):
    from duckpipe_spark.functions.bpe import bpe_encode_ids, learn_bpe_merges

    docs = scramble(_docs(spark))
    return bpe_encode_ids(docs, learn_bpe_merges(docs, n_merges=3))


def op_bpe(spark, scramble):
    # iterative argmax rounds: each round's pair counts are exact integer
    # sums and the (freq desc, lhs, rhs) tie-break is total, so the merge
    # table — and every encode count derived from it — is partition-pure
    from duckpipe_spark.functions.bpe import bpe_token_counts, learn_bpe_merges

    docs = scramble(_docs(spark))
    return bpe_token_counts(docs, learn_bpe_merges(docs, n_merges=4))


def op_bm25(spark, scramble):
    # tf/df/dl are exact integer aggregates; the per-(query, doc) score is
    # an ordered fold over term-sorted contributions, so partitioning
    # cannot reorder the float sum
    from duckpipe_spark.functions.text import bm25_topk

    return bm25_topk(
        scramble(_docs(spark)), [(0, ["the", "join"]), (1, ["a"])], k=5
    )


def op_lm_quality(spark, scramble):
    # LM counts are exact integer aggregates; each bigram probability is
    # one IEEE division and the per-doc sum is an ordered fold over token
    # position — no float summation-order exposure
    import pyspark.sql.functions as F

    from duckpipe_spark.functions.selection import lm_quality_score

    return lm_quality_score(scramble(_docs(spark)), F.col("lang") == "en")


def op_dsir(spark, scramble):
    import pyspark.sql.functions as F

    from duckpipe_spark.functions.selection import dsir_scores

    return dsir_scores(scramble(_docs(spark)), F.col("lang") == "en")


def op_dedup_keep_best(spark, scramble):
    from duckpipe_spark.functions.selection import dedup_keep_best

    return dedup_keep_best(scramble(_docs(spark)))


def op_prototype_prune(spark, scramble):
    from duckpipe_spark.functions.selection import prototype_prune

    return prototype_prune(scramble(_embs(spark)), k=4, iters=1)


def op_ngram_novelty(spark, scramble):
    from duckpipe_spark.functions.dedup import ngram_novelty

    return ngram_novelty(scramble(_docs(spark)))


def op_fim(spark, scramble):
    from duckpipe_spark.functions.text import fim_transform

    return fim_transform(scramble(_docs(spark)))


def op_hamming_topk(spark, scramble):
    from duckpipe_spark.functions.similarity import hamming_topk

    return hamming_topk(scramble(_embs(spark)), [0, 1, 2], k=4)


def op_winnow_decontam(spark, scramble):
    from duckpipe_spark.functions.corpus import winnow_decontaminate

    return winnow_decontaminate(scramble(_docs(spark)))


def op_lm_bucket_sample(spark, scramble):
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from duckpipe_spark.functions.sampling import stratified_sample
    from duckpipe_spark.functions.selection import lm_quality_score

    docs = scramble(_docs(spark))
    scores = lm_quality_score(docs, F.col("lang") == "en")
    w = Window.partitionBy("lang").orderBy(F.col("lm_score").desc(), F.col("id").asc())
    buckets = (
        scores.join(docs.select(F.col("doc_id").alias("id"), "lang"), "id")
        .withColumn("lm_bucket", F.ntile(3).over(w).cast("bigint"))
        .withColumn("stratum", F.concat_ws("|", "lang", F.col("lm_bucket").cast("string")))
    )
    return stratified_sample(buckets, "stratum", 5, id_col="id").select(
        "id", "lang", "lm_bucket", "sample_rank"
    )


def op_ivf_trained_topk(spark, scramble):
    from duckpipe_spark.functions.similarity import ivf_trained_topk

    return ivf_trained_topk(scramble(_embs(spark)), [0, 1, 2], k=4, n_cells=4, iters=1)


def op_winnow_fingerprints(spark, scramble):
    from duckpipe_spark.functions.dedup import winnow_fingerprints

    return winnow_fingerprints(scramble(_docs(spark)))


def op_winnow_matches(spark, scramble):
    from duckpipe_spark.functions.dedup import winnow_matches

    return winnow_matches(scramble(_docs(spark)))


def op_lsh_multiprobe_topk(spark, scramble):
    from duckpipe_spark.functions.similarity import N_PLANES, lsh_multiprobe_topk

    return lsh_multiprobe_topk(
        scramble(_embs(spark)), [0, 1, 2], k=4, n_planes=N_PLANES
    )


def op_brute_force_topk(spark, scramble):
    # r10 two-phase rank: the phase-1 local top-k runs per INPUT partition,
    # so this op is the direct proof that survivors (hence final values)
    # do not depend on how the corpus is split
    from duckpipe_spark.functions.similarity import brute_force_topk

    return brute_force_topk(scramble(_embs(spark)), [0, 1, 2], k=4)


def op_length_bucketed_pack(spark, scramble):
    import pyspark.sql.functions as F

    from duckpipe_spark.functions.sampling import length_bucketed_packing

    toks = scramble(_docs(spark)).select(
        "doc_id", F.size(F.split(F.trim("text"), r"\s+")).cast("bigint").alias("n_tokens")
    )
    return length_bucketed_packing(toks, "n_tokens", 512)


def op_epoch_order(spark, scramble):
    from duckpipe_spark.functions.sampling import epoch_order

    return epoch_order(scramble(_docs(spark)).select("doc_id"), epoch=3, n_shards=4)


def op_corpus_report(spark, scramble):
    from duckpipe_spark.queries import REGISTRY  # noqa: F401 - registry import

    from duckpipe_spark.queries.corpus_q import doc_corpus_report  # noqa: F401

    # the query fn reads from disk; reuse its projection over a scramble
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from duckpipe_spark.functions.text import quality_points_col, tokens_col

    docs = scramble(_docs(spark))
    fp = F.md5(F.lower(F.trim(F.regexp_replace(F.col("text"), r"\s+", " "))))
    s = docs.select(
        "source", "lang",
        F.size(tokens_col(F.col("text"))).cast("bigint").alias("n_toks"),
        quality_points_col(F.col("text")).alias("qp"),
        F.count(F.lit(1)).over(Window.partitionBy(fp)).alias("fpc"),
    )
    n = F.count(F.lit(1))
    return s.groupBy("source", "lang").agg(
        n.cast("bigint").alias("n_docs"),
        F.sum("n_toks").cast("bigint").alias("total_tokens"),
        F.sum(F.when(F.col("fpc") > 1, 1).otherwise(0)).cast("bigint").alias("n_dups"),
    )


def op_maxmatch_encode(spark, scramble):
    from duckpipe_spark.functions.bpe import (
        bpe_vocab_ids,
        learn_bpe_merges,
        maxmatch_encode_ids,
    )

    docs = scramble(_docs(spark))
    merges = learn_bpe_merges(docs, n_merges=4)
    return maxmatch_encode_ids(docs, bpe_vocab_ids(docs, merges))


def op_kmeanspar(spark, scramble):
    from duckpipe_spark.functions.similarity import kmeans_cells

    return kmeans_cells(scramble(_embs(spark)), init="parallel", init_passes=2)


def op_hamming_external(spark, scramble):
    import pyspark.sql.functions as F

    from duckpipe_spark.functions.similarity import hamming_topk_queries

    emb = scramble(_embs(spark))
    q = emb.where(F.col("vec_id") % 97 == 1).select(
        (F.col("vec_id") + 7).alias("query_id"), "embedding"
    )
    return hamming_topk_queries(emb, q, k=4)


def op_lm_pruned(spark, scramble):
    import pyspark.sql.functions as F

    from duckpipe_spark.functions.selection import lm_quality_score

    return lm_quality_score(
        scramble(_docs(spark)), F.col("lang") == "en", min_count=2
    )


def op_dsir_serve(spark, scramble):
    import pyspark.sql.functions as F

    from duckpipe_spark.functions.selection import dsir_score_with_model, dsir_train

    docs = scramble(_docs(spark))
    return dsir_score_with_model(docs, dsir_train(docs, F.col("lang") == "en"))


def op_unimax(spark, scramble):
    from duckpipe_spark.functions.selection import unimax_allocation

    return unimax_allocation(scramble(_docs(spark)), budget=100_000, max_epochs=3)


def op_score_auc(spark, scramble):
    import pyspark.sql.functions as F

    from duckpipe_spark.functions.selection import lm_quality_score, score_auc

    docs = scramble(_docs(spark))
    scores = lm_quality_score(docs, F.col("lang") == "en")
    lab = scores.join(
        docs.select(F.col("doc_id").alias("id"), (F.col("lang") == "en").alias("y")),
        "id",
    )
    return score_auc(lab, label_col="y", score_col="lm_score")


def op_curation_keepbest(spark, scramble):
    from duckpipe_spark.functions.corpus import curation_pipeline

    return curation_pipeline(scramble(_docs(spark)), election="keep_best")


def op_bpe_bytefallback(spark, scramble):
    import pyspark.sql.functions as F

    from duckpipe_spark.functions.bpe import (
        bpe_encode_ids_bytes,
        bpe_vocab_ids_bytes,
        learn_bpe_merges,
    )

    docs = scramble(_docs(spark))
    merges = learn_bpe_merges(docs, n_merges=4)
    vocab = bpe_vocab_ids_bytes(docs, merges)
    injected = docs.select(
        "doc_id", F.concat(F.col("text"), F.lit(" x§ß")).alias("text")
    )
    return bpe_encode_ids_bytes(injected, merges, vocab=vocab)


def op_ivfpq_topk(spark, scramble):
    # r11: trained cells + residual-PQ codebooks are collected literals
    # derived from integer aggregates; ADC sums fold in fixed subvector
    # order, rerank ties break on (cos, id)
    from duckpipe_spark.functions.similarity import ivfpq_topk

    return ivfpq_topk(
        scramble(_embs(spark)), [0, 1, 2], k=4, n_cells=4, iters=1, n_probe=2,
        m=2, pq_cells=4, rerank=8,
    )


def _fingerprint_blobs(spark, scramble, kind):
    """Shared 12-doc blob fixture for the near-dup code kernels: the code
    tables must be invariant to how the doc_id stream is partitioned."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from duckpipe_spark.functions.jpeg import encode_jpeg_gray
    from duckpipe_spark.functions.mp4 import build_mjpeg_mp4
    from duckpipe_spark.functions.png import encode_png
    from duckpipe_spark.functions.wav import encode_wav_mulaw, encode_wav_pcm16

    docs = scramble(_docs(spark).select("doc_id").where("doc_id < 12"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for did in pdf["doc_id"]:
                d = int(did)
                rng = np.random.default_rng(d)
                if kind == "png":
                    blobs.append(
                        encode_png(rng.integers(1, 255, (16, 18)).astype(np.uint8))
                    )
                elif kind == "wav":
                    blobs.append(
                        encode_wav_pcm16(
                            rng.integers(-1024, 1024, 65 * 16).astype(np.int16)
                        )
                    )
                elif kind == "mulaw":
                    # r12: compressed-codec path — same kernel, G.711 blobs
                    blobs.append(
                        encode_wav_mulaw(
                            rng.integers(-30000, 30000, 65 * 16).astype(np.int16)
                        )
                    )
                else:
                    frames = [
                        encode_jpeg_gray(
                            np.full((16, 16), g, np.uint8), quality=95
                        )
                        for g in rng.integers(1, 255, 65)
                    ]
                    blobs.append(build_mjpeg_mp4(frames, fps=4))
            yield pd.DataFrame({"blob_id": pdf["doc_id"], "blob": blobs})

    return docs.mapInPandas(gen, "blob_id bigint, blob binary")


def op_image_dhash(spark, scramble):
    from duckpipe_spark.functions.multimodal import image_dhash

    return image_dhash(_fingerprint_blobs(spark, scramble, "png"))


def op_audio_fingerprint(spark, scramble):
    from duckpipe_spark.functions.multimodal import audio_fingerprint

    return audio_fingerprint(_fingerprint_blobs(spark, scramble, "wav"))


def op_video_fingerprint(spark, scramble):
    from duckpipe_spark.functions.multimodal import video_fingerprint

    return video_fingerprint(_fingerprint_blobs(spark, scramble, "mp4"))


_OPS = [
    op_ivfpq_topk,
    op_image_dhash,
    op_audio_fingerprint,
    op_video_fingerprint,
    op_curation_keepbest,
    op_bpe_bytefallback,
    op_unimax,
    op_score_auc,
    op_kmeanspar,
    op_hamming_external,
    op_lm_pruned,
    op_dsir_serve,
    op_maxmatch_encode,
    op_hamming_topk,
    op_brute_force_topk,
    op_lsh_multiprobe_topk,
    op_winnow_fingerprints,
    op_winnow_matches,
    op_ivf_trained_topk,
    op_lm_bucket_sample,
    op_winnow_decontam,
    op_length_bucketed_pack,
    op_epoch_order,
    op_corpus_report,
    op_fim,
    op_ngram_novelty,
    op_lm_quality,
    op_dsir,
    op_dedup_keep_best,
    op_prototype_prune,
    op_bm25,
    op_token_stats,
    op_bpe,
    op_bpe_encode_ids,
    op_mask_contaminated,
    op_strip_boilerplate,
    op_gopher,
    op_chunks,
    op_minhash,
    op_simhash,
    op_exact_dedup,
    op_span_dedup,
    op_source_rollup,
    op_dup_components,
    op_pack_sequences,
    op_pq_codes,
    op_kmeans,
    op_lsh_recall,
    op_column_stats,
    op_histogram,
    op_sessionize,
    op_temperature_resample,
    op_incremental_dedup,
    op_int8_quant,
    op_gap_fill,
    op_range_join,
    op_salted_join,
    op_triangles,
    op_anomaly_zscore,
    op_lsh_join,
    op_sampled_quantiles,
    op_bloom_probe,
    op_video_frame_sample,
    op_train_shards,
    op_curation_pipeline,
]


@pytest.mark.parametrize("op", _OPS, ids=lambda f: f.__name__)
def test_result_is_partition_invariant(spark, op):
    natural = op(spark, lambda df: df)
    scrambled = op(spark, lambda df: df.repartition(17))
    assert _canon(natural) == _canon(scrambled)


def op_sq8_topk(spark, scramble):
    # r11: gmax is an exact integer corpus aggregate (broadcast 1-row
    # table), candidate scores are exact integer dots, both rank stages
    # are two-phase with id tie-breaks
    from duckpipe_spark.functions.similarity import sq8_topk

    return sq8_topk(scramble(_embs(spark)), [0, 1, 2], k=4, rerank=8)


_OPS.append(op_sq8_topk)


def op_media_neardup_drops(spark, scramble):
    # r12: the curation media stage's drop set — per-modality banding,
    # min-id transitive closure; codes are a pure projection of doc_id so
    # the drop set is a pure function of the data
    import pyspark.sql.functions as F

    from duckpipe_spark.functions.multimodal import media_neardup_drops

    codes = scramble(_docs(spark)).select(
        F.col("doc_id").alias("blob_id"),
        (F.col("doc_id") % 3).cast("int").alias("modality"),
        (F.floor(F.col("doc_id") / 6) * 8).cast("bigint").alias("h0"),
        (F.col("doc_id") % 3).cast("bigint").alias("h1"),
    )
    return media_neardup_drops(codes)


_OPS.append(op_media_neardup_drops)


def op_audio_mulaw_fingerprint(spark, scramble):
    # r12: the compressed-codec decode path must be partition-invariant
    # exactly like the PCM path (stateless per-sample expansion)
    from duckpipe_spark.functions.multimodal import audio_fingerprint

    return audio_fingerprint(_fingerprint_blobs(spark, scramble, "mulaw"))


_OPS.append(op_audio_mulaw_fingerprint)


def op_matryoshka_topk(spark, scramble):
    # r14: the prefix-scan candidate stage ranks per (query, INPUT
    # partition) — the direct proof that the prefix survivors (hence the
    # full-cosine rerank values) do not depend on how the corpus is split
    from duckpipe_spark.functions.similarity import matryoshka_topk

    return matryoshka_topk(
        scramble(_embs(spark)), [0, 1, 2], k=4, prefix_dim=16, rerank=8
    )


_OPS.append(op_matryoshka_topk)


def op_hybrid_rrf(spark, scramble):
    # r14: integer-RRF fusion of two rank lists whose own stages are
    # partition-invariant; the fused BIGINT sum and per-system rank
    # columns must be a pure function of the ranks
    import pyspark.sql.functions as F

    from duckpipe_spark.functions.similarity import (
        brute_force_topk,
        rrf_fuse,
    )
    from duckpipe_spark.functions.text import bm25_topk

    sparse = bm25_topk(
        scramble(_docs(spark)), [(0, ["data", "model"]), (1, ["the"])], k=8
    )
    dense = brute_force_topk(scramble(_embs(spark)), [0, 1], k=8)
    return rrf_fuse(
        [
            ("sparse", sparse.select("query_id", "rank", "doc_id")),
            (
                "dense",
                dense.select(
                    "query_id", "rank", F.col("neighbor_id").alias("doc_id")
                ),
            ),
        ],
        k=5,
    )


_OPS.append(op_hybrid_rrf)


def op_brute_force_topk_queries(spark, scramble):
    # r14: external-namespace cosine leg — the streamed-query serving
    # path must rank identically however the corpus is split
    import pyspark.sql.functions as F

    from duckpipe_spark.functions.similarity import brute_force_topk_queries

    queries = _embs(spark).limit(0).sparkSession.createDataFrame(
        [(100, [0.25] * 64), (101, [-0.5] * 32 + [0.5] * 32)],
        "query_id int, qvec array<float>",
    )
    return brute_force_topk_queries(
        scramble(_embs(spark)), queries, k=4, query_vec_col="qvec"
    )


_OPS.append(op_brute_force_topk_queries)
