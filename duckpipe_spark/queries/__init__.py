"""Query catalog: importing this package registers all queries."""

from duckpipe_spark.queries import events_q, relational, relational_ext, spatial_proxy  # noqa: F401

try:  # text/dedup/similarity modules are added incrementally
    from duckpipe_spark.queries import text_q  # noqa: F401
except ImportError:
    pass
try:
    from duckpipe_spark.queries import dedup_q  # noqa: F401
except ImportError:
    pass
try:
    from duckpipe_spark.queries import similarity_q  # noqa: F401
except ImportError:
    pass
try:
    from duckpipe_spark.queries import multimodal_q  # noqa: F401
except ImportError:
    pass
try:
    from duckpipe_spark.queries import geo_q  # noqa: F401
except ImportError:
    pass
try:
    from duckpipe_spark.queries import sampling_q  # noqa: F401
except ImportError:
    pass
try:
    from duckpipe_spark.queries import corpus_q  # noqa: F401
except ImportError:
    pass
try:
    from duckpipe_spark.queries import bpe_q  # noqa: F401
except ImportError:
    pass
try:
    from duckpipe_spark.queries import graph_q  # noqa: F401
except ImportError:
    pass
try:
    from duckpipe_spark.queries import selection_q  # noqa: F401
except ImportError:
    pass

from duckpipe_spark.queries import base
from duckpipe_spark.queries.base import REGISTRY, oracle_queries, spark_queries


# First 50 names are what the driver's correctness gate will actually check.
# Round-14 rotation — held EXACTLY to the composition published in the r13
# comment block and re-stated by VERDICT r13 item 2:
#   * the r13-new / r13-changed-not-windowed queries FIRST: the THREE
#     never-attested new queries (doc_curation_medianear_artifact,
#     audio_adpcm_fingerprint_neardup, audio_msadpcm_fingerprint_neardup
#     — all judge-green at sf0.01 in VERDICT r13), then
#     embedding_ivfpq_topk at its new derived-covering rerank default
#     (VERDICT r12 item 3; windowed r12 at the OLD default), then the
#     changed-not-windowed CHANGED lineage members in the published
#     order: embedding_semantic_dedup, doc_curation_semdedup,
#     doc_dedup_keep_best, doc_incremental_dedup, doc_curation_pipeline,
#     doc_curation_lmgate_pruned. (doc_incremental_dedup is ALSO one of
#     the 29 r10-cohort leftovers; it appears once, here, so the
#     r10-cohort block below carries the remaining 28.)
#   * then the 28 remaining r10-cohort leftovers (latest driver row r10
#     — 4 rounds old; pre-swept 43/43 at sf0.1 in r12 per the aging
#     cadence) ALPHABETICALLY: doc_feature_hash_embed ..
#     video_frame_sample;
#   * the remaining 12 slots: the r11 cohort (latest green r11; 50
#     queries, 4 of which already lead this window via the CHANGED
#     group; pre-swept 50/50 at sf0.1 in r13) ALPHABETICALLY —
#     blob_byte_entropy .. doc_winnow_decontam.
# That leaves 34 r11-cohort queries NOT in the r14 window
# (doc_winnow_fingerprints .. parts_hll_distinct, the full list below);
# being 4 rounds old at r15, they are scheduled to LEAD the r15 window:
# r15 window plan: any queries NEW in r14 or r14-changed-and-not-
# windowed FIRST — the never-attested r14-new image_gif_phash_neardup,
# doc_hybrid_rrf_topk, doc_hybrid_rrf_artifact_topk,
# embedding_matryoshka_topk, and embedding_matryoshka_recall (all
# registered after the r14 window froze; judge-attestable from the
# local 3-scale runs — the four retrieval queries additionally
# hash-green at the .scale/sf1 corpus), then the
# r14 CHANGED
# members whose latest driver
# row predates their r14 change, in this order: doc_lm_quality,
# doc_lm_buckets, doc_quality_calibration, doc_dsir_scores,
# doc_dsir_serve_scores, doc_curation_lmgate, doc_dup_components,
# doc_fingerprint_dedup, doc_curation_medianear, doc_curation_keepbest
# (all re-attested locally at sf0.001/0.01/0.1 in r14) — then the 34
# r11-cohort leftovers ALPHABETICALLY (doc_winnow_fingerprints,
# doc_winnow_matches, embedding_cosine_topk,
# embedding_hamming_external_topk, embedding_hamming_topk,
# embedding_ivf_recall, embedding_ivf_trained_topk,
# embedding_lsh_multiprobe_topk, embedding_lsh_recall,
# embedding_lsh_topk, embedding_multiprobe_recall,
# embedding_neardup_pairs, events_moving_avg,
# events_purchase_window_clicks, events_retention_cohorts,
# events_salted_counts, events_salted_join, events_session_window,
# events_sliding_rollup, events_transition_matrix,
# events_value_quantiles, features_within_radius,
# first_order_per_customer, geo_buffer_clip_pipeline,
# geo_pivot_pipeline, image_decode_png, lang_id_confusion,
# lineitem_column_stats, lineitem_price_histogram, nation_stats_unpivot,
# nearest_feature_distance, orders_merge_upsert, parts_cm_frequencies,
# parts_hll_distinct — exactly the r11 cohort minus the 16 queries used
# in the r14 window); remaining slots take the r12 cohort (latest green
# r12) alphabetically.
# Queries whose implementation changed this round. The local oracle
# mirror runs the whole catalog at sf0.001; this list gets an ADDITIONAL
# sf0.01 differential run (tests/test_queries_oracle.py::
# test_changed_query_matches_oracle_sf001) — the driver gate's exact
# scale — so scale-sensitive divergence in touched code surfaces locally
# before the gate does. Update each round alongside DRIVER_ORDER.
CHANGED_THIS_ROUND: list[str] = [
    # r15 (optimization): BPE trainers gained the bounded driver fast
    # path (one limit-bounded collect, rounds in Python, distributed
    # loop unchanged over the cap) and the base table moved from cache()
    # to localCheckpoint(); values pinned identical by 3-seed
    # driver-vs-distributed tests and the unrolled SQL oracles. Direct
    # consumers via trained_merges / the artifact chain:
    "doc_bpe_merges",
    "doc_bpe_merges_batched",
    "doc_bpe_encoded",
    "doc_bpe_token_counts",
    "doc_bpe_pack",
    "doc_bpe_vocab",
    "doc_bpe_roundtrip",
    "doc_bpe_bytefallback",
    "doc_maxmatch_encoded",
    "doc_bpe_artifact_encode",
    "lang_tokenizer_fertility",
    # r15 (optimization): feature_hash_embed + lm_quality_score default
    # to mapInPandas hash kernels (memoized per-distinct-word char fold,
    # batch pre-aggregation); all float math stays in the JVM, outputs
    # bit-identical (twin tests). Direct consumers:
    "doc_feature_hash_embed",
    # lm_quality_score consumer set (the r14 single-pass entries for the
    # same names rotate out with this update — the r15 kernel change
    # supersedes them as the reason these need the sf0.01 differential):
    "doc_lm_quality",
    "doc_lm_quality_pruned",
    "doc_lm_buckets",
    "doc_lm_bucket_sample",
    "doc_quality_calibration",
    "doc_lm_auc",
    "doc_curation_lmgate",
    "doc_curation_lmgate_pruned",
]

base.DRIVER_ORDER[:] = [
    # ROUND-15 WINDOW — executes the rotation plan published in the r14
    # comment block above, extended by this round's own changes:
    # (a) the 5 r14-NEW never-driver-attested queries lead;
    # (b) the published r14-changed-not-windowed list, in its published
    #     order (several of these are ALSO r15-changed — the lm kernel
    #     consumers — so this window re-attests them post-change);
    # (c) the r15-changed queries not already above (BPE trainer fast
    #     path + trained_merges/artifact consumers, the feature-hash
    #     kernel, the remaining lm_quality_score consumers);
    # (d) the aged r11-cohort leftovers ALPHABETICALLY (first 19 of the
    #     34; the remaining 15 — events_transition_matrix ..
    #     parts_hll_distinct — are scheduled to LEAD the r16 window).
    # (a) r14-new
    "image_gif_phash_neardup",
    "doc_hybrid_rrf_topk",
    "doc_hybrid_rrf_artifact_topk",
    "embedding_matryoshka_topk",
    "embedding_matryoshka_recall",
    # (b) r14-changed, not in the r14 window (published order)
    "doc_lm_quality",
    "doc_lm_buckets",
    "doc_quality_calibration",
    "doc_dsir_scores",
    "doc_dsir_serve_scores",
    "doc_curation_lmgate",
    "doc_dup_components",
    "doc_fingerprint_dedup",
    "doc_curation_medianear",
    "doc_curation_keepbest",
    # (c) r15-changed (see CHANGED_THIS_ROUND) not already above
    "doc_bpe_merges_batched",
    "doc_bpe_merges",
    "doc_bpe_encoded",
    "doc_bpe_token_counts",
    "doc_bpe_pack",
    "doc_bpe_vocab",
    "doc_bpe_roundtrip",
    "doc_bpe_bytefallback",
    "doc_maxmatch_encoded",
    "doc_bpe_artifact_encode",
    "lang_tokenizer_fertility",
    "doc_feature_hash_embed",
    "doc_lm_quality_pruned",
    "doc_lm_bucket_sample",
    "doc_lm_auc",
    "doc_curation_lmgate_pruned",
    # (d) r11-cohort leftovers, alphabetical (19 of 34)
    "doc_winnow_fingerprints",
    "doc_winnow_matches",
    "embedding_cosine_topk",
    "embedding_hamming_external_topk",
    "embedding_hamming_topk",
    "embedding_ivf_recall",
    "embedding_ivf_trained_topk",
    "embedding_lsh_multiprobe_topk",
    "embedding_lsh_recall",
    "embedding_lsh_topk",
    "embedding_multiprobe_recall",
    "embedding_neardup_pairs",
    "events_moving_avg",
    "events_purchase_window_clicks",
    "events_retention_cohorts",
    "events_salted_counts",
    "events_salted_join",
    "events_session_window",
    "events_sliding_rollup",
]


__all__ = ["REGISTRY", "spark_queries", "oracle_queries"]
