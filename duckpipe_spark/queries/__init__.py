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
    # r14 (VERDICT r13 item 3): LM/DSIR training is single-pass —
    # lm_train folds V into its one grouped explode (kind 'w'),
    # lm_quality_score delegates to the pinned-bit-identical
    # train+serve path (the join path re-executed its train side per
    # broadcast branch: 4 runtime scans → 2), dsir collapses its model
    # to ONE row in a single aggregation chain. All direct consumers:
    "doc_lm_quality",
    "doc_lm_serve_scores",
    "doc_lm_quality_pruned",
    "doc_lm_buckets",
    "doc_lm_bucket_sample",
    "doc_quality_calibration",
    "doc_lm_auc",
    "doc_dsir_scores",
    "doc_dsir_serve_scores",
    "doc_curation_lmgate",
    "doc_curation_lmgate_pruned",
    # r14 (VERDICT r13 item 4): connected_components starts from the
    # 1-hop init min(u, min(N(u))) (one fewer join round) and
    # checkpoints lazily so the convergence count is the materializing
    # job (one action per round). Labels provably unchanged. Direct CC
    # consumers:
    "doc_dup_components",
    "doc_fingerprint_dedup",
    "embedding_semantic_dedup",
    "doc_curation_semdedup",
    "doc_dedup_keep_best",
    "doc_incremental_dedup",
    "doc_curation_medianear",
    "doc_curation_medianear_artifact",
    "doc_curation_keepbest",
    # r14 (ADVICE r13 item 3): msadpcm_decode raises on out-of-table
    # predictor indices (valid wires decode identically)
    "audio_msadpcm_fingerprint_neardup",
    # NEW in r14 (VERDICT r13 item 5): third vendored image codec — GIF
    # (LZW) as CROSS-CODEC dHash twins (PNG even docs vs animated-GIF
    # odd docs); conformance-pinned against an independent scalar LZW
    # transcription and real encoder-written files; hash-green at
    # sf0.001/0.01/0.1 locally; registered after the r14 window froze,
    # so it leads the r15 window
    "image_gif_phash_neardup",
    # NEW in r14: hybrid sparse+dense retrieval — BM25 top-20 and exact
    # cosine top-20 over the shared doc/vec id space fused by integer
    # Reciprocal Rank Fusion (1e6 DIV (60 + rank), rank-only → no new
    # float surface); hash-green at sf0.001/0.01/0.1 locally; registered
    # after the r14 window froze, so it leads the r15 window with the GIF
    # query
    "doc_hybrid_rrf_topk",
    # NEW in r14: Matryoshka adaptive retrieval — prefix-16 cosine
    # candidate scan + full-dim exact rerank (the MRL truncatable-
    # embedding serving shape; 4x scan cut with zero auxiliary index
    # structure); hash-green at sf0.001/0.01/0.1 locally; registered
    # after the r14 window froze, leads the r15 window
    "embedding_matryoshka_topk",
    # NEW in r14: the production hybrid serve shape — sparse leg scores
    # entirely off the persisted BM25 parquet index (plan-pinned: no
    # documents scan inside the fusion), same integer-RRF fusion and
    # oracle as doc_hybrid_rrf_topk, so index-served == corpus-derived
    # is pinned end-to-end; hash-green at sf0.001/0.01/0.1 (+sf1)
    "doc_hybrid_rrf_artifact_topk",
    # NEW in r14: the tuning measurement for the matryoshka prefix-width
    # knob — recall@k of the prefix-scan path vs exact, same in-engine
    # evaluation loop as the lsh/multiprobe/ivf recall rows; hash-green
    # at sf0.001/0.01/0.1 (+sf1)
    "embedding_matryoshka_recall",
]

base.DRIVER_ORDER[:] = [
    # r13-new (never driver-attested) + changed-not-windowed lead
    "doc_curation_medianear_artifact",
    "audio_adpcm_fingerprint_neardup",
    "audio_msadpcm_fingerprint_neardup",
    "embedding_ivfpq_topk",
    "embedding_semantic_dedup",
    "doc_curation_semdedup",
    "doc_dedup_keep_best",
    "doc_incremental_dedup",
    "doc_curation_pipeline",
    "doc_curation_lmgate_pruned",
    # 28 remaining r10-cohort leftovers, alphabetical
    "doc_feature_hash_embed",
    "doc_gopher_quality",
    "doc_jaccard_pairs",
    "doc_lm_quality_pruned",
    "doc_lm_serve_scores",
    "doc_lsh_candidates",
    "doc_minhash_signatures",
    "doc_simhash",
    "doc_strip_boilerplate",
    "embedding_int8_quant",
    "embedding_kmeanspar_cells",
    "events_anomaly_zscore",
    "events_dau_wau",
    "events_funnel",
    "events_gap_fill",
    "events_hourly_rollup",
    "events_json_extract",
    "events_ohlc_bars",
    "events_props_rollup",
    "geo_elevation_pipeline",
    "image_decode_jpeg",
    "lang_top_bigrams",
    "lang_unimax_budgets",
    "lineitem_price_quantiles",
    "orders_bloom_blocklist",
    "parts_triangle_counts",
    "sessionize_users",
    "video_frame_sample",
    # r11-cohort alphabetical fill (first 12 not already above)
    "blob_byte_entropy",
    "brand_min_price",
    "custkeys_f_and_o_intersect",
    "customer_cumulative_spend",
    "customers_without_orders",
    "doc_bm25_topk",
    "doc_bpe_artifact_encode",
    "doc_lm_auc",
    "doc_lm_bucket_sample",
    "doc_mask_contaminated",
    "doc_priority_sample",
    "doc_winnow_decontam",
]


__all__ = ["REGISTRY", "spark_queries", "oracle_queries"]
