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
# Round-11 rotation — held EXACTLY to the composition published in the r10
# comment block and re-stated by VERDICT r10 item 1:
#   * the 19 r7 leftovers FIRST (latest driver row r7 — 4 rounds old;
#     swept 19/19 at sf0.1 out-of-band in r10, now driver-re-attested),
#     alphabetical: events_purchase_window_clicks, events_retention_cohorts,
#     events_salted_counts, events_salted_join, events_session_window,
#     events_sliding_rollup, events_transition_matrix,
#     features_within_radius, first_order_per_customer, geo_pivot_pipeline,
#     image_decode_png, lang_id_confusion, lineitem_column_stats,
#     lineitem_price_histogram, nation_stats_unpivot,
#     nearest_feature_distance, orders_merge_upsert, parts_cm_frequencies,
#     parts_hll_distinct;
#   * then the NINE queries NEW in r10 (registered after the r10 window
#     froze at 50, so never driver-attested): doc_curation_lmgate_pruned,
#     doc_bpe_artifact_encode, embedding_lsh_multiprobe_topk,
#     embedding_multiprobe_recall, doc_winnow_fingerprints,
#     doc_winnow_matches, doc_winnow_decontam, embedding_ivf_trained_topk,
#     doc_lm_bucket_sample;
#   * then the ELEVEN r10-changed re-attests named in the r10 plan:
#     embedding_cosine_topk, embedding_hamming_topk,
#     embedding_hamming_external_topk, embedding_lsh_recall,
#     embedding_ivf_recall (two-phase rank), doc_bm25_topk,
#     embedding_lsh_topk, embedding_neardup_pairs, embedding_semantic_dedup
#     (lsh guards), doc_lm_auc, doc_mask_contaminated (shared positional
#     kernel);
#   * the remaining 11 slots: the r8 cohort (latest green r8; 45 queries,
#     minus doc_bm25_topk / doc_mask_contaminated already placed above)
#     ALPHABETICALLY — blob_byte_entropy .. geo_buffer_clip_pipeline.
# That leaves 32 r8-cohort queries NOT in the r11 window
# (geo_nearest_distance_pipeline .. video_metadata_mp4, alphabetical);
# being 4 rounds old at r12, they are scheduled to lead the r12 window:
# r12 window plan: the SIX NEW-in-r11 queries FIRST (registered after
# this window froze, so never driver-attested): embedding_ivfpq_topk,
# image_phash_neardup, doc_bm25_artifact_topk, audio_fingerprint_neardup,
# video_phash_neardup, embedding_sq8_topk; then any r11-changed
# re-attests not already windowed (see CHANGED_THIS_ROUND below — as of
# r11 close every changed query IS in the r11 window: the winnow trio +
# doc_mask_contaminated carry the 32-bit-pos/rightmost-tie/ws-class
# kernel revision, features_within_radius + geo_buffer_clip_pipeline the
# vectorized circle kernel); then the 32 r8-cohort leftovers
# ALPHABETICALLY (geo_nearest_distance_pipeline, lineitem_multi_distinct,
# order_gaps_lag, orders_cube, orders_except, orders_rollup,
# parts_pagerank, q10_returned_items, q11_important_parts,
# q12_shipmode_priority, q13_order_distribution, q14_promo_effect,
# q15_top_supplier, q16_supplier_part_counts, q17_small_qty_revenue,
# q18_large_orders, q19_disjunctive_revenue, q1_pricing_summary,
# q20_part_suppliers, q21_waiting_supplier, q22_idle_customers,
# q3_shipping_priority, q4_order_priority, q5_local_supplier,
# q6_forecast_revenue, q7_nation_volume, q8_market_share,
# q9_product_profit, segment_year_pivot, suppliers_with_big_lineitems,
# top3_orders_per_customer, video_metadata_mp4); the remaining ~15 slots
# take the r9 cohort (latest green r9) alphabetically.
# Queries whose implementation changed this round. The local oracle
# mirror runs the whole catalog at sf0.001; this list gets an ADDITIONAL
# sf0.01 differential run (tests/test_queries_oracle.py::
# test_changed_query_matches_oracle_sf001) — the driver gate's exact
# scale — so scale-sensitive divergence in touched code surfaces locally
# before the gate does. Update each round alongside DRIVER_ORDER.
CHANGED_THIS_ROUND: list[str] = [
    # Winnow kernel revision (ADVICE r10 items 1-3, values CHANGE in both
    # engines together): pos field widened 21->32 bits so ~2M-shingle docs
    # no longer abort the job; tie-break switched to the SIGMOD'03 RIGHTMOST
    # rule (combined key now hash*2^32 + (cap-1-pos)); oracle tokenizer ws
    # class made byte-identical to the kernel's.
    "doc_winnow_fingerprints",
    "doc_winnow_matches",
    "doc_winnow_decontam",
    # Shares the positional k-gram kernel core with the winnow family; the
    # ws-class alignment touches it (values pinned unchanged — \x0b absent
    # from the corpus).
    "doc_mask_contaminated",
    # Vectorized circle-vs-polygon kernel (VERDICT r10 item 4): per-feature
    # numpy batching replaces the per-pair Python loop inside the Arrow
    # batch — values pinned unchanged.
    "features_within_radius",
    "geo_buffer_clip_pipeline",
    # NEW in r11: IVF-PQ (IVFADC) — trained coarse-cell probe + ADC rerank
    # on PQ codes, exact rerank of the ADC top-m (VERDICT r10 item 2)
    "embedding_ivfpq_topk",
    # NEW in r11: perceptual-hash (dHash) image near-dup over natively
    # decoded pixels through the Hamming infra (VERDICT r10 item 3)
    "image_phash_neardup",
    # NEW in r11: BM25 serve path through a persisted parquet index
    # artifact — the third trained-artifact family (VERDICT r10 item 6)
    "doc_bm25_artifact_topk",
    # NEW in r11: audio sibling of image_phash_neardup — frame-energy
    # delta fingerprint (Haitsma'02 family) over natively decoded PCM
    # through the same Hamming banding infra
    "audio_fingerprint_neardup",
    # NEW in r11: video completes the near-dup triad — temporal-brightness
    # gradient codes over the real sample-table walk + vendored JPEG
    # decode, same Hamming banding infra
    "video_phash_neardup",
    # NEW in r11: SQ8 rung of the quantization ladder — global-scale int8
    # candidate scan (exact-integer approx dots) + exact cosine rerank
    "embedding_sq8_topk",
]

base.DRIVER_ORDER[:] = [
    # the 19 r7 leftovers (4 rounds old — lead per the published plan)
    "events_purchase_window_clicks",
    "events_retention_cohorts",
    "events_salted_counts",
    "events_salted_join",
    "events_session_window",
    "events_sliding_rollup",
    "events_transition_matrix",
    "features_within_radius",
    "first_order_per_customer",
    "geo_pivot_pipeline",
    "image_decode_png",
    "lang_id_confusion",
    "lineitem_column_stats",
    "lineitem_price_histogram",
    "nation_stats_unpivot",
    "nearest_feature_distance",
    "orders_merge_upsert",
    "parts_cm_frequencies",
    "parts_hll_distinct",
    # the 9 never-attested new-r10 queries (published r11 order)
    "doc_curation_lmgate_pruned",
    "doc_bpe_artifact_encode",
    "embedding_lsh_multiprobe_topk",
    "embedding_multiprobe_recall",
    "doc_winnow_fingerprints",
    "doc_winnow_matches",
    "doc_winnow_decontam",
    "embedding_ivf_trained_topk",
    "doc_lm_bucket_sample",
    # the 11 r10-changed re-attests named in the published plan
    "embedding_cosine_topk",
    "embedding_hamming_topk",
    "embedding_hamming_external_topk",
    "embedding_lsh_recall",
    "embedding_ivf_recall",
    "doc_bm25_topk",
    "embedding_lsh_topk",
    "embedding_neardup_pairs",
    "embedding_semantic_dedup",
    "doc_lm_auc",
    "doc_mask_contaminated",
    # r8-cohort alphabetical fill (first 11 not already placed above)
    "blob_byte_entropy",
    "brand_min_price",
    "custkeys_f_and_o_intersect",
    "customer_cumulative_spend",
    "customers_without_orders",
    "doc_curation_pipeline",
    "doc_curation_semdedup",
    "doc_priority_sample",
    "events_moving_avg",
    "events_value_quantiles",
    "geo_buffer_clip_pipeline",
]


__all__ = ["REGISTRY", "spark_queries", "oracle_queries"]
