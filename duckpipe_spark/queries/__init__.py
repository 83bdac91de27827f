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
# Round-12 rotation — held EXACTLY to the composition published in the r11
# comment block and re-stated by VERDICT r11 item 1:
#   * the SIX queries NEW in r11 FIRST (registered after the r11 window
#     froze at 50, so the only 6 of 177 with no driver-green row ever):
#     embedding_ivfpq_topk, image_phash_neardup, doc_bm25_artifact_topk,
#     audio_fingerprint_neardup, video_fingerprint_neardup (registered as
#     video_phash_neardup at r11 close; renamed BEFORE first attestation
#     per ADVICE r11 item 5 — the kernel is a temporal-brightness
#     fingerprint, not a pHash, and the name freezes once attested),
#     embedding_sq8_topk;
#   * then the 32 r8-cohort leftovers (latest driver row r8 — 4 rounds
#     old; swept 32/32 at sf0.1 out-of-band in r11's local 177-query
#     oracle run) ALPHABETICALLY: geo_nearest_distance_pipeline ..
#     video_metadata_mp4;
#   * the remaining 12 slots: the r9 cohort (latest green r9; 46 queries)
#     ALPHABETICALLY — approx_distinct_parts .. doc_dedup_keep_best.
# That leaves 34 r9-cohort queries NOT in the r12 window
# (doc_dsir_scores .. lang_tokenizer_fertility, alphabetical); being 4
# rounds old at r13, they are scheduled to LEAD the r13 window:
# r13 window plan: any queries NEW in r12 or r12-changed-and-not-windowed
# FIRST (see CHANGED_THIS_ROUND below for the running list), then the 34
# r9-cohort leftovers ALPHABETICALLY (doc_dsir_scores, doc_encoded,
# doc_epoch_order, doc_fim_transform, doc_fingerprint_dedup,
# doc_hash_split, doc_language_guess, doc_length_bucketed_pack,
# doc_lm_buckets, doc_lm_quality, doc_maxmatch_encoded,
# doc_mixture_resample, doc_ngram_novelty, doc_pack_sequences,
# doc_pii_scrub, doc_quality_calibration, doc_quality_percentile,
# doc_quality_score, doc_repetition_stats, doc_source_rollup,
# doc_span_dedup, doc_stratified_sample, doc_temperature_resample,
# doc_tfidf_topterms, doc_token_stats, doc_train_shards, doc_vocab,
# embedding_cluster_profile, embedding_ivf_topk, embedding_kmeans_cells,
# embedding_pq_adc_topk, embedding_pq_codes, embedding_prototype_prune,
# lang_tokenizer_fertility); remaining slots take the r10 cohort
# (latest green r10) alphabetically.
# Queries whose implementation changed this round. The local oracle
# mirror runs the whole catalog at sf0.001; this list gets an ADDITIONAL
# sf0.01 differential run (tests/test_queries_oracle.py::
# test_changed_query_matches_oracle_sf001) — the driver gate's exact
# scale — so scale-sensitive divergence in touched code surfaces locally
# before the gate does. Update each round alongside DRIVER_ORDER.
CHANGED_THIS_ROUND: list[str] = [
    # r12: renamed from video_phash_neardup (ADVICE r11 item 5) — same
    # kernel, same oracle, never driver-attested under either name
    "video_fingerprint_neardup",
    # r12: ADVICE r11 item 1 — SQ8 code computation moved fully into the
    # integer domain (`div` instead of pmod-then-double-divide); exact for
    # all magnitudes now, values pinned unchanged at current data ranges
    "embedding_sq8_topk",
    # NEW in r12 (VERDICT r11 item 5): media near-dup stage inside the
    # curation pipeline — modality-partitioned fingerprint pair graph
    # (image dHash + audio/video fingerprints through the real decode
    # kernels) with min-id transitive closure; hash-green at sf0.001/
    # 0.01/0.1 locally, registered after the r12 window froze so it
    # leads the r13 window
    "doc_curation_medianear",
    # NEW in r12: first compressed-codec oracle row — G.711 mu-law audio
    # near-dup (vendored stateless integer codec; oracle replays
    # encode→decode analytically, verified bit-exact over the full int16
    # domain); hash-green at sf0.001/0.01/0.1 locally, leads r13 with
    # doc_curation_medianear
    "audio_mulaw_fingerprint_neardup",
]

base.DRIVER_ORDER[:] = [
    # the 6 never-attested new-r11 queries (published r12 order; video
    # renamed per ADVICE r11 item 5 before first attestation)
    "embedding_ivfpq_topk",
    "image_phash_neardup",
    "doc_bm25_artifact_topk",
    "audio_fingerprint_neardup",
    "video_fingerprint_neardup",
    "embedding_sq8_topk",
    # the 32 r8-cohort leftovers, alphabetical (published r12 plan)
    "geo_nearest_distance_pipeline",
    "lineitem_multi_distinct",
    "order_gaps_lag",
    "orders_cube",
    "orders_except",
    "orders_rollup",
    "parts_pagerank",
    "q10_returned_items",
    "q11_important_parts",
    "q12_shipmode_priority",
    "q13_order_distribution",
    "q14_promo_effect",
    "q15_top_supplier",
    "q16_supplier_part_counts",
    "q17_small_qty_revenue",
    "q18_large_orders",
    "q19_disjunctive_revenue",
    "q1_pricing_summary",
    "q20_part_suppliers",
    "q21_waiting_supplier",
    "q22_idle_customers",
    "q3_shipping_priority",
    "q4_order_priority",
    "q5_local_supplier",
    "q6_forecast_revenue",
    "q7_nation_volume",
    "q8_market_share",
    "q9_product_profit",
    "segment_year_pivot",
    "suppliers_with_big_lineitems",
    "top3_orders_per_customer",
    "video_metadata_mp4",
    # r9-cohort alphabetical fill (first 12 of 46)
    "approx_distinct_parts",
    "asof_clicks_purchases",
    "audio_decode_wav",
    "blob_metadata",
    "custkey_status_skeleton",
    "custkey_yearly_delta_full_outer",
    "customer_spend_quartiles",
    "doc_bpe_roundtrip",
    "doc_bpe_vocab",
    "doc_corpus_report",
    "doc_curation_lmgate",
    "doc_dedup_keep_best",
]


__all__ = ["REGISTRY", "spark_queries", "oracle_queries"]
