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
    from duckpipe_spark.queries import graph_q  # noqa: F401
except ImportError:
    pass

from duckpipe_spark.queries import base
from duckpipe_spark.queries.base import REGISTRY, oracle_queries, spark_queries

# First ~50 names are what the driver's correctness gate will actually check:
# the engine's distinctive operator families first, then the unique-evidence
# relational queries. Everything else (TPC-H sweep, rows-only stubs) follows
# in registration order via base._ordered_items.
# Round-4 rotation (VERDICT r3 item 1): the 16 queries that had never had a
# driver CORRECTNESS row are swapped into the 50-entry gate, displacing
# geo/dedup/ANN entries with >=2 green driver rounds (r2+r3, several r1-r3).
# Queries modified THIS round (geo_pivot_pipeline collect-cap, doc_jaccard_pairs
# df-cap, embedding_lsh_topk non-eager planes, doc_span_dedup shuffle slimming)
# stay in the gate so the changes get fresh independent rows, and the round-4
# additions (image_decode_png, events_gap_fill, embedding_int8_quant,
# blob_byte_entropy's first row, plus the eleven NEW operators: range
# join, salted join, z-score anomalies, triangle counting, integer
# PageRank, star connected components, spend quartiles, OHLC bars, and
# the deterministic sketch family HLL/Count-Min/Bloom) enter in place of
# 2-3-green-round veterans (doc_vocab/doc_encoded/doc_pii_scrub/
# lang_top_bigrams/doc_hash_split/doc_stratified_sample/doc_pack_sequences/
# events_hourly_rollup/doc_boilerplate/doc_repetition_stats/
# doc_mixture_resample, all with >=2 green driver rounds). With this
# window green, every r3-era query has a driver row from rounds 1-4 and
# all eleven round-4 operators are independently attested
# (image_decode_stub stays rows-only by design).
base.DRIVER_ORDER[:] = [
    # geo (modified this round: bounded segment pull)
    "geo_pivot_pipeline",
    # dedup family (modified: df-capped jaccard; 1-green-round incremental)
    "doc_jaccard_pairs",
    "doc_incremental_dedup",
    # ANN family (modified: non-eager plane resolution; 1-green lsh_recall;
    # never-driver-verified ivf_recall / cluster_profile)
    "embedding_lsh_topk",
    "embedding_lsh_recall",
    "embedding_ivf_recall",
    "embedding_cluster_profile",
    # NEW round-4 operators: LOCF gap-fill resample, int8 quantization,
    # bin-bucketed range join, salted skew join, rolling z-score anomalies,
    # degree-oriented triangle counting
    "events_gap_fill",
    "embedding_int8_quant",
    "events_purchase_window_clicks",
    "events_salted_join",
    "events_anomaly_zscore",
    "parts_triangle_counts",
    "parts_pagerank",
    # text analysis family (+ never-verified lang_id_confusion;
    # language_guess/quality_score rotate out with 3 green rounds each)
    "doc_tfidf_topterms",
    "doc_quality_percentile",
    "lang_id_confusion",
    # sampling / packing family (+ never-verified temperature resample;
    # hash_split/stratified/pack rotate out with 2 green rounds each for
    # parts_pagerank, doc_dup_components_star and customer_spend_quartiles)
    "doc_temperature_resample",
    "doc_dup_components_star",
    "customer_spend_quartiles",
    # corpus hygiene family (decontamination rotates out, 2 green rounds,
    # for the NEW weighted priority sampler)
    "doc_priority_sample",
    # boilerplate/repetition_stats/mixture_resample rotate out (2 green
    # rounds each) for the deterministic sketch family (HLL cardinality,
    # Count-Min frequency, Bloom membership)
    "parts_hll_distinct",
    "parts_cm_frequencies",
    "orders_bloom_blocklist",
    "doc_span_dedup",
    "doc_source_rollup",
    # events / timeseries: r3 window + the 7 never-driver-verified
    # (hourly_rollup rotates out with 2 green rounds for events_ohlc_bars)
    "events_ohlc_bars",
    "events_session_window",
    "events_props_rollup",
    "asof_clicks_purchases",
    "events_sliding_rollup",
    "events_funnel",
    "events_retention_cohorts",
    "events_transition_matrix",
    "events_dau_wau",
    "events_salted_counts",
    "events_json_extract",
    # spatial proxies on TPC-H tables
    "nearest_feature_distance",
    "features_within_radius",
    # multimodal (+ never-verified byte entropy; image_decode_png is NEW
    # round-4 code — the real PNG decode round trip — displacing the
    # 2-green-round sessionize_users)
    "blob_metadata",
    "blob_byte_entropy",
    "image_decode_png",
    # relational: unique-evidence r3 window + the 4 never-driver-verified
    "approx_distinct_parts",
    "first_order_per_customer",
    "custkey_status_skeleton",
    "nation_stats_unpivot",
    "lineitem_column_stats",
    "lineitem_price_histogram",
    "orders_merge_upsert",
    "custkey_yearly_delta_full_outer",
]

__all__ = ["REGISTRY", "spark_queries", "oracle_queries"]
