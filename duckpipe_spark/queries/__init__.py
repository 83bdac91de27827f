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

# First 50 names are what the driver's correctness gate will actually check.
# Round-6 rotation (VERDICT r5 item 1 + the standing policy: just-modified
# queries first, then re-attest the queries whose latest green driver row
# is oldest). Composition, from CORRECTNESS_r01-r05:
#   * ALL 28 queries whose latest green row is ROUND 3 (3 rounds old —
#     the doc_* text/sampling family, embedding_*, events_hourly_rollup,
#     sessionize_users, geo_elevation_pipeline, lang_top_bigrams);
#     doc_vocab's top-k selection was also rebuilt this round (two-phase
#     TakeOrderedAndProject);
#   * 7 queries whose code changed this round: audio_decode_wav (rate=0
#     rejection), image_decode_jpeg (fill bytes + standalone markers),
#     orders_bloom_blocklist (single-row map-broadcast probe + one-agg
#     keys/counts), doc_span_dedup (SHJ election join + reconstruction
#     short-circuit), doc_decontam_lsh_join (broadcast_small_side fast
#     path), parts_triangle_counts (measurement pass, BASELINE §10);
#   * 2 NEW never-attested queries (video_frame_sample — MJPEG
#     sample-table frame sampling — and doc_train_shards — deterministic
#     dataloader shard/order prep, both new in r6);
#   * 13 of the 43-strong round-4 cohort (alphabetical prefix; the other
#     30 age to 2 rounds and lead the r7 window); lineitem_price_quantiles
#     re-enters as r6-modified (two-phase rank + value tie-break).
# The 50-strong round-5 green cohort rotates out with 1 fresh row each.
# Queries whose implementation changed this round. The local oracle
# mirror runs the whole catalog at sf0.001; this list gets an ADDITIONAL
# sf0.01 differential run (tests/test_queries_oracle.py::
# test_changed_query_matches_oracle_sf001) — the driver gate's exact
# scale — so scale-sensitive divergence in touched code surfaces locally
# before the gate does (VERDICT r5 item 7). Update each round alongside
# DRIVER_ORDER.
CHANGED_THIS_ROUND = [
    "video_frame_sample",
    "doc_train_shards",
    "lineitem_price_quantiles",
    "audio_decode_wav",
    "image_decode_jpeg",
    "orders_bloom_blocklist",
    "doc_span_dedup",
    "doc_decontam_lsh_join",
    "doc_vocab",
]

base.DRIVER_ORDER[:] = [
    # never-attested first: NEW in r6 (MJPEG frame sampling; dataloader
    # shard/order prep)
    "video_frame_sample",
    "doc_train_shards",
    # round-6-modified operators
    "audio_decode_wav",
    "image_decode_jpeg",
    "orders_bloom_blocklist",
    "parts_triangle_counts",
    "doc_span_dedup",
    "doc_decontam_lsh_join",
    "lineitem_price_quantiles",
    # latest-green r3: the full 28-strong veteran cohort (oldest rows)
    "doc_boilerplate",
    "doc_decontamination",
    "doc_dup_components",
    "doc_encoded",
    "doc_fingerprint_dedup",
    "doc_hash_split",
    "doc_language_guess",
    "doc_minhash_signatures",
    "doc_mixture_resample",
    "doc_pack_sequences",
    "doc_pii_scrub",
    "doc_quality_score",
    "doc_repetition_stats",
    "doc_simhash",
    "doc_stratified_sample",
    "doc_token_stats",
    "doc_vocab",
    "embedding_cosine_topk",
    "embedding_ivf_topk",
    "embedding_kmeans_cells",
    "embedding_neardup_pairs",
    "embedding_pq_adc_topk",
    "embedding_pq_codes",
    "embedding_semantic_dedup",
    "events_hourly_rollup",
    "geo_elevation_pipeline",
    "lang_top_bigrams",
    "sessionize_users",
    # latest-green r4 cohort, alphabetical prefix (13 of 43)
    "approx_distinct_parts",
    "asof_clicks_purchases",
    "blob_metadata",
    "custkey_status_skeleton",
    "custkey_yearly_delta_full_outer",
    "customer_spend_quartiles",
    "doc_incremental_dedup",
    "doc_jaccard_pairs",
    "doc_quality_percentile",
    "doc_source_rollup",
    "doc_temperature_resample",
    "doc_tfidf_topterms",
    "embedding_cluster_profile",
]

__all__ = ["REGISTRY", "spark_queries", "oracle_queries"]
