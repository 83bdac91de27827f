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

from duckpipe_spark.queries import base
from duckpipe_spark.queries.base import REGISTRY, oracle_queries, spark_queries

# First ~50 names are what the driver's correctness gate will actually check:
# the engine's distinctive operator families first, then the unique-evidence
# relational queries. Everything else (TPC-H sweep, rows-only stubs) follows
# in registration order via base._ordered_items.
base.DRIVER_ORDER[:] = [
    # geo pipelines (G1-G17, J3/J4/J6/J7, A2-A5, U1 hard evidence)
    "geo_nearest_distance_pipeline",
    "geo_buffer_clip_pipeline",
    "geo_pivot_pipeline",
    "geo_elevation_pipeline",
    # document dedup family
    "doc_fingerprint_dedup",
    "doc_minhash_signatures",
    "doc_lsh_candidates",
    "doc_simhash",
    "doc_jaccard_pairs",
    "doc_dup_components",
    # embedding similarity / ANN family
    "embedding_cosine_topk",
    "embedding_lsh_topk",
    "embedding_neardup_pairs",
    "embedding_ivf_topk",
    "embedding_pq_codes",
    "embedding_pq_adc_topk",
    "embedding_kmeans_cells",
    "embedding_semantic_dedup",
    "embedding_lsh_recall",
    # text analysis family
    "doc_token_stats",
    "doc_language_guess",
    "doc_quality_score",
    "doc_tfidf_topterms",
    "doc_vocab",
    "doc_encoded",
    "doc_pii_scrub",
    "doc_quality_percentile",
    "lang_top_bigrams",
    # sampling / packing family
    "doc_hash_split",
    "doc_stratified_sample",
    "doc_pack_sequences",
    # corpus hygiene family (incl. round-3 span dedup + source rollup)
    "doc_decontamination",
    "doc_boilerplate",
    "doc_repetition_stats",
    "doc_mixture_resample",
    "doc_span_dedup",
    "doc_source_rollup",
    "doc_incremental_dedup",
    # events / timeseries (NTZ-loader fix evidence; json_extract shares
    # props_rollup's fix class and moved to local-harness-only coverage)
    "events_hourly_rollup",
    "sessionize_users",
    "events_session_window",
    "events_props_rollup",
    "asof_clicks_purchases",
    # spatial proxies on TPC-H tables
    "nearest_feature_distance",
    "features_within_radius",
    # multimodal (oracle-checked metadata path)
    "blob_metadata",
    # unique-evidence relational queries (q12 displaced: its HUGEINT-cast
    # fix proved out in r2 and conditional aggregates appear throughout)
    "approx_distinct_parts",
    "first_order_per_customer",
    "custkey_status_skeleton",
    "nation_stats_unpivot",
]

__all__ = ["REGISTRY", "spark_queries", "oracle_queries"]
