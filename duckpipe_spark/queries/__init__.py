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
# Round-5 rotation (VERDICT r4 item 9 + the documented policy: never-attested
# and just-modified queries first, then re-attest the queries whose latest
# green driver row is oldest). Composition, from CORRECTNESS_r01-r04:
#   * 5 never-green rows: blob_byte_entropy (oracle added this round),
#     the three NEW vendored-codec round trips (image_decode_jpeg,
#     audio_decode_wav, video_metadata_mp4) and the NEW deterministic
#     sampled-quantile sketch (lineitem_price_quantiles);
#   * 6 queries whose code changed this round: parts_triangle_counts
#     (no-per-triangle-row aggregate), parts_pagerank (dst-union node
#     spine), orders_bloom_blocklist (1:1 bloom_probe), doc_span_dedup
#     (two-phase span election), doc_dup_components_star (non-convergence
#     collapse), doc_priority_sample (reserved-name guard);
#   * all 32 queries whose latest green is ROUND 1 (the TPC-H sweep +
#     relational veterans — 4 rounds unattested by now) and the 3 from
#     round 2 (events_moving_avg, events_value_quantiles,
#     q12_shipmode_priority);
#   * the NEW cross-corpus LSH decontamination join + 3 round-3-green
#     picks (lsh_candidates — its banding helper was refactored this
#     round — and the buffer-clip + nearest-distance geo pipelines;
#     doc_minhash_signatures' unchanged code rides inside both LSH
#     queries).
# The 49-strong round-4 green cohort rotates out with 1 fresh green row
# each; the 24 remaining round-3-green queries are the r6 priority (their
# rows age to 3 rounds then).
base.DRIVER_ORDER[:] = [
    # never-attested + round-5-modified operators first
    "blob_byte_entropy",
    "image_decode_jpeg",
    "audio_decode_wav",
    "video_metadata_mp4",
    "lineitem_price_quantiles",
    "parts_triangle_counts",
    "parts_pagerank",
    "orders_bloom_blocklist",
    "doc_span_dedup",
    "doc_dup_components_star",
    "doc_priority_sample",
    # latest-green r1: TPC-H sweep + relational veterans (oldest rows)
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q4_order_priority",
    "q5_local_supplier",
    "q6_forecast_revenue",
    "q7_nation_volume",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_items",
    "q11_important_parts",
    "q13_order_distribution",
    "q14_promo_effect",
    "q15_top_supplier",
    "q16_supplier_part_counts",
    "q17_small_qty_revenue",
    "q18_large_orders",
    "q19_disjunctive_revenue",
    "q20_part_suppliers",
    "q21_waiting_supplier",
    "q22_idle_customers",
    "brand_min_price",
    "custkeys_f_and_o_intersect",
    "customer_cumulative_spend",
    "customers_without_orders",
    "lineitem_multi_distinct",
    "order_gaps_lag",
    "orders_cube",
    "orders_except",
    "orders_rollup",
    "segment_year_pivot",
    "suppliers_with_big_lineitems",
    "top3_orders_per_customer",
    # latest-green r2
    "events_moving_avg",
    "events_value_quantiles",
    "q12_shipmode_priority",
    # latest-green r3 picks: bench headliners + code families touched
    "doc_decontam_lsh_join",
    "doc_lsh_candidates",
    "geo_buffer_clip_pipeline",
    "geo_nearest_distance_pipeline",
]

__all__ = ["REGISTRY", "spark_queries", "oracle_queries"]
