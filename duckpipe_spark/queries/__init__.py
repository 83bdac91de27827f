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
# Round-8 rotation (VERDICT r7 item 1 + the standing policy: never-attested
# and just-modified queries first, then re-attest the queries whose latest
# green driver row is oldest). Composition, from CORRECTNESS_r01-r07:
#   * 2 NEW never-attested queries: doc_bpe_merges_batched (top-K
#     non-interacting merge batching, VERDICT r7 item 3 — fully unrolled
#     SQL oracle) and doc_curation_semdedup (the curation pipeline with
#     the SemDeDup stage enabled, VERDICT r7 item 7 — the multi-CTE
#     oracle grows a recursive near-dup-closure splice);
#   * 6 queries whose code/oracle changed this round: the BPE family
#     (doc_bpe_merges / doc_bpe_token_counts / doc_bpe_encoded /
#     doc_bpe_pack — impl='join' vocabulary-scalable encode + MATERIALIZED
#     per-round CTEs + pairless-round sentinel, VERDICT r7 items 2/3 and
#     ADVICE r7), doc_mask_contaminated (a colliding k-gram now masks BOTH
#     the span holding its start and the one holding its end — ADVICE r7's
#     boundary-leak fix; values change, oracle changed in lockstep), and
#     doc_curation_pipeline (optional SemDeDup/stage_handles params;
#     behavior unchanged when off — re-attested defensively);
#   * the full 41-strong ROUND-5 cohort (oldest rows, 3 rounds old — the
#     r7 verdict's #1 ask and the registry's own two-window schedule);
#   * 1 NEW query added mid-round: doc_bm25_topk (BM25 ranked retrieval,
#     hard-negative mining shape) takes the final slot — new queries
#     outrank the r6 fill (approx_distinct_parts leads the r9 window).
# Two-window schedule going forward, so no query's latest green row ever
# exceeds 3 rounds:
#   * r9 window (60 candidates for 50 slots — trim spelled out): the 17
#     NEW late-r8 queries (doc_lm_quality, doc_dsir_scores,
#     doc_dedup_keep_best, embedding_prototype_prune, doc_bpe_roundtrip,
#     doc_bpe_vocab, doc_lm_buckets, doc_ngram_novelty,
#     doc_curation_lmgate, doc_fim_transform, doc_corpus_report,
#     embedding_hamming_topk, doc_length_bucketed_pack, doc_epoch_order,
#     lang_tokenizer_fertility, doc_maxmatch_encoded,
#     doc_quality_calibration — registered after
#     the r8 window froze at 50, so never-attested) lead, then the
#     kmeans-family re-attest (embedding_kmeans_cells /
#     embedding_cluster_profile — the centroid materialization +
#     incremental init changed the plan, values pinned unchanged), then
#     the ALPHABETICALLY-FIRST 31 of the 41-strong r6 cohort (latest
#     green r6) fill the window; the trailing 10 r6 queries
#     (alphabetical) defer to r10 — their rows are then 4 rounds old,
#     one past the invariant, the price of 17 new queries in one round;
#     name them FIRST in r10.
#   * r10 window: the 10 deferred r6 queries lead, then the r7 cohort
#     (latest green r7) by alphabetical prefix as slots allow.
# Queries whose implementation changed this round. The local oracle
# mirror runs the whole catalog at sf0.001; this list gets an ADDITIONAL
# sf0.01 differential run (tests/test_queries_oracle.py::
# test_changed_query_matches_oracle_sf001) — the driver gate's exact
# scale — so scale-sensitive divergence in touched code surfaces locally
# before the gate does. Update each round alongside DRIVER_ORDER.
CHANGED_THIS_ROUND = [
    "doc_bpe_merges_batched",
    "doc_bm25_topk",
    "doc_curation_semdedup",
    "doc_lm_quality",
    "doc_dsir_scores",
    "doc_dedup_keep_best",
    "embedding_prototype_prune",
    "doc_bpe_roundtrip",
    "doc_bpe_vocab",
    "doc_lm_buckets",
    "doc_ngram_novelty",
    "doc_curation_lmgate",
    "doc_fim_transform",
    "doc_corpus_report",
    "embedding_hamming_topk",
    "doc_length_bucketed_pack",
    "doc_epoch_order",
    "lang_tokenizer_fertility",
    "doc_maxmatch_encoded",
    "doc_quality_calibration",
    "embedding_kmeans_cells",  # centroid-table materialization (values unchanged)
    "embedding_cluster_profile",
    "doc_bpe_merges",
    "doc_bpe_token_counts",
    "doc_bpe_encoded",
    "doc_bpe_pack",
    "doc_mask_contaminated",
    "doc_curation_pipeline",
]

base.DRIVER_ORDER[:] = [
    # never-attested first: NEW in r8, then the r8-changed BPE/mask/pipeline
    "doc_bpe_merges_batched",
    "doc_curation_semdedup",
    "doc_bpe_merges",
    "doc_bpe_token_counts",
    "doc_bpe_encoded",
    "doc_bpe_pack",
    "doc_mask_contaminated",
    "doc_curation_pipeline",
    # latest-green r5: the full 41-strong cohort (oldest rows)
    "blob_byte_entropy",
    "brand_min_price",
    "custkeys_f_and_o_intersect",
    "customer_cumulative_spend",
    "customers_without_orders",
    "doc_priority_sample",
    "events_moving_avg",
    "events_value_quantiles",
    "geo_buffer_clip_pipeline",
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
    # new mid-round: BM25 ranked retrieval
    "doc_bm25_topk",
]


__all__ = ["REGISTRY", "spark_queries", "oracle_queries"]
