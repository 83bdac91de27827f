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

from duckpipe_spark.queries import base
from duckpipe_spark.queries.base import REGISTRY, oracle_queries, spark_queries

# First 50 names are what the driver's correctness gate will actually check.
# Round-7 rotation (VERDICT r6 item 1 + the standing policy: just-modified
# queries first, then re-attest the queries whose latest green driver row
# is oldest). Composition, from CORRECTNESS_r01-r06:
#   * 10 NEW never-attested queries: doc_curation_pipeline (end-to-end
#     curation integration — gate → exact dedup → span dedup → decontam →
#     mixture → shards — against one multi-CTE oracle, VERDICT r6 item 3)
#     and doc_bpe_merges / doc_bpe_token_counts (distributed BPE merge
#     learning + encode, unrolled-round oracle) and doc_gopher_quality
#     (Gopher rule battery) doc_chunks (context-window chunking), doc_bpe_encoded (id sequences)
#     doc_bpe_pack (tokenizer-aware packing) and doc_mask_contaminated
#     (benchmark-contamination span masking) and doc_strip_boilerplate
#     (C4-style line stripping; driver data exercises the no-strip path,
#     planted-boilerplate pytest carries the strip semantics) and
#     doc_feature_hash_embed (hashing-trick vectors);
#   * 10 queries whose code changed this round: the whole shingle family
#     (shingle_hash_array/word_shingles grew a conditionally-empty index
#     guard — sequence(0, size-k) DESCENDS for short docs and
#     InferFiltersFromGenerate can evaluate the shingle expression ahead
#     of the size filter; values unchanged, plans touched);
#   * ALL 30 queries whose latest green row is ROUND 4 (3 rounds old —
#     the events_* family, embedding recall/quant, PNG decode,
#     lineitem/parts sketches, geo pivots: the r6 verdict's #1 ask);
#   * 0 r5-cohort fill slots remain (the new-operator influx consumed
#     them; doc_dup_components_star + doc_lsh_candidates re-enter above as
#     r7-modified — the whole 41-strong r5 cohort leads the r8 window).
# Two-window schedule for the aging cohorts (VERDICT r6 item 7), so no
# query's latest green row ever exceeds 3 rounds:
#   * r8 window: the 40 remaining r5-green queries (r7's new-operator
#     influx left only blob_byte_entropy + the two re-entering-as-changed
#     from the r5 fill) + up to 10 of the 50-strong r6 cohort
#     (alphabetical prefix), trimmed for r8's own new/changed queries;
#   * r9 window: the remaining r6-cohort queries + the r7 cohort starts
#     aging (this window's 50) — alphabetical prefix as needed.
# Queries whose implementation changed this round. The local oracle
# mirror runs the whole catalog at sf0.001; this list gets an ADDITIONAL
# sf0.01 differential run (tests/test_queries_oracle.py::
# test_changed_query_matches_oracle_sf001) — the driver gate's exact
# scale — so scale-sensitive divergence in touched code surfaces locally
# before the gate does. Update each round alongside DRIVER_ORDER.
CHANGED_THIS_ROUND = [
    "doc_curation_pipeline",
    "doc_bpe_merges",
    "doc_bpe_token_counts",
    "doc_gopher_quality",
    "doc_chunks",
    "doc_bpe_encoded",
    "doc_bpe_pack",
    "doc_mask_contaminated",
    "doc_strip_boilerplate",
    "doc_feature_hash_embed",
    "doc_minhash_signatures",
    "doc_lsh_candidates",
    "doc_simhash",
    "doc_jaccard_pairs",
    "doc_dup_components",
    "doc_dup_components_star",
    "doc_incremental_dedup",
    "doc_decontam_lsh_join",
    "doc_decontamination",
    "doc_boilerplate",
]

base.DRIVER_ORDER[:] = [
    # never-attested first: NEW in r7 (end-to-end curation pipeline,
    # BPE merge learning + encode), then the r7-modified shingle family
    "doc_curation_pipeline",
    "doc_bpe_merges",
    "doc_bpe_token_counts",
    "doc_gopher_quality",
    "doc_chunks",
    "doc_bpe_encoded",
    "doc_bpe_pack",
    "doc_mask_contaminated",
    "doc_strip_boilerplate",
    "doc_feature_hash_embed",
    "doc_minhash_signatures",
    "doc_lsh_candidates",
    "doc_simhash",
    "doc_jaccard_pairs",
    "doc_dup_components",
    "doc_dup_components_star",
    "doc_incremental_dedup",
    "doc_decontam_lsh_join",
    "doc_decontamination",
    "doc_boilerplate",
    # latest-green r4: the full 30-strong cohort (oldest rows)
    "embedding_int8_quant",
    "embedding_ivf_recall",
    "embedding_lsh_recall",
    "embedding_lsh_topk",
    "events_anomaly_zscore",
    "events_dau_wau",
    "events_funnel",
    "events_gap_fill",
    "events_json_extract",
    "events_ohlc_bars",
    "events_props_rollup",
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
]


__all__ = ["REGISTRY", "spark_queries", "oracle_queries"]
