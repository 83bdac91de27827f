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
# Round-10 rotation — held EXACTLY to the composition published in the r9
# comment block and re-stated by VERDICT r9 item 1:
#   * the NINE deferred-r6 queries lead (latest driver row r6 — 4 rounds
#     old, one past the 3-round invariant; the declared price of r8's 17
#     new queries), alphabetical:
#     events_hourly_rollup, geo_elevation_pipeline, image_decode_jpeg,
#     lang_top_bigrams, lineitem_price_quantiles, orders_bloom_blocklist,
#     parts_triangle_counts, sessionize_users, video_frame_sample;
#   * then the NINE queries NEW in r9 (registered after the r9 window
#     froze at 50, so never driver-attested): doc_lm_quality_pruned,
#     doc_lm_serve_scores, doc_dsir_serve_scores,
#     embedding_hamming_external_topk, embedding_kmeanspar_cells,
#     lang_unimax_budgets, doc_lm_auc, doc_bpe_bytefallback,
#     doc_curation_keepbest;
#   * then the NINE r9-changed re-attests named in the r9 plan:
#     doc_bpe_merges, doc_bpe_merges_batched, doc_bpe_token_counts,
#     doc_bpe_encoded, doc_bpe_pack (trained-merges artifact + checkpoint
#     cadence, values pinned unchanged), embedding_lsh_topk,
#     embedding_neardup_pairs, embedding_semantic_dedup,
#     embedding_lsh_recall (lsh_bucket_col plane-slice, values pinned
#     unchanged);
#   * the remaining 23 slots: the r7 cohort (latest green r7; 44 queries,
#     minus embedding_lsh_topk / embedding_lsh_recall already placed
#     above) ALPHABETICALLY — doc_boilerplate .. events_props_rollup.
# That leaves 19 r7-cohort queries NOT in the r10 window
# (events_purchase_window_clicks .. parts_hll_distinct, alphabetical); per
# VERDICT r9 item 7 they get an out-of-band sf0.1 oracle-harness sweep this
# round (result recorded in COVERAGE.md) and, being 4 rounds old at r11,
# they are scheduled to lead the r11 window:
# r11 window plan: the 19 r7 leftovers FIRST (events_purchase_window_clicks,
# events_retention_cohorts, events_salted_counts, events_salted_join,
# events_session_window, events_sliding_rollup, events_transition_matrix,
# features_within_radius, first_order_per_customer, geo_pivot_pipeline,
# image_decode_png, lang_id_confusion, lineitem_column_stats,
# lineitem_price_histogram, nation_stats_unpivot, nearest_feature_distance,
# orders_merge_upsert, parts_cm_frequencies, parts_hll_distinct); then the
# NINE queries NEW in r10 (registered after this window froze, so never
# driver-attested): doc_curation_lmgate_pruned, doc_bpe_artifact_encode,
# embedding_lsh_multiprobe_topk, embedding_multiprobe_recall,
# doc_winnow_fingerprints, doc_winnow_matches, doc_winnow_decontam,
# embedding_ivf_trained_topk, doc_lm_bucket_sample;
# then the r10-changed-but-not-windowed re-attests (CHANGED_THIS_ROUND
# below: the two-phase-rank five — embedding_cosine_topk,
# embedding_hamming_topk/external, embedding_lsh_recall,
# embedding_ivf_recall — plus doc_bm25_topk, the lsh-guard trio,
# doc_lm_auc, and doc_mask_contaminated (shared positional-kernel core);
# values pinned unchanged, all verified at sf0.1 this round);
# then the r8 cohort (latest green r8, 50 queries) alphabetically.
# Queries whose implementation changed this round. The local oracle
# mirror runs the whole catalog at sf0.001; this list gets an ADDITIONAL
# sf0.01 differential run (tests/test_queries_oracle.py::
# test_changed_query_matches_oracle_sf001) — the driver gate's exact
# scale — so scale-sensitive divergence in touched code surfaces locally
# before the gate does. Update each round alongside DRIVER_ORDER.
CHANGED_THIS_ROUND: list[str] = [
    # Two-phase top-k in the full-scan ANN rank stage (VERDICT r9 item 2):
    # partial per-input-partition rank before the global per-query window so
    # no single task sorts the corpus — values pinned unchanged.
    "embedding_cosine_topk",
    "embedding_hamming_topk",
    "embedding_hamming_external_topk",
    "embedding_lsh_recall",
    "embedding_ivf_recall",
    "doc_bm25_topk",
    # lsh_bucket_col dim>planes validation + NULL-vector guard (ADVICE r9
    # item 1) — no-op at the oracle-facing dim 64, values pinned unchanged.
    "embedding_lsh_topk",
    "embedding_neardup_pairs",
    "embedding_semantic_dedup",
    # score_auc NULL-score filter (ADVICE r9 item 2) — no NULL scores reach
    # the op via this query today, values pinned unchanged.
    "doc_lm_auc",
    # NEW in r10: curation pipeline's LM gate with count-floor-pruned model
    # (VERDICT r9 item 3 — lm_min_count wired through curation_pipeline)
    "doc_curation_lmgate_pruned",
    # NEW in r10: encode through a tokenizer LOADED from a parquet artifact
    # on disk — the cross-session serving contract (VERDICT r9 item 6)
    "doc_bpe_artifact_encode",
    # NEW in r10: multi-probe LSH (Hamming-1 neighbor buckets, Lv'07) —
    # the recall knob that doesn't add planes or duplicate the index
    "embedding_lsh_multiprobe_topk",
    "embedding_multiprobe_recall",
    # NEW in r10: winnowing fingerprints + MOSS-style matching (SIGMOD'03)
    # + verbatim-run decontamination over the winnowed index
    "doc_winnow_fingerprints",
    "doc_winnow_matches",
    "doc_winnow_decontam",
    # r10 self-review fixes: the positional/winnow kernels now share one
    # module-level k-gram hash core (values pinned unchanged) — re-attest
    # the positional consumer alongside the winnow family
    "doc_mask_contaminated",
    # NEW in r10: CCNet-style final draw — exactly-k deterministic sample
    # per (lang, LM bucket): pure composition of two verified operators
    "doc_lm_bucket_sample",
    # NEW in r10: IVF over k-means-TRAINED centroids (the production coarse
    # quantizer ivf_assign's docstring promises); the kmeans oracle builders
    # were refactored to share CTE chains — _kmeans_oracle output pinned
    # byte-identical, kmeans family re-attested at sf0.01 this round
    "embedding_ivf_trained_topk",
]

base.DRIVER_ORDER[:] = [
    # the 9 deferred-r6 queries (4 rounds old — lead per the published plan)
    "events_hourly_rollup",
    "geo_elevation_pipeline",
    "image_decode_jpeg",
    "lang_top_bigrams",
    "lineitem_price_quantiles",
    "orders_bloom_blocklist",
    "parts_triangle_counts",
    "sessionize_users",
    "video_frame_sample",
    # the 9 never-attested new-r9 queries (published r10 order)
    "doc_lm_quality_pruned",
    "doc_lm_serve_scores",
    "doc_dsir_serve_scores",
    "embedding_hamming_external_topk",
    "embedding_kmeanspar_cells",
    "lang_unimax_budgets",
    "doc_lm_auc",
    "doc_bpe_bytefallback",
    "doc_curation_keepbest",
    # the 9 r9-changed re-attests named in the published plan
    "doc_bpe_merges",
    "doc_bpe_merges_batched",
    "doc_bpe_token_counts",
    "doc_bpe_encoded",
    "doc_bpe_pack",
    "embedding_lsh_topk",
    "embedding_neardup_pairs",
    "embedding_semantic_dedup",
    "embedding_lsh_recall",
    # r7-cohort alphabetical fill (first 23 not already placed above)
    "doc_boilerplate",
    "doc_chunks",
    "doc_decontam_lsh_join",
    "doc_decontamination",
    "doc_dup_components",
    "doc_dup_components_star",
    "doc_feature_hash_embed",
    "doc_gopher_quality",
    "doc_incremental_dedup",
    "doc_jaccard_pairs",
    "doc_lsh_candidates",
    "doc_minhash_signatures",
    "doc_simhash",
    "doc_strip_boilerplate",
    "embedding_int8_quant",
    "embedding_ivf_recall",
    "events_anomaly_zscore",
    "events_dau_wau",
    "events_funnel",
    "events_gap_fill",
    "events_json_extract",
    "events_ohlc_bars",
    "events_props_rollup",
]


__all__ = ["REGISTRY", "spark_queries", "oracle_queries"]
