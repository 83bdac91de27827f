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
# Round-9 rotation — held EXACTLY to the composition published in the r8
# comment block and re-stated by VERDICT r8 item 1:
#   * the 17 NEW late-r8 queries (registered after the r8 window froze at
#     50, so never driver-attested) lead;
#   * then the kmeans-family re-attest (embedding_kmeans_cells /
#     embedding_cluster_profile — r8's centroid materialization +
#     incremental init changed the plan; values pinned unchanged);
#   * then the ALPHABETICALLY-FIRST 31 of the r6 cohort fill the window.
# Cohort-count correction vs the r8 comment: recounting CORRECTNESS_r01-r08
# (latest green row == r6, minus the two kmeans queries listed above) gives
# a 40-strong r6 cohort, not 41 — so 31 re-attest now and NINE (not ten)
# defer to r10, where their rows are 4 rounds old (one past the 3-round
# invariant; the declared price of 17 new queries in one round). The nine,
# alphabetical, to be named FIRST in the r10 window:
#   events_hourly_rollup, geo_elevation_pipeline, image_decode_jpeg,
#   lang_top_bigrams, lineitem_price_quantiles, orders_bloom_blocklist,
#   parts_triangle_counts, sessionize_users, video_frame_sample.
# r10 window plan: those 9 lead, then the 9 queries NEW in r9 (registered
# after this window froze, so never driver-attested): doc_lm_quality_pruned,
# doc_lm_serve_scores, doc_dsir_serve_scores, embedding_hamming_external_topk,
# embedding_kmeanspar_cells, lang_unimax_budgets, doc_lm_auc,
# doc_bpe_bytefallback, doc_curation_keepbest; then the
# r9-changed-but-not-windowed re-attests
# (doc_bpe_merges, doc_bpe_merges_batched, doc_bpe_token_counts,
# doc_bpe_encoded, doc_bpe_pack — trained-merges artifact + checkpoint
# cadence, values pinned unchanged; embedding_lsh_topk,
# embedding_neardup_pairs, embedding_semantic_dedup, embedding_lsh_recall —
# lsh_bucket_col plane-slice, values pinned unchanged; all 21 r9-changed
# queries verified hash-exact at sf0.1 this round, 10x the gate scale);
# the remaining ~19 slots go to the r7 cohort (latest green r7, 44 queries)
# alphabetically.
# Queries whose implementation changed this round. The local oracle
# mirror runs the whole catalog at sf0.001; this list gets an ADDITIONAL
# sf0.01 differential run (tests/test_queries_oracle.py::
# test_changed_query_matches_oracle_sf001) — the driver gate's exact
# scale — so scale-sensitive divergence in touched code surfaces locally
# before the gate does. Update each round alongside DRIVER_ORDER.
CHANGED_THIS_ROUND: list[str] = [
    # BPE family: wrappers consume the session-memoized trained-merges
    # artifact instead of retraining inline (VERDICT r8 item 2) — values
    # pinned unchanged (deterministic trainer; pytest pins memo ≡ fresh)
    "doc_bpe_merges",
    "doc_bpe_token_counts",
    "doc_bpe_encoded",
    "doc_bpe_vocab",
    "doc_bpe_roundtrip",
    "doc_bpe_pack",
    "lang_tokenizer_fertility",
    "doc_maxmatch_encoded",
    # NEW in r9: count-floor-pruned LM model (VERDICT r8 item 5) — leads r10
    "doc_lm_quality_pruned",
    # NEW in r9: train/serve split scored through the persisted model
    # (VERDICT r8 item 8 + ADVICE r8 full-bucket-support oracle evidence)
    "doc_lm_serve_scores",
    "doc_dsir_serve_scores",
    # NEW in r9: Hamming ANN against an external query table (VERDICT r8 item 7)
    "embedding_hamming_external_topk",
    # checkpoint cadence in the batched trainer is now merge-count-bounded
    # (k=256-safe lineage segments); values pinned unchanged
    "doc_bpe_merges_batched",
    # NEW in r9: k-means|| oversampled init (VERDICT r8 item 4)
    "embedding_kmeanspar_cells",
    # lsh_bucket_col now slices the plane literal to the vector length
    # (no-op at the oracle-facing dim 64 — values pinned unchanged; fixes
    # the all-in-bucket-0 collapse on shorter vectors)
    "embedding_lsh_topk",
    "embedding_neardup_pairs",
    "embedding_semantic_dedup",
    "embedding_lsh_recall",
    # NEW in r9 (late): UniMax per-language budgets + exact LM-score AUC
    "lang_unimax_budgets",
    "doc_lm_auc",
    # NEW in r9 (late): lossless byte-fallback encode (serving drift shape)
    "doc_bpe_bytefallback",
    # NEW in r9 (late): keep-best election inside the curation pipeline
    "doc_curation_keepbest",
]

base.DRIVER_ORDER[:] = [
    # the 17 never-attested late-r8 queries (published r9 order)
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
    # kmeans-family re-attest (r8 plan change, values pinned unchanged)
    "embedding_kmeans_cells",
    "embedding_cluster_profile",
    # alphabetically-first 31 of the 40-strong r6 cohort (latest green r6)
    "approx_distinct_parts",
    "asof_clicks_purchases",
    "audio_decode_wav",
    "blob_metadata",
    "custkey_status_skeleton",
    "custkey_yearly_delta_full_outer",
    "customer_spend_quartiles",
    "doc_encoded",
    "doc_fingerprint_dedup",
    "doc_hash_split",
    "doc_language_guess",
    "doc_mixture_resample",
    "doc_pack_sequences",
    "doc_pii_scrub",
    "doc_quality_percentile",
    "doc_quality_score",
    "doc_repetition_stats",
    "doc_source_rollup",
    "doc_span_dedup",
    "doc_stratified_sample",
    "doc_temperature_resample",
    "doc_tfidf_topterms",
    "doc_token_stats",
    "doc_train_shards",
    "doc_vocab",
    "embedding_cosine_topk",
    "embedding_ivf_topk",
    "embedding_neardup_pairs",
    "embedding_pq_adc_topk",
    "embedding_pq_codes",
    "embedding_semantic_dedup",
]


__all__ = ["REGISTRY", "spark_queries", "oracle_queries"]
