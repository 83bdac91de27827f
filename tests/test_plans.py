"""Physical-plan property tests: pin the plan shapes that matter at 100 TB
(pushdown, pruning, broadcast strategy, codegen, bounded shuffles) so a
regression fails CI instead of a cluster run."""

import re

import pytest

from duckpipe_spark.plans.audit import audit_plan, no_aqe
from tests.conftest import SF_SMOKE


def _q(name):
    from duckpipe_spark.queries import REGISTRY

    return REGISTRY[name].fn


def test_q1_scan_pushdown_and_pruning(spark):
    with no_aqe(spark):
        a = audit_plan(_q("q1_pricing_summary")(spark, SF_SMOKE))
    assert any("l_shipdate" in f for f in a.pushed_filters()), a.pushed_filters()
    cols = a.read_columns()[0]
    # only the 7 needed columns reach the scan — no SELECT *
    assert set(cols) == {
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate",
    }
    assert a.codegen_spans >= 1


def test_q5_broadcast_join_chain(spark):
    a = audit_plan(_q("q5_local_supplier")(spark, SF_SMOKE))
    assert a.broadcast_hash_joins >= 5  # every dim side broadcast
    assert a.sort_merge_joins == 0
    assert a.shuffle_hash_joins == 0
    # the fact table shuffles at most twice (agg partial→final under AQE)
    assert a.exchanges <= 2
    # region filter reached its scan
    assert any("r_name" in f for f in a.pushed_filters())


def test_distance_operator_plan(spark):
    with no_aqe(spark):
        a = audit_plan(_q("geo_nearest_distance_pipeline")(spark, SF_SMOKE))
    # feature decode is the only Python stage; per-pair math is JVM
    assert a.sort_merge_joins == 0
    assert a.exchanges <= 2  # only the final per-id aggregation shuffles
    assert a.codegen_spans >= 1


def test_llw_operator_has_no_scalar_python(spark):
    with no_aqe(spark):
        a = audit_plan(_q("geo_buffer_clip_pipeline")(spark, SF_SMOKE))
    # decode via MapInPandas is expected; no ArrowEvalPython scalar UDF —
    # the circle-clip kernel must be column arithmetic
    assert "ArrowEvalPython" not in a.text
    assert a.codegen_spans >= 1


def test_minhash_is_shuffle_free_projection(spark):
    # default (arrow) impl: ONE MapInPandas stage straight off the scan,
    # and no exchange anywhere — the signature is a pure projection
    import re

    with no_aqe(spark):
        a = audit_plan(_q("doc_minhash_signatures")(spark, SF_SMOKE))
    # count detail headers only (the formatted plan names each node twice)
    assert len(re.findall(r"\n\(\d+\) MapInPandas", a.text)) == 1
    assert a.exchanges == 0

    # reference (hof) impl stays entirely in the JVM
    from duckpipe_spark.functions.dedup import minhash_signatures
    from duckpipe_spark.sources.tables import load_table

    with no_aqe(spark):
        h = audit_plan(
            minhash_signatures(load_table(spark, SF_SMOKE, "documents"), impl="hof")
        )
    assert h.python_stages == 0
    assert h.exchanges == 0
    assert h.codegen_spans >= 1


def test_nearest_neighbor_grid_plan(spark):
    # grid-pruned NN: no sort-merge join, both probe and fallback joins are
    # broadcast, and the only exchanges are the two per-id aggregations
    # (pass A + fallback) — never an O(n·m) shuffle
    with no_aqe(spark):
        a = audit_plan(_q("nearest_feature_distance")(spark, SF_SMOKE))
    assert a.sort_merge_joins == 0
    assert a.broadcast_hash_joins >= 1
    assert a.exchanges <= 4


def test_skeleton_fill_broadcasts_small_sides(spark):
    a = audit_plan(_q("custkey_status_skeleton")(spark, SF_SMOKE))
    assert a.broadcast_hash_joins + a.broadcast_nl_joins >= 1
    assert a.sort_merge_joins == 0


def test_q10_uses_take_ordered(spark):
    with no_aqe(spark):
        a = audit_plan(_q("q10_returned_items")(spark, SF_SMOKE))
    # deterministic top-k must compile to TakeOrderedAndProject (per-partition
    # top-k + driver merge), not a single-partition global sort window
    assert "TakeOrderedAndProject" in a.text


def test_asof_is_one_window_no_join(spark):
    with no_aqe(spark):
        a = audit_plan(_q("asof_clicks_purchases")(spark, SF_SMOKE))
    # union-merge formulation: zero joins, bounded shuffles (purchase
    # pre-agg + window repartition), sort happens once per partition
    assert a.sort_merge_joins + a.shuffle_hash_joins + a.broadcast_hash_joins == 0
    assert a.exchanges <= 3


def test_lsh_candidates_single_self_join(spark):
    import re

    with no_aqe(spark):
        a = audit_plan(_q("doc_lsh_candidates")(spark, SF_SMOKE))
    # all bands go through ONE equi-join on (band_idx, band_key) — band count
    # must not multiply join/shuffle stages. Count detail headers only: the
    # formatted plan mentions each join twice (tree line + detail section).
    joins = re.findall(r"\n\(\d+\) \w*(?:SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)", a.text)
    assert len(joins) == 1, joins
    # the only Python stage is the Arrow signature build inside the cached
    # relation; the banding/join/dedup pipeline itself is pure JVM
    assert "ArrowEvalPython" not in a.text


def test_multi_distinct_uses_expand(spark):
    with no_aqe(spark):
        a = audit_plan(_q("lineitem_multi_distinct")(spark, SF_SMOKE))
    # three distinct aggregates over one scan: Expand-based rewrite, with
    # partial aggregation still present (no raw-row shuffle of the fact)
    assert "Expand" in a.text
    assert a.codegen_spans >= 1


def test_hash_split_is_shuffle_free(spark):
    with no_aqe(spark):
        a = audit_plan(_q("doc_hash_split")(spark, SF_SMOKE))
    # split assignment is a pure projection: no Exchange, no join, no Python
    assert a.exchanges == 0, a.text
    assert a.python_stages == 0
    assert a.codegen_spans >= 1


def test_q16_broadcasts_both_small_sides(spark):
    a = audit_plan(_q("q16_supplier_part_counts")(spark, SF_SMOKE))
    # NOT-IN exclusion and part filter both resolve as broadcast joins —
    # the fact-side pair set never sort-merge-joins
    assert a.sort_merge_joins == 0
    assert a.broadcast_hash_joins >= 1
    assert any("p_size" in f or "p_brand" in f for f in a.pushed_filters())


def test_q21_has_no_expand(spark):
    with no_aqe(spark):
        a = audit_plan(_q("q21_waiting_supplier")(spark, SF_SMOKE))
    # stacked plain aggregates, not a double COUNT(DISTINCT) Expand rewrite
    assert "Expand" not in a.text
    assert a.python_stages == 0


def test_pack_sequences_single_shuffle(spark):
    with no_aqe(spark):
        a = audit_plan(_q("doc_pack_sequences")(spark, SF_SMOKE))
    # one Exchange on the stream key feeds the prefix-sum window
    assert a.exchanges == 1, a.text
    assert a.python_stages == 0


def test_corpus_hygiene_joins_are_broadcast_only(spark):
    """Decontamination and boilerplate must never sort-merge: the n-gram
    hit sets (benchmark / heavy-hitter) are the broadcast sides, and the
    only exchanges are the three aggregations (set distinct + two counts).
    The shingle source is the Arrow numpy kernel (r7 — the JVM HOF fold
    measured ~100× slower per doc), and both counts fold into ONE
    aggregate off a left join against the broadcast set, so the plan is:
    ≤2 kernel passes (the set side and the per-doc side — decontamination
    splits the corpus by bucket BEFORE the kernel so neither pass reads
    the whole table twice), exactly one broadcast join, and no
    row-at-a-time ArrowEvalPython anywhere."""
    for name in ("doc_decontamination", "doc_boilerplate"):
        with no_aqe(spark):
            a = audit_plan(_q(name)(spark, SF_SMOKE))
        assert a.sort_merge_joins == 0, name
        assert a.shuffle_hash_joins == 0, name
        # count unique join NODES via detail headers (the raw counter sees
        # each node twice: once in the tree, once in the detail section)
        assert len(re.findall(r"\n\(\d+\) BroadcastHashJoin", a.text)) == 1, name
        assert a.exchanges <= 3, (name, a.text)
        assert "ArrowEvalPython" not in a.text, name
        kernels = len(re.findall(r"\n\(\d+\) MapInPandas", a.text))
        assert kernels <= 2, (name, kernels)


def test_encode_docs_is_broadcast_projection(spark):
    """Encoding shuffles once (the vocabulary count agg); the vocab join
    onto the exploded positions is broadcast, never a shuffle of tokens."""
    with no_aqe(spark):
        a = audit_plan(_q("doc_encoded")(spark, SF_SMOKE))
    assert a.exchanges <= 1, a.text
    assert a.sort_merge_joins == 0
    assert a.python_stages == 0


def test_pq_adc_scan_side_never_shuffles_vectors(spark):
    """ADC joins the code rows against a broadcast LUT; no sort-merge join
    anywhere and the only exchanges are the (id,sub) argmin and the final
    (query,id) sum + rank."""
    with no_aqe(spark):
        a = audit_plan(_q("embedding_pq_adc_topk")(spark, SF_SMOKE))
    assert a.sort_merge_joins == 0
    assert a.shuffle_hash_joins == 0
    assert a.broadcast_hash_joins >= 4
    assert a.exchanges <= 3, a.text
    assert a.python_stages == 0


def test_ivfpq_no_full_corpus_adc_scan(spark):
    """embedding_ivfpq_topk (r11): the centroid table and residual codebook
    are collected literals, every join in the plan is broadcast (the ADC
    LUT inner join IS the probe filter — codes outside probed cells never
    reach the aggregate), no sort-merge/shuffled-hash join or Python stage
    exists, and the shuffle count stays at the aggregates + two-phase rank
    (assign argmin, code argmin, ADC sum, shortlist, final rank)."""
    with no_aqe(spark):
        a = audit_plan(_q("embedding_ivfpq_topk")(spark, SF_SMOKE))
    assert a.sort_merge_joins == 0
    assert a.shuffle_hash_joins == 0
    assert a.broadcast_hash_joins >= 8
    assert a.exchanges <= 6, a.text
    assert a.python_stages == 0


def test_span_dedup_plan_bounded_shuffles(spark):
    # span dedup: no Python stage (codegen split/slice/md5), no cartesian,
    # shuffles bounded by: span-hash election, kept-spans join, per-doc
    # reassembly, final doc join. Nothing scales worse than the span table.
    with no_aqe(spark):
        a = audit_plan(_q("doc_span_dedup")(spark, SF_SMOKE))
    assert a.python_stages == 0
    assert a.broadcast_nl_joins == 0
    assert "CartesianProduct" not in a.text
    assert a.exchanges <= 8
    # the wins⋈firsts election join must be the hinted shuffled-hash join,
    # not sort-merge: SMJ's two md5-key sorts were the dominant cost at
    # 500k docs (BASELINE §11), and SHJ's build side is one row per
    # distinct span hash (hot-span skew-safe)
    assert "ShuffledHashJoin" in a.text, a.text


def test_source_rollup_single_shuffle(spark):
    # one partial-agg'd exchange on source (the distinct-fp count rides the
    # same grouping via Expand), zero joins, zero Python
    with no_aqe(spark):
        a = audit_plan(_q("doc_source_rollup")(spark, SF_SMOKE))
    assert a.python_stages == 0
    assert a.sort_merge_joins + a.broadcast_hash_joins + a.broadcast_nl_joins == 0
    assert a.exchanges <= 2


def test_lsh_recall_no_cartesian_on_corpus(spark):
    # both the exact side (broadcast query vectors) and the LSH side
    # (bucket-equi join) avoid a corpus×corpus product
    with no_aqe(spark):
        a = audit_plan(_q("embedding_lsh_recall")(spark, SF_SMOKE))
    assert "CartesianProduct" not in a.text
    assert a.sort_merge_joins == 0


def test_jaccard_df_cap_is_broadcast_anti_join(spark):
    """The round-4 shingle df cap must not add a wide shuffle of the
    (id, shingle) index: the hot-shingle list is removed with a BROADCAST
    left-anti join, and the pair pipeline still has exactly one equi
    self-join."""
    import re

    from duckpipe_spark.functions.dedup import ngram_jaccard_pairs
    from duckpipe_spark.sources.tables import load_table

    docs = load_table(spark, SF_SMOKE, "documents").limit(100)
    with no_aqe(spark):
        a = audit_plan(ngram_jaccard_pairs(docs, max_df=50))
    anti = re.findall(r"BroadcastHashJoin [^\n]*LeftAnti", a.text)
    assert len(anti) >= 1, "df cap should broadcast the hot-shingle list"
    # the intersection self-join is the ONLY non-broadcast join
    assert a.sort_merge_joins + a.shuffle_hash_joins <= 1


def test_merge_upsert_broadcast_flag_controls_join_strategy(spark):
    """broadcast_updates=True pins a broadcast anti-join (base never
    shuffles); False leaves the strategy to the planner (no broadcast hint
    on a potentially huge updates batch)."""
    from duckpipe_spark.operators.maintenance import merge_upsert
    from duckpipe_spark.sources.tables import load_table

    base = load_table(spark, SF_SMOKE, "orders").select("o_orderkey", "o_totalprice")
    updates = base.limit(10)
    with no_aqe(spark):
        hinted = audit_plan(merge_upsert(base, updates, "o_orderkey"))
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            unhinted = audit_plan(
                merge_upsert(base, updates, "o_orderkey", broadcast_updates=False)
            )
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    assert hinted.broadcast_hash_joins >= 1
    # with the hint OFF and auto-broadcast disabled the planner picks a
    # shuffle join — proving the hint (not table size) controlled it before
    assert unhinted.broadcast_hash_joins == 0
    assert unhinted.sort_merge_joins + unhinted.shuffle_hash_joins >= 1


def test_range_join_query_plan_no_nested_loop(spark):
    """events_purchase_window_clicks: the registered interval-join query
    plans as equi-joins only — never BroadcastNestedLoopJoin/cartesian —
    and keeps the whole pipeline Python-free."""
    with no_aqe(spark):
        a = audit_plan(_q("events_purchase_window_clicks")(spark, SF_SMOKE))
    assert a.broadcast_nl_joins == 0
    assert "CartesianProduct" not in a.text
    assert a.python_stages == 0


def test_salted_join_is_pure_equi_join(spark):
    """events_salted_join: salting must add zero Python and no extra
    shuffle beyond the join + final aggregate; the salt is a column
    expression, the dim replication a generator projection."""
    with no_aqe(spark):
        a = audit_plan(_q("events_salted_join")(spark, SF_SMOKE))
    assert a.python_stages == 0
    assert a.broadcast_nl_joins == 0
    assert "CartesianProduct" not in a.text
    # events scan prunes to the two needed columns
    assert any(set(c) <= {"user_id", "value"} for c in a.read_columns() if c), a.read_columns()


def test_triangle_count_bounded_exchanges_no_python(spark):
    """parts_triangle_counts: degree attach + adjacency closing are all
    equi-joins; the closing intersection is a JVM higher-order function
    (no ArrowEvalPython anywhere), and no nested-loop join appears."""
    with no_aqe(spark):
        a = audit_plan(_q("parts_triangle_counts")(spark, SF_SMOKE))
    assert a.python_stages == 0
    assert a.broadcast_nl_joins == 0
    assert "CartesianProduct" not in a.text


def test_anomaly_zscore_single_shuffle_window(spark):
    """events_anomaly_zscore: one exchange (the user_id window partition),
    no joins at all — the cheapest possible shape for a per-key trailing
    window at 100 TB."""
    with no_aqe(spark):
        a = audit_plan(_q("events_anomaly_zscore")(spark, SF_SMOKE))
    assert a.python_stages == 0
    assert a.exchanges == 1, a.text
    assert a.sort_merge_joins + a.broadcast_hash_joins + a.shuffle_hash_joins == 0


def test_triangle_counts_by_min_no_distinct_exchange(spark):
    """Round-5 triangle rebuild: pair dedup rides the adjacency
    collect_set, so no separate distinct/dedup exchange exists; the count
    path stays JVM-only and never materializes per-triangle rows (no
    Generate of a 3-struct sort — the only explodes are the pair
    generator, the adjacency, and the bounded w<min filter)."""
    with no_aqe(spark):
        a = audit_plan(_q("parts_triangle_counts")(spark, SF_SMOKE))
    assert a.python_stages == 0
    assert a.broadcast_nl_joins == 0 and "CartesianProduct" not in a.text
    assert "HashAggregate(keys=[u#" in a.text or "ObjectHashAggregate" in a.text
    # the old path's per-triangle sort_array(array(src, dst, w)) is gone
    assert "sort_array(array(src" not in a.text.replace(" ", "")
    # exactly 3 shuffle keys: per-order sets, per-node adjacency, final
    # count — the orientation re-group reuses the adjacency partitioning
    # (attribute kept, not re-aliased), so no 4th exchange exists
    import re as _re

    keys = set(_re.findall(r"hashpartitioning\((\w+)#\d+", a.text))
    assert len(keys) == 3, keys


def test_sampled_quantiles_bounded_plan(spark):
    """lineitem_price_quantiles: one rank-window shuffle + the k-bounded
    fold reusing the same partitioning — ≤2 unique exchanges, no joins,
    no Python stages."""
    with no_aqe(spark):
        a = audit_plan(_q("lineitem_price_quantiles")(spark, SF_SMOKE))
    assert a.python_stages == 0
    assert a.sort_merge_joins + a.broadcast_hash_joins + a.shuffle_hash_joins == 0
    assert a.exchanges <= 2, a.text


def test_bloom_probe_is_broadcast_only_one_to_one(spark):
    """orders_bloom_blocklist: the probe side never shuffles for the
    filter — since r6 the entire word→bits filter folds into ONE
    single-row broadcast map attached by a cross join (k in-row
    element_at lookups), replacing the former k chained broadcast hash
    joins. No shuffle/sort/hash join of the probe side, no aggregation
    collapsing probe rows between scan and verdict."""
    import pyspark.sql.functions as F

    from duckpipe_spark.functions.sketches import bloom_build, bloom_probe

    keys = spark.range(0, 1000).select(F.col("id").alias("k"))
    filt = bloom_build(spark.range(0, 100).select(F.col("id").alias("k")), "k")
    a = audit_plan(bloom_probe(filt, keys, "k"))
    assert a.sort_merge_joins == 0 and a.shuffle_hash_joins == 0
    # the one-row broadcast arrives as a BroadcastNestedLoopJoin (cross
    # with a single build row — constant work per probe row) and there
    # are no per-seed hash joins left
    assert "BroadcastNestedLoopJoin" in a.text
    assert a.broadcast_hash_joins == 0
    # probe cardinality is 1:1 by construction: no aggregate above the probe
    assert "element_at" in a.text


def test_build_vocab_two_phase_topk(spark):
    """VERDICT r5 item 5: the vocabulary rank window must never sort the
    full distinct-token relation in one partition — the top-max_size
    selection compiles to TakeOrderedAndProject (partial per-partition
    top-k + merge), and only the max_size survivors reach the window."""
    from duckpipe_spark.functions.text import build_vocab

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    with no_aqe(spark):
        a = audit_plan(build_vocab(docs, 500))
    assert "TakeOrderedAndProject" in a.text, a.text
    # no full-relation global sort anywhere in the plan (the old shape fed
    # the window with Sort[global] over the whole distinct-token table)
    import re

    assert not re.search(r"Sort .*global=true", a.text), a.text


def test_sampled_quantiles_two_phase_rank(spark):
    """BASELINE §13: the rank cut must run as TWO windows — a per-(group,
    scan-partition) local rank (parallelism ∝ partitions) feeding a final
    rank over ≤ P·k rows per group — never one window whose parallelism
    is the group cardinality."""
    import pyspark.sql.functions as F

    from duckpipe_spark.functions.sketches import sampled_quantiles

    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").select(
        "l_returnflag",
        F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)").alias("cents"),
        F.expr("l_orderkey * 8 + l_linenumber").alias("rid"),
    )
    with no_aqe(spark):
        a = audit_plan(sampled_quantiles(li, "cents", "rid", ["l_returnflag"], k=64))
    assert a.text.count("Window") >= 2, a.text
    assert "SPARK_PARTITION_ID" in a.text.upper() or "spark_partition_id" in a.text, a.text


def test_bm25_broadcast_only_semi_pruned(spark):
    """BM25: query-term/df/stats sides broadcast (no sort-merge join), the
    only BNLJ is the 1-row stats crossJoin, zero Python stages, and the
    token explode is pruned by a left-semi against the broadcast term set
    BEFORE the tf shuffle (the df aggregate never sees non-query terms)."""
    from duckpipe_spark.functions.text import bm25_topk
    from duckpipe_spark.sources.tables import load_table

    df = bm25_topk(
        load_table(spark, SF_SMOKE, "documents"), [(0, ["the", "a"])], k=5
    )
    a = audit_plan(df)
    assert a.sort_merge_joins == 0
    # exactly ONE BNLJ node: the 1-row stats crossJoin (tree + detail
    # section each mention it once, so count detail headers)
    assert len(re.findall(r"\n\(\d+\) BroadcastNestedLoopJoin", a.text)) == 1
    assert a.python_stages == 0
    assert a.broadcast_hash_joins >= 4  # semi-prune + qt + dfq + (dl small here)
    assert "LeftSemi" in a.text
    # r10: the rank stage is the two-phase per-query top-k — phase 1 ranks
    # within (query_id, input partition) so a stop-word query term can't
    # funnel a corpus-sized candidate set into one reducer
    assert "SPARK_PARTITION_ID" in a.text.upper(), a.text


def test_curation_semdedup_no_cartesian_no_extra_python(spark):
    """The SemDeDup splice must not add a cartesian pair search (the pair
    join is a bucket equi-join on all-JVM fold expressions) and must not
    add Python stages: the static un-persisted plan replays the Arrow
    shingle kernel per consumer (persist_stages collapses that at run
    time), so the pin compares against the BASE pipeline's count rather
    than an absolute."""
    from duckpipe_spark.functions.corpus import curation_pipeline
    from duckpipe_spark.functions.similarity import N_PLANES
    from duckpipe_spark.sources.tables import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    base = audit_plan(curation_pipeline(docs, persist_stages=False))
    a = audit_plan(
        curation_pipeline(
            docs,
            embeddings=load_table(spark, SF_SMOKE, "embeddings"),
            semdedup_planes=N_PLANES,
            persist_stages=False,
        )
    )
    assert "CartesianProduct" not in a.text
    assert a.python_stages == base.python_stages, (a.python_stages, base.python_stages)
    # the splice's own joins (survivor anti-join, closure label joins) are
    # all EQUI joins — SMJ/SHJ are legitimate there at unknown build-side
    # size; only a cartesian/BNLJ pair search would be a scale bug, and the
    # BNLJ count must not grow vs the base pipeline
    assert a.broadcast_nl_joins <= base.broadcast_nl_joins


def test_lm_quality_broadcast_lm_tables_no_smj(spark):
    """doc_lm_quality: the trained LM tables (bigram counts, prefix
    counts, 1-row vocab stats) are vocabulary-bounded and must BROADCAST
    onto the corpus bigram stream — a sort-merge join here would shuffle
    every (id, pos, hash) row of the corpus against the LM at 100 TB.
    The only nested-loop joins allowed are the 1-row scalar crossJoins.
    Optimization r15: the corpus bigram stream comes from exactly ONE
    MapInPandas hash kernel (the train-side kernel lives behind the
    localCheckpoint boundary and is not in this lazy plan) — more than
    one would mean the memoized fold re-entered Python per consumer."""
    with no_aqe(spark):
        a = audit_plan(_q("doc_lm_quality")(spark, SF_SMOKE))
    assert a.sort_merge_joins == 0
    assert a.shuffle_hash_joins == 0
    assert a.broadcast_hash_joins >= 2  # bigram + prefix count tables
    # one physical MapInPandas node == 2 formatted-text mentions (tree +
    # detail header), same counting note as the dsir BNLJ pin below
    assert a.python_stages == 2, a.python_stages  # the corpus bigram kernel
    assert "CartesianProduct" not in a.text


def test_dsir_bucket_table_broadcast_no_smj(spark):
    """doc_dsir_scores (single-pass r14 shape): the bucket model collapses
    to ONE broadcast row (B-entry map) riding a single cross
    BroadcastNestedLoopJoin onto the (id, bucket) counts; the corpus
    explode feeds model and probe through ONE shared exchange
    (ReusedExchange). No SMJ/SHJ, no equi-broadcast needed anymore, and
    never a CartesianProduct."""
    with no_aqe(spark):
        a = audit_plan(_q("doc_dsir_scores")(spark, SF_SMOKE))
    assert a.sort_merge_joins == 0
    assert a.shuffle_hash_joins == 0
    # formatted explain prints each node twice (tree + detail header), so
    # one physical BNLJ node == 2 matches; the 1-row model join is the
    # ONLY nested-loop join allowed
    assert a.broadcast_nl_joins == 2, a.text
    assert "ReusedExchange" in a.text  # corpus explode tokenized once
    assert a.python_stages == 0
    assert "CartesianProduct" not in a.text


def test_dedup_keep_best_component_map_broadcasts(spark):
    """doc_dedup_keep_best: the component map (duplicate clusters only —
    tiny vs the corpus) broadcasts LEFT onto the quality projection; the
    only exchange in the final stitch is the per-component window."""
    with no_aqe(spark):
        a = audit_plan(_q("doc_dedup_keep_best")(spark, SF_SMOKE))
    assert a.sort_merge_joins == 0
    assert a.broadcast_hash_joins >= 1
    assert a.exchanges <= 2, a.text


def test_prototype_prune_centroids_broadcast_no_python(spark):
    """embedding_prototype_prune: centroid arrays (k rows) broadcast onto
    the assignment; distances are JVM fold expressions (zero Python); no
    cartesian pair search anywhere in the unrolled Lloyd plan."""
    with no_aqe(spark):
        a = audit_plan(_q("embedding_prototype_prune")(spark, SF_SMOKE))
    assert a.sort_merge_joins == 0
    assert a.shuffle_hash_joins == 0
    assert a.python_stages == 0
    assert "CartesianProduct" not in a.text


def test_fim_is_zero_exchange_projection(spark):
    """doc_fim_transform: the PSM reorder is a PURE projection — zero
    exchanges, zero joins, zero Python; the cheapest possible shape for a
    corpus-wide rewrite at 100 TB."""
    with no_aqe(spark):
        a = audit_plan(_q("doc_fim_transform")(spark, SF_SMOKE))
    assert a.exchanges == 0, a.text
    assert a.sort_merge_joins + a.broadcast_hash_joins + a.shuffle_hash_joins == 0
    assert a.python_stages == 0


def test_epoch_and_length_pack_single_window_exchange(spark):
    """doc_epoch_order / doc_length_bucketed_pack: projection + ONE rank/
    prefix-sum window exchange — the dataloader-prep floor."""
    for name in ("doc_epoch_order", "doc_length_bucketed_pack"):
        with no_aqe(spark):
            a = audit_plan(_q(name)(spark, SF_SMOKE))
        assert a.exchanges == 1, (name, a.text)
        assert a.python_stages == 0, name


def test_hamming_topk_no_smj_two_phase_rank(spark):
    """embedding_hamming_topk: codes are a projection, the 5-row query
    side broadcasts (tiny BNLJ is the intended crossJoin), and the rank
    stage is TWO-PHASE (VERDICT r9 item 2): a local (query_id,
    spark_partition_id) window — n_partitions × n_queries reducers, each
    sorting only its corpus slice — then the global per-query window over
    the n_partitions × k survivors. Exactly two exchanges; no SMJ ever
    touches the corpus codes."""
    with no_aqe(spark):
        a = audit_plan(_q("embedding_hamming_topk")(spark, SF_SMOKE))
    assert a.sort_merge_joins == 0 and a.shuffle_hash_joins == 0
    assert a.exchanges == 2, a.text
    assert "SPARK_PARTITION_ID" in a.text.upper(), a.text
    assert a.python_stages == 0


def test_hamming_external_no_smj_two_phase_rank(spark):
    """embedding_hamming_external_topk: same two-phase shape as the
    in-corpus pin — the external query batch broadcasts (BNLJ crossJoin),
    partial per-partition rank, then the global per-query window over
    survivors; no SMJ, no Python."""
    with no_aqe(spark):
        a = audit_plan(_q("embedding_hamming_external_topk")(spark, SF_SMOKE))
    assert a.sort_merge_joins == 0 and a.shuffle_hash_joins == 0
    assert a.exchanges == 2, a.text
    assert "SPARK_PARTITION_ID" in a.text.upper(), a.text
    assert a.python_stages == 0


def test_winnow_fingerprints_shuffle_free(spark):
    """doc_winnow_fingerprints: the whole selection (k-gram hashes +
    window min + distinct-per-doc) happens inside ONE Arrow kernel over
    the scan — zero exchanges, zero joins; the only Python node is the
    mapInPandas kernel itself (the documented coarse-Arrow boundary; the
    audit counts each node in both the plan tree and the detail section,
    so one kernel reads as 2)."""
    with no_aqe(spark):
        a = audit_plan(_q("doc_winnow_fingerprints")(spark, SF_SMOKE))
    assert a.exchanges == 0, a.text
    assert a.sort_merge_joins + a.broadcast_hash_joins + a.shuffle_hash_joins == 0
    assert a.text.count("MapInPandas") == 2 and a.python_stages == 2, a.text


def test_winnow_decontam_broadcast_probe_two_kernels(spark):
    """doc_winnow_decontam: the bench fingerprint set joins as a BROADCAST
    (never a sort-merge shuffle of the train index), there is no
    cartesian, and the bucket split happens BEFORE the winnow kernel —
    exactly two kernel invocations (bench slice + train slice; the audit
    counts each MapInPandas node twice, tree + detail)."""
    with no_aqe(spark):
        a = audit_plan(_q("doc_winnow_decontam")(spark, SF_SMOKE))
    assert a.sort_merge_joins == 0, a.text
    assert "CartesianProduct" not in a.text
    assert a.broadcast_hash_joins >= 1, a.text
    assert a.text.count("MapInPandas") == 4, a.text


def test_winnow_matches_anti_join_before_pairs(spark):
    """doc_winnow_matches: the boilerplate df-cap is a BROADCAST anti-join
    applied BEFORE the pair self-join (one hot fingerprint would emit df²
    pair rows), and the pair join itself is an equi-join — no cartesian."""
    with no_aqe(spark):
        a = audit_plan(_q("doc_winnow_matches")(spark, SF_SMOKE))
    assert "CartesianProduct" not in a.text
    assert "LeftAnti" in a.text, a.text
    assert a.sort_merge_joins == 0, a.text


def test_multiprobe_no_smj_no_cartesian(spark):
    """embedding_lsh_multiprobe_topk: the corpus is bucketed ONCE (pure
    projection), the probe side (queries × masks) broadcasts into a bucket
    equi-join — no sort-merge join against the corpus, no cartesian pair
    search, no Python; the rank stage is the two-phase top-k."""
    with no_aqe(spark):
        a = audit_plan(_q("embedding_lsh_multiprobe_topk")(spark, SF_SMOKE))
    assert a.sort_merge_joins == 0, a.text
    assert "CartesianProduct" not in a.text
    assert a.python_stages == 0
    assert "SPARK_PARTITION_ID" in a.text.upper(), a.text


def test_lm_serve_scores_is_broadcast_projection(spark):
    """doc_lm_serve_scores: the serve path is a projection over a 1-row
    broadcast model — no SMJ/SHJ against the corpus, no Python, and no
    corpus-keyed exchange on the scoring side (the exchanges present
    belong to the TRAIN aggregates that build the model row)."""
    with no_aqe(spark):
        a = audit_plan(_q("doc_lm_serve_scores")(spark, SF_SMOKE))
    assert a.sort_merge_joins == 0 and a.shuffle_hash_joins == 0, a.text
    assert a.python_stages == 0


def test_unimax_single_corpus_exchange(spark):
    """lang_unimax_budgets: the corpus contributes ONE map-combinable
    groupBy; the water-filling windows run on the language-cardinality
    table. No SMJ, no Python."""
    with no_aqe(spark):
        a = audit_plan(_q("lang_unimax_budgets")(spark, SF_SMOKE))
    assert a.sort_merge_joins == 0, a.text
    assert a.python_stages == 0
    # partial agg on the scan side must exist (map-side combine)
    assert "partial" in a.text.lower()


def test_score_auc_groups_before_window(spark):
    """doc_lm_auc: the rank window runs over score-DISTINCT rows (the
    groupBy collapses the corpus first), never over per-doc rows; no SMJ
    against the corpus, no Python."""
    with no_aqe(spark):
        a = audit_plan(_q("doc_lm_auc")(spark, SF_SMOKE))
    assert a.python_stages == 0
    assert a.sort_merge_joins == 0, a.text


def test_bm25_artifact_serve_reads_only_the_index(spark):
    """doc_bm25_artifact_topk (r11): the serve plan reads the persisted
    postings/doclens/termstats/stats parquet and NOTHING else — no
    documents.parquet scan, no training lineage, no Python stage. That is
    the whole point of the artifact contract: scoring works from a fresh
    session without the corpus."""
    with no_aqe(spark):
        a = audit_plan(_q("doc_bm25_artifact_topk")(spark, SF_SMOKE))
    locs = " ".join(s.get("location", "") for s in a.scans)
    assert "bm25_index_" in locs, locs
    assert "documents.parquet" not in locs, locs
    assert a.python_stages == 0


def test_phash_neardup_banded_join_no_cartesian(spark):
    """The fingerprint near-dup family (image/audio/video share
    phash_neardup_pairs): codes come from ONE shuffle-free Arrow kernel
    over the blob stream, the hot-band df-cap is a BROADCAST anti-join
    applied BEFORE the pair self-join (one flat-color band would emit df²
    candidate rows), and the pair join itself is a band equi-join — never
    a cartesian over codes."""
    for name in (
        "image_phash_neardup",
        "audio_fingerprint_neardup",
        "video_fingerprint_neardup",
    ):
        with no_aqe(spark):
            a = audit_plan(_q(name)(spark, SF_SMOKE))
        assert "CartesianProduct" not in a.text, name
        assert "LeftAnti" in a.text, (name, a.text)
        assert a.broadcast_hash_joins >= 1, (name, a.text)


def test_sq8_jvm_only_broadcast_scan(spark):
    """embedding_sq8_topk (r11): the entire SQ8 scan is JVM-side — zero
    Python stages (codes/reconstruction/integer dots are higher-order
    Column functions inside codegen), the only joins are the broadcast
    gmax/query crossJoins (no SMJ, no cartesian), and the only exchanges
    are the two-phase rank's (<= 3 with the gmax aggregate)."""
    with no_aqe(spark):
        a = audit_plan(_q("embedding_sq8_topk")(spark, SF_SMOKE))
    assert a.python_stages == 0, a.text
    assert a.sort_merge_joins == 0 and a.shuffle_hash_joins == 0, a.text
    assert "CartesianProduct" not in a.text
    assert a.broadcast_nl_joins >= 2, a.text
    assert a.exchanges <= 3, a.text


def test_medianear_stage_banded_join_no_cartesian(spark):
    """doc_curation_medianear (r12): the media stage's pair search is a
    (modality, band) equi-join with the hot-band broadcast anti-join
    applied first, the drop set returns as one anti-join on id, and
    nothing in the spliced pipeline introduces a cartesian over codes or
    documents."""
    with no_aqe(spark):
        a = audit_plan(_q("doc_curation_medianear")(spark, SF_SMOKE))
    assert "CartesianProduct" not in a.text
    assert "LeftAnti" in a.text, a.text
    assert a.broadcast_hash_joins >= 1, a.text


def test_medianear_artifact_serves_codes_without_decode(spark, monkeypatch):
    """doc_curation_medianear_artifact (r13): once the code artifact
    exists on disk, the query must NEVER invoke the decode/fingerprint
    path — the serve contract the BM25 index pin above checks for
    retrieval, pinned at the EXECUTION level (a plan-text pin is unsound
    here: the 400+-node pipeline plan gets string-truncated and stage
    persists hide upstream lineage behind InMemoryRelation). Method:
    poison the code BUILDER after ensuring the artifact exists; the
    artifact query must still produce its full result from the parquet
    alone, while the decode-inline twin trips the poison immediately."""
    import duckpipe_spark.queries.multimodal_q as mq
    from duckpipe_spark.queries.base import REGISTRY
    from duckpipe_spark.queries.corpus_q import _media_codes_artifact

    _media_codes_artifact(spark, SF_SMOKE)  # build once, for real

    def _poisoned(*a, **k):
        raise AssertionError(
            "artifact query invoked the decode path despite a persisted artifact"
        )

    monkeypatch.setattr(mq, "media_fixture_codes", _poisoned)
    rows = REGISTRY["doc_curation_medianear_artifact"].fn(spark, SF_SMOKE).collect()
    assert len(rows) > 0

    import pytest as _pytest

    with _pytest.raises(AssertionError, match="decode path"):
        REGISTRY["doc_curation_medianear"].fn(spark, SF_SMOKE).collect()


def test_matryoshka_jvm_only_two_phase(spark):
    """embedding_matryoshka_topk (r14): the prefix-slice candidate scan is
    a pure JVM projection (slice + fold inside codegen — zero Python
    stages), the 5-row query side broadcasts (tiny BNLJ crossJoin is the
    intended shape), both rank stages are the two-phase per-query top-k,
    and no SMJ/SHJ/cartesian ever touches the corpus."""
    with no_aqe(spark):
        a = audit_plan(_q("embedding_matryoshka_topk")(spark, SF_SMOKE))
    assert a.python_stages == 0, a.text
    assert a.sort_merge_joins == 0 and a.shuffle_hash_joins == 0, a.text
    assert "CartesianProduct" not in a.text
    assert a.broadcast_nl_joins >= 1, a.text
    assert "SPARK_PARTITION_ID" in a.text.upper(), a.text


def test_hybrid_rrf_fusion_is_bounded_no_corpus_sort(spark):
    """doc_hybrid_rrf_topk (r14): the fusion layer only ever sees the two
    pre-bounded top-k lists — the corpus-side work stays inside the BM25
    and cosine rank stages (both two-phase), so the plan carries their
    pins (no cartesian, no Python stages) and the fused window adds no
    corpus-wide sort (every Sort under the final window follows a rank
    exchange over bounded rows)."""
    with no_aqe(spark):
        a = audit_plan(_q("doc_hybrid_rrf_topk")(spark, SF_SMOKE))
    assert a.python_stages == 0, a.text
    assert "CartesianProduct" not in a.text
    assert "SPARK_PARTITION_ID" in a.text.upper(), a.text


def test_hybrid_artifact_sparse_leg_reads_only_the_index(spark):
    """doc_hybrid_rrf_artifact_topk (r14): the fused plan's scans are the
    BM25 index parquet (sparse leg) and embeddings.parquet (dense leg) —
    documents.parquet appears NOWHERE, so the sparse leg provably serves
    from the artifact inside the fusion too, not just standalone."""
    with no_aqe(spark):
        a = audit_plan(_q("doc_hybrid_rrf_artifact_topk")(spark, SF_SMOKE))
    locs = " ".join(s.get("location", "") for s in a.scans)
    assert "bm25_index_" in locs, locs
    assert "embeddings.parquet" in locs, locs
    assert "documents.parquet" not in locs, locs
    assert a.python_stages == 0
