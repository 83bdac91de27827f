"""Structured Streaming tests: file source → memory sink, incremental
micro-batches, streaming results equal the batch twins."""

import pyspark.sql.functions as F
import pytest

from duckpipe_spark.sources.tables import load_table
from duckpipe_spark.streaming import (
    read_event_stream,
    session_windows,
    sessionize_stateful,
    windowed_rollup,
)
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def event_files(tmp_path_factory, spark):
    """Split the events table into 3 parquet files (3 micro-batches),
    partitioned by time so later files carry later events."""
    d = tmp_path_factory.mktemp("eventstream")
    ev = load_table(spark, SF_SMOKE, "events").orderBy("ts")
    pdf = ev.toPandas()
    n = len(pdf)
    for i, chunk in enumerate([pdf.iloc[: n // 3], pdf.iloc[n // 3 : 2 * n // 3], pdf.iloc[2 * n // 3 :]]):
        spark.createDataFrame(chunk).coalesce(1).write.parquet(f"{d}/batch{i}")
    files = [str(p) for p in sorted(d.glob("batch*/*.parquet"))]
    stream_dir = d / "stream"
    stream_dir.mkdir()
    import os
    import shutil

    for i, f in enumerate(files):
        dst = stream_dir / f"part-{i:03d}.parquet"
        shutil.copy(f, dst)
        # FileStreamSource orders micro-batches by modification time; copies
        # land in the same mtime tick, which makes processing order (and
        # therefore watermark advancement) nondeterministic. Stamp strictly
        # increasing mtimes so batch i is always processed before batch i+1.
        os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))
    return str(stream_dir)


def _run_stream(spark, sdf, name, mode="complete", timeout=120):
    import tempfile

    ckpt = tempfile.mkdtemp(prefix=f"ckpt-{name}-")
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(timeout), "stream did not terminate in time"
    return spark.table(name)


def test_windowed_rollup_matches_batch(spark, event_files, tmp_path):
    stream = read_event_stream(spark, event_files, max_files_per_trigger=1)
    got = _run_stream(spark, windowed_rollup(stream), "rollup_t").toPandas()

    batch = load_table(spark, SF_SMOKE, "events")
    exp = windowed_rollup(batch).toPandas()
    got_s = got.sort_values(["window_start", "event_type"]).reset_index(drop=True)
    exp_s = exp.sort_values(["window_start", "event_type"]).reset_index(drop=True)
    assert len(got_s) == len(exp_s)
    assert (got_s["n_events"].to_numpy() == exp_s["n_events"].to_numpy()).all()
    assert abs(got_s["sum_value"].to_numpy() - exp_s["sum_value"].to_numpy()).max() < 1e-6


def test_session_windows_matches_batch(spark, event_files):
    stream = read_event_stream(spark, event_files, max_files_per_trigger=1)
    # watermark=None → no state eviction → complete-mode output equals batch
    got = _run_stream(spark, session_windows(stream, watermark=None), "sess_t").toPandas()
    batch = load_table(spark, SF_SMOKE, "events")
    exp = session_windows(batch).toPandas()
    g = got.sort_values(["user_id", "session_start"]).reset_index(drop=True)
    e = exp.sort_values(["user_id", "session_start"]).reset_index(drop=True)
    assert len(g) == len(e)
    assert (g["n_events"].to_numpy() == e["n_events"].to_numpy()).all()
    # session counts per user must also equal the lag/cumsum batch definition
    n_sessions = g.groupby("user_id").size()
    from duckpipe_spark.queries.events_q import sessionize_users

    lag_based = sessionize_users(spark, SF_SMOKE).toPandas().set_index("user_id")
    for uid, cnt in n_sessions.items():
        assert cnt == lag_based.loc[uid, "n_sessions"]


def test_stateful_sessionizer_closes_sessions(spark, event_files):
    # ProcessingTimeTimeout is incompatible with availableNow termination
    # (Spark keeps the query alive for pending timeouts — the pre-r12 form
    # of this test silently read a partial sink when awaitTermination(120)
    # timed out): run the sessionizer the way production would, on a
    # processing-time trigger with a short idle flush, poll the sink up to
    # the batch twin's full session count, then stop explicitly.
    import tempfile
    import time

    stream = read_event_stream(spark, event_files, max_files_per_trigger=1)
    batch_sessions = session_windows(load_table(spark, SF_SMOKE, "events")).toPandas()
    ckpt = tempfile.mkdtemp(prefix="ckpt-sess-state-")
    q = (
        sessionize_stateful(stream, flush_timeout_ms=3_000)
        .writeStream.format("memory")
        .queryName("sess_state")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 240
        while time.time() < deadline:
            if spark.table("sess_state").count() >= len(batch_sessions):
                break
            time.sleep(2)
    finally:
        q.stop()
    got = spark.table("sess_state").toPandas()
    # with the state store drained by the idle flush, append mode has
    # emitted EVERY session (gap-closed and idle-flushed) — the full
    # batch session set, exactly
    merged = got.merge(
        batch_sessions,
        on=["user_id", "session_start"],
        how="outer",
        suffixes=("", "_b"),
        indicator=True,
    )
    assert (merged["_merge"] == "both").all(), merged[merged["_merge"] != "both"]
    assert (merged["n_events"] == merged["n_events_b"]).all()
    assert len(got) > 0


def test_streaming_dedup_drops_replayed_events(spark, event_files, tmp_path):
    import shutil
    from duckpipe_spark.streaming import dedup_event_stream

    # replay the first file as a later duplicate delivery
    dup_dir = tmp_path / "dupstream"
    dup_dir.mkdir()
    import glob

    import os

    files = sorted(glob.glob(f"{event_files}/*.parquet"))
    for i, f in enumerate(files):
        dst = dup_dir / f"part-{i:03d}.parquet"
        shutil.copy(f, dst)
        os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))
    replay = dup_dir / "part-900-replay.parquet"
    shutil.copy(files[0], replay)
    # the replayed duplicate must be *processed last* (mtime ordering), after
    # the originals — that is the delivery pattern the dedup operator handles
    os.utime(replay, (1_700_000_000 + len(files), 1_700_000_000 + len(files)))

    stream = read_event_stream(spark, str(dup_dir), max_files_per_trigger=1)
    out = _run_stream(spark, dedup_event_stream(stream), "dedup_t", mode="append")
    got = out.toPandas()
    n_unique = load_table(spark, SF_SMOKE, "events").select("event_id").distinct().count()
    assert len(got) == n_unique
    assert got["event_id"].is_unique


def test_stream_static_enrichment_matches_batch(spark, event_files):
    from duckpipe_spark.streaming import enrich_with_dimension

    dim = load_table(spark, SF_SMOKE, "customer")
    stream = read_event_stream(spark, event_files, max_files_per_trigger=1)
    got = _run_stream(
        spark, enrich_with_dimension(stream, dim), "enrich_t", mode="append"
    ).toPandas()

    batch = load_table(spark, SF_SMOKE, "events")
    exp = enrich_with_dimension(batch, dim).toPandas()
    key = ["event_id"]
    got_s = got.sort_values(key).reset_index(drop=True)
    exp_s = exp.sort_values(key).reset_index(drop=True)
    assert len(got_s) == len(exp_s)
    assert (got_s["c_mktsegment"].fillna("") == exp_s["c_mktsegment"].fillna("")).all()
    # at least some events matched a dimension row
    assert got_s["c_mktsegment"].notna().any()


def test_stream_stream_interval_join_matches_batch(spark, event_files):
    from duckpipe_spark.streaming import join_click_purchase_streams

    def split(df):
        clicks = df.where(F.col("event_type") == "click")
        purchases = df.where(F.col("event_type") == "purchase")
        return clicks, purchases

    sc, sp = split(read_event_stream(spark, event_files, max_files_per_trigger=1))
    got = _run_stream(
        spark, join_click_purchase_streams(sc, sp), "ssjoin_t", mode="append"
    ).toPandas()

    bc, bp = split(load_table(spark, SF_SMOKE, "events"))
    exp = join_click_purchase_streams(bc, bp).toPandas()

    key = ["click_id", "purchase_ts"]
    got_s = got.sort_values(key).reset_index(drop=True)
    exp_s = exp.sort_values(key).reset_index(drop=True)
    assert len(got_s) == len(exp_s) and len(exp_s) > 0
    assert (got_s["purchase_value"].round(6) == exp_s["purchase_value"].round(6)).all()


def test_transform_with_state_running_totals(spark, event_files):
    """transformWithState (Spark 4 typed stateful API): the last emitted
    update per user must equal the batch groupBy aggregate once the stream
    drains. Requires the RocksDB state store provider and protobuf (the
    state-server wire protocol) — skipped where protobuf isn't installed."""
    pytest.importorskip("google.protobuf")
    from duckpipe_spark.streaming import running_totals_stateful

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = read_event_stream(spark, event_files, max_files_per_trigger=1)
        out = _run_stream(spark, running_totals_stateful(stream), "run_totals", mode="update")
        got = out.toPandas()
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)

    # memory sink in update mode appends every emitted update; the final
    # state per user is the row with the max n_events (totals only grow)
    final = got.sort_values("n_events").groupby("user_id").tail(1).set_index("user_id")
    batch = (
        load_table(spark, SF_SMOKE, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .toPandas()
        .set_index("user_id")
    )
    assert set(final.index) == set(batch.index)
    for uid in batch.index:
        assert final.loc[uid, "n_events"] == batch.loc[uid, "n_events"]
        assert abs(final.loc[uid, "sum_value"] - batch.loc[uid, "sum_value"]) < 1e-6


def test_cdc_stream_folds_into_snapshot(spark, event_files, tmp_path):
    """apply_cdc_stream: after all micro-batches, the parquet snapshot holds
    exactly the LAST event per user (keyed upsert), matching the batch
    window computation over the same data."""
    from duckpipe_spark.streaming import apply_cdc_stream

    stream = read_event_stream(spark, event_files, max_files_per_trigger=1).select(
        "user_id", "event_id", "event_type", "value"
    )
    snap = str(tmp_path / "user_state")
    ckpt = str(tmp_path / "cdc_ckpt")
    q = apply_cdc_stream(stream, snap, key="user_id", order_col="event_id", checkpoint=ckpt)
    assert q.awaitTermination(120), "cdc stream did not terminate in 120s"

    got = (
        spark.read.parquet(snap)
        .orderBy("user_id")
        .toPandas()
        .set_index("user_id")
    )
    from pyspark.sql import Window

    ev = load_table(spark, SF_SMOKE, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("event_id").desc())
    exp = (
        ev.select("user_id", "event_id", "event_type", "value")
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
        .toPandas()
        .set_index("user_id")
    )
    assert len(got) == len(exp)
    assert (got["event_id"].sort_index() == exp["event_id"].sort_index()).all()
    assert (got["event_type"].sort_index() == exp["event_type"].sort_index()).all()


def test_sliding_windowed_rollup_matches_batch(spark, event_files):
    """Sliding windows (1h/30min): complete-mode streaming result equals
    the batch twin (each event expands into two overlapping windows)."""
    stream = read_event_stream(spark, event_files, max_files_per_trigger=1)
    got = _run_stream(
        spark, windowed_rollup(stream, window="1 hour", slide="30 minutes"), "slide_t"
    ).toPandas()
    batch = load_table(spark, SF_SMOKE, "events")
    exp = windowed_rollup(batch, window="1 hour", slide="30 minutes").toPandas()
    key = ["window_start", "event_type"]
    g = got.sort_values(key).reset_index(drop=True)
    e = exp.sort_values(key).reset_index(drop=True)
    assert len(g) == len(e) > 0
    assert (g["n_events"].to_numpy() == e["n_events"].to_numpy()).all()


def test_cdc_batch_apply_is_idempotent(spark, tmp_path):
    """Re-applying the same CDC batch leaves the snapshot unchanged — the
    property that makes foreachBatch's replay-on-failure delivery safe."""
    from duckpipe_spark.streaming import apply_cdc_batch

    snap = str(tmp_path / "idem_snap")
    base = load_table(spark, SF_SMOKE, "orders").select("o_orderkey", "o_totalprice").limit(200)
    batch = base.limit(20).withColumn("o_totalprice", F.col("o_totalprice") * 3)

    apply_cdc_batch(spark, base, snap, key="o_orderkey", order_col="o_orderkey")
    apply_cdc_batch(spark, batch, snap, key="o_orderkey", order_col="o_orderkey")
    once = {(r.o_orderkey, round(r.o_totalprice, 4)) for r in spark.read.parquet(snap).collect()}
    apply_cdc_batch(spark, batch, snap, key="o_orderkey", order_col="o_orderkey")
    twice = {(r.o_orderkey, round(r.o_totalprice, 4)) for r in spark.read.parquet(snap).collect()}
    assert once == twice
    assert len(once) == 200


def _snap_rows(spark, snap):
    return {(r.o_orderkey, round(r.o_totalprice, 4)) for r in spark.read.parquet(snap).collect()}


def test_cdc_swap_recovers_from_any_crash_point(spark, tmp_path):
    """Crash-safety of the snapshot swap: simulate every interruption state
    the swap can leave behind and check the next apply_cdc_batch recovers
    without losing previously merged state."""
    import shutil
    from pathlib import Path

    from duckpipe_spark.streaming import apply_cdc_batch

    snap = str(tmp_path / "crash_snap")
    base = load_table(spark, SF_SMOKE, "orders").select("o_orderkey", "o_totalprice").limit(100)
    apply_cdc_batch(spark, base, snap, key="o_orderkey", order_col="o_orderkey")
    merged = _snap_rows(spark, snap)
    batch = base.limit(10).withColumn("o_totalprice", F.col("o_totalprice") * 2)

    # state A: crash between demote(live->old) and promote(tmp->live):
    # live missing, complete tmp + old present -> replay promotes tmp
    shutil.copytree(snap, snap + ".tmp")
    Path(snap).rename(snap + ".old")
    apply_cdc_batch(spark, batch, snap, key="o_orderkey", order_col="o_orderkey")
    after = _snap_rows(spark, snap)
    assert len(after) == 100 and after != merged  # updates applied on FULL prior state
    assert not Path(snap + ".tmp").exists() and not Path(snap + ".old").exists()

    # state B: crash mid-write of tmp (no _SUCCESS): live intact -> stale tmp dropped
    Path(snap + ".tmp").mkdir()
    (Path(snap + ".tmp") / "part-00000.parquet").write_bytes(b"garbage")
    apply_cdc_batch(spark, base, snap, key="o_orderkey", order_col="o_orderkey")
    assert len(_snap_rows(spark, snap)) == 100
    assert not Path(snap + ".tmp").exists()

    # state C: crash after demote with INCOMPLETE tmp: roll back to old
    state = _snap_rows(spark, snap)
    Path(snap).rename(snap + ".old")
    Path(snap + ".tmp").mkdir()
    (Path(snap + ".tmp") / "part-00000.parquet").write_bytes(b"garbage")
    apply_cdc_batch(spark, base.limit(0), snap, key="o_orderkey", order_col="o_orderkey")
    assert _snap_rows(spark, snap) == state  # nothing lost, empty batch is a no-op merge


def test_latest_per_key_breaks_order_ties_deterministically(spark):
    """Two CDC rows with equal (key, order_col) must elect the same winner
    on every run: the tie-break orders by the remaining payload columns."""
    from duckpipe_spark.streaming import latest_per_key

    rows = [(1, 10, "b"), (1, 10, "a"), (2, 5, "x")]
    df = spark.createDataFrame(rows, "k int, ord int, payload string").repartition(8)
    for _ in range(3):
        got = {(r.k, r.payload) for r in latest_per_key(df, "k", "ord").collect()}
        assert got == {(1, "b"), (2, "x")}  # desc tie-break: 'b' > 'a'


def test_streaming_hll_registers_equal_batch(spark, event_files):
    """The HLL sketch builds incrementally on a stream: MAX-per-bucket is a
    streaming-safe aggregate (monotone, order-free), so the registers after
    the stream drains — and therefore the estimate — must equal the batch
    sketch bit for bit. This is the streaming half of the sketch family's
    mergeability story: micro-batches are just another sharding."""
    from duckpipe_spark.functions.sketches import hll_estimate, hll_registers

    stream = read_event_stream(spark, event_files, max_files_per_trigger=1)
    sreg = hll_registers(
        stream.select(F.lit("g").alias("grp"), "user_id"), "user_id", ["grp"]
    )
    got = _run_stream(spark, sreg, "hll_regs_t").toPandas()

    batch = load_table(spark, SF_SMOKE, "events")
    exp = hll_registers(
        batch.select(F.lit("g").alias("grp"), "user_id"), "user_id", ["grp"]
    ).toPandas()

    g = got.sort_values("bucket").reset_index(drop=True)[["bucket", "reg"]]
    e = exp.sort_values("bucket").reset_index(drop=True)[["bucket", "reg"]]
    assert g.equals(e)

    est_s = hll_estimate(
        spark.createDataFrame(got), ["grp"]
    ).collect()[0].hll_distinct
    est_b = hll_estimate(
        hll_registers(batch.select(F.lit("g").alias("grp"), "user_id"), "user_id", ["grp"]),
        ["grp"],
    ).collect()[0].hll_distinct
    n_true = batch.select("user_id").distinct().count()
    assert est_s == est_b
    assert abs(est_s - n_true) / n_true < 0.25


def test_streaming_cm_and_bloom_equal_batch(spark, event_files):
    """The other two mergeable sketches build incrementally too: Count-Min
    cells are SUM-combinable and Bloom words are bit_or-combinable, both
    order-free, so the drained stream's sketch state equals the batch
    sketch exactly — micro-batches are just another sharding."""
    from duckpipe_spark.functions.sketches import bloom_build, cm_sketch

    stream = read_event_stream(spark, event_files, max_files_per_trigger=1)
    batch = load_table(spark, SF_SMOKE, "events")

    got_cm = _run_stream(
        spark, cm_sketch(stream.select("user_id"), "user_id"), "cm_t"
    ).toPandas()
    exp_cm = cm_sketch(batch.select("user_id"), "user_id").toPandas()
    key = ["row", "cell"]
    assert (
        got_cm.sort_values(key).reset_index(drop=True)[key + ["cnt"]]
        .equals(exp_cm.sort_values(key).reset_index(drop=True)[key + ["cnt"]])
    )

    got_bl = _run_stream(
        spark, bloom_build(stream.select("user_id"), "user_id"), "bloom_t"
    ).toPandas()
    exp_bl = bloom_build(batch.select("user_id"), "user_id").toPandas()
    assert (
        got_bl.sort_values("word").reset_index(drop=True)[["word", "bits"]]
        .equals(exp_bl.sort_values("word").reset_index(drop=True)[["word", "bits"]])
    )


def test_streaming_decontamination_matches_batch(spark, tmp_path):
    """The ingest-time shape of `lsh_join`: a DOCUMENT stream is minhashed
    and band-joined against the static benchmark corpus, candidates
    verified with the exact integer Jaccard — every stage (mapInPandas
    signatures, band explode, stream-static joins) is streaming-legal, so
    the drained stream must produce exactly the batch join's matches."""
    import pyspark.sql.functions as F

    from duckpipe_spark.functions.dedup import (
        banded_keys,
        lsh_join,
        minhash_signatures,
        shingle_hash_array,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    corpus = docs.where(F.col("doc_id") % 7 != 3)
    benchmark = docs.where(F.col("doc_id") % 7 == 3)
    expected = sorted(
        (r.id_a, r.id_b, r.n_inter, r.n_union)
        for r in lsh_join(corpus, benchmark, min_jaccard_pct=20).collect()
    )

    # stream the corpus in 3 files
    d = tmp_path / "docstream"
    d.mkdir()
    pdf = corpus.toPandas()
    n = len(pdf)
    for i, chunk in enumerate([pdf[: n // 3], pdf[n // 3 : 2 * n // 3], pdf[2 * n // 3 :]]):
        spark.createDataFrame(chunk).coalesce(1).write.parquet(str(d / f"b{i}"))
    stream = (
        spark.readStream.schema(corpus.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d / "b*"))
    )

    lb = banded_keys(minhash_signatures(stream)).select(
        F.col("id").alias("id_a"), "bidx", "bk"
    )
    rb = banded_keys(minhash_signatures(benchmark)).select(
        F.col("id").alias("id_b"), "bidx", "bk"
    )
    cand = lb.join(rb, ["bidx", "bk"]).select("id_a", "id_b").dropDuplicates()
    la = shingle_hash_array(stream).select(F.col("id").alias("id_a"), F.col("hvs").alias("_ha"))
    ra = shingle_hash_array(benchmark).select(F.col("id").alias("id_b"), F.col("hvs").alias("_hb"))
    n_inter = F.size(F.array_intersect("_ha", "_hb"))
    verified = (
        cand.join(la, "id_a")
        .join(ra, "id_b")
        .select(
            "id_a", "id_b",
            n_inter.cast("bigint").alias("n_inter"),
            (F.size("_ha") + F.size("_hb") - n_inter).cast("bigint").alias("n_union"),
        )
        .where((F.col("n_inter") > 0) & (F.lit(100) * F.col("n_inter") >= F.lit(20) * F.col("n_union")))
    )
    got = _run_stream(spark, verified, "decontam_t", mode="append")
    assert sorted(map(tuple, got.collect())) == expected


def test_streaming_quantile_sketch_equals_batch(spark, event_files):
    """Fourth sketch-family streaming≡batch twin: the bounded-state
    (O(k)/group) streaming sampled-quantile sketch, drained over the same
    rows, is bit-identical to the batch operator — same priorities, same
    rank cut, same lower-index quantile rule. Cents conversion happens in
    Spark on BOTH sides so the twins share one rounding expression."""
    import pyspark.sql.functions as F

    from duckpipe_spark.functions.sketches import sampled_quantiles
    from duckpipe_spark.streaming.events import read_event_stream
    from duckpipe_spark.streaming.quantiles import quantile_sketch_stateful

    cents = F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents")
    stream = read_event_stream(spark, event_files, max_files_per_trigger=1).select(
        "event_type", "event_id", cents
    )
    got = _run_stream(
        spark,
        quantile_sketch_stateful(stream, "cents", "event_id", "event_type", k=64),
        "qsk_t",
        mode="update",
    ).toPandas()
    # update mode re-emits a refreshed row per group each micro-batch;
    # n_seen is strictly increasing, so the final sketch is the max row
    final = got.loc[got.groupby("grp")["n_seen"].idxmax()].set_index("grp")

    batch = spark.read.parquet(event_files).select("event_type", "event_id", cents)
    exp = (
        sampled_quantiles(batch, "cents", "event_id", ["event_type"], k=64)
        .toPandas()
        .set_index("event_type")
    )
    assert set(final.index) == set(exp.index)
    for g in exp.index:
        assert int(final.loc[g, "n_sampled"]) == int(exp.loc[g, "n_sampled"]), g
        for q in (25, 50, 75, 90, 99):
            assert int(final.loc[g, f"q{q}"]) == int(exp.loc[g, f"q{q}"]), (g, q)
    # the streaming side's state really was bounded: n_seen exceeds k for
    # at least one group (otherwise the test proves nothing about the cut)
    assert (final["n_seen"] > 64).any()


def test_streaming_quantile_sketch_survives_restart(spark, event_files, tmp_path):
    """Crash-at-batch-boundary resume: drain the first file with one
    query, then restart a NEW query on the SAME checkpoint after the rest
    of the corpus arrives. The resumed sketch must absorb only the new
    files (state restored, no reprocessing) and finish bit-identical to
    the batch operator over the whole corpus."""
    import os
    import shutil

    import pyspark.sql.functions as F

    from duckpipe_spark.functions.sketches import sampled_quantiles
    from duckpipe_spark.streaming.events import read_event_stream
    from duckpipe_spark.streaming.quantiles import quantile_sketch_stateful

    src_files = sorted(
        f for f in os.listdir(event_files) if f.endswith(".parquet")
    )
    assert len(src_files) >= 3
    stage = tmp_path / "qsk_restart_stream"
    stage.mkdir()
    ckpt = str(tmp_path / "qsk_restart_ckpt")
    cents = F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents")

    def run(name):
        import pandas as pd

        stream = read_event_stream(spark, str(stage), max_files_per_trigger=1).select(
            "event_type", "event_id", cents
        )
        sk = quantile_sketch_stateful(stream, "cents", "event_id", "event_type", k=64)
        # foreachBatch, not the memory sink: memory-sink queries refuse
        # checkpoint recovery, and recovery is the point of this test
        emitted = []
        q = (
            sk.writeStream.foreachBatch(
                lambda bdf, _id: emitted.append(bdf.toPandas())
            )
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120), "stream did not terminate in 120s"
        return pd.concat(emitted, ignore_index=True)

    # run 1: only the first file exists, then the "crash"
    shutil.copy(os.path.join(event_files, src_files[0]), stage / src_files[0])
    os.utime(stage / src_files[0], (1_700_000_000, 1_700_000_000))
    first = run("qsk_restart_a")
    assert (first.groupby("grp")["n_seen"].max() > 0).all()

    # the rest of the corpus lands; a fresh query resumes from the checkpoint
    for i, f in enumerate(src_files[1:], start=1):
        shutil.copy(os.path.join(event_files, f), stage / f)
        os.utime(stage / f, (1_700_000_000 + i, 1_700_000_000 + i))
    second = run("qsk_restart_b")
    final = second.loc[second.groupby("grp")["n_seen"].idxmax()].set_index("grp")

    batch = spark.read.parquet(event_files).select("event_type", "event_id", cents)
    exp = (
        sampled_quantiles(batch, "cents", "event_id", ["event_type"], k=64)
        .toPandas()
        .set_index("event_type")
    )
    # the resumed run only processed the NEW files, yet its final n_seen
    # covers the whole corpus: restored state, no reprocessing
    total_rows = spark.read.parquet(event_files).count()
    assert int(final["n_seen"].sum()) == total_rows
    run1_rows = int(first.groupby("grp")["n_seen"].max().sum())
    assert run1_rows < total_rows  # run 1 really was partial
    assert set(final.index) == set(exp.index)
    for g in exp.index:
        assert int(final.loc[g, "n_sampled"]) == int(exp.loc[g, "n_sampled"]), g
        for q in (25, 50, 75, 90, 99):
            assert int(final.loc[g, f"q{q}"]) == int(exp.loc[g, f"q{q}"]), (g, q)


@pytest.fixture(scope="module")
def doc_stream_files(tmp_path_factory, spark):
    """A landing directory of 3 id-ordered document drops with CROSS-drop
    exact duplicates: the base corpus plus a re-id'd copy of 40% of it
    (same text → same fingerprint, id shifted past the whole corpus so
    every duplicate arrives AFTER its original)."""
    import os

    import pyspark.sql.functions as F

    d = tmp_path_factory.mktemp("docstream")
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    dups = docs.where(F.col("doc_id") % 5 < 2).withColumn(
        "doc_id", F.col("doc_id") + 1_000_000
    )
    pdf = docs.unionByName(dups).orderBy("doc_id").toPandas()
    n = len(pdf)
    stream_dir = d / "stream"
    stream_dir.mkdir()
    for i, chunk in enumerate(
        [pdf.iloc[: n // 3], pdf.iloc[n // 3 : 2 * n // 3], pdf.iloc[2 * n // 3 :]]
    ):
        f = str(stream_dir / f"part-{i:03d}.parquet")
        spark.createDataFrame(chunk).coalesce(1).toPandas().to_parquet(f)
        os.utime(f, (1_700_000_000 + i, 1_700_000_000 + i))
    return str(stream_dir)


def test_streaming_incremental_dedup_equals_batch(spark, doc_stream_files):
    """Continuous-crawl ingestion: first-arrival-wins exact dedup with ONE
    long of state per distinct fingerprint. With id-ordered arrival the
    accepted set must be bit-identical to batch exact_dedup_groups'
    canonical ids — duplicates arriving in LATER micro-batches (and inside
    the same batch) are all rejected."""
    from duckpipe_spark.functions.dedup import exact_dedup_groups
    from duckpipe_spark.streaming.corpus import (
        incremental_dedup_stateful,
        read_document_stream,
    )

    batch = spark.read.parquet(doc_stream_files)
    stream = read_document_stream(spark, doc_stream_files, batch.schema)
    got = _run_stream(
        spark, incremental_dedup_stateful(stream), "incdedup_t", mode="append"
    )
    expected = exact_dedup_groups(batch).select("fp", F.col("canonical_id").alias("doc_id"))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, expected.collect()))
    # the dedup actually did something: fewer accepted than arrived
    assert got.count() < batch.count()


def test_streaming_incremental_dedup_survives_restart(spark, doc_stream_files, tmp_path):
    """Checkpoint crash-resume for the ingestion dedup: drain drop 0, kill
    the query, land the remaining drops, resume a NEW query on the SAME
    checkpoint. The fingerprint state must be restored (no fingerprint
    accepted twice across the runs) and the union of accepted rows must
    still equal the batch canonical set."""
    import os
    import shutil

    import pandas as pd

    from duckpipe_spark.functions.dedup import exact_dedup_groups
    from duckpipe_spark.streaming.corpus import (
        incremental_dedup_stateful,
        read_document_stream,
    )

    src_files = sorted(f for f in os.listdir(doc_stream_files) if f.endswith(".parquet"))
    assert len(src_files) == 3
    stage = tmp_path / "incdedup_restart_stream"
    stage.mkdir()
    ckpt = str(tmp_path / "incdedup_restart_ckpt")
    schema = spark.read.parquet(doc_stream_files).schema

    def run():
        stream = read_document_stream(spark, str(stage), schema)
        emitted = []
        q = (
            incremental_dedup_stateful(stream)
            .writeStream.foreachBatch(lambda bdf, _id: emitted.append(bdf.toPandas()))
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120), "stream did not terminate in 120s"
        return pd.concat(emitted, ignore_index=True) if emitted else pd.DataFrame(
            columns=["fp", "doc_id"]
        )

    shutil.copy(os.path.join(doc_stream_files, src_files[0]), stage / src_files[0])
    os.utime(stage / src_files[0], (1_700_000_000, 1_700_000_000))
    first = run()
    assert len(first) > 0

    for i, f in enumerate(src_files[1:], start=1):
        shutil.copy(os.path.join(doc_stream_files, f), stage / f)
        os.utime(stage / f, (1_700_000_000 + i, 1_700_000_000 + i))
    second = run()

    both = pd.concat([first, second], ignore_index=True)
    # restored state: no fingerprint accepted twice across the crash
    assert both["fp"].is_unique
    # run 2 really only processed the new drops
    assert len(second) < len(both)
    expected = (
        exact_dedup_groups(spark.read.parquet(doc_stream_files))
        .select("fp", F.col("canonical_id").alias("doc_id"))
        .toPandas()
    )
    got = both.sort_values(["fp"]).reset_index(drop=True)
    exp = expected.sort_values(["fp"]).reset_index(drop=True)
    assert got["fp"].tolist() == exp["fp"].tolist()
    assert got["doc_id"].astype("int64").tolist() == exp["doc_id"].astype("int64").tolist()


def test_gopher_and_chunking_stream_as_projections(spark, tmp_path):
    """The r7 text projections (Gopher rule battery, context-window
    chunking, BPE encode with a pre-trained merge list) are stateless, so
    they run unchanged on a readStream and the drained append-mode sink
    equals the batch result — the property that lets a continuous-crawl
    pipeline score/chunk/encode documents on arrival."""
    import pyspark.sql.functions as F

    from duckpipe_spark.functions.bpe import bpe_token_counts
    from duckpipe_spark.functions.text import chunk_documents, gopher_quality_flags
    from duckpipe_spark.sources.tables import load_table
    from tests.conftest import SF_SMOKE
    from tests.oracle_harness import canonicalize

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    d = tmp_path / "docs"
    d.mkdir()
    pdf = docs.toPandas()
    n = len(pdf)
    for i, chunk in enumerate([pdf[: n // 2], pdf[n // 2 :]]):
        spark.createDataFrame(chunk, docs.schema).coalesce(1).write.parquet(str(d / f"b{i}"))
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d / "b*"))
    )
    from duckpipe_spark.functions.dedup import winnow_fingerprints
    from duckpipe_spark.functions.text import fim_transform

    merges = [("a", "b")]  # pre-trained merge list (training itself is batch)
    cases = [
        ("gopher_s", gopher_quality_flags),
        ("chunks_s", chunk_documents),
        ("bpe_s", lambda df: bpe_token_counts(df, merges)),
        ("fim_s", fim_transform),
        # r10: winnowing selection is doc-local (one Arrow kernel), so a
        # continuous crawl can fingerprint documents on arrival; the index
        # consumer (winnow_matches) aggregates and stays batch/incremental
        ("winnow_s", winnow_fingerprints),
    ]
    for name, op in cases:
        got = _run_stream(spark, op(stream), name, mode="append")
        want = op(docs)
        assert canonicalize(got.toPandas()) == canonicalize(want.toPandas()), name


def test_lm_score_stream_matches_batch(spark, tmp_path):
    """Train-batch / score-stream: the bigram LM trains on the static
    corpus (lm_train, persisted so the train lineage doesn't re-execute
    per micro-batch); scoring is a pure projection over a stateless
    stream-static cross join, so the drained append-mode sink equals the
    batch lm_quality_score result bit-for-bit — the train/serve split a
    production quality scorer runs."""
    import pyspark.sql.functions as F

    from duckpipe_spark.functions.selection import (
        lm_quality_score,
        lm_score_with_model,
        lm_train,
    )
    from duckpipe_spark.sources.tables import load_table
    from tests.conftest import SF_SMOKE
    from tests.oracle_harness import canonicalize

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text", "lang")
    d = tmp_path / "docs"
    d.mkdir()
    pdf = docs.toPandas()
    n = len(pdf)
    for i, chunk in enumerate([pdf[: n // 2], pdf[n // 2 :]]):
        spark.createDataFrame(chunk, docs.schema).coalesce(1).write.parquet(str(d / f"b{i}"))
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d / "b*"))
    )
    model = lm_train(docs, F.col("lang") == "en").persist()
    try:
        got = _run_stream(spark, lm_score_with_model(stream, model), "lm_s", mode="append")
        want = lm_quality_score(docs, F.col("lang") == "en")
        assert canonicalize(got.toPandas()) == canonicalize(want.toPandas())
    finally:
        model.unpersist()


def test_dsir_score_stream_matches_batch(spark, tmp_path):
    """Train-batch / score-stream DSIR: the B-row bucket model rides one
    persisted map row; scoring is a pure projection over a stateless
    stream-static cross join — append-safe, and the drained sink equals
    the same operator run on batch."""
    import pyspark.sql.functions as F

    from duckpipe_spark.functions.selection import dsir_score_with_model, dsir_train
    from duckpipe_spark.sources.tables import load_table
    from tests.conftest import SF_SMOKE
    from tests.oracle_harness import canonicalize

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text", "lang")
    d = tmp_path / "docs"
    d.mkdir()
    pdf = docs.toPandas()
    n = len(pdf)
    for i, chunk in enumerate([pdf[: n // 2], pdf[n // 2 :]]):
        spark.createDataFrame(chunk, docs.schema).coalesce(1).write.parquet(str(d / f"b{i}"))
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d / "b*"))
    )
    model = dsir_train(docs, F.col("lang") == "en").persist()
    try:
        got = _run_stream(spark, dsir_score_with_model(stream, model), "dsir_s", mode="append")
        want = dsir_score_with_model(docs, model)
        assert canonicalize(got.toPandas()) == canonicalize(want.toPandas())
    finally:
        model.unpersist()


def test_winnow_probe_stream_matches_batch(spark, tmp_path):
    """Winnow-matches streaming twin (VERDICT r10 item 7): a static
    benchmark index is winnowed once; arriving documents fingerprint
    on arrival (doc-local Arrow kernel) and probe the index through a
    stateless stream-static broadcast join. The drained append-mode sink
    equals the batch composition row-for-row, the planted verbatim
    >= w+k-1 run IS flagged (the winnowing guarantee survives the
    serving split), and the clean doc is not."""
    import pyspark.sql.functions as F

    from duckpipe_spark.functions.dedup import winnow_fingerprints
    from duckpipe_spark.streaming.corpus import winnow_probe_static
    from tests.oracle_harness import canonicalize

    shared = "alpha beta gamma delta epsilon zeta"  # w + k - 1 = 6 tokens
    bench = spark.createDataFrame(
        [
            (1, f"benchmark question one {shared} answer text here"),
            (2, "a completely unrelated benchmark prompt with other words"),
        ],
        "doc_id bigint, text string",
    )
    arriving = spark.createDataFrame(
        [
            (100, f"crawled page mentioning {shared} verbatim in the middle"),
            (101, "clean crawled page sharing no three gram with anything"),
            (102, "another clean arrival full of fresh novel vocabulary"),
        ],
        "doc_id bigint, text string",
    )
    index = winnow_fingerprints(bench).select(
        F.col("id").alias("index_id"), "fp"
    ).persist()
    try:
        d = tmp_path / "arrivals"
        d.mkdir()
        pdf = arriving.toPandas()
        for i in range(len(pdf)):  # one doc per micro-batch
            spark.createDataFrame(pdf.iloc[i : i + 1], arriving.schema).coalesce(
                1
            ).write.parquet(str(d / f"b{i}"))
        stream = (
            spark.readStream.schema(arriving.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(d / "b*"))
        )
        got = _run_stream(
            spark, winnow_probe_static(stream, index), "winnow_probe_s", mode="append"
        )
        want = winnow_probe_static(arriving, index)
        assert canonicalize(got.toPandas()) == canonicalize(want.toPandas())
        hit_ids = {r.doc_id for r in got.collect()}
        assert 100 in hit_ids, "planted verbatim run must be flagged"
        assert {r.index_id for r in got.where(F.col("doc_id") == 100).collect()} == {1}
        assert 101 not in hit_ids and 102 not in hit_ids
    finally:
        index.unpersist()


def test_bm25_serve_stream_matches_batch(spark, tmp_path):
    """BM25 serve streaming twin (r11): the index artifact is built once as
    a batch job; arriving query batches score through foreachBatch against
    the LOADED artifact with idempotent per-batch-overwrite sinks. The
    drained sink equals the batch `bm25_topk_from_index` over the union of
    queries row-for-row (queries are independent, so micro-batch
    composition cannot change any query's ranking)."""
    from duckpipe_spark.functions.text import bm25_topk_from_index, save_bm25_index
    from duckpipe_spark.sources.tables import load_table
    from duckpipe_spark.streaming.corpus import bm25_serve_stream
    from tests.oracle_harness import canonicalize

    idx = str(tmp_path / "bm25_index")
    save_bm25_index(load_table(spark, SF_SMOKE, "documents"), idx)

    queries = [
        (1, ["data", "pipeline"]),
        (2, ["model", "training", "quality"]),
        (3, ["zzz_no_such_term"]),
        (4, ["the", "document"]),
    ]
    qdir = tmp_path / "query_batches"
    qdir.mkdir()
    schema = "query_id int, terms array<string>"
    for i, q in enumerate(queries):  # one query per micro-batch
        spark.createDataFrame([q], schema).coalesce(1).write.parquet(
            str(qdir / f"b{i}")
        )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(qdir / "b*"))
    )
    sink = str(tmp_path / "scored")
    q = bm25_serve_stream(stream, idx, sink, str(tmp_path / "serve_ckpt"), k=5)
    # awaitTermination(timeout) returns False on timeout WITHOUT raising —
    # assert it, or a hung stream reads a partial sink and fails later with
    # a confusing canonicalize mismatch (ADVICE r11 item 4)
    assert q.awaitTermination(120), "bm25 serve stream did not terminate in 120s"

    got = spark.read.parquet(sink).drop("batch_id")
    want = bm25_topk_from_index(spark, idx, queries, k=5)
    assert canonicalize(got.toPandas()) == canonicalize(want.toPandas())
    got_ids = {r.query_id for r in got.select("query_id").distinct().collect()}
    want_ids = {r.query_id for r in want.select("query_id").distinct().collect()}
    # per-query presence matches the batch twin exactly; the planted
    # no-match query never surfaces and at least one real query does
    assert got_ids == want_ids and got_ids and 3 not in got_ids


def test_phash_probe_stream_matches_batch(spark, tmp_path):
    """Perceptual-hash probe streaming twin (r11): a static blocklist of
    image codes is computed once; arriving blobs fingerprint on arrival
    (doc-local Arrow kernel) and verify by exact xor+popcount against the
    broadcast index. The drained append-mode sink equals the batch
    composition row-for-row; the planted near-identical arrival IS flagged
    and the distinct arrivals are not."""
    import numpy as np
    import pandas as pd
    import pyspark.sql.functions as F

    from duckpipe_spark.functions.multimodal import image_dhash
    from duckpipe_spark.functions.png import encode_png
    from duckpipe_spark.streaming.corpus import phash_probe_static
    from tests.oracle_harness import canonicalize

    rng = np.random.default_rng(13)
    blocked = rng.integers(1, 255, size=(16, 18)).astype(np.uint8)
    perturbed = blocked.copy()
    perturbed[0::2, 0::2] += 1
    perturbed[1::2, 1::2] -= 1  # block sums unchanged -> same dHash

    index = image_dhash(
        spark.createDataFrame(
            pd.DataFrame({"blob_id": [1], "blob": [bytearray(encode_png(blocked))]})
        )
    ).select(F.col("blob_id").alias("index_id"), "h0", "h1").persist()
    try:
        arrivals = pd.DataFrame(
            {
                "blob_id": [100, 101, 102],
                "blob": [
                    bytearray(encode_png(perturbed)),
                    bytearray(encode_png(rng.integers(1, 255, (16, 18)).astype(np.uint8))),
                    bytearray(encode_png(rng.integers(1, 255, (16, 18)).astype(np.uint8))),
                ],
            }
        )
        schema = "blob_id bigint, blob binary"
        d = tmp_path / "blob_arrivals"
        d.mkdir()
        for i in range(len(arrivals)):  # one blob per micro-batch
            spark.createDataFrame(arrivals.iloc[i : i + 1], schema).coalesce(
                1
            ).write.parquet(str(d / f"b{i}"))
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(d / "b*"))
        )
        got = _run_stream(
            spark,
            phash_probe_static(stream, index, image_dhash),
            "phash_probe_s",
            mode="append",
        )
        batch = spark.createDataFrame(arrivals, schema)
        want = phash_probe_static(batch, index, image_dhash)
        assert canonicalize(got.toPandas()) == canonicalize(want.toPandas())
        hits = {(r.blob_id, r.index_id): r.hamming for r in got.collect()}
        assert hits == {(100, 1): 0}, hits
    finally:
        index.unpersist()


def test_hybrid_serve_stream_matches_batch(spark, tmp_path):
    """Hybrid serve streaming twin (r14): queries carrying BOTH legs
    (BM25 terms + dense qvec) arrive one per micro-batch and score
    against the loaded BM25 index artifact + the static embedding corpus
    through foreachBatch. The drained sink equals the batch composition
    (bm25_topk_from_index + brute_force_topk_queries + rrf_fuse) over the
    union of queries row-for-row; a terms-only query still fuses from its
    dense leg alone (NULL sparse_rank), so a hybrid server degrades
    gracefully to single-leg retrieval."""
    import numpy as np

    from duckpipe_spark.functions.similarity import (
        brute_force_topk_queries,
        rrf_fuse,
    )
    from duckpipe_spark.functions.text import bm25_topk_from_index, save_bm25_index
    from duckpipe_spark.sources.tables import load_table
    from duckpipe_spark.streaming.corpus import hybrid_serve_stream
    from tests.oracle_harness import canonicalize

    idx = str(tmp_path / "bm25_index")
    save_bm25_index(load_table(spark, SF_SMOKE, "documents"), idx)
    emb = load_table(spark, SF_SMOKE, "embeddings")

    rng = np.random.default_rng(11)
    dim = len(emb.select("embedding").first()[0])
    queries = [
        (1, ["data", "pipeline"], rng.standard_normal(dim).astype("float32").tolist()),
        (2, ["model", "training"], rng.standard_normal(dim).astype("float32").tolist()),
        # planted no-match sparse leg: fuses from the dense leg alone
        (3, ["zzz_no_such_term"], rng.standard_normal(dim).astype("float32").tolist()),
    ]
    schema = "query_id int, terms array<string>, qvec array<float>"
    qdir = tmp_path / "query_batches"
    qdir.mkdir()
    for i, q in enumerate(queries):  # one query per micro-batch
        spark.createDataFrame([q], schema).coalesce(1).write.parquet(
            str(qdir / f"b{i}")
        )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(qdir / "b*"))
    )
    sink = str(tmp_path / "fused")
    q = hybrid_serve_stream(
        stream, idx, emb, sink, str(tmp_path / "hybrid_ckpt"), k=5, cand_k=8
    )
    assert q.awaitTermination(180), "hybrid serve stream did not terminate in 180s"

    got = spark.read.parquet(sink).drop("batch_id")
    qdf = spark.createDataFrame(queries, schema)
    sparse = bm25_topk_from_index(
        spark, idx, qdf.select("query_id", F.explode("terms").alias("term")), k=8
    )
    dense = brute_force_topk_queries(emb, qdf, 8, query_vec_col="qvec")
    want = rrf_fuse(
        [
            ("sparse", sparse.select("query_id", "rank", "doc_id")),
            ("dense", dense.select("query_id", "rank", F.col("neighbor_id").alias("doc_id"))),
        ],
        k=5,
    )
    assert canonicalize(got.toPandas()) == canonicalize(want.toPandas())
    three = [r for r in got.collect() if r.query_id == 3]
    assert len(three) == 5  # dense-only leg still serves a full top-k
    assert all(r.sparse_rank is None for r in three)
