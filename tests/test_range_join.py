"""Bin-bucketed range join: exactness vs a nested-loop reference, closed
variants, timestamp handling, and the no-cartesian plan guarantee."""

import pyspark.sql.functions as F
import pytest

from duckpipe_spark.operators.range_join import range_join


def _points(spark, vals):
    return spark.createDataFrame([(i, float(v)) for i, v in enumerate(vals)], "pid int, p double")


def _intervals(spark, spans):
    return spark.createDataFrame(
        [(i, float(lo), float(hi)) for i, (lo, hi) in enumerate(spans)],
        "iid int, lo double, hi double",
    )


def _ref_pairs(vals, spans, closed):
    out = set()
    for pid, p in enumerate(vals):
        for iid, (lo, hi) in enumerate(spans):
            if closed == "left":
                ok = lo <= p < hi
            elif closed == "right":
                ok = lo < p <= hi
            else:
                ok = lo <= p <= hi
            if ok:
                out.add((pid, iid))
    return out


@pytest.mark.parametrize("closed", ["left", "right", "both"])
@pytest.mark.parametrize("bin_width", [1, 3, 10, 1000])
def test_matches_nested_loop_reference(spark, closed, bin_width):
    """Every (point, interval) pair appears exactly once, for bin widths far
    smaller and far larger than the interval lengths (correctness must not
    depend on the tuning knob)."""
    vals = [0, 1, 2.5, 3, 7, 9.99, 10, 10.01, -5, -0.001, 42]
    spans = [(0, 10), (2.5, 3), (9.99, 10.01), (-7, -4), (10, 10), (40, 50)]
    got = (
        range_join(
            _points(spark, vals),
            _intervals(spark, spans),
            "p",
            "lo",
            "hi",
            bin_width=bin_width,
            closed=closed,
        )
        .select("pid", "iid")
        .collect()
    )
    pairs = [(r.pid, r.iid) for r in got]
    assert len(pairs) == len(set(pairs)), "duplicate pair emitted"
    assert set(pairs) == _ref_pairs(vals, spans, closed)


def test_equi_keys_restrict_matches(spark):
    pts = spark.createDataFrame([("a", 5.0), ("b", 5.0)], "k string, p double")
    ivs = spark.createDataFrame([("a", 0.0, 10.0)], "k string, lo double, hi double")
    got = range_join(pts, ivs, "p", "lo", "hi", bin_width=4, equi_keys=["k"]).collect()
    assert [(r.k, r.p) for r in got] == [("a", 5.0)]


def test_timestamp_ntz_points_and_bounds(spark):
    pts = spark.sql(
        "SELECT * FROM VALUES (1, TIMESTAMP_NTZ'2024-01-01 00:30:00'),"
        " (2, TIMESTAMP_NTZ'2024-01-01 02:00:00') AS t(pid, ts)"
    )
    ivs = spark.sql(
        "SELECT 10 AS iid, TIMESTAMP_NTZ'2024-01-01 00:00:00' AS lo,"
        " TIMESTAMP_NTZ'2024-01-01 01:00:00' AS hi"
    )
    got = range_join(pts, ivs, "ts", "lo", "hi", bin_width=3600 * 1_000_000).collect()
    assert [r.pid for r in got] == [1]


def test_plan_is_equi_join_not_nested_loop(spark):
    """The point of the operator: the physical plan must be a hash/sort-merge
    equi-join on the bin id — never BroadcastNestedLoopJoin or
    CartesianProduct, whose cost is |P|x|I|."""
    vals = range(100)
    spans = [(i, i + 5) for i in range(0, 100, 7)]
    df = range_join(
        _points(spark, vals), _intervals(spark, spans), "p", "lo", "hi", bin_width=5
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Join" in plan


def test_validation(spark):
    p, i = _points(spark, [1]), _intervals(spark, [(0, 2)])
    with pytest.raises(ValueError):
        range_join(p, i, "p", "lo", "hi", bin_width=0)
    with pytest.raises(ValueError):
        range_join(p, i, "p", "lo", "hi", bin_width=1, closed="open")


def test_exact_bins_at_epoch_scale_bigints(spark):
    """Integer keys near 2^62 with points exactly on / adjacent to bin
    edges: the BIGINT floor-division path must place every edge value in
    its true bin and the join must be exact (double division would shift
    bins by a ULP here; membership stays correct either way — this pins
    the stronger bin-alignment property via end-to-end results)."""
    bw = 3_600_000_000
    k = 1_280_000_000
    edge = k * bw  # ~4.6e18, beyond double's 2^53 exact-integer range
    pts = spark.createDataFrame(
        [(1, edge - 1), (2, edge), (3, edge + 1), (4, edge - bw)],
        "pid int, p bigint",
    )
    ivs = spark.createDataFrame(
        [(10, edge - bw, edge), (11, edge, edge + bw)],
        "iid int, lo bigint, hi bigint",
    )
    got = sorted(
        (r.pid, r.iid)
        for r in range_join(pts, ivs, "p", "lo", "hi", bin_width=bw).collect()
    )
    # closed="left": [lo, hi)
    assert got == [(1, 10), (2, 11), (3, 11), (4, 10)]


def test_negative_integer_keys_floor_not_trunc(spark):
    """pmod-based floor division must bin negative integers like floor
    (-1 -> bin -1 for width 10), not like truncation (bin 0)."""
    pts = spark.createDataFrame([(1, -1), (2, -10), (3, -11)], "pid int, p bigint")
    ivs = spark.createDataFrame([(10, -10, 0)], "iid int, lo bigint, hi bigint")
    got = sorted(
        (r.pid, r.iid)
        for r in range_join(pts, ivs, "p", "lo", "hi", bin_width=10).collect()
    )
    assert got == [(1, 10), (2, 10)]
