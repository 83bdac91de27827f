"""Behavioral tests for the geo driver queries beyond the oracle mirror:
the bounded-driver-pull cap in geo_pivot_pipeline must fall back to the
shuffle cross-join plan (and agree with the broadcast kernel) when the
decoded segment count exceeds MAX_BROADCAST_SEGMENTS."""

import pytest

from tests.conftest import SF_SMOKE


def _rows(df):
    return sorted(
        (r["id"], r["year"], round(r["D_FeatEven"], 9), round(r["D_FeatOdd"], 9))
        for r in df.collect()
    )


def test_geo_pivot_cap_fallback(spark, monkeypatch):
    from duckpipe_spark.operators import distance as dist
    from duckpipe_spark.queries.geo_q import geo_pivot_pipeline

    expected = _rows(geo_pivot_pipeline(spark, SF_SMOKE))
    assert expected  # broadcast path produced rows

    # Force the cap to engage: every segment count exceeds 1.
    monkeypatch.setattr(dist, "MAX_BROADCAST_SEGMENTS", 1)
    got = _rows(geo_pivot_pipeline(spark, SF_SMOKE))
    assert got == expected


def test_tolerant_decode_and_stats(spark):
    """decode_segments(tolerant=True) survives malformed WKB rows, and
    wkb_decode_stats counts every row into exactly one health bucket."""
    from duckpipe_spark.geo import wkb
    from duckpipe_spark.operators.features import decode_segments, wkb_decode_stats

    good = wkb.to_wkb(wkb.linestring([(0.0, 0.0), (1.0, 1.0), (2.0, 0.0)]))
    empty = wkb.to_wkb(wkb.point(float("nan"), float("nan")))
    rows = [(1, good), (2, b"\x01\x02garbage"), (3, None), (4, empty), (5, good[:7])]
    df = spark.createDataFrame(rows, "fid bigint, geometry binary")

    segs = decode_segments(df, keep_cols=["fid"], tolerant=True)
    assert {r.fid for r in segs.collect()} == {1}  # only the good row decodes

    s = wkb_decode_stats(df).collect()[0]
    assert (s.n_rows, s.n_null, s.n_malformed, s.n_empty, s.n_ok) == (5, 1, 2, 1, 1)

    # strict mode still fails loudly on the malformed row
    import pytest

    with pytest.raises(Exception):
        decode_segments(df, keep_cols=["fid"]).collect()
