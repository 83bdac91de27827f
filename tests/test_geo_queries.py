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
