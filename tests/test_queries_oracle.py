"""Differential tests: every registered query vs its DuckDB oracle at
sf0.001 (fast smoke; the driver runs the same comparison at sf0.01)."""

import pytest

from tests.conftest import SF_SMOKE
from tests.oracle_harness import compare


def _names():
    from duckpipe_spark.queries import REGISTRY

    return list(REGISTRY)


@pytest.mark.parametrize("name", _names())
def test_query_matches_oracle(spark, name):
    r = compare(name, spark, SF_SMOKE)
    assert r.get("ok"), r


def _changed():
    from duckpipe_spark.queries import CHANGED_THIS_ROUND

    return list(CHANGED_THIS_ROUND)


@pytest.mark.parametrize("name", _changed())
def test_changed_query_matches_oracle_sf001(spark, name):
    """Changed-query tier (VERDICT r5 item 7): re-run this round's touched
    queries at sf0.01 — the driver gate's exact scale — so divergence that
    only appears above sf0.001 (sampling densities, collision counts,
    window populations) fails locally before the gate runs."""
    from tests.conftest import SF_ORACLE

    r = compare(name, spark, SF_ORACLE)
    assert r.get("ok"), r


def test_entry_contract(spark):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    df = mod.entry(spark)
    assert len(df.collect()) > 0
    q, o = mod.queries(), mod.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 13
