"""Query registry backing ``__spark_entry__.queries()`` / ``oracle_sql()``.

Each registered query is a (Spark callable, DuckDB oracle SQL) pair over the
driver's testdata tables. The Spark side exercises an engine operator from
SURVEY.md §2; the oracle is semantically-identical ANSI SQL. Column names are
aliased identically on both sides (the driver hash-compares after sorting
columns by name).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    description: str = ""
    bench: bool = False  # include in bench.py beyond the headline list


REGISTRY: dict[str, Query] = {}

# Explicit export order for the driver contract. The driver's correctness
# harness checks the first ~50 entries of ``queries()``, so the engine's
# distinctive operator families (geo pipelines, dedup, similarity/ANN, text,
# sampling, corpus hygiene, events/streaming) must come before the TPC-H-shape
# sweep, and rows-only stubs must come last. Set by queries/__init__.py.
DRIVER_ORDER: list[str] = []


def register(name: str, oracle: str | None = None, description: str = "", bench: bool = False):
    def deco(fn):
        REGISTRY[name] = Query(
            name=name, fn=fn, oracle=oracle, description=description, bench=bench
        )
        return fn

    return deco


def _ordered_items() -> list[tuple[str, Query]]:
    """Priority names first (in DRIVER_ORDER order), then the rest in
    registration order with oracle-less (rows-only) entries last."""
    prio = {n: i for i, n in enumerate(DRIVER_ORDER)}
    names = list(REGISTRY)
    reg_ix = {n: i for i, n in enumerate(names)}

    def key(n: str):
        if n in prio:
            return (0, prio[n])
        return (1 if REGISTRY[n].oracle is not None else 2, reg_ix[n])

    return [(n, REGISTRY[n]) for n in sorted(names, key=key)]


def spark_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in _ordered_items()}


def oracle_queries() -> dict[str, str]:
    return {name: q.oracle for name, q in _ordered_items() if q.oracle is not None}
