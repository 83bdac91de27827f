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


def register(name: str, oracle: str | None = None, description: str = "", bench: bool = False):
    def deco(fn):
        REGISTRY[name] = Query(
            name=name, fn=fn, oracle=oracle, description=description, bench=bench
        )
        return fn

    return deco


def spark_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in REGISTRY.items()}


def oracle_queries() -> dict[str, str]:
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}
