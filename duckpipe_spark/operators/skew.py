"""Skew-safe joins: replication salting for hot join keys.

A shuffled equi-join hashes both sides on the key; one hot key (a viral
user, a null-ish sentinel, a default FK) sends its entire partition to a
single reducer and the stage runs at straggler speed. AQE's skew-join
split (`spark.sql.adaptive.skewJoin.enabled`, on in `session.py`) already
handles sort-merge cases at runtime by splitting oversized partitions —
`salted_join` is the declarative fallback for when the skew is known
up-front, AQE is unavailable (e.g. inside a cached/reused stage), or the
build side is mid-sized (too big to broadcast, small enough to replicate
``salts``×).

Mechanics (fact ⋈ dim on ``key``):

* every fact row gets a deterministic salt in ``[0, salts)`` hashed from
  the whole row — a hot key's rows spread across ``salts`` reducers;
* every dim row is replicated to ALL ``salts`` sub-keys (one
  ``explode(sequence(...))``, shuffle grows ``salts``×|dim|);
* join on ``(key, salt)`` — a plain equi-join Catalyst plans normally;
* drop the salt. Result set is EXACTLY the plain join's (salting moves
  rows between reducers, never changes matches), which is what the
  oracle-checked query pins.

The salt must be deterministic (rerun/retry-stable, partition-layout-
independent) — ``xxhash64`` of the fact row's columns, never ``rand()``
or ``spark_partition_id()``. Identical duplicate fact rows therefore
share a salt; dedupe upstream if exact-duplicate hot rows are themselves
the skew source.

Reference parity: the duckpipe reference is single-node DuckDB and has no
shuffle, hence no skew surface; beyond-reference §2.14 scale operator.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

_SALT = "__salt"


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    on: str | Sequence[str],
    *,
    salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``facts`` to ``dim`` on ``on`` with ``salts``-way key
    splitting. Supports ``inner`` and ``left`` (fact-preserving) joins —
    the replicated side must be the one whose rows may duplicate, so
    right/full joins on the dim side are rejected."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    if salts < 1:
        raise ValueError("salts must be >= 1")
    if _SALT in facts.columns or _SALT in dim.columns:
        raise ValueError(f"column name {_SALT!r} is reserved by salted_join")
    keys = [on] if isinstance(on, str) else list(on)

    f = facts.withColumn(
        _SALT, F.pmod(F.xxhash64(*[F.col(c) for c in facts.columns]), F.lit(salts)).cast("int")
    )
    d = dim.withColumn(_SALT, F.explode(F.sequence(F.lit(0), F.lit(salts - 1))))
    return f.join(d, on=[*keys, _SALT], how=how).drop(_SALT)
