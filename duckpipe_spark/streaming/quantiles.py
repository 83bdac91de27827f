"""Streaming twin of the deterministic sampled-quantile sketch
(`functions.sketches.sampled_quantiles`): per-group bounded-state
quantiles over an unbounded stream via ``applyInPandasWithState``.

The batch sketch is "the k rows with the smallest deterministic
id-priority"; that set is mergeable by union + re-rank, so a stream can
maintain it incrementally with EXACTLY k rows of state per group —
never the group's row count — and the drained stream's sketch is
bit-identical to the batch sketch over the same rows (the equivalence
the test suite proves for the HLL/CM/Bloom family members, extended to
the fourth). Same template as `events.sessionize_stateful`.

State per group: three parallel arrays (priority, id, value) truncated
to the k least (priority, id) pairs, plus the absorbed-row count. Each
micro-batch emits the group's refreshed quantile row (update mode);
``n_seen`` is strictly increasing, so the latest row per group is the
final answer.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from duckpipe_spark.functions.sketches import HLL_A, HLL_B, HLL_P, QSK_QS


def _priority(i: int) -> int:
    """Python-int twin of `sketches._qsk_priority_sql` (exact: operands
    are non-negative and far inside int range)."""
    h1 = (HLL_A * i + HLL_B) % HLL_P
    return (h1 * h1 + h1) % HLL_P


def _mk_fn(k: int, qs: tuple[int, ...]):
    def fn(
        key: tuple[Any, ...], pdf_iter: Iterator[pd.DataFrame], state
    ) -> Iterator[pd.DataFrame]:
        (grp,) = key
        rows: list[tuple[int, int, int]] = []
        n_new = 0
        for pdf in pdf_iter:
            for i, v in zip(pdf["__id"], pdf["__v"]):
                rows.append((_priority(int(i)), int(i), int(v)))
                n_new += 1
        if state.exists:
            ps, ids, vs, n_seen = state.get
            rows.extend(zip(ps, ids, vs))
        else:
            n_seen = 0
        # union + re-rank: keep the k least (priority, id, value) — the
        # exact total rank order the batch window applies
        rows.sort()
        rows = rows[:k]
        n_seen += n_new
        state.update(
            ([r[0] for r in rows], [r[1] for r in rows], [r[2] for r in rows], n_seen)
        )
        s = sorted(r[2] for r in rows)
        n = len(s)
        out = {"grp": [grp], "n_seen": [n_seen], "n_sampled": [n]}
        for q in qs:
            # lower-index quantile, 1-based: element_at(s, 1 + (q*(n-1)) DIV 100)
            out[f"q{q}"] = [s[(q * (n - 1)) // 100] if n else None]
        yield pd.DataFrame(out)

    return fn


def quantile_sketch_stateful(
    df,
    value_col: str,
    id_col: str,
    group_col: str,
    k: int = 512,
    qs: tuple[int, ...] = QSK_QS,
):
    """Streaming per-group sampled quantiles with O(k) state per group.
    ``value_col`` must already be an integer column (same cents
    discipline as the batch operator — do the rounding in Spark so both
    twins share one expression) and ``id_col`` unique per row."""
    state_schema = "ps array<long>, ids array<long>, vs array<long>, n_seen long"
    out_schema = "grp string, n_seen long, n_sampled long, " + ", ".join(
        f"q{q} long" for q in qs
    )
    src = df.select(
        df[group_col].alias("grp"),
        df[id_col].alias("__id"),
        df[value_col].alias("__v"),
    )
    return src.groupBy("grp").applyInPandasWithState(
        _mk_fn(k, qs),
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf="NoTimeout",
    )
