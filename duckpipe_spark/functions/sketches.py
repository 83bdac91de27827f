"""Deterministic cross-engine HyperLogLog.

`approx_count_distinct` is rows-only-checkable against DuckDB because the
two engines' HLL sketches (hash function, register layout, bias tables)
differ. This module implements HLL from its public definition (Flajolet
et al. 2007) out of portable integer column ops, so Spark and the SQL
oracle compute THE SAME sketch and THE SAME estimate — turning an
"approximate" operator into an exactly-verifiable one (the estimate is
deterministic; only its relation to the true count is approximate).

Determinism inventory (why the cross-engine hash matches bit-for-bit):
* hash = (769·x + 12582917) mod 1e9+7 — affine over BIGINT, the same
  family as the MinHash permutations, trivially identical in SQL;
* register index = hash mod 256; suffix = hash div 256 (22 bits);
* rho = 23 − bit_length(suffix), with bit_length spelled
  ``length(bin(x))`` — identical semantics in Spark and DuckDB (no
  zero-padding in either), no float log2 anywhere;
* registers = MAX per bucket — order-independent;
* the harmonic sum Σ 2^−M[j] adds 256 dyadic rationals of denominator
  2^23 and magnitude ≤ 1, so every partial sum fits a 31-bit mantissa —
  float addition is EXACT here, in any order, on any engine;
* the final estimate is one fixed IEEE expression over those exact
  inputs, rounded to BIGINT (a shared ~1e-16 `ln` libm wobble in the
  small-range branch cannot move an integer rounding).

Scale shape: one shuffle to (group, bucket) MAX registers — 256 rows per
group regardless of input size — then a tiny per-group fold. Registers
are mergeable by construction (MAX), so shards/partitions/days combine
without re-scanning, which is the entire point of HLL at 100 TB.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

HLL_P = 1_000_000_007
HLL_A = 769
HLL_B = 12_582_917
HLL_M = 256  # 2^8 registers → ~6.5% standard error
# Flajolet's alpha_256, embedded as the SAME literal in Spark and SQL
HLL_ALPHA = repr(0.7213 / (1 + 1.079 / 256))

# shared SQL fragments (used verbatim by the Spark side via F.expr and by
# the DuckDB oracle) — the expression TEXT being identical is what makes
# the float path bit-identical.
#
# The hash needs AVALANCHE, not just dispersion: an affine map of a
# sequential key range is itself sequential, its high bits stay tiny, and
# every rho saturates (estimates off by 20x — caught by the accuracy
# test). Two middle-square rounds mod the prime mix high bits properly
# while every intermediate stays under 2^63 on both engines:
# h1 = (a·x + b) mod P;  h2 = (h1² + h1) mod P;  h = (h² + 3·h2) mod P.
HLL_H1_SQL = f"pmod({HLL_A} * {{col}} + {HLL_B}, {HLL_P})"
HLL_H2_SQL = f"pmod({{h}} * {{h}} + {{h}}, {HLL_P})"
HLL_H3_SQL = f"pmod({{h}} * {{h}} + 3 * {{h}}, {HLL_P})"
HLL_RHO_SQL = (
    "CASE WHEN {rest} = 0 THEN 23 ELSE 23 - length(bin({rest})) END"
)
# every numeric literal is CAST(... AS DOUBLE): Spark and DuckDB both
# parse bare decimal literals as DECIMAL, whose arithmetic overflows /
# rounds differently — the fragments must force the IEEE double path
_D = "CAST({v} AS DOUBLE)".format
_EST = (
    f"({_D(v=HLL_ALPHA)} * {_D(v=65536)}) / {{s}}"
)
HLL_EST_SQL = (
    f"CASE WHEN {_EST} <= {_D(v=640)} AND {{zeros}} > 0 "
    f"THEN {_D(v=256)} * ln({_D(v=256)} / {{zeros}}) "
    f"ELSE {_EST} END"
)


def hll_registers(df: DataFrame, col: str, group_cols: list[str]) -> DataFrame:
    """(group..., bucket, reg) — the mergeable sketch state (MAX-combinable
    across any sharding of the input)."""
    d = (
        df.select(*group_cols, F.expr(HLL_H1_SQL.format(col=col)).alias("__h"))
        .withColumn("__h", F.expr(HLL_H2_SQL.format(h="__h")))
        .withColumn("__h", F.expr(HLL_H3_SQL.format(h="__h")))
        .select(
            *group_cols,
            F.expr(f"pmod(__h, {HLL_M})").alias("__bucket"),
            F.expr(f"__h DIV {HLL_M}").alias("__rest"),
        )
        .withColumn("__rho", F.expr(HLL_RHO_SQL.format(rest="__rest")))
    )
    return (
        d.groupBy(*group_cols, F.col("__bucket").alias("bucket"))
        .agg(F.max("__rho").alias("reg"))
    )


def hll_estimate(registers: DataFrame, group_cols: list[str]) -> DataFrame:
    """Fold (group..., bucket, reg) registers into the integer cardinality
    estimate per group."""
    folded = registers.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("__np"),
        F.sum(F.expr("power(CAST(0.5 AS DOUBLE), reg)")).alias("__sp"),
    )
    s = "((256 - __np) * CAST(1 AS DOUBLE) + __sp)"
    zeros = "(256 - __np)"
    est = HLL_EST_SQL.format(s=s, zeros=zeros)
    return folded.select(
        *group_cols,
        F.expr(f"CAST(round({est}) AS BIGINT)").alias("hll_distinct"),
    )


def hll_distinct(df: DataFrame, col: str, group_cols: list[str]) -> DataFrame:
    """Grouped deterministic-HLL distinct-count estimate → (group...,
    hll_distinct)."""
    return hll_estimate(hll_registers(df, col, group_cols), group_cols)


def hll_oracle_sql(table: str, col: str, group_cols: list[str]) -> str:
    """The DuckDB twin, assembled from the SAME expression fragments."""
    g = ", ".join(group_cols)
    rho = HLL_RHO_SQL.format(rest="rest")
    est = HLL_EST_SQL.format(s="((256 - np) * CAST(1 AS DOUBLE) + sp)", zeros="(256 - np)")
    # DuckDB pmod: operands here are non-negative, so % == pmod
    h1 = f"({HLL_A} * {col} + {HLL_B}) % {HLL_P}"
    h2 = f"(h1 * h1 + h1) % {HLL_P}"
    h3 = f"(h2 * h2 + 3 * h2) % {HLL_P}"
    return f"""
WITH s1 AS (SELECT {g}, {h1} AS h1 FROM {table}),
s2 AS (SELECT {g}, {h2} AS h2 FROM s1),
s3 AS (SELECT {g}, {h3} AS h FROM s2),
rows_h AS (
  SELECT {g}, h % 256 AS bucket, h // 256 AS rest FROM s3
), regs AS (
  SELECT {g}, bucket, MAX({rho}) AS reg FROM rows_h GROUP BY {g}, bucket
), folded AS (
  SELECT {g}, COUNT(*) AS np, SUM(power(CAST(0.5 AS DOUBLE), reg)) AS sp
  FROM regs GROUP BY {g}
)
SELECT {g}, CAST(round({est}) AS BIGINT) AS hll_distinct FROM folded
"""


# --- Count-Min frequency sketch (Cormode & Muthukrishnan 2005) -------------
#
# Same portability story as the HLL above, but simpler: the sketch is a
# d x w grid of COUNTS (exact BIGINT sums — no float anywhere), the
# point-query estimate is the MIN over d cells, and both build and probe
# are plain groupBy/join algebra. Estimates are upper bounds: exact for
# keys with no cell collisions, inflated by collision mass otherwise —
# deterministic on any engine, so the oracle hash-matches exactly.

CM_D = 4          # rows (independent hash seeds)
CM_W = 1024       # counters per row
# distinct odd multipliers per row, same affine-then-middle-square mixer
CM_SEEDS = [(769, 12_582_917), (1543, 25_165_843), (3079, 50_331_653), (6151, 100_663_319)]


def _cm_cell_sql(col: str, a: int, b: int) -> str:
    h1 = f"pmod({a} * {col} + {b}, {HLL_P})"
    h2 = f"pmod({h1} * {h1} + {h1}, {HLL_P})"
    return f"pmod({h2}, {CM_W})"


def cm_sketch(df: DataFrame, col: str) -> DataFrame:
    """Build the d×w sketch → (row, cell, cnt). One explode (d rows per
    input row) + one groupBy: at most d·w = 4096 output rows regardless of
    input size, SUM-mergeable across shards."""
    cells = F.array(
        *[F.expr(_cm_cell_sql(col, a, b)) for a, b in CM_SEEDS]
    )
    d = df.select(F.posexplode(cells).alias("row", "cell"))
    return d.groupBy("row", "cell").agg(F.count(F.lit(1)).alias("cnt"))


def cm_estimate(sketch: DataFrame, keys: DataFrame, col: str) -> DataFrame:
    """Point-query each key in ``keys`` → (col, cm_count): MIN over the d
    probed cells. The sketch side is ≤4096 rows — always broadcast."""
    probes = keys.select(
        F.col(col),
        F.posexplode(
            F.array(*[F.expr(_cm_cell_sql(col, a, b)) for a, b in CM_SEEDS])
        ).alias("row", "cell"),
    )
    return (
        probes.join(F.broadcast(sketch), ["row", "cell"], "left")
        .groupBy(col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("cm_count"))
    )


def cm_oracle_sql(table: str, col: str, keys_sql: str) -> str:
    """DuckDB twin: same cells, same SUM/MIN algebra. ``keys_sql`` is a
    query producing the distinct keys to probe (column name = ``col``).
    DuckDB has no pmod(); every operand here is non-negative so ``%`` is
    identical."""

    def cell(a: int, b: int) -> str:
        h1 = f"(({a} * {col} + {b}) % {HLL_P})"
        h2 = f"(({h1} * {h1} + {h1}) % {HLL_P})"
        return f"({h2} % {CM_W})"

    cell_rows = " UNION ALL ".join(
        f"SELECT {i} AS row, {cell(a, b)} AS cell FROM {table}"
        for i, (a, b) in enumerate(CM_SEEDS)
    )
    probe_rows = " UNION ALL ".join(
        f"SELECT {col}, {i} AS row, {cell(a, b)} AS cell FROM ks"
        for i, (a, b) in enumerate(CM_SEEDS)
    )
    return f"""
WITH cells AS ({cell_rows}),
sk AS (SELECT row, cell, CAST(count(*) AS BIGINT) AS cnt FROM cells GROUP BY 1, 2),
ks AS ({keys_sql}),
probes AS ({probe_rows})
SELECT probes.{col}, CAST(min(COALESCE(sk.cnt, 0)) AS BIGINT) AS cm_count
FROM probes LEFT JOIN sk USING (row, cell)
GROUP BY 1
"""


# --- Bloom filter (membership; Bloom 1970) ---------------------------------
#
# Third sketch of the family: set MEMBERSHIP with one-sided error (false
# positives only, never false negatives). The filter is 32 BIGINT words
# (2048 bits) built with bit_or — an aggregate both engines share — and
# the same mixer as CM/HLL for the k=4 bit positions, so build and probe
# are bit-identical cross-engine and the gate hash-verifies the
# APPROXIMATE membership verdicts, false positives included.
#
# 100 TB shape: the built filter is <=32 rows (broadcast-always); probing
# a fact stream is a broadcast join + bit test — the decontamination /
# blocklist pattern where shipping the full key set would shuffle, and
# bit_or-mergeable words mean shards build independently.

BLOOM_BITS = 2048           # ~33 x 63-bit words; sized for a DEMO fp-rate —
BLOOM_WORDS = BLOOM_BITS // 63 + 1  # production would size m/n ~ 10+ bits/key
BLOOM_K = 4
# Single source for the bloom hash family: build, probe (and its
# reserved-name guard), and the oracle SQL all iterate BLOOM_SEEDS, so
# resizing BLOOM_K can never desynchronize them.
BLOOM_SEEDS = CM_SEEDS[:BLOOM_K]
assert len(BLOOM_SEEDS) == BLOOM_K, "BLOOM_K exceeds available CM_SEEDS"
# 63 bits per BIGINT word, not 64: bit 63 is the sign bit, and
# 1 << 63 overflows DuckDB's checked BIGINT (Spark would wrap silently —
# the engines would even disagree); bits 0..62 are portable


def _bloom_pos_sql(col: str, a: int, b: int) -> str:
    h1 = f"pmod({a} * {col} + {b}, {HLL_P})"
    h2 = f"pmod({h1} * {h1} + {h1}, {HLL_P})"
    return f"pmod({h2}, {BLOOM_BITS})"


def bloom_build(df: DataFrame, col: str) -> DataFrame:
    """→ (word, bits): the filter as OR-combined 64-bit words."""
    pos = F.array(*[F.expr(_bloom_pos_sql(col, a, b)) for a, b in BLOOM_SEEDS])
    p = df.select(F.explode(pos).alias("__pos")).select(
        F.expr("__pos DIV 63").alias("word"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pmod(__pos, 63) AS INT))").alias("__bit"),
    )
    return p.groupBy("word").agg(F.expr("bit_or(__bit)").alias("bits"))


def bloom_probe(filt: DataFrame, df: DataFrame, col: str) -> DataFrame:
    """df + ``maybe_member`` (1 = all k bits set; 0 = definitely absent).

    Output rows are exactly 1:1 with input rows — duplicates pass through
    and no column of ``df`` needs to be groupable. The whole
    ≤``BLOOM_WORDS``-row filter is folded into ONE single-row broadcast
    (a word→bits map), so the probe is one cross join plus k in-row map
    lookups — replacing the previous k chained broadcast joins, which
    cost k join operators and ~6× the wall-clock at sf1 (BASELINE §12).
    ``element_at`` on the ≤33-entry map is a bounded scan (the map is
    BLOOM_WORDS-sized by construction, never data-sized). No shuffle of
    the probe side at any size; an empty filter still yields the one
    (empty-map) build row, and absent words coalesce to 0.

    ``filt`` must have UNIQUE word rows (what `bloom_build` emits).
    Merging shard filters means bit_or-regrouping them first; a
    duplicated word now fails loudly at map construction (Spark's
    duplicate-map-key error) — the previous k-join form would have
    silently multiplied probe rows and broken the 1:1 contract."""
    reserved = {"maybe_member", "__bloom_map"}
    clash = reserved & set(df.columns)
    if clash:
        raise ValueError(f"bloom_probe reserves column name(s) {sorted(clash)}")
    bmap = filt.groupBy().agg(
        F.map_from_entries(F.collect_list(F.struct("word", "bits"))).alias(
            "__bloom_map"
        )
    )
    hits = []
    for a, b in BLOOM_SEEDS:
        pos = _bloom_pos_sql(col, a, b)
        hits.append(
            f"CAST(shiftright("
            f"COALESCE(element_at(__bloom_map, ({pos}) DIV 63), CAST(0 AS BIGINT)),"
            f" CAST(pmod({pos}, 63) AS INT)) & 1 AS INT)"
        )
    return df.crossJoin(F.broadcast(bmap)).select(
        *df.columns, F.expr("least(" + ", ".join(hits) + ")").alias("maybe_member")
    )


# --- sampled quantiles (deterministic bounded-sample sketch) ---------------
#
# Fourth member of the family: per-group QUANTILES from a deterministic
# k-row sample. approx_percentile is rows-only-checkable (engine-specific
# GK/KLL internals); here the "sketch" is the k rows with the smallest
# middle-square hash priority of their id — a uniform-without-replacement
# sample that is a pure function of the data — and the estimate is the
# exact lower-index quantile of that sample (integer indexing, no
# interpolation), so build and probe hash-verify cross-engine exactly.
# Error behavior is the standard sampled-quantile bound (±O(1/sqrt(k))
# rank error w.h.p.); determinism makes it attestable.
#
# 100 TB shape: one rank window partitioned by group (state = top-k per
# group, never the group's row count), then a k-bounded per-group fold.
# The sample rows are themselves mergeable evidence: union two shards'
# samples and re-rank to get the combined sketch.

QSK_QS = (25, 50, 75, 90, 99)


def _qsk_priority_sql(id_col: str, pmod: bool = True) -> str:
    """The mixer in Spark `pmod(...)` form, or DuckDB `%` form (operands
    are non-negative, so the two are identical)."""
    if pmod:
        h1 = f"pmod({HLL_A} * {id_col} + {HLL_B}, {HLL_P})"
        return f"pmod({h1} * {h1} + {h1}, {HLL_P})"
    h1 = f"(({HLL_A} * {id_col} + {HLL_B}) % {HLL_P})"
    return f"(({h1} * {h1} + {h1}) % {HLL_P})"


def sampled_quantiles(
    df: DataFrame,
    value_col: str,
    id_col: str,
    group_cols: list[str],
    k: int = 512,
    qs: tuple[int, ...] = QSK_QS,
) -> DataFrame:
    """Per-group deterministic sampled quantiles → (group..., n_sampled,
    q<p> for each p). Values must be integer-comparable (use cents, not
    float money). Groups smaller than k are sampled whole (exact
    quantiles). ``id_col`` seeds the priority; the rank order is the
    TOTAL order (priority, id, value) — r6: value joined the tie-break,
    so duplicated ids no longer make the rank cut
    partition-order-dependent (rows identical in (group, id, value) are
    interchangeable and harmless). A unique id is still the best
    practice (it keeps the sample uniform); it is no longer a
    determinism requirement."""
    from pyspark.sql import Window

    if k < 1:
        raise ValueError("sampled_quantiles needs k >= 1")
    if not qs or any(not 0 <= q <= 100 for q in qs):
        raise ValueError("qs must be percentages in [0, 100]")
    pri = df.select(
        *group_cols,
        F.col(value_col).alias("__v"),
        F.col(id_col).alias("__id"),
        F.expr(_qsk_priority_sql(id_col)).alias("__p"),
    )
    # Two-phase per-group top-k (r6): a single rank window partitioned by
    # the group columns has parallelism = GROUP CARDINALITY — with 3
    # groups, 3 tasks sort everything no matter how many executors exist,
    # and at web scale ONE reducer would sort (and spill) an entire
    # group. Phase 1 ranks within (group, scan-partition id) — flat rows,
    # fully parallel local sorts — and keeps each partition's k least
    # (priority, id, value) per group; the final window then ranks at
    # most P·k candidate rows per group. Every global top-k row is in its
    # own partition's top-k, so the cut is exact, and the (p, id, v)
    # order is total, so the result is bit-identical to the one-window
    # form. (A collect_list/array_sort/slice phase-1 was measured WORSE —
    # the fat list rows serialize through the exchange; the flat window
    # form ties the one-window wall-clock at sf1 while removing the
    # per-group reducer sort: BASELINE §13.)
    pid = pri.withColumn("__pid", F.spark_partition_id())
    w1 = Window.partitionBy(*group_cols, "__pid").orderBy("__p", "__id", "__v")
    part = (
        pid.withColumn("__r1", F.row_number().over(w1))
        .where(F.col("__r1") <= k)
        .drop("__pid", "__r1")
    )
    w = Window.partitionBy(*group_cols).orderBy("__p", "__id", "__v")
    samp = part.withColumn("__r", F.row_number().over(w)).where(F.col("__r") <= k)
    folded = samp.groupBy(*group_cols).agg(
        F.sort_array(F.collect_list("__v")).alias("__s")
    )
    cols = [F.expr("CAST(size(__s) AS BIGINT)").alias("n_sampled")]
    for q in qs:
        cols.append(
            F.expr(f"element_at(__s, CAST(1 + ({q} * (size(__s) - 1)) DIV 100 AS INT))")
            .alias(f"q{q}")
        )
    return folded.select(*group_cols, *cols)


def sampled_quantiles_oracle_sql(
    table: str,
    value_col: str,
    id_col: str,
    group_cols: list[str],
    k: int = 512,
    qs: tuple[int, ...] = QSK_QS,
) -> str:
    """DuckDB twin: same priorities, same (p, id, v) total rank order,
    same rank cut, same lower-index quantile rule. Ties in the final
    ORDER BY value are harmless — the i-th element VALUE is unique
    regardless of how equal values are ordered."""
    g = ", ".join(group_cols)
    pri = _qsk_priority_sql(id_col, pmod=False)
    q_exprs = ",\n       ".join(
        f"MAX(CASE WHEN i = 1 + ({q} * (n - 1)) // 100 THEN v END) AS q{q}"
        for q in qs
    )
    return f"""
WITH pri AS (
  SELECT {g}, {value_col} AS v, {id_col} AS id, {pri} AS p FROM {table}
), rk AS (
  SELECT {g}, v, row_number() OVER (PARTITION BY {g} ORDER BY p, id, v) AS r FROM pri
), samp AS (
  SELECT {g}, v FROM rk WHERE r <= {k}
), sorted AS (
  SELECT {g}, v,
         row_number() OVER (PARTITION BY {g} ORDER BY v) AS i,
         count(*) OVER (PARTITION BY {g}) AS n
  FROM samp
)
SELECT {g}, CAST(MAX(n) AS BIGINT) AS n_sampled, {q_exprs}
FROM sorted GROUP BY {g}
"""


def bloom_oracle_sql(build_sql: str, probe_table: str, col: str) -> str:
    """DuckDB twin. ``build_sql`` yields the member keys (column ``col``);
    the probe scans ``probe_table``. Returns rows of the probe table's key
    plus maybe_member. Non-negative operands → % == pmod; DuckDB's >> <<
    & and bit_or match Spark's on BIGINT."""

    def pos(a: int, b: int, c: str) -> str:
        h1 = f"(({a} * {c} + {b}) % {HLL_P})"
        h2 = f"(({h1} * {h1} + {h1}) % {HLL_P})"
        return f"({h2} % {BLOOM_BITS})"

    build_rows = " UNION ALL ".join(
        f"SELECT {pos(a, b, col)} AS p FROM member_keys" for a, b in BLOOM_SEEDS
    )
    probe_rows = " UNION ALL ".join(
        f"SELECT {col}, {pos(a, b, col)} AS p FROM {probe_table}" for a, b in BLOOM_SEEDS
    )
    return f"""
WITH member_keys AS ({build_sql}),
bpos AS ({build_rows}),
filt AS (
  SELECT p // 63 AS word, bit_or(CAST(1 AS BIGINT) << CAST(p % 63 AS INT)) AS bits
  FROM bpos GROUP BY 1
),
ppos AS ({probe_rows}),
hits AS (
  SELECT ppos.{col},
         CAST(((COALESCE(filt.bits, CAST(0 AS BIGINT)) >> CAST(ppos.p % 63 AS INT)) & 1) AS INT) AS hit
  FROM ppos LEFT JOIN filt ON ppos.p // 63 = filt.word
)
SELECT {col}, CAST(min(hit) AS INT) AS maybe_member FROM hits GROUP BY 1
"""
