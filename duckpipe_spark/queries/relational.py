"""Core relational operator coverage (SURVEY.md §2.2-2.8) on the testdata
star schema.

Each query maps to reference operator classes (cited per query): scan+filter
pushdown (P1), multi-way joins (J5), group-by aggregation (A1-A6), window
row_number (W1, `core.py:143,156`), pivot (U4/A9, `core.py:189-198`), unpivot
(U2/U3, `RoadLLWCalculator.py:101-105`), skeleton densification with zero-fill
(J8, `LanduseCalculator.py:127-141`).

Exactness policy vs the DuckDB oracle: floating-point SUMs are order-dependent,
so a cross-engine hash compare of `round(sum(double))` is flaky at tie
boundaries. All money aggregates therefore run in *integer cents* (BIGINT,
exact, order-independent) and divide back to doubles afterwards — both engines
then produce bit-identical doubles and rounding is safe. Prices/discounts in
the data carry ≤2 decimals, so `round(x*100)` is lossless.

Scale notes: every aggregation here is a partial+final hash agg (map-side
combine); dimension sides of joins (region/nation/supplier/customer-distinct)
are broadcast so the fact scan never shuffles for them. Pivot uses an explicit
value list to avoid the extra distinct-scan pass. The integer-cents trick also
helps at 100 TB: BIGINT sum is associative, so partial aggregation loses
nothing (the naive double sum is already what Spark would do, just
non-reproducible run-to-run under AQE re-partitioning).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession, Window

from duckpipe_spark.queries.base import register
from duckpipe_spark.sources.tables import load_table


def _cents(col: Column) -> Column:
    """Exact integer cents of a ≤2-decimal double column."""
    return F.round(col * 100).cast("bigint")


def _pct(col: Column) -> Column:
    """Exact integer percent points of a ≤2-decimal factor (e.g. 1-discount)."""
    return F.round(col * 100).cast("bigint")


# ---------------------------------------------------------------------------
# q1_pricing_summary — flagship: scan + pushed filter + 8-agg hash aggregate
# ---------------------------------------------------------------------------

_Q1_ORACLE = """
SELECT
  l_returnflag,
  l_linestatus,
  CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0  AS sum_qty,
  CAST(sum(price_c) AS DOUBLE) / 100.0                                 AS sum_base_price,
  CAST(sum(price_c * disc_f) AS DOUBLE) / 10000.0                      AS sum_disc_price,
  CAST(sum(price_c * disc_f * tax_f) AS DOUBLE) / 1000000.0            AS sum_charge,
  CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0 / count(*) AS avg_qty,
  CAST(sum(price_c) AS DOUBLE) / 100.0 / count(*)                      AS avg_price,
  CAST(sum(disc_c) AS DOUBLE) / 100.0 / count(*)                       AS avg_disc,
  count(*)                                                          AS count_order
FROM (
  SELECT
    *,
    CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c,
    CAST(round((1 - l_discount) * 100) AS BIGINT) AS disc_f,
    CAST(round((1 + l_tax) * 100) AS BIGINT) AS tax_f,
    CAST(round(l_discount * 100) AS BIGINT) AS disc_c
  FROM lineitem
  WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
)
GROUP BY l_returnflag, l_linestatus
"""


@register("q1_pricing_summary", _Q1_ORACLE, "TPC-H Q1-style pricing summary (A1-A6,P1)")
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .withColumn("price_c", _cents(F.col("l_extendedprice")))
        .withColumn("disc_f", _pct(1 - F.col("l_discount")))
        .withColumn("tax_f", _pct(1 + F.col("l_tax")))
        .withColumn("disc_c", _pct(F.col("l_discount")))
        .withColumn("qty_c", _cents(F.col("l_quantity")))
    )
    cnt = F.count(F.lit(1))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            (F.sum("qty_c").cast("double") / 100.0).alias("sum_qty"),
            (F.sum("price_c").cast("double") / 100.0).alias("sum_base_price"),
            (F.sum(F.col("price_c") * F.col("disc_f")).cast("double") / 10000.0).alias(
                "sum_disc_price"
            ),
            (
                F.sum(F.col("price_c") * F.col("disc_f") * F.col("tax_f")).cast("double")
                / 1000000.0
            ).alias("sum_charge"),
            (F.sum("qty_c").cast("double") / 100.0 / cnt).alias("avg_qty"),
            (F.sum("price_c").cast("double") / 100.0 / cnt).alias("avg_price"),
            (F.sum("disc_c").cast("double") / 100.0 / cnt).alias("avg_disc"),
            cnt.alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# q3_shipping_priority — selective 3-way join
# ---------------------------------------------------------------------------

_REVENUE_SQL = "CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * CAST(round((1 - l_discount) * 100) AS BIGINT)) AS DOUBLE) / 10000.0"


def _revenue_col() -> Column:
    rev_c = _cents(F.col("l_extendedprice")) * _pct(1 - F.col("l_discount"))
    return F.sum(rev_c).cast("double") / 10000.0


_Q3_ORACLE = f"""
SELECT
  l_orderkey,
  {_REVENUE_SQL}                    AS revenue,
  strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
  o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1997-03-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '1997-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
"""


@register("q3_shipping_priority", _Q3_ORACLE, "TPC-H Q3-style join+agg (J5,P1)")
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = F.lit("1997-03-15 00:00:00").cast("timestamp")
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_revenue_col().alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
    )


# ---------------------------------------------------------------------------
# q5_local_supplier — 6-table broadcast join chain
# ---------------------------------------------------------------------------

_Q5_ORACLE = f"""
SELECT
  n_name,
  {_REVENUE_SQL} AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey  = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
"""


@register("q5_local_supplier", _Q5_ORACLE, "TPC-H Q5-style 6-way join (J5,P1)")
def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(_revenue_col().alias("revenue"))
    )


# ---------------------------------------------------------------------------
# first_order_per_customer — window ROW_NUMBER (W1, `core.py:143,156`)
# ---------------------------------------------------------------------------

_FIRST_ORDER_ORACLE = """
SELECT o_custkey, first_orderkey, first_orderdate FROM (
  SELECT
    o_custkey,
    o_orderkey AS first_orderkey,
    strftime(o_orderdate, '%Y-%m-%d') AS first_orderdate,
    ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
  FROM orders
) WHERE rn = 1
"""


@register("first_order_per_customer", _FIRST_ORDER_ORACLE, "window row_number (W1)")
def first_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("first_orderkey"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("first_orderdate"),
        )
    )


# ---------------------------------------------------------------------------
# segment_year_pivot — long→wide pivot (U4/A9, `core.py:189-198`)
# ---------------------------------------------------------------------------

_PIVOT_YEARS = list(range(1995, 2002))

_PIVOT_ORACLE = "SELECT c_mktsegment, " + ", ".join(
    f"CAST(coalesce(sum(CASE WHEN year(o_orderdate) = {y} "
    f"THEN CAST(round(o_totalprice * 100) AS BIGINT) END), 0) AS DOUBLE) / 100.0 AS y{y}"
    for y in _PIVOT_YEARS
) + """
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


@register("segment_year_pivot", _PIVOT_ORACLE, "long→wide pivot with explicit value list (U4/A9)")
def segment_year_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    piv = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .withColumn("yr", F.year("o_orderdate"))
        .withColumn("price_c", _cents(F.col("o_totalprice")))
        .groupBy("c_mktsegment")
        # explicit value list: avoids an extra distinct scan (SURVEY §7 risk note)
        .pivot("yr", _PIVOT_YEARS)
        .agg(F.sum("price_c"))
    )
    return piv.select(
        "c_mktsegment",
        *[
            (F.coalesce(F.col(str(y)), F.lit(0)).cast("double") / 100.0).alias(f"y{y}")
            for y in _PIVOT_YEARS
        ],
    )


# ---------------------------------------------------------------------------
# nation_stats_unpivot — wide→long melt (U2/U3, `RoadLLWCalculator.py:101-105`)
# DuckDB UNPIVOT drops NULL cells; mirrored with a notNull filter.
# ---------------------------------------------------------------------------

_UNPIVOT_ORACLE = """
SELECT n_name, varname, value FROM (
  SELECT
    n_name,
    CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_bal,
    CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS DOUBLE) / 100.0 / count(*) AS avg_bal,
    CAST(count(*) AS DOUBLE) AS n_cust
  FROM customer JOIN nation ON c_nationkey = n_nationkey
  GROUP BY n_name
) UNPIVOT (value FOR varname IN (sum_bal, avg_bal, n_cust))
"""


@register("nation_stats_unpivot", _UNPIVOT_ORACLE, "wide→long unpivot incl. NULL-drop semantics (U2)")
def nation_stats_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    bal_c = F.sum(_cents(F.col("c_acctbal"))).cast("double")
    cnt = F.count(F.lit(1))
    wide = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            (bal_c / 100.0).alias("sum_bal"),
            (bal_c / 100.0 / cnt).alias("avg_bal"),
            cnt.cast("double").alias("n_cust"),
        )
    )
    long = wide.unpivot(["n_name"], ["sum_bal", "avg_bal", "n_cust"], "varname", "value")
    # DuckDB UNPIVOT drops NULL cells by default (SURVEY §2 U2 note)
    return long.filter(F.col("value").isNotNull())


# ---------------------------------------------------------------------------
# custkey_status_skeleton — densified skeleton + zero-fill
# (J8, `LanduseCalculator.py:51-61,127-141`)
# ---------------------------------------------------------------------------

_SKELETON_ORACLE = """
WITH statuses AS (SELECT DISTINCT o_orderstatus FROM orders),
measures AS (
  SELECT
    o_custkey,
    o_orderstatus,
    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total
  FROM orders GROUP BY o_custkey, o_orderstatus
)
SELECT
  c.c_custkey,
  s.o_orderstatus AS status,
  coalesce(m.total, 0) AS total
FROM customer AS c
CROSS JOIN statuses AS s
LEFT JOIN measures AS m
  ON m.o_custkey = c.c_custkey AND m.o_orderstatus = s.o_orderstatus
"""


@register("custkey_status_skeleton", _SKELETON_ORACLE, "skeleton densification + COALESCE 0 (J8/A7/F4)")
def custkey_status_skeleton(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    statuses = orders.select("o_orderstatus").distinct()
    measures = orders.groupBy("o_custkey", "o_orderstatus").agg(
        (F.sum(_cents(F.col("o_totalprice"))).cast("double") / 100.0).alias("total")
    )
    skeleton = cust.select("c_custkey").crossJoin(F.broadcast(statuses))
    return (
        skeleton.join(
            measures,
            (skeleton.c_custkey == measures.o_custkey)
            & (skeleton.o_orderstatus == measures.o_orderstatus),
            "left",
        )
        .select(
            skeleton.c_custkey,
            skeleton.o_orderstatus.alias("status"),
            F.coalesce(measures.total, F.lit(0.0)).alias("total"),
        )
    )


# ---------------------------------------------------------------------------
# brand_min_price — per-group min + join back (correlated-subquery shape)
# ---------------------------------------------------------------------------

_BRAND_MIN_ORACLE = """
SELECT p.p_brand, p.p_partkey, p.p_retailprice AS min_price
FROM part AS p
JOIN (
  SELECT p_brand, min(p_retailprice) AS mn FROM part GROUP BY p_brand
) AS m ON p.p_brand = m.p_brand AND p.p_retailprice = m.mn
"""


@register("brand_min_price", _BRAND_MIN_ORACLE, "min-per-group join-back (A1 shape)")
def brand_min_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    mins = (
        part.groupBy("p_brand")
        .agg(F.min("p_retailprice").alias("mn"))
        .select(F.col("p_brand").alias("mn_brand"), "mn")
    )
    return (
        part.join(
            F.broadcast(mins),
            (part.p_brand == mins.mn_brand) & (part.p_retailprice == mins.mn),
        )
        .select(part.p_brand, part.p_partkey, part.p_retailprice.alias("min_price"))
    )


# ---------------------------------------------------------------------------
# semi/anti joins + set ops — engine completeness beyond the reference
# (the reference has none of these, SURVEY.md §2.3/§2.7 notes)
# ---------------------------------------------------------------------------

_ANTI_ORACLE = """
SELECT c_custkey, c_name
FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
"""


@register("customers_without_orders", _ANTI_ORACLE, "left anti join")
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


_SEMI_ORACLE = """
SELECT s_suppkey, s_name
FROM supplier
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_suppkey = s_suppkey AND l_quantity > 45
)
"""


@register("suppliers_with_big_lineitems", _SEMI_ORACLE, "left semi join (EXISTS)")
def suppliers_with_big_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return supp.join(li, supp.s_suppkey == li.l_suppkey, "left_semi").select(
        "s_suppkey", "s_name"
    )


_SETOP_ORACLE = """
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
INTERSECT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
"""


@register("custkeys_f_and_o_intersect", _SETOP_ORACLE, "INTERSECT set operation")
def custkeys_f_and_o_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    f = orders.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    o = orders.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey"))
    return f.intersect(o)


_EXCEPT_ORACLE = """
SELECT o_orderkey AS k FROM orders WHERE o_totalprice > 300000
EXCEPT
SELECT l_orderkey FROM lineitem WHERE l_quantity > 40
"""


@register("orders_except", _EXCEPT_ORACLE, "EXCEPT set operation")
def orders_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = orders.filter(F.col("o_totalprice") > 300000).select(F.col("o_orderkey").alias("k"))
    heavy = li.filter(F.col("l_quantity") > 40).select(F.col("l_orderkey").alias("k"))
    # subtract = EXCEPT (set semantics); exceptAll would be bag semantics
    return big.subtract(heavy)


_ROLLUP_ORACLE = """
SELECT
  coalesce(o_orderstatus, 'ALL') AS status,
  coalesce(o_orderpriority, 'ALL') AS priority,
  count(*) AS n,
  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


@register("orders_rollup", _ROLLUP_ORACLE, "ROLLUP hierarchical aggregation")
def orders_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(_cents(F.col("o_totalprice"))).cast("double") / 100.0).alias("total"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n",
            "total",
        )
    )


_Q6_ORACLE = """
SELECT
  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * CAST(round(l_discount * 100) AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@register("q6_forecast_revenue", _Q6_ORACLE, "TPC-H Q6-style selective scan + single agg (P1)")
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    rev_c = _cents(F.col("l_extendedprice")) * _pct(F.col("l_discount"))
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg((F.sum(rev_c).cast("double") / 10000.0).alias("revenue"))
    )


_Q4_ORACLE = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
  )
GROUP BY o_orderpriority
"""


@register("q4_order_priority", _Q4_ORACLE, "TPC-H Q4-style EXISTS semi-join + agg")
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


_Q12_ORACLE = """
SELECT
  l_linestatus,
  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_linestatus
"""


@register("q12_shipmode_priority", _Q12_ORACLE, "TPC-H Q12-style conditional-count join")
def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


_Q14_ORACLE = """
SELECT
  CAST(100 * sum(CASE WHEN p_type LIKE 'PROMO%'
        THEN CAST(round(l_extendedprice * 100) AS BIGINT) * CAST(round((1 - l_discount) * 100) AS BIGINT)
        ELSE 0 END) AS DOUBLE)
  / CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * CAST(round((1 - l_discount) * 100) AS BIGINT)) AS DOUBLE)
  AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
"""


@register("q14_promo_effect", _Q14_ORACLE, "TPC-H Q14-style conditional-ratio agg")
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part")
    rev_c = _cents(F.col("l_extendedprice")) * _pct(1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").like("PROMO%"), rev_c).otherwise(F.lit(0))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            (
                (F.lit(100) * F.sum(promo)).cast("double") / F.sum(rev_c).cast("double")
            ).alias("promo_revenue_pct")
        )
    )
