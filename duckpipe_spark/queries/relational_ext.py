"""Extended relational coverage: the remaining TPC-H query shapes (adapted to
the testdata schema, which has no partsupp/receiptdate/phone columns), the
full window-function family beyond W1 (`core.py:143,156` is the reference's
only window use), and a scalable as-of join.

Shapes covered here and their engine significance:

- correlated scalar subqueries (q11/q15/q17/q22): decorrelated by hand into
  broadcast single-row aggregates / per-group join-backs — the plan Spark
  would want anyway; comparisons run in integer cents so the threshold
  predicates are exact across engines.
- deterministic top-k (q10, top3): a full unique tiebreak makes ORDER BY +
  LIMIT (TakeOrderedAndProject) and rank()<=k equivalent, so each engine can
  use its natural plan and the result set is still well-defined.
- left-outer + count distribution (q13), disjunctive join predicates (q19),
  semi-join chains (q20), anti + scalar threshold (q22).
- window frames: running sum (rows unbounded preceding), moving average
  (rows 3 preceding), lag gaps — all on exact integer scales.
- as-of join: union-marker + last(ignorenulls) window — the shuffle-once,
  scale-out formulation (no per-row range probe); oracle is DuckDB's native
  ASOF LEFT JOIN.

Scale notes: every window here partitions by a high-cardinality key
(customer/user), so the sort is fully parallel with no skewed partition. The
as-of formulation is one shuffle + one in-partition sort regardless of the
ratio of left/right rows — at 100 TB this beats a range-join NLJ by orders of
magnitude. Single-row aggregates (q11 total, q22 avg) are crossJoin-broadcast,
not collected to the driver.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession, Window

from duckpipe_spark.queries.base import register
from duckpipe_spark.sources.tables import load_table


def _cents(col: Column) -> Column:
    return F.round(col * 100).cast("bigint")


_REV_C_SQL = "CAST(round(l_extendedprice * 100) AS BIGINT) * CAST(round((1 - l_discount) * 100) AS BIGINT)"


def _rev_c() -> Column:
    return _cents(F.col("l_extendedprice")) * F.round((1 - F.col("l_discount")) * 100).cast(
        "bigint"
    )


# ---------------------------------------------------------------------------
# q7_nation_volume — TPC-H Q7: volume between nation pairs by year
# ---------------------------------------------------------------------------

_Q7_ORACLE = f"""
SELECT
  cn.n_name AS cust_nation,
  sn.n_name AS supp_nation,
  year(l_shipdate) AS ship_year,
  CAST(sum({_REV_C_SQL}) AS DOUBLE) / 10000.0 AS volume
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
WHERE cn.n_name IN ('NATION_1', 'NATION_2') AND sn.n_name IN ('NATION_1', 'NATION_2')
  AND cn.n_name <> sn.n_name
GROUP BY cn.n_name, sn.n_name, year(l_shipdate)
"""


@register("q7_nation_volume", _Q7_ORACLE, "TPC-H Q7-style nation-pair volume (J5, self-joined dim)")
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(F.col("n_name").isin("NATION_1", "NATION_2"))
    cn = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cn), cust.c_nationkey == cn.cn_key)
        .join(F.broadcast(sn), supp.s_nationkey == sn.sn_key)
        .filter(F.col("cust_nation") != F.col("supp_nation"))
        .groupBy("cust_nation", "supp_nation", F.year("l_shipdate").alias("ship_year"))
        .agg((F.sum(_rev_c()).cast("double") / 10000.0).alias("volume"))
    )


# ---------------------------------------------------------------------------
# q8_market_share — TPC-H Q8: conditional-share ratio per year
# ---------------------------------------------------------------------------

_Q8_ORACLE = f"""
SELECT
  year(o_orderdate) AS order_year,
  CAST(sum(CASE WHEN sn.n_name = 'NATION_1' THEN {_REV_C_SQL} ELSE 0 END) AS DOUBLE)
    / CAST(sum({_REV_C_SQL}) AS DOUBLE) AS mkt_share
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN region    ON cn.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
WHERE r_name = 'ASIA'
GROUP BY year(o_orderdate)
"""


@register("q8_market_share", _Q8_ORACLE, "TPC-H Q8-style market-share ratio (F2/A2)")
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    cn = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    sn = nation.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    rev = _rev_c()
    korea = F.when(F.col("supp_nation") == "NATION_1", rev).otherwise(F.lit(0))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(cn), cust.c_nationkey == cn.cn_key)
        .join(F.broadcast(region), cn.cn_region == region.r_regionkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(sn), supp.s_nationkey == sn.sn_key)
        .groupBy(F.year("o_orderdate").alias("order_year"))
        .agg((F.sum(korea).cast("double") / F.sum(rev).cast("double")).alias("mkt_share"))
    )


# ---------------------------------------------------------------------------
# q9_product_profit — TPC-H Q9: profit by supplier nation × year, LIKE filter
# (no partsupp table: cost proxy = p_retailprice × l_quantity × 0.1)
# ---------------------------------------------------------------------------

_Q9_ORACLE = f"""
SELECT
  n_name AS nation,
  year(o_orderdate) AS order_year,
  CAST(sum({_REV_C_SQL} * 10
           - CAST(round(p_retailprice * 100) AS BIGINT)
             * CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100000.0 AS profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
WHERE p_name LIKE '%red%'
GROUP BY n_name, year(o_orderdate)
"""


@register("q9_product_profit", _Q9_ORACLE, "TPC-H Q9-style profit agg + LIKE pushdown")
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    # all terms ×100000 (cents·cents·10) so the sum is one exact BIGINT
    profit_c = _rev_c() * F.lit(10) - _cents(F.col("p_retailprice")) * _cents(F.col("l_quantity"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("order_year"))
        .agg((F.sum(profit_c).cast("double") / 100000.0).alias("profit"))
    )


# ---------------------------------------------------------------------------
# q10_returned_items — TPC-H Q10: deterministic top-20 by returned revenue
# ---------------------------------------------------------------------------

_Q10_ORACLE = f"""
WITH ranked AS (
  SELECT
    c_custkey, c_name,
    CAST(sum({_REV_C_SQL}) AS DOUBLE) / 10000.0 AS revenue,
    rank() OVER (ORDER BY sum({_REV_C_SQL}) DESC, c_custkey) AS rnk
  FROM customer
  JOIN orders   ON c_custkey = o_custkey
  JOIN lineitem ON l_orderkey = o_orderkey
  WHERE l_returnflag = 'R'
  GROUP BY c_custkey, c_name
)
SELECT c_custkey, c_name, revenue FROM ranked WHERE rnk <= 20
"""


@register("q10_returned_items", _Q10_ORACLE, "TPC-H Q10-style deterministic top-k", bench=True)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    per_cust = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(F.sum(_rev_c()).alias("rev_c"))
    )
    # c_custkey tiebreak is unique, so rank()<=20 == ORDER BY + LIMIT 20;
    # orderBy+limit compiles to TakeOrderedAndProject (per-partition top-k,
    # driver merge) — no single-partition window even at 100 TB
    return (
        per_cust.orderBy(F.col("rev_c").desc(), F.col("c_custkey"))
        .limit(20)
        .select("c_custkey", "c_name", (F.col("rev_c").cast("double") / 10000.0).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# q11_important_parts — TPC-H Q11: group sum > fraction of global sum
# ---------------------------------------------------------------------------

_Q11_ORACLE = """
WITH per_part AS (
  SELECT l_partkey, sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS val_c
  FROM lineitem GROUP BY l_partkey
),
total AS (SELECT sum(val_c) AS total_c FROM per_part)
SELECT l_partkey, CAST(val_c AS DOUBLE) / 100.0 AS part_value
FROM per_part, total
WHERE val_c * 2000 > total_c
"""


@register("q11_important_parts", _Q11_ORACLE, "TPC-H Q11-style global-fraction threshold (scalar subquery)")
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        F.sum(_cents(F.col("l_extendedprice"))).alias("val_c")
    )
    total = per_part.agg(F.sum("val_c").alias("total_c"))
    # decorrelated scalar subquery: broadcast the single-row total, exact BIGINT compare
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("val_c") * 2000 > F.col("total_c"))
        .select("l_partkey", (F.col("val_c").cast("double") / 100.0).alias("part_value"))
    )


# ---------------------------------------------------------------------------
# q13_order_distribution — TPC-H Q13: left outer + count distribution
# ---------------------------------------------------------------------------

_Q13_ORACLE = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c LEFT JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
)
GROUP BY c_count
"""


@register("q13_order_distribution", _Q13_ORACLE, "TPC-H Q13-style outer-join count distribution")
def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy(cust.c_custkey)
        .agg(F.count(orders.o_orderkey).alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# ---------------------------------------------------------------------------
# q15_top_supplier — TPC-H Q15: max over aggregated view (exact-cents equality)
# ---------------------------------------------------------------------------

_Q15_ORACLE = f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no, sum({_REV_C_SQL}) AS total_c
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(total_c AS DOUBLE) / 10000.0 AS total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_c = (SELECT max(total_c) FROM revenue)
"""


@register("q15_top_supplier", _Q15_ORACLE, "TPC-H Q15-style max-over-view scalar subquery")
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    supp = load_table(spark, sf_dir, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_rev_c()).alias("total_c")
    )
    mx = revenue.agg(F.max("total_c").alias("max_c"))
    return (
        revenue.crossJoin(F.broadcast(mx))
        .filter(F.col("total_c") == F.col("max_c"))
        .join(F.broadcast(supp), F.col("supplier_no") == supp.s_suppkey)
        .select(
            "s_suppkey", "s_name", (F.col("total_c").cast("double") / 10000.0).alias("total_revenue")
        )
    )


# ---------------------------------------------------------------------------
# q17_small_qty_revenue — TPC-H Q17: correlated avg-quantity threshold
# qty < 0.2 * avg(qty per part)  ⇔  qty_c * 5 * cnt < sum_qty_c  (exact)
# ---------------------------------------------------------------------------

_Q17_ORACLE = """
WITH per_part AS (
  SELECT l_partkey AS pk,
         sum(CAST(round(l_quantity * 100) AS BIGINT)) AS sum_qty_c,
         count(*) AS cnt
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 / 7.0
  AS avg_yearly
FROM lineitem JOIN per_part ON l_partkey = pk
WHERE CAST(round(l_quantity * 100) AS BIGINT) * 5 * cnt < sum_qty_c
"""


@register("q17_small_qty_revenue", _Q17_ORACLE, "TPC-H Q17-style correlated-avg threshold")
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(_cents(F.col("l_quantity"))).alias("sum_qty_c"),
        F.count(F.lit(1)).alias("cnt"),
    )
    return (
        li.join(per_part, li.l_partkey == per_part.pk)
        .filter(_cents(F.col("l_quantity")) * 5 * F.col("cnt") < F.col("sum_qty_c"))
        .agg(
            (F.sum(_cents(F.col("l_extendedprice"))).cast("double") / 100.0 / 7.0).alias(
                "avg_yearly"
            )
        )
    )


# ---------------------------------------------------------------------------
# q18_large_orders — TPC-H Q18: HAVING sum(qty) threshold + join-back
# ---------------------------------------------------------------------------

_Q18_ORACLE = """
WITH big AS (
  SELECT l_orderkey AS k, sum(CAST(round(l_quantity * 100) AS BIGINT)) AS sum_qty_c
  FROM lineitem GROUP BY l_orderkey
  HAVING sum(CAST(round(l_quantity * 100) AS BIGINT)) > 15000
)
SELECT c_name, c_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       o_totalprice,
       CAST(sum_qty_c AS DOUBLE) / 100.0 AS total_qty
FROM big
JOIN orders   ON o_orderkey = k
JOIN customer ON o_custkey = c_custkey
"""


@register("q18_large_orders", _Q18_ORACLE, "TPC-H Q18-style HAVING threshold + join-back", bench=True)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy(F.col("l_orderkey").alias("k"))
        .agg(F.sum(_cents(F.col("l_quantity"))).alias("sum_qty_c"))
        .filter(F.col("sum_qty_c") > 15000)
    )
    return (
        big.join(orders, big.k == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_totalprice",
            (F.col("sum_qty_c").cast("double") / 100.0).alias("total_qty"),
        )
    )


# ---------------------------------------------------------------------------
# q19_disjunctive_revenue — TPC-H Q19: OR-of-ANDs join predicate
# ---------------------------------------------------------------------------

_Q19_ORACLE = f"""
SELECT CAST(sum({_REV_C_SQL}) AS DOUBLE) / 10000.0 AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1  AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
"""


@register("q19_disjunctive_revenue", _Q19_ORACLE, "TPC-H Q19-style disjunctive predicates")
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5) & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10) & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 15) & q.between(20, 30))
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg((F.sum(_rev_c()).cast("double") / 10000.0).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# q20_part_suppliers — TPC-H Q20-style nested semi-join chain
# ---------------------------------------------------------------------------

_Q20_ORACLE = """
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
    AND l_quantity > 30
)
"""


@register("q20_part_suppliers", _Q20_ORACLE, "TPC-H Q20-style nested IN semi-join chain")
def q20_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 30)
    red = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    li_red = li.join(F.broadcast(red), li.l_partkey == red.p_partkey, "left_semi")
    return supp.join(li_red, supp.s_suppkey == li_red.l_suppkey, "left_semi").select(
        "s_suppkey", "s_name"
    )


# ---------------------------------------------------------------------------
# q22_idle_customers — TPC-H Q22: above-avg balance + anti join, name bucket
# bal > avg(positive bals)  ⇔  bal_c * cnt > sum_c  (exact BIGINT)
# ---------------------------------------------------------------------------

_Q22_ORACLE = """
WITH avg_bal AS (
  SELECT sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS sum_c, count(*) AS cnt
  FROM customer WHERE c_acctbal > 0.0
)
SELECT
  substr(c_name, 10, 2) AS name_bucket,
  count(*) AS numcust,
  CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total_bal
FROM customer, avg_bal
WHERE CAST(round(c_acctbal * 100) AS BIGINT) * cnt > sum_c
  AND NOT EXISTS (
    SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
  )
GROUP BY substr(c_name, 10, 2)
"""


@register("q22_idle_customers", _Q22_ORACLE, "TPC-H Q22-style scalar-avg + anti join")
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        F.sum(_cents(F.col("c_acctbal"))).alias("sum_c"), F.count(F.lit(1)).alias("cnt")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(_cents(F.col("c_acctbal")) * F.col("cnt") > F.col("sum_c"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy(F.substring("c_name", 10, 2).alias("name_bucket"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            (F.sum(_cents(F.col("c_acctbal"))).cast("double") / 100.0).alias("total_bal"),
        )
    )


# ---------------------------------------------------------------------------
# window-function family beyond W1: frames, rank, lag
# ---------------------------------------------------------------------------

_CUMSUM_ORACLE = """
SELECT
  o_custkey, o_orderkey,
  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
       OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS UNBOUNDED PRECEDING) AS DOUBLE) / 100.0 AS cum_spend
FROM orders
"""


@register("customer_cumulative_spend", _CUMSUM_ORACLE, "running-sum window frame (rows unbounded preceding)")
def customer_cumulative_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        (F.sum(_cents(F.col("o_totalprice"))).over(w).cast("double") / 100.0).alias("cum_spend"),
    )


_MOVAVG_ORACLE = """
SELECT
  user_id, event_id,
  CAST(sum(CAST(round(value * 100) AS BIGINT))
       OVER w AS DOUBLE) / 100.0 / count(*) OVER w AS moving_avg
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id ROWS 3 PRECEDING)
"""


@register("events_moving_avg", _MOVAVG_ORACLE, "moving average window frame (rows 3 preceding)")
def events_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, Window.currentRow)
    )
    return events.select(
        "user_id",
        "event_id",
        (
            F.sum(_cents(F.col("value"))).over(w).cast("double")
            / 100.0
            / F.count(F.lit(1)).over(w)
        ).alias("moving_avg"),
    )


_TOP3_ORACLE = """
SELECT o_custkey, o_orderkey, o_totalprice FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rnk
  FROM orders
) WHERE rnk <= 3
"""


@register("top3_orders_per_customer", _TOP3_ORACLE, "per-group deterministic top-k (rank window)")
def top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return (
        orders.withColumn("rnk", F.rank().over(w))
        .filter(F.col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


_LAG_ORACLE = """
SELECT o_custkey, o_orderkey,
       datediff('day',
                lag(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
                o_orderdate) AS days_since_prev
FROM orders
"""


@register("order_gaps_lag", _LAG_ORACLE, "lag window + date arithmetic")
def order_gaps_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w)).alias("days_since_prev"),
    )


# ---------------------------------------------------------------------------
# as-of join — clicks matched to latest purchase at-or-before, per user.
# Spark formulation: union with a side marker + last(ignorenulls) running
# window = ONE shuffle + in-partition sort, independent of row ratio.
# Purchases are pre-aggregated to one row per (user, ts) so the at-tie match
# is well-defined on both engines.
# ---------------------------------------------------------------------------

_ASOF_ORACLE = """
WITH clicks AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
),
purchases AS (
  SELECT user_id, ts, max(CAST(round(value * 100) AS BIGINT)) AS pvalue_c
  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
)
SELECT c.event_id, c.user_id,
       strftime(c.ts, '%Y-%m-%dT%H:%M:%S') AS click_ts,
       CAST(p.pvalue_c AS DOUBLE) / 100.0 AS last_purchase_value
FROM clicks c ASOF LEFT JOIN purchases p
  ON c.user_id = p.user_id AND c.ts >= p.ts
"""


@register("asof_clicks_purchases", _ASOF_ORACLE, "as-of join (union + last-ignorenulls window)", bench=True)
def asof_clicks_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", F.lit(1).alias("is_click"), F.lit(None).cast("bigint").alias("pvalue_c")
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max(_cents(F.col("value"))).alias("pvalue_c"))
        .select(F.lit(None).cast("bigint").alias("event_id"), "user_id", "ts", F.lit(0).alias("is_click"), "pvalue_c")
    )
    # at equal ts the purchase row sorts first (is_click 0 < 1), so a click at
    # the same instant sees it — matching ASOF's >= inclusive semantics
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_click")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = clicks.unionByName(purchases).withColumn(
        "last_pvalue_c", F.last("pvalue_c", ignorenulls=True).over(w)
    )
    return merged.filter(F.col("is_click") == 1).select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss").alias("click_ts"),
        (F.col("last_pvalue_c").cast("double") / 100.0).alias("last_purchase_value"),
    )


# ---------------------------------------------------------------------------
# count-distinct family — exact single + multi distinct aggregates.
# Multi-distinct compiles to an Expand-based plan (one row replicated per
# distinct group) — partial aggregation still applies, so it scales; the
# approx variant (approx_count_distinct/HLL) is the 100 TB path and is
# pinned by a rows-only check since sketches differ across engines.
# ---------------------------------------------------------------------------

_CNTD_ORACLE = """
SELECT
  l_returnflag,
  count(DISTINCT l_partkey)  AS n_parts,
  count(DISTINCT l_suppkey)  AS n_supps,
  count(DISTINCT l_orderkey) AS n_orders,
  count(*) AS n_rows
FROM lineitem
GROUP BY l_returnflag
"""


@register("lineitem_multi_distinct", _CNTD_ORACLE, "multi count-distinct (Expand plan)")
def lineitem_multi_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.count(F.lit(1)).alias("n_rows"),
    )


_APPROX_DISTINCT_ORACLE = """
SELECT
  l_returnflag,
  count(DISTINCT l_partkey) AS n_parts_exact,
  TRUE AS within_5pct
FROM lineitem
GROUP BY l_returnflag
"""


@register(
    "approx_distinct_parts",
    _APPROX_DISTINCT_ORACLE,
    "approx_count_distinct (HLL sketch) bounds-checked against exact distinct",
)
def approx_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL sketches differ across engines, so the raw estimate can't be
    hash-compared. Instead emit the exact distinct count plus a boolean
    asserting the HLL estimate landed within 5% of it; the oracle computes
    the same exact count with a constant TRUE. A broken sketch (or a broken
    exact path) flips the boolean / count and fails the hash."""
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.01).alias("_approx"),
        F.countDistinct("l_partkey").alias("n_parts_exact"),
    )
    return agg.select(
        "l_returnflag",
        "n_parts_exact",
        (
            F.abs(F.col("_approx") - F.col("n_parts_exact"))
            / F.col("n_parts_exact")
            <= F.lit(0.05)
        ).alias("within_5pct"),
    )


# ---------------------------------------------------------------------------
# grouping sets / cube — completes the multi-dimensional agg family
# (reference has only plain GROUP BY; rollup already covered)
# ---------------------------------------------------------------------------

_CUBE_ORACLE = """
SELECT
  coalesce(o_orderstatus, 'ALL') AS status,
  coalesce(c_mktsegment, 'ALL')  AS segment,
  grouping(o_orderstatus) AS g_status,
  grouping(c_mktsegment)  AS g_segment,
  count(*) AS n
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY CUBE (o_orderstatus, c_mktsegment)
"""


@register("orders_cube", _CUBE_ORACLE, "CUBE + grouping() disambiguation")
def orders_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .cube("o_orderstatus", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            # grouping() is only resolvable inside the Aggregate itself
            F.grouping("o_orderstatus").cast("bigint").alias("g_status"),
            F.grouping("c_mktsegment").cast("bigint").alias("g_segment"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("c_mktsegment", F.lit("ALL")).alias("segment"),
            "g_status",
            "g_segment",
            "n",
        )
    )


# ---------------------------------------------------------------------------
# q16_supplier_part_counts — TPC-H Q16: NOT-IN anti join + count distinct
# (testdata has no partsupp; the distinct (partkey, suppkey) pairs observed in
# lineitem stand in for it, which preserves the shape: dedup → anti join →
# grouped COUNT(DISTINCT). Reference has no subquery machinery at all —
# SURVEY.md §2.3 J-family extension.)
# ---------------------------------------------------------------------------

_Q16_ORACLE = """
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#5'
  AND p_type NOT LIKE 'PROMO%'
  AND p_size IN (1, 4, 9, 14, 23, 36, 45, 49)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""


@register(
    "q16_supplier_part_counts",
    _Q16_ORACLE,
    "TPC-H Q16-style NOT-IN exclusion + grouped count-distinct",
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape on the lineitem-derived part↔supplier relation.

    Plan choices for scale: the distinct pair set is a map-side-combinable
    aggregate on (partkey, suppkey); the NOT-IN is a broadcast left-anti join
    (supplier is the small side — NULL-safe here because s_suppkey is a key);
    part is broadcast so the only shuffle is the final group-by.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")

    pairs = li.select("l_partkey", "l_suppkey").distinct()
    bad_supp = supp.where(F.col("s_acctbal") < 0).select("s_suppkey")
    kept = pairs.join(
        F.broadcast(bad_supp), pairs.l_suppkey == bad_supp.s_suppkey, "left_anti"
    )
    pset = part.where(
        (F.col("p_brand") != "Brand#5")
        & ~F.col("p_type").startswith("PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 23, 36, 45, 49)
    )
    return (
        kept.join(F.broadcast(pset), kept.l_partkey == pset.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# q21_waiting_supplier — TPC-H Q21: EXISTS + NOT-EXISTS self-correlation,
# decorrelated into one per-order aggregate (the scale-out plan)
# ---------------------------------------------------------------------------

_Q21_ORACLE = """
SELECT s_name, count(*) AS numwait
FROM lineitem l1
JOIN orders   ON l1.l_orderkey = o_orderkey
JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    JOIN orders o3 ON l3.l_orderkey = o3.o_orderkey
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY)
GROUP BY s_name
"""


@register(
    "q21_waiting_supplier",
    _Q21_ORACLE,
    "TPC-H Q21-style EXISTS/NOT-EXISTS self-correlation, aggregate-decorrelated",
    bench=True,
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers solely responsible for late multi-supplier 'F' orders.

    Instead of the two correlated self-joins the SQL implies (EXISTS + NOT
    EXISTS over lineitem — two extra shuffles of the fact table and a
    worst-case O(n·k) probe), compute one per-order aggregate:
    n_supps = COUNT(DISTINCT suppkey), n_late_supps = COUNT(DISTINCT suppkey
    WHERE late). A late line qualifies iff its order has n_supps > 1 and
    n_late_supps = 1 (that distinct late supplier is necessarily this line's).

    The fact table is scanned ONCE: the (order, supplier) rollup also
    carries n_late_lines = SUM(is_late), so the qualifying count per
    supplier is a sum over rollup rows — the former second lineitem pass
    (filter late lines + re-join per-order stats) collapses into a filter
    on the already-aggregated pair relation. Row multiplicity of l1 is
    preserved exactly: a qualifying order's single late supplier
    contributes its n_late_lines late lines, which is precisely the set of
    qualifying l1 rows.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")

    f_orders = orders.where(F.col("o_orderstatus") == "F").select("o_orderkey", "o_orderdate")
    lif = li.join(f_orders, li.l_orderkey == f_orders.o_orderkey).withColumn(
        "is_late",
        (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")).cast("int"),
    )
    # two stacked plain aggregates instead of a double COUNT(DISTINCT):
    # the distinct-pair rollup is map-side combinable and the second agg
    # reads the already-shuffled (orderkey, suppkey) relation — no Expand
    # (which would triple the shuffle rows to serve two DISTINCT branches)
    per_supp = lif.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("is_late").alias("supp_late"),
        F.sum("is_late").cast("bigint").alias("n_late_lines"),
    )
    per_order = per_supp.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supps"),
        F.sum("supp_late").alias("n_late_supps"),
    )
    qualifying = (
        per_supp.where(F.col("supp_late") == 1)
        .join(per_order, "l_orderkey")
        .where((F.col("n_supps") > 1) & (F.col("n_late_supps") == 1))
    )
    return (
        qualifying.join(F.broadcast(supp), qualifying.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.sum("n_late_lines").alias("numwait"))
    )


# ---------------------------------------------------------------------------
# table maintenance: one-pass column statistics, keyed upsert merge
# ---------------------------------------------------------------------------

_STATS_COLS = ["l_orderkey", "l_partkey", "l_quantity", "l_extendedprice"]

_STATS_ORACLE = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS column,
       count(*) AS n_rows,
       CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
       count(DISTINCT {c}) AS n_distinct,
       CAST(min({c}) AS DOUBLE) AS min_v,
       CAST(max({c}) AS DOUBLE) AS max_v
FROM lineitem"""
    for c in _STATS_COLS
)


@register(
    "lineitem_column_stats",
    _STATS_ORACLE,
    "one-pass per-column stats (nulls, exact NDV, min/max) — the optimizer-stats surface",
)
def lineitem_column_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckpipe_spark.operators.maintenance import table_stats

    return table_stats(load_table(spark, sf_dir, "lineitem"), _STATS_COLS)


_MERGE_ORACLE = """
WITH updates AS (
  SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) * 2 AS price_c
  FROM orders WHERE o_orderkey % 10 = 0
),
survivors AS (
  SELECT o.o_orderkey, CAST(round(o.o_totalprice * 100) AS BIGINT) AS price_c
  FROM orders o ANTI JOIN updates u ON o.o_orderkey = u.o_orderkey
)
SELECT * FROM updates UNION ALL SELECT * FROM survivors
"""


@register(
    "orders_merge_upsert",
    _MERGE_ORACLE,
    "keyed last-writer-wins merge (batch MERGE INTO): updates replace, base survives",
)
def orders_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckpipe_spark.operators.maintenance import merge_upsert

    orders = load_table(spark, sf_dir, "orders")
    price_c = F.round(F.col("o_totalprice") * 100).cast("bigint")
    base = orders.select("o_orderkey", price_c.alias("price_c"))
    updates = (
        orders.where(F.col("o_orderkey") % 10 == 0)
        .select("o_orderkey", (price_c * 2).alias("price_c"))
    )
    return merge_upsert(base, updates, "o_orderkey")


_HIST_LO, _HIST_HI, _HIST_BINS = 0.0, 80000.0, 16
_HIST_W = (_HIST_HI - _HIST_LO) / _HIST_BINS

_HIST_ORACLE = f"""
SELECT
  least(greatest(CAST(floor((CAST(l_extendedprice AS DOUBLE) - {_HIST_LO!r}) / {_HIST_W!r}) AS BIGINT),
                 0), {_HIST_BINS - 1}) AS bucket,
  count(*) AS n
FROM lineitem
WHERE l_extendedprice IS NOT NULL
GROUP BY 1
"""


@register(
    "lineitem_price_histogram",
    _HIST_ORACLE,
    "equi-width value histogram (skew diagnosis; clamped edge buckets)",
)
def lineitem_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckpipe_spark.operators.maintenance import column_histogram

    return column_histogram(
        load_table(spark, sf_dir, "lineitem"), "l_extendedprice", _HIST_LO, _HIST_HI, _HIST_BINS
    )


_FULL_OUTER_ORACLE = """
WITH y97 AS (
  SELECT o_custkey, count(*) AS n97 FROM orders
  WHERE year(o_orderdate) = 1997 GROUP BY o_custkey
),
y98 AS (
  SELECT o_custkey, count(*) AS n98 FROM orders
  WHERE year(o_orderdate) = 1998 GROUP BY o_custkey
)
SELECT COALESCE(y97.o_custkey, y98.o_custkey) AS custkey,
       COALESCE(n97, 0) AS n97,
       COALESCE(n98, 0) AS n98,
       COALESCE(n98, 0) - COALESCE(n97, 0) AS delta
FROM y97 FULL OUTER JOIN y98 ON y97.o_custkey = y98.o_custkey
"""


@register(
    "custkey_yearly_delta_full_outer",
    _FULL_OUTER_ORACLE,
    "FULL OUTER join of two yearly aggregates with zero-coalesced delta",
)
def custkey_yearly_delta_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year activity comparison keeping customers present in
    EITHER year — the join type the skeleton densification family (J8)
    cannot express. Both sides shuffle once on the key; at scale this is a
    single co-partitioned SMJ (or shuffle-hash under AQE)."""
    orders = load_table(spark, sf_dir, "orders")

    def per_year(y, alias):
        return (
            orders.where(F.year("o_orderdate") == y)
            .groupBy("o_custkey")
            .agg(F.count(F.lit(1)).alias(alias))
        )

    a, b = per_year(1997, "n97"), per_year(1998, "n98")
    return (
        a.join(b, "o_custkey", "full_outer")
        .select(
            F.col("o_custkey").alias("custkey"),
            F.coalesce("n97", F.lit(0)).alias("n97"),
            F.coalesce("n98", F.lit(0)).alias("n98"),
            (F.coalesce("n98", F.lit(0)) - F.coalesce("n97", F.lit(0))).alias("delta"),
        )
    )


_NTILE_ORACLE = """
WITH spend AS (
  SELECT o_custkey AS custkey,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY 1
), tiled AS (
  SELECT custkey, cents,
         ntile(4) OVER (ORDER BY cents DESC, custkey) AS quartile
  FROM spend
)
SELECT quartile,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(cents) AS BIGINT) AS spend_cents,
       CAST(min(cents) AS BIGINT) AS floor_cents
FROM tiled GROUP BY 1
"""


@register(
    "customer_spend_quartiles",
    _NTILE_ORACLE,
    "ntile(4) spend quartiles over a global ordering with unique tie-break",
)
def customer_spend_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quartile segmentation of customers by lifetime spend — the ntile
    window function over a GLOBAL ordering (the one window type the catalog
    did not yet exercise). Deterministic because the ordering is total
    (cents desc, custkey): ntile's row assignment is then a pure function
    of the data on any engine.

    Scale note: a global ntile forces a single-partition sort — inherent to
    the semantics (any engine must totally order the input). For per-group
    tiling at 100 TB, partitionBy the window instead; this query pins the
    harder single-ordering case at aggregate (per-customer) cardinality,
    which is the realistic use (segment the CUSTOMER table, not the raw
    fact table)."""
    orders = load_table(spark, sf_dir, "orders")
    spend = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("cents")
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("cents").desc(), "custkey")
    tiled = spend.withColumn("quartile", F.ntile(4).over(w))
    return tiled.groupBy("quartile").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("cents").alias("spend_cents"),
        F.min("cents").alias("floor_cents"),
    )


def _hll_oracle() -> str:
    from duckpipe_spark.functions.sketches import hll_oracle_sql

    inner = hll_oracle_sql("lineitem", "l_partkey", ["l_returnflag"]).strip()
    return f"""
WITH hll AS ({inner}),
exact AS (
  SELECT l_returnflag, CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_distinct
  FROM lineitem GROUP BY 1
)
SELECT hll.l_returnflag AS returnflag, hll.hll_distinct, exact.exact_distinct
FROM hll JOIN exact USING (l_returnflag)
"""


@register(
    "parts_hll_distinct",
    _hll_oracle(),
    "deterministic cross-engine HyperLogLog vs the exact distinct count",
)
def parts_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct parts per return flag, twice: a from-scratch deterministic
    HLL (functions/sketches.py — same integer sketch and same IEEE
    estimate on both engines, so the gate hash-verifies an APPROXIMATE
    operator exactly) next to the exact count. Unlike
    approx_count_distinct (rows-only: engine sketches differ), this HLL
    is portable by construction; its 256 MAX-mergeable registers per
    group are the 100 TB shape — shards combine without re-scanning."""
    from duckpipe_spark.functions.sketches import hll_distinct

    li = load_table(spark, sf_dir, "lineitem")
    hll = hll_distinct(li, "l_partkey", ["l_returnflag"])
    exact = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("exact_distinct")
    )
    return (
        hll.join(exact, "l_returnflag")
        .select(
            F.col("l_returnflag").alias("returnflag"),
            "hll_distinct",
            "exact_distinct",
        )
    )


def _cm_oracle() -> str:
    from duckpipe_spark.functions.sketches import cm_oracle_sql

    inner = cm_oracle_sql(
        "lineitem", "l_partkey", "SELECT DISTINCT l_partkey FROM lineitem"
    ).strip()
    return f"""
WITH cm AS ({inner}),
exact AS (
  SELECT l_partkey, CAST(count(*) AS BIGINT) AS exact_count
  FROM lineitem GROUP BY 1
)
SELECT cm.l_partkey AS part, cm.cm_count, exact.exact_count
FROM cm JOIN exact USING (l_partkey)
"""


@register(
    "parts_cm_frequencies",
    _cm_oracle(),
    "deterministic Count-Min frequency estimates vs exact per-key counts",
)
def parts_cm_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-part lineitem frequency, twice: a 4x1024 Count-Min sketch
    (functions/sketches.py — all-integer, SUM-mergeable, always-broadcast
    probe) next to the exact count. The estimate is a deterministic upper
    bound (min over 4 hashed cells), identical on both engines, so the
    gate hash-verifies the frequency-sketch family the way
    parts_hll_distinct verifies cardinality."""
    from duckpipe_spark.functions.sketches import cm_estimate, cm_sketch

    li = load_table(spark, sf_dir, "lineitem")
    sk = cm_sketch(li.select("l_partkey"), "l_partkey")
    keys = li.select("l_partkey").distinct()
    est = cm_estimate(sk, keys, "l_partkey")
    exact = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("exact_count"))
    return est.join(exact, "l_partkey").select(
        F.col("l_partkey").alias("part"), "cm_count", "exact_count"
    )


def _bloom_oracle() -> str:
    from duckpipe_spark.functions.sketches import bloom_oracle_sql

    inner = bloom_oracle_sql(
        "SELECT c_custkey AS k FROM customer WHERE c_acctbal < 0",
        "(SELECT DISTINCT o_custkey AS k FROM orders) pk",
        "k",
    ).strip()
    return f"""
WITH probed AS ({inner}),
blocked AS (SELECT c_custkey AS k FROM customer WHERE c_acctbal < 0),
ord_counts AS (
  SELECT o_custkey AS k, CAST(count(*) AS BIGINT) AS n_orders FROM orders GROUP BY 1
)
SELECT probed.k AS custkey,
       probed.maybe_member AS maybe_blocked,
       CAST(CASE WHEN blocked.k IS NOT NULL THEN 1 ELSE 0 END AS INT) AS is_blocked,
       ord_counts.n_orders
FROM probed
LEFT JOIN blocked ON probed.k = blocked.k
JOIN ord_counts ON probed.k = ord_counts.k
"""


@register(
    "orders_bloom_blocklist",
    _bloom_oracle(),
    "deterministic Bloom-filter blocklist probe: false positives hash-verified",
)
def orders_bloom_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The broadcast-Bloom blocklist pattern: build a 2048-bit filter over
    negative-balance customers, probe every ordering customer, and emit
    the Bloom verdict NEXT TO the exact membership — so the driver gate
    hash-verifies the sketch's one-sided error behavior itself (every
    is_blocked=1 row must carry maybe_blocked=1; the deterministic false
    positives match DuckDB's bit for bit). At 100 TB the filter stays
    <=32 broadcast rows while the exact key set would be a shuffle join
    — the decontamination/blocklist scale path of functions/sketches.py."""
    from duckpipe_spark.functions.sketches import bloom_build, bloom_probe

    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    block = cust.where(F.col("c_acctbal") < 0).select(F.col("c_custkey").alias("k"))
    filt = bloom_build(block, "k")
    # ONE aggregation yields both the distinct probe keys and their order
    # counts — the previous separate .distinct() shuffled the same
    # o_custkey stream a second time and then paid a key-join to stitch
    # the two aggregates back together (r6: one shuffle, no stitch join)
    counts = orders.groupBy(F.col("o_custkey").alias("k")).agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    probed = bloom_probe(filt, counts, "k")
    return (
        probed.join(block.withColumn("__b", F.lit(1)), "k", "left")
        .select(
            F.col("k").alias("custkey"),
            F.col("maybe_member").alias("maybe_blocked"),
            F.coalesce("__b", F.lit(0)).cast("int").alias("is_blocked"),
            "n_orders",
        )
    )


def _quantile_sketch_oracle() -> str:
    from duckpipe_spark.functions.sketches import sampled_quantiles_oracle_sql

    inner = sampled_quantiles_oracle_sql(
        "(SELECT l_returnflag,"
        " CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,"
        " l_orderkey * 8 + l_linenumber AS rid FROM lineitem)",
        "cents",
        "rid",
        ["l_returnflag"],
    ).strip()
    return f"SELECT l_returnflag AS returnflag, n_sampled, q25, q50, q75, q90, q99 FROM ({inner})"


@register(
    "lineitem_price_quantiles",
    _quantile_sketch_oracle(),
    "deterministic sampled-quantile sketch (4th sketch family member)",
)
def lineitem_price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price quantiles per return flag from a deterministic 512-row
    priority sample (functions/sketches.py `sampled_quantiles`): where
    approx_percentile is rows-only-checkable (engine-internal GK/KLL
    sketches differ), this sketch is a pure function of the data — the k
    smallest id-hash priorities per group, exact lower-index quantiles of
    the sorted sample — so the gate hash-verifies an approximate-quantile
    operator exactly, like the HLL/Count-Min/Bloom siblings. Prices are
    integer cents (the repo's no-float-money rule). Scale shape: one rank
    window per group with top-k state, then a k-bounded fold; shard
    samples re-rank to merge."""
    from duckpipe_spark.functions.sketches import sampled_quantiles

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)").alias("cents"),
        F.expr("l_orderkey * 8 + l_linenumber").alias("rid"),
    )
    out = sampled_quantiles(li, "cents", "rid", ["l_returnflag"])
    return out.select(
        F.col("l_returnflag").alias("returnflag"),
        "n_sampled", "q25", "q50", "q75", "q90", "q99",
    )
