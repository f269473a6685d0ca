"""Second batch of TPC-H-derived golden plans (Q8/Q9/Q14/Q17/Q18/Q19/Q22).

Adapted to the reduced fixture schema (FIXTURES.md): no partsupp table,
no l_shipmode/l_commitdate/p_container/c_phone — each query keeps the
reference query's *shape* (the join topology and aggregation pattern
that stress the planner) and swaps unavailable predicates for
equivalents on existing columns.

Determinism discipline (SURVEY §2.12, round-1 lessons):
- ratio outputs use FLOOR(num/den * 10^k) on ROUND-ed operands — both
  engines then divide bit-identical doubles and FLOOR is tie-free,
  where ROUND(ratio, k) is HALF_UP-vs-HALF_EVEN unsafe;
- l_quantity is integral (verified) → its sums/avgs are IEEE-exact in
  any summation order, so avg-threshold comparisons (Q17) are safe;
- money sums are ROUND(x, 2) of 2-decimal inputs on both sides.

Scale notes (100 TB):
- Q8/Q9 are the widest star joins in the suite (7–8 relations).
  region/nation stay broadcast at any scale; part/supplier filters are
  pushed to the scan so AQE sizes the surviving build sides from
  runtime stats; lineitem⋈orders is the one unavoidable big shuffle.
- Q17's per-part average is a fact-side partial aggregate (map-side
  combine on l_partkey) joined back — no correlated re-scan per row.
- Q18's HAVING filter collapses lineitem to qualifying orderkeys
  before anything touches customer/orders: semi-join pushdown shape.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from graphsense_datafeed_spark.registry import query
from graphsense_datafeed_spark.sources.tables import load

# NB: must be lazy — classic-mode F.col() requires an active SparkContext,
# and this module is imported (registry side-effect) before any session
# exists in pytest collection.
def _volume():
    return (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume")


@query(
    "golden_q8_market_share",
    """
    SELECT o_year,
           CAST(FLOOR(ROUND(SUM(CASE WHEN nation = 'NATION_7' THEN volume ELSE 0 END), 2)
                      / ROUND(SUM(volume), 2) * 10000) AS BIGINT) AS mkt_share_bp
    FROM (
      SELECT EXTRACT(year FROM o_orderdate) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n2.n_name AS nation
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region    ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'ASIA' AND p_type LIKE 'PROMO%'
    ) t
    GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: national market share inside one region.

    8-relation star with nation joined twice (customer side n1 fixes
    the region; supplier side n2 is the share dimension). The CASE-sum
    over the same aggregate input gives the share numerator without a
    second pass.
    """
    part = load(spark, sf_dir, "part").filter(F.col("p_type").like("PROMO%"))
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    n1 = load(spark, sf_dir, "nation").alias("n1")
    n2 = load(spark, sf_dir, "nation").alias("n2")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")

    joined = (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), cust.c_nationkey == F.col("n1.n_nationkey"))
        .join(F.broadcast(region), F.col("n1.n_regionkey") == region.r_regionkey)
        .join(F.broadcast(n2), supp.s_nationkey == F.col("n2.n_nationkey"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            _volume(),
            F.col("n2.n_name").alias("nation"),
        )
    )
    num = F.round(
        F.sum(F.when(F.col("nation") == "NATION_7", F.col("volume")).otherwise(0.0)), 2
    )
    den = F.round(F.sum("volume"), 2)
    return joined.groupBy("o_year").agg(
        F.floor(num / den * 10000).cast("bigint").alias("mkt_share_bp")
    )


@query(
    "golden_q9_profit",
    """
    SELECT nation, o_year,
           CAST(SUM(CAST(ROUND(volume * 10000) AS BIGINT)) AS BIGINT) AS sum_profit_e4
    FROM (
      SELECT n_name AS nation,
             EXTRACT(year FROM o_orderdate) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%widget%'
    ) t
    GROUP BY nation, o_year
    """,
)
def q9_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation and order year.

    Adapted: no partsupp table in the fixtures, so profit is the
    discounted revenue rather than revenue minus ps_supplycost; the
    join topology (part-filtered fact, supplier→nation rollup, order
    year) is what the query exists to exercise.

    The measure is summed in integral ten-thousandths: volume is an
    exact 4-decimal quantity, so per-row ROUND(volume*1e4) lands on the
    same integer in both engines and the integer sum is order-exact —
    ROUND(SUM(volume), 2) over 175 groups hit a genuine half-cent tie
    at sf0.01 (HALF_UP vs HALF_EVEN).
    """
    part = load(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    orders = load(spark, sf_dir, "orders")
    nation = load(spark, sf_dir, "nation")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"), _volume())
        .groupBy("nation", "o_year")
        .agg(
            F.sum(F.round(F.col("volume") * 10000).cast("bigint")).alias("sum_profit_e4")
        )
    )


@query(
    "golden_q14_promo",
    """
    SELECT CAST(FLOOR(ROUND(SUM(CASE WHEN p_type LIKE 'PROMO%'
                                     THEN l_extendedprice * (1 - l_discount)
                                     ELSE 0 END), 2)
                      / ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)
                      * 10000) AS BIGINT) AS promo_share_bp,
           COUNT(*) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE CAST(l_shipdate AS DATE) >= DATE '1997-03-01'
      AND CAST(l_shipdate AS DATE) <  DATE '1997-04-01'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promotion revenue share for one ship month."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate").cast("date") >= F.lit("1997-03-01").cast("date"))
        & (F.col("l_shipdate").cast("date") < F.lit("1997-04-01").cast("date"))
    )
    part = load(spark, sf_dir, "part")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    num = F.round(F.sum(F.when(F.col("p_type").like("PROMO%"), vol).otherwise(0.0)), 2)
    den = F.round(F.sum(vol), 2)
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            F.floor(num / den * 10000).cast("bigint").alias("promo_share_bp"),
            F.count("*").alias("n_lines"),
        )
    )


@query(
    "golden_q17_small_qty",
    """
    SELECT ROUND(SUM(l_extendedprice), 2) AS total_revenue,
           COUNT(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#1'
      AND l_quantity < (SELECT 0.2 * AVG(l_quantity)
                        FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
    """,
)
def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from unusually small orders per part.

    The correlated AVG subquery is decorrelated by hand into a per-part
    partial aggregate joined back to the fact — at scale this is one
    map-side-combined agg over l_partkey plus a broadcast-or-shuffle
    equi-join, never a per-row re-scan. Safe as an exact oracle because
    l_quantity is integral (verified): both engines' averages are
    IEEE-exact regardless of summation order.
    """
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    avg_qty = li.groupBy("l_partkey").agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_threshold")
    ).withColumnRenamed("l_partkey", "t_partkey")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(avg_qty, li.l_partkey == avg_qty.t_partkey)
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            F.round(F.sum("l_extendedprice"), 2).alias("total_revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@query(
    "golden_q18_large_orders",
    """
    SELECT c_name, c_custkey, o_orderkey,
           CAST(o_orderdate AS DATE) AS orderdate,
           o_totalprice,
           ROUND(qty, 2) AS total_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN (SELECT l_orderkey, SUM(l_quantity) AS qty
          FROM lineitem GROUP BY l_orderkey
          HAVING SUM(l_quantity) > 250) big ON o_orderkey = big.l_orderkey
    """,
)
def q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: large-volume orders (HAVING-filtered fact rollup).

    The lineitem rollup runs first and keeps only qualifying orderkeys
    (~1% of orders at threshold 250, verified across SFs), so the joins
    up to customer see a tiny build side — AQE demotes them to
    broadcast at runtime.
    """
    li = load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 250)
    )
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("orderdate"),
            "o_totalprice",
            F.round(F.col("qty"), 2).alias("total_qty"),
        )
    )


@query(
    "golden_q19_disjunctive",
    """
    SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
           AND l_quantity BETWEEN 10 AND 35)
       OR (p_type LIKE 'PROMO%' AND p_size BETWEEN 20 AND 50
           AND l_quantity BETWEEN 20 AND 50)
    """,
)
def q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs predicate spanning both join sides.

    Adapted (no p_container/l_shipmode): three disjunctive branches
    mixing part-side and lineitem-side conjuncts. Catalyst extracts the
    common-side implications of the OR so each scan still gets a
    partial pushed filter, and the residual evaluates post-join.
    """
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    q = F.col("l_quantity")
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & q.between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(10, 30)
            & q.between(10, 35)
        )
        | (
            F.col("p_type").like("PROMO%")
            & F.col("p_size").between(20, 50)
            & q.between(20, 50)
        )
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count("*").alias("n_lines"),
        )
    )


@query(
    "golden_q22_inactive",
    """
    SELECT cc, COUNT(*) AS n_cust, ROUND(SUM(c_acctbal), 2) AS total_bal
    FROM (
      SELECT c_custkey % 7 AS cc, c_acctbal
      FROM customer
      WHERE c_custkey % 7 IN (1, 3, 5)
        AND c_acctbal > (SELECT AVG(c_acctbal) FROM customer
                         WHERE c_acctbal > 0 AND c_custkey % 7 IN (1, 3, 5))
        AND NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey
                          AND CAST(o_orderdate AS DATE) >= DATE '2000-06-01')
    ) t
    GROUP BY cc
    """,
)
def q22_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: positive-balance customers gone inactive.

    Adapted: no c_phone → the "country code" is c_custkey % 7; "no
    orders" never happens in the fixtures (referential integrity is
    total, verified) → the anti-join is against *recent* orders
    instead. Scalar-average subquery → literal broadcast; NOT EXISTS →
    left_anti join, both the decorrelations Catalyst itself applies.
    """
    cust = load(spark, sf_dir, "customer").withColumn(
        "cc", F.col("c_custkey") % 7
    )
    eligible = cust.filter(F.col("cc").isin(1, 3, 5))
    avg_bal = (
        eligible.filter(F.col("c_acctbal") > 0)
        .agg(F.avg("c_acctbal").alias("a"))
    )
    recent = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").cast("date") >= F.lit("2000-06-01").cast("date")
    )
    return (
        eligible.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(recent, eligible.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("cc")
        .agg(
            F.count("*").alias("n_cust"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
    )
