"""Third batch of TPC-H-derived golden plans (Q2/Q11/Q12/Q16/Q20/Q21).

Completes the TPC-H shape coverage: with these, every one of the 22
reference queries whose join/subquery topology is expressible over the
reduced fixture schema (FIXTURES.md) has a golden adaptation. The six
here are the subquery-heavy tail:

- Q2  — correlated MIN subquery decorrelated into a per-key partial
        aggregate joined back (the same decorrelation Catalyst applies
        to the SQL form);
- Q11 — group aggregate HAVING-compared against a scalar subquery over
        the *same* source (one shared scan, two aggregation scopes);
- Q12 — two-sided CASE-sum classification join;
- Q16 — NOT IN → left-anti + COUNT(DISTINCT) over a bridge;
- Q20 — nested IN chain → semi-join ladder;
- Q21 — EXISTS + NOT EXISTS dual self-join on the fact table.

Schema adaptations (no partsupp / l_shipmode / l_commitdate /
l_receiptdate / p_container / s_comment in the fixtures):
- the part<->supplier bridge everywhere partsupp is required is the
  *observed* bridge `SELECT DISTINCT l_partkey, l_suppkey FROM
  lineitem` — same key structure, same join topology;
- Q12's ship modes are derived deterministically from l_linenumber
  (`MOD 3` -> MAIL/SHIP/TRUCK); Q21's "late delivery" proxy is
  l_returnflag = 'R' (no receipt/commit dates to compare).

Determinism discipline (SURVEY §2.12, round-1 lessons): l_extendedprice
is NOT 2-decimal in the fixtures (6 714 rows at sf0.01 carry more
digits), so money measures here never use ROUND — they use
FLOOR(product) per row cast to BIGINT (tie-free, bit-identical in both
engines because the double product is) and integer sums thereafter.
Threshold comparisons are integer-vs-integer (Q11) or double-vs-double
on identically-computed values (Q2's MIN, Q20's integral-quantity SUM).

Scale notes (100 TB):
- Q2/Q16/Q20 hinge on the DISTINCT (partkey, suppkey) bridge: a single
  map-side-combinable distinct over two narrow columns, orders of
  magnitude smaller than lineitem, after which every downstream join
  sees dimension-sized inputs (AQE demotes them to broadcast).
- Q11's scalar total is one extra reduction over the SAME shuffled
  partial aggregate — Spark reuses the exchange (ReusedExchange in the
  plan) rather than rescanning lineitem.
- Q21 self-joins lineitem twice but only on l_orderkey after a
  returnflag filter: both sides shuffle on the same key, so the two
  probes co-partition with the l1 build — three scans, ONE exchange
  key, no replication.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from graphsense_datafeed_spark.registry import query
from graphsense_datafeed_spark.sources.tables import load


@query(
    "golden_q2_min_cost",
    """
    SELECT p_partkey, p_brand, s_name, n_name,
           CAST(FLOOR(min_price) AS BIGINT) AS min_price_fl
    FROM (
      SELECT l_partkey, MIN(l_extendedprice) AS min_price
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
      GROUP BY l_partkey
    ) best
    JOIN lineitem ON lineitem.l_partkey = best.l_partkey
                 AND l_extendedprice = best.min_price
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    JOIN part     ON p_partkey = best.l_partkey
    WHERE r_name = 'EUROPE' AND p_size BETWEEN 1 AND 10
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: cheapest European supplier per part.

    The reference's correlated `ps_supplycost = (SELECT MIN(...))` is
    decorrelated by hand: one per-part MIN over the region-restricted
    offers, equality-joined back to the offers to recover the winning
    supplier rows (ties keep all winners, exactly as the SQL does).
    MIN carries a raw input double — no arithmetic — so the equality
    rejoin and the FLOOR output are bit-exact in both engines.
    """
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    nation = load(spark, sf_dir, "nation")
    supp = load(spark, sf_dir, "supplier")
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(F.col("p_size").between(1, 10))

    euro_offers = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("l_partkey", "l_extendedprice", "s_name", "n_name")
    )
    best = euro_offers.groupBy("l_partkey").agg(
        F.min("l_extendedprice").alias("min_price")
    ).withColumnRenamed("l_partkey", "b_partkey")
    return (
        euro_offers.join(
            best,
            (euro_offers.l_partkey == best.b_partkey)
            & (euro_offers.l_extendedprice == best.min_price),
        )
        .join(part, F.col("l_partkey") == part.p_partkey)
        .select(
            "p_partkey",
            "p_brand",
            "s_name",
            "n_name",
            F.floor("min_price").cast("bigint").alias("min_price_fl"),
        )
    )


@query(
    "golden_q11_important_stock",
    """
    WITH vals AS (
      SELECT l_partkey,
             CAST(SUM(CAST(FLOOR(l_extendedprice * l_quantity) AS BIGINT))
                  AS BIGINT) AS value_fl
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_3'
      GROUP BY l_partkey
    )
    SELECT l_partkey, value_fl
    FROM vals
    WHERE value_fl * 500 > (SELECT CAST(SUM(value_fl) AS BIGINT) FROM vals)
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts holding an outsized share of one
    nation's stock value.

    The HAVING threshold is a scalar subquery over the SAME grouped
    aggregate — built once, used twice, so the plan reuses the shuffle
    (ReusedExchange) instead of rescanning lineitem. The measure is
    per-row FLOOR(price*qty) summed as BIGINT: the double product is
    bit-identical in both engines, FLOOR is tie-free, and the integer
    sum is order-independent — then the 0.2 % share threshold is the
    integer comparison value*500 > total.
    """
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    vals = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("l_partkey")
        .agg(
            F.sum(
                F.floor(F.col("l_extendedprice") * F.col("l_quantity")).cast("bigint")
            )
            .cast("bigint")
            .alias("value_fl")
        )
    )
    total = vals.agg(F.sum("value_fl").cast("bigint").alias("grand_total"))
    return (
        vals.join(F.broadcast(total))
        .filter(F.col("value_fl") * 500 > F.col("grand_total"))
        .select("l_partkey", "value_fl")
    )


@query(
    "golden_q12_shipmode_priority",
    """
    SELECT CASE MOD(l_linenumber, 3) WHEN 0 THEN 'MAIL'
                                     WHEN 1 THEN 'SHIP'
                                     ELSE 'TRUCK' END AS ship_mode,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
      AND CAST(l_shipdate AS DATE) <  DATE '1998-01-01'
    GROUP BY 1
    """,
)
def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: order-priority mix per ship mode for one year.

    No l_shipmode in the fixtures — the mode is derived
    deterministically from l_linenumber MOD 3, preserving the query's
    point: a fact-side group key with an orders-side CASE-sum
    classification riding the same join.
    """
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate").cast("date") >= F.lit("1997-01-01").cast("date"))
        & (F.col("l_shipdate").cast("date") < F.lit("1998-01-01").cast("date"))
    )
    orders = load(spark, sf_dir, "orders")
    mode = (
        F.when(F.col("l_linenumber") % 3 == 0, "MAIL")
        .when(F.col("l_linenumber") % 3 == 1, "SHIP")
        .otherwise("TRUCK")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(mode.alias("ship_mode"), F.when(high, 1).otherwise(0).alias("is_high"))
        .groupBy("ship_mode")
        .agg(
            F.sum("is_high").alias("high_line_count"),
            F.sum(1 - F.col("is_high")).alias("low_line_count"),
        )
    )


@query(
    "golden_q16_supplier_cnt",
    """
    SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) bridge
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_type NOT LIKE 'PROMO%'
      AND p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_size
    """,
)
def q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many suppliers can deliver each niche part
    class, excluding a complaint blacklist.

    The partsupp relation is reconstructed as the observed DISTINCT
    (l_partkey, l_suppkey) bridge; the `NOT IN (SELECT ... complaints)`
    becomes a left-anti join against negative-balance suppliers (the
    fixtures have no s_comment). COUNT(DISTINCT) over the bridge is
    the aggregation the reference query exists to stress.
    """
    bridge = (
        load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    )
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & ~F.col("p_type").like("PROMO%")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    blacklist = load(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0)
    return (
        bridge.join(part, bridge.l_partkey == part.p_partkey)
        .join(
            blacklist,
            bridge.l_suppkey == blacklist.s_suppkey,
            "left_anti",
        )
        .groupBy("p_brand", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "golden_q20_excess_stock",
    """
    SELECT s_suppkey, s_name
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name IN ('NATION_3', 'NATION_8')
      AND s_suppkey IN (
        SELECT l_suppkey
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_name LIKE '%gadget%'
          AND CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
          AND CAST(l_shipdate AS DATE) <  DATE '1998-01-01'
        GROUP BY l_suppkey, l_partkey
        HAVING SUM(l_quantity) > 50
      )
    """,
)
def q20_excess_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who moved excess volume of a part
    family in one year — a nested-IN ladder flattened to semi-joins.

    Inner scope: per (supplier, part) quantity rollup over the
    name-filtered, year-windowed fact, HAVING-thresholded (l_quantity
    is integral, so the SUM threshold is exact). Outer scope: semi-join
    the supplier dim on the surviving suppkeys, nation-restricted.
    """
    part = load(spark, sf_dir, "part").filter(F.col("p_name").like("%gadget%"))
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate").cast("date") >= F.lit("1997-01-01").cast("date"))
        & (F.col("l_shipdate").cast("date") < F.lit("1998-01-01").cast("date"))
    )
    movers = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 50)
        .select("l_suppkey")
    )
    nation = load(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_3", "NATION_8")
    )
    supp = load(spark, sf_dir, "supplier")
    return (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(movers, supp.s_suppkey == movers.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
    )


@query(
    "golden_q21_waiting_orders",
    """
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier, lineitem l1, orders
    WHERE s_suppkey = l1.l_suppkey
      AND o_orderkey = l1.l_orderkey
      AND o_orderstatus = 'F'
      AND l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s_name
    """,
)
def q21_waiting_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: the supplier solely responsible for problem
    lines on finished multi-supplier orders.

    No l_receiptdate/l_commitdate in the fixtures, so "kept waiting"
    is proxied by l_returnflag = 'R'; the topology is untouched — the
    fact table appears three times: the blamed line (l1), an EXISTS
    probe for other suppliers on the order (l2, semi-join with a
    non-equi conjunct), and a NOT EXISTS probe that no OTHER supplier
    also returned (l3, anti-join). All three shuffle on l_orderkey
    only, so they co-partition under one exchange key.
    """
    li = load(spark, sf_dir, "lineitem")
    l1 = li.filter(F.col("l_returnflag") == "R").alias("l1")
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    l2 = li.select("l_orderkey", "l_suppkey").alias("l2")
    l3 = (
        li.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .alias("l3")
    )
    supp = load(spark, sf_dir, "supplier")
    blamed = (
        l1.join(orders, F.col("l1.l_orderkey") == orders.o_orderkey)
        .join(
            l2,
            (F.col("l2.l_orderkey") == F.col("l1.l_orderkey"))
            & (F.col("l2.l_suppkey") != F.col("l1.l_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l3.l_orderkey") == F.col("l1.l_orderkey"))
            & (F.col("l3.l_suppkey") != F.col("l1.l_suppkey")),
            "left_anti",
        )
    )
    return (
        blamed.join(supp, F.col("l1.l_suppkey") == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )
