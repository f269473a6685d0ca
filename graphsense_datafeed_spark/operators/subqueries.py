"""Subquery surface + remaining relational extras.

Catalyst decorrelates every subquery form below into joins
(SURVEY §4.2: RewriteCorrelatedScalarSubquery / RewritePredicateSubquery)
— registered through the SQL entry point so the rewrite actually runs,
with the decorrelated join shapes visible in `.explain`.

Scale notes: a correlated subquery that survives decorrelation would
re-execute per outer row — Catalyst turning IN/EXISTS into semi/anti
joins and scalar subqueries into (broadcast) aggregated joins is what
makes these shapes viable at 100 TB; nothing here needs hand-rewriting.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from graphsense_datafeed_spark.registry import query
from graphsense_datafeed_spark.sources.tables import load, register_views


def _sql(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    register_views(spark, sf_dir, prefix="gds_")
    return spark.sql(sql)


@query(
    "subquery_scalar",
    """
    SELECT c_custkey, c_acctbal
    FROM customer
    WHERE c_acctbal > (SELECT AVG(c_acctbal) * 1.5 FROM customer)
    """,
)
def subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery → single-row broadcast join."""
    return _sql(
        spark,
        sf_dir,
        """
        SELECT c_custkey, c_acctbal FROM gds_customer
        WHERE c_acctbal > (SELECT AVG(c_acctbal) * 1.5 FROM gds_customer)
        """,
    )


@query(
    "subquery_in",
    """
    SELECT o_orderkey, o_custkey
    FROM orders
    WHERE o_custkey IN (
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY'
    ) AND o_orderstatus = 'O'
    """,
)
def subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery → left-semi join (RewritePredicateSubquery)."""
    return _sql(
        spark,
        sf_dir,
        """
        SELECT o_orderkey, o_custkey FROM gds_orders
        WHERE o_custkey IN (
            SELECT c_custkey FROM gds_customer WHERE c_mktsegment = 'MACHINERY'
        ) AND o_orderstatus = 'O'
        """,
    )


@query(
    "subquery_correlated",
    """
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000.0
    ) AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '5-LOW'
    )
    """,
)
def subquery_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS + NOT EXISTS → semi + anti join pair."""
    return _sql(
        spark,
        sf_dir,
        """
        SELECT c_custkey, c_name FROM gds_customer c
        WHERE EXISTS (
            SELECT 1 FROM gds_orders o
            WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000.0
        ) AND NOT EXISTS (
            SELECT 1 FROM gds_orders o
            WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '5-LOW'
        )
        """,
    )


@query(
    "golden_q4_priority",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE CAST(o_orderdate AS DATE) >= DATE '1996-07-01'
      AND CAST(o_orderdate AS DATE) < DATE '1996-10-01'
      AND EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey
            AND CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE)
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def golden_q4_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 adapted (commitdate/receiptdate columns don't exist in
    the fixtures → the EXISTS tests late shipment instead)."""
    return _sql(
        spark,
        sf_dir,
        """
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM gds_orders
        WHERE CAST(o_orderdate AS DATE) >= DATE '1996-07-01'
          AND CAST(o_orderdate AS DATE) < DATE '1996-10-01'
          AND EXISTS (
              SELECT 1 FROM gds_lineitem
              WHERE l_orderkey = o_orderkey
                AND CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE)
          )
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """,
    )


@query(
    "golden_q10_returns",
    """
    SELECT c_custkey, c_name, n_name,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN orders   ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_returnflag = 'R'
      AND CAST(o_orderdate AS DATE) >= DATE '1996-10-01'
      AND CAST(o_orderdate AS DATE) <  DATE '1997-01-01'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey ASC
    LIMIT 20
    """,
)
def golden_q10_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 adapted: returned-item revenue per customer, top 20."""
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate").cast("date") >= F.lit("1996-10-01").cast("date"))
        & (F.col("o_orderdate").cast("date") < F.lit("1997-01-01").cast("date"))
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


@query(
    "golden_q7_trade",
    """
    SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
           COUNT(*) AS n_lines,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation cn ON cn.n_nationkey = c_nationkey
    JOIN nation sn ON sn.n_nationkey = s_nationkey
    WHERE cn.n_name IN ('NATION_1', 'NATION_2')
      AND sn.n_name IN ('NATION_3', 'NATION_4')
      AND CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
    GROUP BY cn.n_name, sn.n_name
    """,
)
def golden_q7_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 adapted: revenue flow between customer-nation and
    supplier-nation pairs — a 6-table join using BOTH ends of the
    lineitem fact (customer side and supplier side), with the nation
    dim joined twice under different aliases."""
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").cast("date") >= F.lit("1996-01-01").cast("date")
    )
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    sup = load(spark, sf_dir, "supplier")
    cn = load(spark, sf_dir, "nation").alias("cn")
    sn = load(spark, sf_dir, "nation").alias("sn")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(
            F.broadcast(cn),
            (cust.c_nationkey == F.col("cn.n_nationkey"))
            & F.col("cn.n_name").isin("NATION_1", "NATION_2"),
        )
        .join(
            F.broadcast(sn),
            (sup.s_nationkey == F.col("sn.n_nationkey"))
            & F.col("sn.n_name").isin("NATION_3", "NATION_4"),
        )
        .groupBy(
            F.col("cn.n_name").alias("cust_nation"),
            F.col("sn.n_name").alias("supp_nation"),
        )
        .agg(
            F.count("*").alias("n_lines"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
    )


@query(
    "arr_explode_outer",
    """
    SELECT doc_id,
           unnest(CASE WHEN len(tail) = 0 THEN [NULL] ELSE tail END) AS w
    FROM (
        SELECT doc_id, str_split(text, ' ')[40:] AS tail
        FROM documents WHERE doc_id < 80
    )
    """,
)
def arr_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode_outer: rows with EMPTY arrays survive as a null row
    (plain explode silently drops them — a classic data-loss bug in
    flattening pipelines). Oracle emulates via [NULL] substitution."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 80)
    tail = F.slice(
        F.split("text", " "), 40, F.greatest(F.size(F.split("text", " ")) - 39, F.lit(1))
    )
    return d.select("doc_id", F.explode_outer(tail).alias("w"))


@query(
    "set_union_by_name",
    """
    SELECT c_custkey AS id, c_acctbal AS bal, 'customer' AS kind FROM customer
    UNION ALL
    SELECT s_suppkey AS id, s_acctbal AS bal, 'supplier' AS kind FROM supplier
    """,
)
def set_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName: schema-aligned-by-NAME union (positional unionAll
    silently mismatches when column orders drift — by-name is the safe
    default for evolving pipelines)."""
    cust = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"),
        F.lit("customer").alias("kind"),
        F.col("c_acctbal").alias("bal"),
    )
    sup = load(spark, sf_dir, "supplier").select(
        F.col("s_acctbal").alias("bal"),
        F.col("s_suppkey").alias("id"),
        F.lit("supplier").alias("kind"),
    )
    return cust.unionByName(sup)


@query(
    "win_range_interval",
    """
    SELECT user_id, event_id, ts,
           COUNT(*) OVER (PARTITION BY user_id ORDER BY ts
                          RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                          AND CURRENT ROW) AS events_last_hour
    FROM events
    """,
)
def win_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-interval RANGE frame: events in the trailing hour per user
    (the sliding-lookback shape). Spark's rangeBetween needs a numeric
    sort key → epoch µs with interval expressed in µs; DuckDB takes the
    interval directly — same frame, asserted equal."""
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp")))
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        F.count("*").over(w).alias("events_last_hour"),
    )


@query(
    "subquery_not_in_null_trap",
    """
    WITH probe AS (
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        UNION ALL SELECT NULL
    )
    SELECT 'not_in_naive' AS variant,
           CAST((SELECT COUNT(*) FROM orders
                 WHERE o_custkey NOT IN (SELECT c_custkey FROM probe))
                AS BIGINT) AS n_rows
    UNION ALL
    SELECT 'not_exists_null_safe',
           CAST((SELECT COUNT(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM probe p
                                   WHERE p.c_custkey = o.o_custkey))
                AS BIGINT)
    ORDER BY variant
    """,
)
def subquery_not_in_null_trap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE NOT-IN NULL TRAP, pinned as an operator (round 10): under
    ANSI three-valued logic, ``x NOT IN (set containing NULL)`` is
    never TRUE (x <> NULL is UNKNOWN), so ONE null in the subquery
    silently empties the whole result — the single most common
    silent-wrong-answer bug in migrated SQL.  The operator runs both
    variants against a probe set with an injected NULL and emits
    their row counts side by side: the naive NOT IN returns 0, the
    null-safe NOT EXISTS returns the real anti-join count.  Both
    engines implement the same ANSI semantics, so this doubles as a
    parity pin on the null-aware anti-join rewrite
    (Spark: NullAwareAntiJoin; the plan every reviewer should look
    for when NOT IN appears on a nullable column).

    Scale note: the null-aware anti-join CANNOT use a plain
    broadcast-anti fast path (it must detect the any-null case), so
    at 100 TB prefer NOT EXISTS / anti-join on non-null predicates —
    exactly the guidance this row's side-by-side readout teaches.

    Exactness: two integer counts."""
    return _sql(
        spark,
        sf_dir,
        """
        WITH probe AS (
            SELECT c_custkey FROM gds_customer
            WHERE c_mktsegment = 'BUILDING'
            UNION ALL SELECT NULL
        )
        SELECT 'not_in_naive' AS variant,
               CAST((SELECT COUNT(*) FROM gds_orders
                     WHERE o_custkey NOT IN
                         (SELECT c_custkey FROM probe)) AS BIGINT)
                   AS n_rows
        UNION ALL
        SELECT 'not_exists_null_safe',
               CAST((SELECT COUNT(*) FROM gds_orders o
                     WHERE NOT EXISTS (SELECT 1 FROM probe p
                                       WHERE p.c_custkey = o.o_custkey))
                    AS BIGINT)
        ORDER BY variant
        """,
    )
