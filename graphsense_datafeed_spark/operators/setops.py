"""SURVEY §2.7 — set operations.

Scale notes:
- UNION ALL is a zero-shuffle plan concatenation (partitions of both
  children are simply unioned) — free at any scale.
- UNION DISTINCT / INTERSECT / EXCEPT shuffle by full row hash; at
  100 TB prefer key-based semi/anti joins (operators/joins.py) when a
  key is available — full-row comparison is reserved for narrow
  projections like these.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from graphsense_datafeed_spark.registry import query
from graphsense_datafeed_spark.sources.tables import load


def _building(spark, sf_dir) -> DataFrame:
    return (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey", "c_nationkey")
    )


def _rich(spark, sf_dir) -> DataFrame:
    return (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 5000.0)
        .select("c_custkey", "c_nationkey")
    )


_DUCK_BUILDING = (
    "SELECT c_custkey, c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'"
)
_DUCK_RICH = "SELECT c_custkey, c_nationkey FROM customer WHERE c_acctbal > 5000.0"


@query("set_union_all", f"{_DUCK_BUILDING} UNION ALL {_DUCK_RICH}")
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics union by position (unionByName is the name-matched
    variant; both children here share the schema)."""
    return _building(spark, sf_dir).unionAll(_rich(spark, sf_dir))


@query("set_union_distinct", f"{_DUCK_BUILDING} UNION {_DUCK_RICH}")
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _building(spark, sf_dir).union(_rich(spark, sf_dir)).distinct()


@query("set_intersect", f"{_DUCK_BUILDING} INTERSECT {_DUCK_RICH}")
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _building(spark, sf_dir).intersect(_rich(spark, sf_dir))


@query("set_except", f"{_DUCK_BUILDING} EXCEPT {_DUCK_RICH}")
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _building(spark, sf_dir).subtract(_rich(spark, sf_dir))


@query(
    "set_intersect_all",
    """
    SELECT l_suppkey, l_returnflag FROM lineitem WHERE l_linenumber = 1
    INTERSECT ALL
    SELECT l_suppkey, l_returnflag FROM lineitem WHERE l_linenumber = 2
    """,
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset intersect (per-row multiplicity = min of the two sides)."""
    li = load(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_linenumber") == 1).select("l_suppkey", "l_returnflag")
    b = li.filter(F.col("l_linenumber") == 2).select("l_suppkey", "l_returnflag")
    return a.intersectAll(b)


@query(
    "set_except_all",
    """
    SELECT l_suppkey, l_returnflag FROM lineitem WHERE l_linenumber = 1
    EXCEPT ALL
    SELECT l_suppkey, l_returnflag FROM lineitem WHERE l_linenumber = 2
    """,
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_linenumber") == 1).select("l_suppkey", "l_returnflag")
    b = li.filter(F.col("l_linenumber") == 2).select("l_suppkey", "l_returnflag")
    return a.exceptAll(b)


@query(
    "set_symmetric_difference",
    """
    WITH a AS (
        SELECT DISTINCT o_custkey AS custkey FROM orders
        WHERE o_orderpriority = '1-URGENT'
    ), b AS (
        SELECT DISTINCT o_custkey AS custkey FROM orders
        WHERE o_orderpriority = '5-LOW'
    )
    SELECT custkey, side FROM (
        SELECT custkey, 'only_urgent' AS side FROM a
        WHERE custkey NOT IN (SELECT custkey FROM b)
        UNION ALL
        SELECT custkey, 'only_low' AS side FROM b
        WHERE custkey NOT IN (SELECT custkey FROM a)
    ) ORDER BY custkey, side
    """,
)
def set_symmetric_difference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SYMMETRIC DIFFERENCE (round 11): customers who placed urgent
    orders XOR low-priority orders — (A∖B) ∪ (B∖A) with a side tag,
    completing the set-operation family (§2.7 has union/intersect/
    except in all/distinct variants; the XOR member is what audit
    reconciliations actually want: 'who is in exactly one of these
    two extracts').

    Exactness: pure distinct-set relational algebra on integer keys.

    Scale: two anti-joins on the same key — both sides shuffle on
    custkey once and AQE broadcasts whichever distinct set turns out
    small; the NOT IN here is null-free by construction (keys are
    non-null), so the null-aware-anti-join trap
    (subquery_not_in_null_trap) does not bite."""
    orders = load(spark, sf_dir, "orders")
    a = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("custkey"))
        .distinct()
    )
    b = (
        orders.filter(F.col("o_orderpriority") == "5-LOW")
        .select(F.col("o_custkey").alias("custkey"))
        .distinct()
    )
    only_a = a.join(b, "custkey", "left_anti").select(
        "custkey", F.lit("only_urgent").alias("side")
    )
    only_b = b.join(a, "custkey", "left_anti").select(
        "custkey", F.lit("only_low").alias("side")
    )
    return only_a.unionByName(only_b).orderBy("custkey", "side")
