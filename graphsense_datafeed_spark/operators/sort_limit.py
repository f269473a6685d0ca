"""SURVEY §2.6 — sort / limit / top-k.

Scale notes:
- ``orderBy`` is a range-partitioned total sort: Spark samples key
  ranges, exchanges by range, sorts within partitions — scales to any
  size but is the most expensive shape here; only use when the OUTPUT
  must be totally ordered.
- ``orderBy().limit(k)`` never runs that global sort: Catalyst plans
  TakeOrderedAndProject (per-partition top-k heap + driver merge of k
  rows per partition) — verified on the plan in tests/test_plans.py.
  This is the 100 TB-safe top-k.
- A bare ``limit(n)`` without order is nondeterministic by contract;
  the registered query pairs it with a total order (SURVEY §2.12-5).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from graphsense_datafeed_spark.registry import query
from graphsense_datafeed_spark.sources.tables import load


@query(
    "sort_multikey",
    """
    SELECT c_custkey, c_mktsegment, seg_or_null, c_acctbal
    FROM (
        SELECT c_custkey, c_mktsegment,
               nullif(c_mktsegment, 'BUILDING') AS seg_or_null, c_acctbal
        FROM customer WHERE c_custkey < 400
    )
    ORDER BY seg_or_null ASC NULLS FIRST, c_acctbal DESC, c_custkey ASC
    """,
)
def sort_multikey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key total sort with explicit null placement (fixtures are
    null-free, so a null-producing column is derived via nullif)."""
    return (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") < 400)
        .select(
            "c_custkey",
            "c_mktsegment",
            F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg_or_null"),
            "c_acctbal",
        )
        .orderBy(
            F.col("seg_or_null").asc_nulls_first(),
            F.col("c_acctbal").desc(),
            F.col("c_custkey").asc(),
        )
    )


@query(
    "limit_n",
    """
    SELECT event_id, user_id, event_type
    FROM events ORDER BY event_id ASC LIMIT 50
    """,
)
def limit_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIMIT paired with a unique total order — the only deterministic
    form (SURVEY §2.12-5)."""
    return (
        load(spark, sf_dir, "events")
        .select("event_id", "user_id", "event_type")
        .orderBy(F.col("event_id").asc())
        .limit(50)
    )


@query(
    "topk",
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 25
    """,
)
def topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k → TakeOrderedAndProject (no total sort; see module
    docstring + plan assertion in tests/test_plans.py)."""
    return (
        load(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(25)
    )


@query(
    "topk_with_ties",
    """
    SELECT o_custkey, o_orderkey,
           CAST(FLOOR(o_totalprice) AS BIGINT) AS price_fl,
           CAST(rnk AS BIGINT) AS rnk
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               rank() OVER (ORDER BY FLOOR(o_totalprice) DESC) AS rnk
        FROM orders
    )
    WHERE rnk <= 10
    """,
)
def topk_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k WITH TIES (round 5 batch 14) — SQL's FETCH FIRST k ROWS
    WITH TIES: every row whose RANK reaches the cutoff survives, so
    equal values at the boundary are all kept or all dropped —
    the semantics leaderboards and threshold reports actually need,
    where `topk`'s row_number silently discards an arbitrary subset
    of the boundary tie. Ranking on the FLOORED integer price makes
    ties structural (deterministic across engines) rather than
    float-exact-equality luck.

    The global RANK is acceptable for a k-bounded readout: Catalyst
    rewrites rank-filter ≤ k into WindowGroupLimit (running limit per
    partition, then one k-bounded merge) — asserted in
    tests/test_plans.py for the row_number form; the rank form keeps
    the same shape with ties retained. Output size is k + tie overflow
    (data-dependent, bounded by the tie class)."""
    o = load(spark, sf_dir, "orders")
    w = Window.orderBy(F.floor("o_totalprice").desc())
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.floor("o_totalprice").cast("bigint").alias("price_fl"),
            F.rank().over(w).cast("bigint").alias("rnk"),
        )
        .filter(F.col("rnk") <= 10)
    )
