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


@query(
    "skyline_2d",
    """
    WITH pts AS (
        SELECT o_orderkey,
               CAST(FLOOR(o_totalprice) AS BIGINT) AS price_fl,
               o_orderdate
        FROM orders
    ), flagged AS (
        SELECT o_orderkey, price_fl, o_orderdate,
               max(o_orderdate) OVER (
                   ORDER BY price_fl, o_orderdate DESC, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS best_date_cheaper
        FROM pts
    )
    SELECT o_orderkey, price_fl, o_orderdate
    FROM flagged
    WHERE best_date_cheaper IS NULL OR o_orderdate > best_date_cheaper
    """,
)
def skyline_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline / Pareto frontier (round 5 batch 16): the orders no
    other order DOMINATES — here "cheaper or equal AND at least as
    recent, better in one" (minimize price, maximize date) — the
    multi-objective shortlist (price-vs-freshness, cost-vs-quality,
    latency-vs-recall) that no single ORDER BY can produce and
    top-k over any one column gets wrong.

    The classic sort-scan: order by price ascending (date DESC as the
    tie order so an equal-price-newer row dominates its older twins,
    o_orderkey as the FINAL tiebreak so rows identical in BOTH
    dimensions get a deterministic survivor — without it the ROWS
    frame's contents at exact duplicates are engine-order luck), carry
    the running best date over STRICTLY PRECEDING rows — a row
    survives iff its date beats every cheaper-or-tied-earlier row's.
    One window over the frontier sort; dominance is a single NULL-safe
    comparison per row. Integer price floor makes tie classes
    structural across engines.

    Scale: the standard two-phase distributed reduction —
    skyline(S) = skyline(∪ of per-partition partial skylines).  Phase 1
    sorts WITHIN each input partition (local sort, zero exchange) and
    folds the same strictly-preceding running-max through an Arrow
    ``mapInPandas`` stream, dropping every locally-dominated row.  The
    pruning is exact, not heuristic: the sort is a total order
    (price, date DESC, orderkey), so a row's local dominator also
    precedes it globally with a date ≥ the local best — locally
    dominated ⇒ globally dominated — while a global survivor's local
    preceding set is a subset of its global one, so it always survives
    phase 1.  Phase 2 re-runs the identical window globally, but over
    only the partial-skyline union (expected O(P·log n) rows for
    random data), so the single-partition sort that previously moved
    the whole fact table now moves a shortlist, and no network
    exchange ever carries the full input.  Partition boundaries only
    affect how MUCH phase 1 prunes — phase 2 alone decides membership,
    so the result is deterministic.  Pinned in tests/test_plans.py:
    the one Exchange SinglePartition in the plan consumes the phase-1
    output, never the raw scan."""
    o = load(spark, sf_dir, "orders")
    pts = o.select(
        "o_orderkey",
        F.floor("o_totalprice").cast("bigint").alias("price_fl"),
        "o_orderdate",
    )
    order_keys = [
        F.col("price_fl").asc(),
        F.col("o_orderdate").desc(),
        F.col("o_orderkey").asc(),
    ]

    def _partial_skyline(batches):
        import pandas as pd

        best = None  # running max date over all rows seen so far
        for pdf in batches:
            if len(pdf) == 0:
                continue
            d = pd.to_datetime(pdf["o_orderdate"])
            prev = d.cummax().shift(1)
            if best is not None:
                # max(prev, carry-in best); NaT compares False -> best
                prev = prev.where(prev >= best, best)
            keep = prev.isna() | (d > prev)
            batch_max = d.max()
            if best is None or batch_max > best:
                best = batch_max
            out = pdf[keep.values]
            if len(out):
                yield out

    partial = pts.sortWithinPartitions(*order_keys).mapInPandas(
        _partial_skyline, schema=pts.schema
    )

    # Phase 2: exact skyline over the pruned union.
    w_global = Window.orderBy(*order_keys).rowsBetween(
        Window.unboundedPreceding, -1
    )
    flagged = partial.withColumn(
        "best_date_cheaper", F.max("o_orderdate").over(w_global)
    )
    return flagged.filter(
        F.col("best_date_cheaper").isNull()
        | (F.col("o_orderdate") > F.col("best_date_cheaper"))
    ).select("o_orderkey", "price_fl", "o_orderdate")
