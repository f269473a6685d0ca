"""SURVEY §2.2 — projection, filters, distinct, casts, keyed dedup.

These realize the reference's field-mapping/normalize stage (JSON
fields → typed CQL columns — SURVEY.md §3.1) as narrow, shuffle-free
transformations. Everything here stays inside whole-stage codegen and
pushes to the parquet scan (no exchanges except where dedup semantics
require one).

Scale notes:
- Projections/filters: zero shuffle; cost is scan-bound and prunes at
  the reader. 100× data → 100× tasks, flat per-task cost.
- ``distinct_rows`` / ``dedup_keys``: these DO shuffle (by all columns
  / by key). At 100 TB the key-based variant is the right one (hash
  partition on the upsert key = the Cassandra PK analogy); full-row
  distinct on a wide fact table would be re-expressed as dedup on a
  content hash (see llm_dedup.dedup_exact).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from graphsense_datafeed_spark.registry import query
from graphsense_datafeed_spark.sources.tables import load


@query(
    "project_select",
    """
    SELECT o_orderkey AS order_id,
           o_orderstatus AS status,
           ROUND(o_totalprice * 0.1, 3) AS commission,
           upper(o_orderpriority) AS priority_uc
    FROM orders
    """,
)
def project_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column subset + rename + computed cols ([REF] field mapping)."""
    return load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("order_id"),
        F.col("o_orderstatus").alias("status"),
        F.round(F.col("o_totalprice") * 0.1, 3).alias("commission"),
        F.upper("o_orderpriority").alias("priority_uc"),
    )


@query(
    "filter_compare",
    """
    SELECT c_custkey, c_name, c_acctbal
    FROM customer
    WHERE c_acctbal > 5000.0 AND c_nationkey != 3
    """,
)
def filter_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "customer")
        .filter((F.col("c_acctbal") > 5000.0) & (F.col("c_nationkey") != 3))
        .select("c_custkey", "c_name", "c_acctbal")
    )


@query(
    "filter_boolean",
    """
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders
    WHERE (o_orderstatus = 'F' OR o_totalprice > 200000.0)
      AND NOT o_orderpriority = '5-LOW'
    """,
)
def filter_boolean(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .filter(
            ((F.col("o_orderstatus") == "F") | (F.col("o_totalprice") > 200000.0))
            & ~(F.col("o_orderpriority") == "5-LOW")
        )
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
    )


@query(
    "filter_in",
    """
    SELECT c_custkey, c_mktsegment, c_nationkey
    FROM customer
    WHERE c_mktsegment IN ('BUILDING', 'MACHINERY') AND c_nationkey IN (1, 5, 9)
    """,
)
def filter_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "customer")
        .filter(
            F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
            & F.col("c_nationkey").isin(1, 5, 9)
        )
        .select("c_custkey", "c_mktsegment", "c_nationkey")
    )


@query(
    "filter_between",
    """
    SELECT l_orderkey, l_linenumber, CAST(l_shipdate AS DATE) AS shipdate
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) BETWEEN DATE '1997-06-01' AND DATE '1997-06-30'
    """,
)
def filter_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = F.col("l_shipdate").cast("date")
    return (
        load(spark, sf_dir, "lineitem")
        .filter(d.between(F.lit("1997-06-01").cast("date"), F.lit("1997-06-30").cast("date")))
        .select("l_orderkey", "l_linenumber", d.alias("shipdate"))
    )


@query(
    "filter_like",
    """
    SELECT p_partkey, p_type, p_name
    FROM part
    WHERE p_type LIKE 'PROMO%' AND p_name LIKE '%widget%'
    """,
)
def filter_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "part")
        .filter(F.col("p_type").like("PROMO%") & F.col("p_name").like("%widget%"))
        .select("p_partkey", "p_type", "p_name")
    )


@query(
    "filter_null",
    """
    SELECT c_custkey, nullif(c_mktsegment, 'BUILDING') AS seg_or_null
    FROM customer
    WHERE nullif(c_mktsegment, 'BUILDING') IS NOT NULL
      AND nullif(c_acctbal, 0.0) IS NOT NULL
    """,
)
def filter_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixtures are null-free (FIXTURES.md) — nulls injected via nullif."""
    seg = F.nullif(F.col("c_mktsegment"), F.lit("BUILDING"))
    return (
        load(spark, sf_dir, "customer")
        .filter(seg.isNotNull() & F.nullif(F.col("c_acctbal"), F.lit(0.0)).isNotNull())
        .select("c_custkey", seg.alias("seg_or_null"))
    )


@query(
    "distinct_rows",
    "SELECT DISTINCT l_returnflag, l_linestatus, l_linenumber FROM lineitem",
)
def distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_linestatus", "l_linenumber")
        .distinct()
    )


@query(
    "cast_types",
    """
    SELECT o_orderkey,
           CAST(o_orderkey AS VARCHAR) AS key_str,
           CAST(CAST(o_orderkey AS VARCHAR) AS BIGINT) AS key_roundtrip,
           CAST(o_custkey AS DOUBLE) AS cust_dbl,
           CAST(FLOOR(o_totalprice) AS BIGINT) AS price_floor,
           make_timestamp(CAST(o_orderkey AS BIGINT) * 1000000) AS key_ts
    FROM orders
    WHERE o_orderkey < 1000
    """,
)
def cast_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[REF] normalize-stage conversions (hex→blob, secs→ts, str→int).

    double→int goes through FLOOR deliberately: bare CAST truncates in
    Spark but rounds in DuckDB — a cross-engine trap (SURVEY §2.12).
    ``timestamp_seconds`` (LTZ) is cast to NTZ under the pinned UTC
    session tz ↔ DuckDB ``make_timestamp`` (µs, naive).
    """
    return (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 1000)
        .select(
            "o_orderkey",
            F.col("o_orderkey").cast("string").alias("key_str"),
            F.col("o_orderkey").cast("string").cast("bigint").alias("key_roundtrip"),
            F.col("o_custkey").cast("double").alias("cust_dbl"),
            F.floor(F.col("o_totalprice")).cast("bigint").alias("price_floor"),
            F.timestamp_seconds(F.col("o_orderkey"))
            .cast("timestamp_ntz")
            .alias("key_ts"),
        )
    )


@query(
    "dedup_keys",
    """
    SELECT user_id, event_id, event_type, ts
    FROM (
        SELECT user_id, event_id, event_type, ts,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    ) WHERE rn = 1
    """,
)
def dedup_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-write-wins dedup by key — the Cassandra-upsert semantics of
    the reference's re-ingest path ([REF], SURVEY §3.1-2), made
    deterministic via an explicit total order (never bare
    ``dropDuplicates``, whose survivor is partition-order-dependent).

    Scale: single hash-partition shuffle on the key; at 100 TB this is
    the canonical pre-upsert compaction and co-partitions with the
    sink's PK.
    """
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        load(spark, sf_dir, "events")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type", "ts")
    )


@query(
    "seq_global_two_pass",
    """
    SELECT l_orderkey, l_linenumber,
           CAST(ROW_NUMBER() OVER (ORDER BY l_orderkey, l_linenumber) - 1
                AS BIGINT) AS seq
    FROM lineitem
    WHERE l_orderkey < 4000
    """,
)
def seq_global_two_pass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed GLOBAL sequence assignment (round 9) — the
    scalable replacement for the zipWithIndex / single-partition
    ROW_NUMBER() OVER (ORDER BY ...) trap. The classic two-pass
    program: (1) range-repartition on the sort key and rank LOCALLY
    within each partition (keyed window, fully parallel); (2) count
    rows per partition — a tiny frame — prefix-sum it into partition
    OFFSETS, broadcast, and add. seq = offset(pid) + local_rank − 1
    is the exact global sequence because range partitioning orders
    the partitions and the local window orders within: no stage ever
    moves all rows to one task.

    Correctness is boundary-placement-independent: wherever the range
    sampler cuts, offsets absorb the cut — the referee asserts the
    result equals the single-partition ROW_NUMBER oracle exactly.

    Scale: pass 1 is the same shuffle a global sort needs but ends at
    per-partition windows; pass 2 shuffles |partitions| integers. The
    oracle's single-partition window is the 10 TB anti-pattern this
    operator exists to replace — at driver scale (sf0.01) both sides
    are cheap and hash-equal."""
    li = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") < 4000)
        .select("l_orderkey", "l_linenumber")
        .repartitionByRange(8, "l_orderkey", "l_linenumber")
        .withColumn("pid", F.spark_partition_id())
    )
    w_local = Window.partitionBy("pid").orderBy("l_orderkey", "l_linenumber")
    ranked = li.withColumn("rn", F.row_number().over(w_local))
    counts = ranked.groupBy("pid").agg(F.count("*").alias("c"))
    w_off = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.withColumn(
        "off", F.coalesce(F.sum("c").over(w_off), F.lit(0)).cast("bigint")
    ).select("pid", "off")
    return (
        ranked.join(F.broadcast(offsets), "pid")
        .select(
            "l_orderkey",
            "l_linenumber",
            (F.col("off") + F.col("rn") - 1).cast("bigint").alias("seq"),
        )
    )


@query(
    "seq_collapse_consecutive",
    """
    WITH ordered AS (
        SELECT user_id, ts, event_id, event_type,
               LAG(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_type
        FROM events WHERE user_id < 25
    )
    SELECT user_id, event_id, event_type
    FROM ordered
    WHERE prev_type IS NULL OR event_type != prev_type
    ORDER BY user_id, event_id
    """,
)
def seq_collapse_consecutive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COLLAPSE CONSECUTIVE DUPLICATES (round 11): keep each user's
    event only when its type DIFFERS from the immediately preceding
    one — run-length compression of a state stream, the row-ops
    primitive under events_markov_transitions (self-loops removed),
    CDC feeds (suppress no-op updates), and sensor pipelines
    (repeated readings compressed).  distinct_rows removes ALL
    duplicates regardless of position; this removes only CONSECUTIVE
    ones — order-sensitive dedup, a genuinely different operator.

    Exactness: pure lag-compare on a total order (ts, event_id).

    Scale: one keyed window (user) — the win_lag_lead shape; the
    filter is a narrow map afterwards."""
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 25)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = ev.select(
        "user_id",
        "event_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    )
    return (
        ordered.filter(
            F.col("prev_type").isNull()
            | (F.col("event_type") != F.col("prev_type"))
        )
        .select("user_id", "event_id", "event_type")
        .orderBy("user_id", "event_id")
    )
