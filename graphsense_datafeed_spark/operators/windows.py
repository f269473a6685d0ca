"""SURVEY §2.5 — window functions.

The reference's only window-shaped need is "newest record per key wins"
on re-ingest (SURVEY §2.5 `win_topk_per_group` provenance note); the
rest is the general analytical window surface.

Scale notes:
- A window = one hash exchange on partitionBy keys + an in-partition
  sort. Multiple windows sharing a partitionBy reuse one exchange
  (Catalyst window coalescing) — queries below are written to share.
- The dangerous shape at 100 TB is a window with NO partitionBy (single
  partition holds everything); none of the engine's operators emit one.
  Skewed partition keys (one user with 1e9 events) are handled by AQE
  skew hints upstream or pre-aggregation; documented per call site.
- Frames: ROWS frames are O(1) per row; RANGE frames need the sorted
  run — both spill-safe via UnsafeExternalSorter.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from graphsense_datafeed_spark.registry import query
from graphsense_datafeed_spark.sources.tables import load

# Deterministic per-customer order: date then unique key (SURVEY §2.12-5).
# Built lazily — PySpark 4 column expressions require an active session,
# and operator modules are imported before one exists.
def _w_cust() -> Window:
    return Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )


_DUCK_W_CUST = "PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC"


@query(
    "win_row_number",
    f"""
    SELECT o_custkey, o_orderkey,
           row_number() OVER ({_DUCK_W_CUST}) AS rn
    FROM orders WHERE o_custkey < 300
    """,
)
def win_row_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") < 300)
        .select(
            "o_custkey", "o_orderkey", F.row_number().over(_w_cust()).alias("rn")
        )
    )


@query(
    "win_rank_dense",
    """
    SELECT l_returnflag, l_orderkey, l_linenumber,
           rank()       OVER (PARTITION BY l_returnflag ORDER BY l_quantity DESC) AS qty_rank,
           dense_rank() OVER (PARTITION BY l_returnflag ORDER BY l_quantity DESC) AS qty_dense_rank
    FROM lineitem WHERE l_orderkey < 100
    """,
)
def win_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank/dense_rank tie handling (l_quantity has heavy ties — ranks
    are deterministic even though row order within ties is not; only
    rank columns + unique keys are emitted)."""
    w = Window.partitionBy("l_returnflag").orderBy(F.col("l_quantity").desc())
    return (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") < 100)
        .select(
            "l_returnflag",
            "l_orderkey",
            "l_linenumber",
            F.rank().over(w).alias("qty_rank"),
            F.dense_rank().over(w).alias("qty_dense_rank"),
        )
    )


@query(
    "win_ntile",
    f"""
    SELECT o_custkey, o_orderkey, ntile(4) OVER ({_DUCK_W_CUST}) AS quartile
    FROM orders WHERE o_custkey < 300
    """,
)
def win_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") < 300)
        .select(
            "o_custkey", "o_orderkey", F.ntile(4).over(_w_cust()).alias("quartile")
        )
    )


@query(
    "win_lag_lead",
    """
    SELECT user_id, event_id, ts,
           lag(ts)  OVER w AS prev_ts,
           lead(ts) OVER w AS next_ts,
           CAST(epoch_us(ts) - epoch_us(lag(ts) OVER w) AS BIGINT) AS gap_us
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    """,
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap between a user's consecutive events (classic sessionization
    precursor — reused by stream_session's batch oracle)."""
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    ev = load(spark, sf_dir, "events")
    prev_ts = F.lag("ts").over(w)
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        prev_ts.alias("prev_ts"),
        F.lead("ts").over(w).alias("next_ts"),
        (
            F.unix_micros(F.col("ts").cast("timestamp"))
            - F.unix_micros(prev_ts.cast("timestamp"))
        ).alias("gap_us"),
    )


@query(
    "win_running_sum",
    f"""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(FLOOR(o_totalprice) AS BIGINT))
                OVER ({_DUCK_W_CUST} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS running_spend
    FROM orders WHERE o_custkey < 300
    """,
)
def win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total on an integerized measure (float running sums are
    order-sensitive in the last ulp — SURVEY §2.12-3)."""
    w = _w_cust().rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") < 300)
        .select(
            "o_custkey",
            "o_orderkey",
            F.sum(F.floor("o_totalprice").cast("bigint"))
            .over(w)
            .cast("bigint")
            .alias("running_spend"),
        )
    )


@query(
    "win_moving_avg",
    f"""
    SELECT o_custkey, o_orderkey,
           ROUND(AVG(o_totalprice)
                 OVER ({_DUCK_W_CUST} ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4)
               AS moving_avg3
    FROM orders WHERE o_custkey < 300
    """,
)
def win_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = _w_cust().rowsBetween(-2, 0)
    return (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") < 300)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round(F.avg("o_totalprice").over(w), 4).alias("moving_avg3"),
        )
    )


@query(
    "win_percent_cume",
    """
    SELECT s_suppkey,
           ROUND(percent_rank() OVER (ORDER BY s_acctbal ASC, s_suppkey ASC), 6) AS pr,
           ROUND(cume_dist()    OVER (ORDER BY s_acctbal ASC, s_suppkey ASC), 6) AS cd
    FROM supplier
    """,
)
def win_percent_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global-order window — acceptable ONLY on dimension-sized inputs
    (supplier ≤1k rows); a no-partitionBy window on a fact table would
    serialize onto one task at 100 TB."""
    w = Window.orderBy(F.col("s_acctbal").asc(), F.col("s_suppkey").asc())
    return load(spark, sf_dir, "supplier").select(
        "s_suppkey",
        F.round(F.percent_rank().over(w), 6).alias("pr"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
    )


@query(
    "win_first_last_value",
    f"""
    SELECT o_custkey, o_orderkey,
           first_value(o_orderkey) OVER ({_DUCK_W_CUST}
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_key,
           last_value(o_orderkey)  OVER ({_DUCK_W_CUST}
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_key
    FROM orders WHERE o_custkey < 300
    """,
)
def win_first_last_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = _w_cust().rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") < 300)
        .select(
            "o_custkey",
            "o_orderkey",
            F.first("o_orderkey").over(w).alias("first_key"),
            F.last("o_orderkey").over(w).alias("last_key"),
        )
    )


@query(
    "win_topk_per_group",
    """
    SELECT o_custkey, o_orderkey, o_totalprice, rn AS k
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        FROM orders
    ) WHERE rn <= 3
    """,
)
def win_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer; with k=1 this is exactly the
    reference's newest-record-wins upsert dedup ([REF]; dedup_keys).
    Spark plans the rn<=k filter as a per-partition running limit
    (WindowGroupLimit) — it does NOT materialize full ranks at scale."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        load(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
        .withColumnRenamed("rn", "k")
    )


@query(
    "win_count_distinct",
    """
    WITH flagged AS (
        SELECT user_id, event_id, ts, event_type,
               CASE WHEN row_number() OVER (
                        PARTITION BY user_id, event_type
                        ORDER BY ts ASC, event_id ASC) = 1
                    THEN 1 ELSE 0 END AS first_seen
        FROM events WHERE user_id < 40
    )
    SELECT user_id, event_id,
           CAST(SUM(first_seen) OVER (
                    PARTITION BY user_id
                    ORDER BY ts ASC, event_id ASC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS distinct_types_so_far
    FROM flagged
    """,
)
def win_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative DISTINCT count over a window — "how many distinct
    event types has this user produced so far" — which neither Spark
    nor DuckDB supports natively (`COUNT(DISTINCT) OVER (... ROWS
    ...)` is rejected by both parsers). The standard two-window
    rewrite: flag each (user, event_type)'s FIRST occurrence with
    row_number over (user, type), then running-sum the flags over the
    user's event order.

    Scale: both windows hash-partition on user_id (the second's key is
    a superset start — Catalyst still needs one exchange per distinct
    partitionBy, so this is two exchanges total, each on the same
    bounded key space). Per-row state is O(1); no collect_set of the
    value space ever materializes — THE reason this rewrite beats a
    `size(collect_set() over w)` formulation, whose per-row state is
    the distinct set itself (unbounded at 100 TB key cardinalities)."""
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 40)
    w_first = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.when(F.row_number().over(w_first) == 1, 1).otherwise(0).alias("first_seen"),
    )
    return flagged.select(
        "user_id",
        "event_id",
        F.sum("first_seen").over(w_run).cast("bigint").alias("distinct_types_so_far"),
    )


@query(
    "win_nth_value",
    f"""
    SELECT o_custkey, o_orderkey,
           nth_value(o_orderkey, 2) OVER ({_DUCK_W_CUST}
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
               AS second_order,
           nth_value(o_orderkey, 3) OVER ({_DUCK_W_CUST}
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
               AS third_order
    FROM orders WHERE o_custkey < 300
    """,
)
def win_nth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTH_VALUE over the full partition frame: each order row carries
    the customer's 2nd and 3rd order keys (NULL when fewer exist) —
    the k-th-event lookup that first/last_value can't express. Full
    frame, deterministic order with the unique-key tiebreak."""
    w = _w_cust().rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    o = load(spark, sf_dir, "orders").filter(F.col("o_custkey") < 300)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.nth_value("o_orderkey", 2).over(w).alias("second_order"),
        F.nth_value("o_orderkey", 3).over(w).alias("third_order"),
    )


@query(
    "win_moving_median",
    """
    SELECT event_id, event_type,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_window,
           CAST(FLOOR(median(CAST(FLOOR(value * 10000) AS BIGINT)) OVER w
                      * 10) AS BIGINT) AS med_e5
    FROM events
    WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
                 ROWS BETWEEN 10 PRECEDING AND CURRENT ROW)
    """,
)
def win_moving_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 11-row moving MEDIAN of each series' value (round 5
    batch 6) — the robust smoother win_moving_avg is not: one spike in
    the frame shifts the mean by spike/11 but leaves the median
    untouched, which is why despiking pipelines median-filter first
    (ts_outlier_mad is the same robustness idea as a global gate; this
    is its sliding form).

    Determinism: the frame contents are pinned by the (ts, event_id)
    total order; values enter as floor-e4 bigints, and the only double
    is the even-count midpoint average (a+b)/2 of two bigints — exact
    in IEEE64 far past this domain — floored at e5 to keep the .5
    midpoints integral. Spark refuses ordered-aggregate median over a
    moving frame (INVALID_WINDOW_SPEC_FOR_AGGREGATION_FUNC), so the
    frame is materialized with collect_list — bounded at 11 elements
    by construction — sorted, and the midpoint read by index: the
    median from its definition, identical to DuckDB's frame median.

    Scale: per-series window sort, same exchange discipline as every
    ROWS frame here; the per-row array is O(k) state, fine at k=11
    (documented: for k in the thousands, switch to the two-heap
    applyInPandas form rather than ever growing this buffer)."""
    ev = load(spark, sf_dir, "events")
    v = F.floor(F.col("value") * 10000).cast("bigint")
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-10, 0)
    )
    arr = F.array_sort(F.collect_list(v).over(w))
    n = F.size(arr)
    mid_lo = F.element_at(arr, F.floor((n + 1) / 2).cast("int"))
    mid_hi = F.element_at(arr, F.ceil((n + 1) / 2).cast("int"))
    med = (mid_lo + mid_hi).cast("double") / 2.0
    return ev.select(
        "event_id",
        "event_type",
        n.cast("bigint").alias("n_window"),
        F.floor(med * 10).cast("bigint").alias("med_e5"),
    )


@query(
    "win_pattern_match",
    """
    WITH tape AS (
        SELECT event_id, user_id, ts, event_type,
               lag(event_type, 1) OVER w AS t1,
               lag(event_type, 2) OVER w AS t2,
               lag(event_id, 2) OVER w AS start_id,
               lag(ts, 2) OVER w AS start_ts
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT event_id AS match_id, user_id, start_id,
           CAST(epoch_us(ts) - epoch_us(start_ts) AS BIGINT) AS span_us
    FROM tape
    WHERE event_type = 'purchase' AND t1 = 'click' AND t2 = 'view'
    """,
)
def win_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-pattern matching (round 5 batch 9): detect the CONSECUTIVE
    view → click → purchase sequence inside each user's stream — SQL's
    MATCH_RECOGNIZE shape, which neither engine parses, expressed as
    its lag-program equivalent: a fixed-length pattern over K
    consecutive rows is exactly K−1 lag columns plus one predicate.
    events_funnel counts stage reach ANYWHERE in a user's history;
    this demands adjacency — the strict-sequence semantics clickstream
    "golden path" and fraud-pattern rules actually specify. Emits the
    matching row, the pattern's start row and the integer-µs span.

    All three lags ride ONE (user, ts, event_id) window exchange;
    matching is a post-window filter, so the plan is scan → window →
    filter with no join. Variable-length patterns (A B* C) need the
    sessionize-then-fold form (events_user_paths' machinery), pinned
    here as the documented extension, not a different engine.

    Scale: one exchange + per-user sort — the streaming form is a
    K-row ring buffer per key (stream_stateful's shape)."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    tape = ev.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.lag("event_type", 1).over(w).alias("t1"),
        F.lag("event_type", 2).over(w).alias("t2"),
        F.lag("event_id", 2).over(w).alias("start_id"),
        F.lag("ts", 2).over(w).alias("start_ts"),
    )
    return tape.filter(
        (F.col("event_type") == "purchase")
        & (F.col("t1") == "click")
        & (F.col("t2") == "view")
    ).select(
        F.col("event_id").alias("match_id"),
        "user_id",
        "start_id",
        (us("ts") - us("start_ts")).cast("bigint").alias("span_us"),
    )


@query(
    "win_gaps_islands",
    """
    WITH days AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
        FROM events WHERE user_id < 60
    ), keyed AS (
        SELECT user_id, d,
               d - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d)
                        AS INT) AS island
        FROM days
    )
    SELECT user_id, MIN(d) AS run_start, MAX(d) AS run_end,
           CAST(COUNT(*) AS BIGINT) AS run_days
    FROM keyed GROUP BY user_id, island
    """,
)
def win_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands (round 5 batch 9): each user's CONSECUTIVE
    active-day runs — start, end, length — the classic SQL pattern
    behind streak features ("7-day streak"), uptime runs and
    contiguous-coverage audits, and the one windowing idiom the §2.5
    surface still lacked. The tabibitosan trick: date minus the
    per-user row_number is CONSTANT exactly while days are
    consecutive, so the unrepresentable "group by consecutiveness"
    becomes a plain GROUP BY on that derived key.

    Distinct days first (bounded per user), one window exchange for
    the row_number, one map-side-combinable agg on (user, island) —
    dates stay DATE arithmetic end-to-end (integer day domain, no
    timestamp/timezone surface at all).

    Scale: identical shape at any size; the distinct is the only
    row-scale shuffle and the standard pre-aggregation."""
    days = (
        load(spark, sf_dir, "events")
        .filter(F.col("user_id") < 60)
        .select("user_id", F.col("ts").cast("date").alias("d"))
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("d")
    keyed = days.select(
        "user_id",
        "d",
        F.date_sub(F.col("d"), F.row_number().over(w)).alias("island"),
    )
    return keyed.groupBy("user_id", "island").agg(
        F.min("d").alias("run_start"),
        F.max("d").alias("run_end"),
        F.count("*").cast("bigint").alias("run_days"),
    ).select("user_id", "run_start", "run_end", "run_days")


@query(
    "win_weighted_moving_avg",
    """
    WITH tape AS (
        SELECT event_id, event_type,
               CAST(FLOOR(value * 10000) AS BIGINT) AS v,
               lag(CAST(FLOOR(value * 10000) AS BIGINT), 1) OVER w AS v1,
               lag(CAST(FLOOR(value * 10000) AS BIGINT), 2) OVER w AS v2,
               lag(CAST(FLOOR(value * 10000) AS BIGINT), 3) OVER w AS v3,
               lag(CAST(FLOOR(value * 10000) AS BIGINT), 4) OVER w AS v4
        FROM events
        WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
    )
    SELECT event_id, event_type,
           CAST(FLOOR(CAST(5 * v + 4 * COALESCE(v1, 0)
                           + 3 * COALESCE(v2, 0) + 2 * COALESCE(v3, 0)
                           + COALESCE(v4, 0) AS DOUBLE)
                      / (5 + CASE WHEN v1 IS NULL THEN 0 ELSE 4 END
                           + CASE WHEN v2 IS NULL THEN 0 ELSE 3 END
                           + CASE WHEN v3 IS NULL THEN 0 ELSE 2 END
                           + CASE WHEN v4 IS NULL THEN 0 ELSE 1 END))
                AS BIGINT) AS wma_e4
    FROM tape
    """,
)
def win_weighted_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linearly-weighted moving average, 5-point triangular weights
    (round 5 batch 23): the newest observation counts 5×, the oldest
    1× — the smoother between win_moving_avg (all-equal weights,
    laggy) and ts_ewma (infinite memory, recursive): bounded memory
    AND recency emphasis, which is why WMA is the chartist/telemetry
    default. Warm-up rows renormalize over the weights actually
    present (a shrinking-window mean, not a zero-padded lie).

    Exactness: the frame is materialized as K−1 lag columns on ONE
    window exchange (the win_pattern_match tape trick — weighted
    frames can't be expressed as a plain framed SUM since the weight
    depends on the OFFSET, not the row); numerator and denominator
    are exact integers, one floored division per row.

    Scale: one exchange + per-series sort; K scales the projection
    width, not the shuffle."""
    ev = load(spark, sf_dir, "events")
    v = F.floor(F.col("value") * 10000).cast("bigint")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    tape = ev.select(
        "event_id",
        "event_type",
        v.alias("v"),
        F.lag(v, 1).over(w).alias("v1"),
        F.lag(v, 2).over(w).alias("v2"),
        F.lag(v, 3).over(w).alias("v3"),
        F.lag(v, 4).over(w).alias("v4"),
    )
    num = (
        5 * F.col("v")
        + 4 * F.coalesce(F.col("v1"), F.lit(0))
        + 3 * F.coalesce(F.col("v2"), F.lit(0))
        + 2 * F.coalesce(F.col("v3"), F.lit(0))
        + F.coalesce(F.col("v4"), F.lit(0))
    )
    den = (
        F.lit(5)
        + F.when(F.col("v1").isNull(), 0).otherwise(4)
        + F.when(F.col("v2").isNull(), 0).otherwise(3)
        + F.when(F.col("v3").isNull(), 0).otherwise(2)
        + F.when(F.col("v4").isNull(), 0).otherwise(1)
    )
    return tape.select(
        "event_id",
        "event_type",
        F.floor(num.cast("double") / den).cast("bigint").alias("wma_e4"),
    )


@query(
    "win_hampel_filter",
    """
    WITH framed AS (
        SELECT event_id, event_type,
               CAST(FLOOR(value * 10000) AS BIGINT) AS v,
               list_sort(list(CAST(FLOOR(value * 10000) AS BIGINT)) OVER (
                   PARTITION BY event_type ORDER BY ts, event_id
                   ROWS BETWEEN 10 PRECEDING AND CURRENT ROW
               )) AS arr
        FROM events
    ), med AS (
        SELECT event_id, event_type, v, arr,
               arr[CAST((len(arr) + 1) // 2 AS INT)]
               + arr[CAST(len(arr) - (len(arr) - 1) // 2 AS INT)] AS med2
        FROM framed
    ), mad AS (
        SELECT event_id, event_type, v, med2,
               list_sort(list_transform(arr, x -> abs(2 * x - med2))) AS devs
        FROM med
    )
    SELECT event_id, event_type,
           CAST(med2 AS BIGINT) AS med2_e4,
           CAST(devs[CAST((len(devs) + 1) // 2 AS INT)]
                + devs[CAST(len(devs) - (len(devs) - 1) // 2 AS INT)]
                AS BIGINT) AS mad4_e4,
           20000 * abs(2 * v - med2) >
               44478 * (devs[CAST((len(devs) + 1) // 2 AS INT)]
                        + devs[CAST(len(devs) - (len(devs) - 1) // 2 AS INT)])
               AS is_spike
    FROM mad
    """,
)
def win_hampel_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hampel filter (round 5 batch 24): the sliding ROBUST despiker —
    flag a point when |v − frame median| > 3·1.4826·frame MAD — which
    is what ts_zscore_anomaly becomes once the baseline itself must
    survive spikes (a burst of outliers inflates the trailing
    mean/σ and MASKS its own members; median and MAD barely move).
    ts_outlier_mad applies this GLOBALLY per series; the Hampel form
    is its per-window sibling, the standard sensor-stream cleaner.

    ENTIRELY in integer arithmetic despite two nested medians: work
    in doubled units — med2 = lo+hi of the sorted frame (2× median,
    always integral), per-element deviations |2x − med2| (2× dev,
    integral), mad4 = lo+hi of the sorted deviations (4× MAD) — and
    the 3·1.4826 threshold becomes the integer cross-multiplication
    20000·dev2 > 44478·mad4. No float comparison anywhere, so the
    flag cannot flip on an ulp.

    Scale: win_moving_median's bounded-frame discipline (k=11 array
    per row); the transform/sort work is per-row O(k log k), JVM
    codegen, no extra exchange."""
    ev = load(spark, sf_dir, "events")
    v = F.floor(F.col("value") * 10000).cast("bigint")
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-10, 0)
    )
    arr = F.array_sort(F.collect_list(v).over(w))
    framed = ev.select(
        "event_id", "event_type", v.alias("v"), arr.alias("arr")
    )
    n = F.size("arr")
    lo = F.element_at(F.col("arr"), F.floor((n + 1) / 2).cast("int"))
    hi = F.element_at(F.col("arr"), (n - F.floor((n - 1) / 2)).cast("int"))
    med = framed.withColumn("med2", lo + hi)
    devs = F.array_sort(
        F.transform(F.col("arr"), lambda x: F.abs(2 * x - F.col("med2")))
    )
    mad = med.withColumn("devs", devs)
    nd = F.size("devs")
    dlo = F.element_at(F.col("devs"), F.floor((nd + 1) / 2).cast("int"))
    dhi = F.element_at(
        F.col("devs"), (nd - F.floor((nd - 1) / 2)).cast("int")
    )
    mad4 = dlo + dhi
    return mad.select(
        "event_id",
        "event_type",
        F.col("med2").cast("bigint").alias("med2_e4"),
        mad4.cast("bigint").alias("mad4_e4"),
        (20000 * F.abs(2 * F.col("v") - F.col("med2")) > 44478 * mad4).alias(
            "is_spike"
        ),
    )


@query(
    "win_pattern_match_var",
    """
    WITH numbered AS (
        SELECT user_id, event_id, ts, event_type,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events
    ), tape AS (
        SELECT user_id, event_id, ts, event_type, rn,
               last_value(CASE WHEN event_type <> 'click'
                               THEN event_type END IGNORE NULLS)
                   OVER w AS prev_nc_type,
               last_value(CASE WHEN event_type <> 'click'
                               THEN rn END IGNORE NULLS)
                   OVER w AS prev_nc_rn,
               last_value(CASE WHEN event_type <> 'click'
                               THEN event_id END IGNORE NULLS)
                   OVER w AS prev_nc_id,
               last_value(CASE WHEN event_type <> 'click'
                               THEN ts END IGNORE NULLS)
                   OVER w AS prev_nc_ts
        FROM numbered
        WINDOW w AS (PARTITION BY user_id ORDER BY rn
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    )
    SELECT event_id AS match_id, user_id,
           prev_nc_id AS start_id,
           CAST(rn - prev_nc_rn - 1 AS BIGINT) AS n_clicks,
           CAST(epoch_us(ts) - epoch_us(prev_nc_ts) AS BIGINT) AS span_us
    FROM tape
    WHERE event_type = 'purchase' AND prev_nc_type = 'view'
    """,
)
def win_pattern_match_var(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIABLE-length row-pattern match — the MATCH_RECOGNIZE class
    ``A B* C`` (here ``view click* purchase``) that the fixed-K lag
    tape of win_pattern_match cannot express (VERDICT r5 #5): a match
    is a purchase preceded by a view with any number (including zero)
    of clicks and NOTHING ELSE in between.

    The sessionize-fold trick replaces per-length enumeration: for
    every row, ``last(CASE WHEN type <> B THEN attr END, ignorenulls)``
    over the strictly-preceding frame carries forward the LAST
    NON-CLICK row's (type, position, id, ts).  If that row is a view,
    every row between it and the current purchase is a click BY
    CONSTRUCTION (any non-click would itself be the carried row), so
    the whole variable-length contiguity test collapses to one
    predicate — no self-join, no explode over candidate lengths, and
    the click count falls out as the row-number gap minus one.

    All four carried attributes ride ONE window spec (same partition
    and frame), so Catalyst coalesces them into a single Window node:
    the plan is one hash exchange on user_id + one in-partition sort —
    pinned in tests/test_plans.py.  At 100 TB this is the same keyed
    discipline as events_sessionize; B*-runs never materialize."""
    ev = load(spark, sf_dir, "events")
    w_num = Window.partitionBy("user_id").orderBy("ts", "event_id")
    numbered = ev.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.row_number().over(w_num).alias("rn"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("rn")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    nc = lambda col: F.last(  # noqa: E731
        F.when(F.col("event_type") != "click", F.col(col)), ignorenulls=True
    ).over(w)
    tape = numbered.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        "rn",
        nc("event_type").alias("prev_nc_type"),
        nc("rn").alias("prev_nc_rn"),
        nc("event_id").alias("prev_nc_id"),
        nc("ts").alias("prev_nc_ts"),
    )
    return tape.filter(
        (F.col("event_type") == "purchase")
        & (F.col("prev_nc_type") == "view")
    ).select(
        F.col("event_id").alias("match_id"),
        "user_id",
        F.col("prev_nc_id").alias("start_id"),
        (F.col("rn") - F.col("prev_nc_rn") - 1)
        .cast("bigint")
        .alias("n_clicks"),
        (
            F.unix_micros(F.col("ts").cast("timestamp"))
            - F.unix_micros(F.col("prev_nc_ts").cast("timestamp"))
        )
        .cast("bigint")
        .alias("span_us"),
    )


@query(
    "win_value_percentile_grouped",
    """
    WITH base AS (
        SELECT event_id, user_id, event_type,
               CAST(FLOOR(value * 10000) AS BIGINT) AS v
        FROM events
    ), atoms AS (
        SELECT event_type, v, CAST(COUNT(*) AS BIGINT) AS c
        FROM base GROUP BY event_type, v
    ), ranked AS (
        SELECT event_type, v,
               COALESCE(SUM(c) OVER (PARTITION BY event_type ORDER BY v
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS prev,
               c,
               CAST(SUM(c) OVER (PARTITION BY event_type) AS BIGINT) AS n
        FROM atoms
    )
    SELECT b.event_id, b.event_type, b.v,
           CAST(FLOOR(CAST(r.prev + r.c AS DOUBLE) / r.n * 1000000)
                AS BIGINT) AS cume_dist_e6
    FROM base b
    JOIN ranked r ON r.event_type = b.event_type AND r.v = b.v
    WHERE b.user_id < 20
    """,
)
def win_value_percentile_grouped(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-row within-group percentile WITHOUT ranking the fact table
    (round 7) — the scale-correct form of the global-rank family
    (win_percent_cume's documented dimension-only limitation,
    solved): cumulative distribution per (event_type, value) comes
    from the ATOM table's keyed prefix window, then joins BACK onto
    fact rows by the atom key — every row learns its percentile
    while the only ordered pass touches |distinct values| rows.  The
    emitted subset (user_id < 20) bounds the driver readout; the
    ranks are computed against the FULL group distribution.

    cume_dist = (prev + c)/n floored once to e6 — the exact tie-aware
    definition both engines share.

    Scale: atom aggregation + keyed prefix window + one broadcast-or
    -shuffle equi-join on (group, atom) — the join key is the
    at-rest partition key for floored metrics."""
    ev = load(spark, sf_dir, "events")
    base = ev.select(
        "event_id",
        "user_id",
        "event_type",
        F.floor(F.col("value") * 10000).cast("bigint").alias("v"),
    )
    atoms = base.groupBy("event_type", "v").agg(
        F.count("*").cast("bigint").alias("c")
    )
    w_prev = (
        Window.partitionBy("event_type")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wn = Window.partitionBy("event_type")
    ranked = atoms.select(
        "event_type",
        "v",
        F.coalesce(F.sum("c").over(w_prev), F.lit(0)).alias("prev"),
        "c",
        F.sum("c").over(wn).cast("bigint").alias("n"),
    )
    return (
        base.filter(F.col("user_id") < 20)
        .join(ranked, ["event_type", "v"])
        .select(
            "event_id",
            "event_type",
            "v",
            F.floor(
                (F.col("prev") + F.col("c")).cast("double")
                / F.col("n")
                * 1000000
            )
            .cast("bigint")
            .alias("cume_dist_e6"),
        )
    )


@query(
    "win_record_highs",
    """
    WITH base AS (
        SELECT user_id, ts, event_id,
               CAST(FLOOR(value * 10000) AS BIGINT) AS v
        FROM events
    ), marked AS (
        SELECT user_id, v,
               CASE WHEN v > COALESCE(MAX(v) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   -9223372036854775808)
               THEN 1 ELSE 0 END AS is_record
        FROM base
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(is_record) AS BIGINT) AS n_records,
           CAST(MAX(v) AS BIGINT) AS all_time_high_e4
    FROM marked GROUP BY user_id
    """,
)
def win_record_highs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record-high counter per user (round 7) — how many times each
    user's value stream set a new all-time high: the classic
    record-statistics readout (for an i.i.d. stream E[records] ≈ ln n,
    so a user whose record count far exceeds ln(events) is trending,
    not fluctuating — a one-number trend detector with a known null
    model, unlike a slope it needs no window length).

    Exact: a strict > against the running prefix max on floored-e4
    integers over the (ts, event_id) total order — the first event is
    always a record (the sentinel min-bigint COALESCE).

    Scale: one keyed prefix-max window + one keyed rollup."""
    ev = load(spark, sf_dir, "events")
    base = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.floor(F.col("value") * 10000).cast("bigint").alias("v"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = base.select(
        "user_id",
        "v",
        F.when(
            F.col("v")
            > F.coalesce(
                F.max("v").over(w), F.lit(-9223372036854775808)
            ),
            1,
        )
        .otherwise(0)
        .alias("is_record"),
    )
    return marked.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.sum("is_record").cast("bigint").alias("n_records"),
        F.max("v").cast("bigint").alias("all_time_high_e4"),
    )


@query(
    "win_abc_classification",
    """
    WITH spend AS (
        SELECT l_returnflag, l_partkey,
               CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS cents
        FROM lineitem GROUP BY 1, 2
    ), ranked AS (
        SELECT l_returnflag, l_partkey, cents,
               CAST(SUM(cents) OVER (PARTITION BY l_returnflag
                   ORDER BY cents DESC, l_partkey ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cum_cents,
               CAST(SUM(cents) OVER (PARTITION BY l_returnflag)
                    AS BIGINT) AS total_cents
        FROM spend
    ), classed AS (
        SELECT l_returnflag,
               CASE WHEN cum_cents * 100 <= total_cents * 80 THEN 'A'
                    WHEN cum_cents * 100 <= total_cents * 95 THEN 'B'
                    ELSE 'C' END AS abc_class,
               cents
        FROM ranked
    )
    SELECT l_returnflag, abc_class,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(cents) AS BIGINT) AS class_cents
    FROM classed GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def win_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC (Pareto) CLASSIFICATION per return flag (round 10): rank
    parts by spend, classify by cumulative share — A up to 80%, B to
    95%, C the tail — the inventory-management standard that turns
    agg_pareto_coverage's single readout into the actionable
    three-way split ops teams stock/audit/deprioritize by.  Emits
    the class census (how many parts, how much value per class) —
    the "20% of parts are 80% of value" verdict per segment.

    ZERO floats: class boundaries compare cum·100 ≤ total·80 in pure
    bigint cross-multiplication (no percentage division anywhere);
    the cumulative order is total (cents DESC, partkey ASC), so ties
    break identically in both engines.

    Scale: one map-side-combinable spend rollup, then one keyed
    cumulative window over |parts-per-flag| rows and a tiny class
    rollup — the agg_lorenz_deciles exchange with a CASE instead of
    an ntile."""
    li = load(spark, sf_dir, "lineitem")
    spend = li.groupBy("l_returnflag", "l_partkey").agg(
        F.sum(F.floor(F.col("l_extendedprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    wc = (
        Window.partitionBy("l_returnflag")
        .orderBy(F.col("cents").desc(), F.col("l_partkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy("l_returnflag")
    ranked = spend.select(
        "l_returnflag",
        "cents",
        F.sum("cents").over(wc).cast("bigint").alias("cum_cents"),
        F.sum("cents").over(wt).cast("bigint").alias("total_cents"),
    )
    classed = ranked.select(
        "l_returnflag",
        F.when(
            F.col("cum_cents") * 100 <= F.col("total_cents") * 80, "A"
        )
        .when(F.col("cum_cents") * 100 <= F.col("total_cents") * 95, "B")
        .otherwise("C")
        .alias("abc_class"),
        "cents",
    )
    return (
        classed.groupBy("l_returnflag", "abc_class")
        .agg(
            F.count("*").cast("bigint").alias("n_parts"),
            F.sum("cents").cast("bigint").alias("class_cents"),
        )
        .orderBy("l_returnflag", "abc_class")
    )


@query(
    "win_variance_bridge",
    """
    WITH half AS (
        SELECT l_returnflag,
               CAST(SUM(CASE WHEN l_shipdate < DATE '1996-01-01'
                    THEN CAST(FLOOR(l_extendedprice * 100) AS BIGINT)
                    ELSE 0 END) AS BIGINT) AS pre_cents,
               CAST(SUM(CASE WHEN l_shipdate >= DATE '1996-01-01'
                    THEN CAST(FLOOR(l_extendedprice * 100) AS BIGINT)
                    ELSE 0 END) AS BIGINT) AS post_cents
        FROM lineitem GROUP BY 1
    )
    SELECT l_returnflag, pre_cents, post_cents,
           post_cents - pre_cents AS delta_cents,
           CAST(SUM(post_cents - pre_cents) OVER () AS BIGINT)
               AS total_delta_cents,
           CASE WHEN SUM(post_cents - pre_cents) OVER () <> 0 THEN
               CAST(FLOOR(CAST(post_cents - pre_cents AS DOUBLE)
                          / SUM(post_cents - pre_cents) OVER ()
                          * 1000000) AS BIGINT)
           ELSE NULL END AS contrib_share_e6,
           CAST(SUM(post_cents - pre_cents) OVER (
               ORDER BY post_cents - pre_cents DESC, l_returnflag
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS waterfall_running_cents
    FROM half ORDER BY delta_cents DESC, l_returnflag
    """,
)
def win_variance_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANCE BRIDGE / waterfall (round 10): decompose the total
    period-over-period revenue change into per-segment contributions
    with a running waterfall — THE finance/BI explanation artifact
    ("revenue moved +X; segment A contributed 70%, B −20%...") that
    turns ts_period_over_period's per-series deltas into an
    additive, presentation-ready bridge.  Each segment's share of
    the total delta and the cumulative waterfall line are emitted
    so the chart is a straight render of the result.

    Exactness: pre/post sums and deltas are exact cents bigints; the
    waterfall running sum is integer; only the share floors (and is
    guarded against a zero total delta).  The waterfall order pins
    on (delta DESC, flag) — deterministic ties.

    Scale: one conditional-sum scan to |segments| rows; the windows
    run over that dashboard-sized frame (budgeted)."""
    li = load(spark, sf_dir, "lineitem")
    cents = F.floor(F.col("l_extendedprice") * 100).cast("bigint")
    half = li.groupBy("l_returnflag").agg(
        F.sum(
            F.when(F.col("l_shipdate") < F.lit("1996-01-01").cast("date"), cents)
            .otherwise(0)
        )
        .cast("bigint")
        .alias("pre_cents"),
        F.sum(
            F.when(
                F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"), cents
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("post_cents"),
    )
    delta = F.col("post_cents") - F.col("pre_cents")
    wall = Window.partitionBy()
    wfall = Window.orderBy(delta.desc(), F.col("l_returnflag")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    total = F.sum(delta).over(wall)
    return half.select(
        "l_returnflag",
        "pre_cents",
        "post_cents",
        delta.alias("delta_cents"),
        total.cast("bigint").alias("total_delta_cents"),
        F.when(
            total != 0,
            F.floor(delta.cast("double") / total * 1000000).cast("bigint"),
        ).alias("contrib_share_e6"),
        F.sum(delta).over(wfall).cast("bigint").alias("waterfall_running_cents"),
    ).orderBy(F.col("delta_cents").desc(), "l_returnflag")


@query(
    "win_reset_cumsum",
    """
    WITH ordered AS (
        SELECT user_id, ts, event_id,
               CAST(FLOOR(value * 10000) AS BIGINT) AS v,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id)
                         > INTERVAL 30 MINUTE
                    OR LAG(ts) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS is_start
        FROM events WHERE user_id < 25
    ), sessioned AS (
        SELECT user_id, ts, event_id, v,
               CAST(SUM(is_start) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id)
                    AS BIGINT) AS session_no
        FROM ordered
    )
    SELECT user_id, event_id, session_no,
           CAST(SUM(v) OVER (PARTITION BY user_id, session_no
                             ORDER BY ts, event_id) AS BIGINT)
               AS session_running_e4
    FROM sessioned
    """,
)
def win_reset_cumsum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RESETTING CUMULATIVE SUM (round 11): a per-user running value
    total that RESTARTS at every session boundary (>30 min gap) —
    the composition the window family was missing: gaps-islands
    session numbering (win_gaps_islands) feeding a second window
    keyed by the DERIVED (user, session) — 'spend so far this
    session', the live-dashboard primitive that a plain running sum
    (win_running_sum) silently gets wrong across session breaks.

    Exactness: session boundaries are exact interval comparisons on
    a total order (ts, event_id); running sums are exact e4 bigints.

    Scale: both windows are keyed (user, then user+session — the
    second key REFINES the first, so AQE reuses the same hash
    partitioning with only an intra-partition re-sort, no second
    exchange); never a global window."""
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 25)
    w_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w_user)
    # exact microsecond interval compare (the events_sessionize
    # pattern) — a unix_timestamp() diff truncates to seconds and
    # diverges from the oracle's INTERVAL compare within 1 s of the
    # boundary (round-11 review finding)
    is_start = (
        F.when(
            prev_ts.isNull()
            | (F.col("ts") > prev_ts + F.expr("INTERVAL 30 MINUTES")),
            1,
        )
        .otherwise(0)
    )
    sessioned = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.floor(F.col("value") * 10000).cast("bigint").alias("v"),
        is_start.alias("is_start"),
    ).select(
        "user_id",
        "ts",
        "event_id",
        "v",
        F.sum("is_start").over(w_user).cast("bigint").alias("session_no"),
    )
    w_sess = Window.partitionBy("user_id", "session_no").orderBy(
        "ts", "event_id"
    )
    return sessioned.select(
        "user_id",
        "event_id",
        "session_no",
        F.sum("v").over(w_sess).cast("bigint").alias("session_running_e4"),
    )
