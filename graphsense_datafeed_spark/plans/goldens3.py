"""Third batch of golden plans: TPC-H Q13/Q15 adaptations + deterministic sampling.

Adapted to the reduced fixture schema (FIXTURES.md): Q13's
``o_comment NOT LIKE`` filter becomes an ``o_orderpriority`` exclusion
(same shape: a right-side predicate inside the LEFT JOIN's ON clause);
Q15's revenue window uses the fixture shipdate domain.

``sample_deterministic`` is the training-data-pipeline sampling
pattern: a content-hash (md5-hex-prefix) systematic sample. Unlike
``TABLESAMPLE``/``df.sample`` it is reproducible across engines, scales
(the decision is a pure per-row function — no coordination, no seed
state), and is stable under repartitioning/retries, which
partition-order-dependent Bernoulli sampling is not.

Scale notes (100 TB):
- Q13 is a fact→dim LEFT join grouped by the *dim* key: the first
  aggregate shuffles on c_custkey (same key as the join → AQE reuses
  the exchange), the second groups a customer-cardinality input on a
  tiny integer domain — effectively free.
- Q15's revenue aggregate shuffles lineitem once on l_suppkey; the
  max-revenue scalar is a 1-row broadcast (no driver collect), and the
  supplier join is dim-sized.
- The md5 sample prunes at scan time right after the parquet reader
  (one hash per row, whole-stage codegen) — bytes after the filter are
  sample-sized, so every downstream stage shrinks by the sample rate.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from graphsense_datafeed_spark.registry import query
from graphsense_datafeed_spark.sources.tables import load


@query(
    "golden_q13_custdist",
    """
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    """,
)
def q13_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of per-customer order counts.

    LEFT OUTER join keeps zero-order customers (c_count = 0 bucket);
    the right-side predicate lives in the ON clause, which is
    equivalent to pre-filtering the right input — the form used here so
    the filter reaches the orders scan.
    """
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    c_orders = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return c_orders.groupBy("c_count").agg(F.count("*").alias("custdist"))


@query(
    "golden_q15_top_supplier",
    """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
      FROM lineitem
      WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
        AND CAST(l_shipdate AS DATE) <  DATE '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) with the maximum quarterly revenue.

    The view-reuse query: ``revenue`` feeds both the scalar MAX and the
    join. The max rides as a 1-row broadcast crossJoin (SCALE.md rule:
    no driver-side scalars); equality is on ROUND(...,2) values
    computed identically on both sides, so the float-sum §2.12 trap
    can't flip the winner.
    """
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate").cast("date") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate").cast("date") < F.lit("1996-04-01").cast("date"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "total_revenue"
        )
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    supp = load(spark, sf_dir, "supplier")
    return (
        revenue.crossJoin(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(supp, F.col("supplier_no") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "sample_deterministic",
    """
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    WHERE substr(md5(CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR)), 1, 2) <= '0f'
    """,
)
def sample_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-hash systematic sample (~1/16) of lineitem by PK digest.

    ``md5(pk)`` hex-prefix comparison is engine-portable (both emit
    lowercase hex, compared lexicographically) and reproducible: the
    same row is always in or out, independent of partitioning, retries,
    or engine — the property training-data subsampling needs and
    seed-based Bernoulli sampling lacks.
    """
    li = load(spark, sf_dir, "lineitem")
    digest = F.md5(
        F.concat(
            F.col("l_orderkey").cast("string"),
            F.lit("-"),
            F.col("l_linenumber").cast("string"),
        ).cast("binary")
    )
    return li.filter(F.substring(digest, 1, 2) <= "0f").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )


@query(
    "events_funnel",
    """
    WITH s AS (
      SELECT user_id, MIN(ts) AS first_signup
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    ), p AS (
      SELECT e.user_id, COUNT(*) AS purchases_after
      FROM events e JOIN s ON e.user_id = s.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s.first_signup
      GROUP BY e.user_id
    )
    SELECT s.user_id, COALESCE(p.purchases_after, 0) AS purchases_after
    FROM s LEFT JOIN p ON s.user_id = p.user_id
    """,
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup→purchase funnel: per signed-up user, purchases strictly
    after their first signup. Two aggregates over the same fact table
    shuffled on the same key (user_id) — AQE reuses the exchange; the
    per-user signup min is user-cardinality — it SCALES with users, so
    the enrich join is left to AQE (broadcast only while it fits,
    shuffle beyond; round-9 sf1 lesson: never hint-pin a build side
    that grows with the data). Timestamp comparison is
    µs-exact on both engines (events ts parity, SURVEY §2.12-1)."""
    ev = load(spark, sf_dir, "events")
    signups = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_signup"))
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .join(signups, "user_id")
        .filter(F.col("ts") > F.col("first_signup"))
        .groupBy("user_id")
        .agg(F.count("*").alias("p_after"))
    )
    return signups.join(purchases, "user_id", "left").select(
        "user_id", F.coalesce("p_after", F.lit(0)).alias("purchases_after")
    )


@query(
    "events_cohort_retention",
    """
    WITH cohorts AS (
      SELECT user_id,
             CAST(date_trunc('week', MIN(CAST(ts AS DATE))) AS DATE) AS cohort_week
      FROM events GROUP BY user_id
    )
    SELECT cohort_week,
           date_diff('day', cohort_week,
                     CAST(date_trunc('week', CAST(e.ts AS DATE)) AS DATE)) // 7
             AS week_offset,
           COUNT(DISTINCT e.user_id) AS active_users
    FROM events e JOIN cohorts c USING (user_id)
    GROUP BY cohort_week, week_offset
    """,
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users bucketed by first-seen week, counted
    distinct in each subsequent activity week. Week offsets are
    computed as whole-day differences between week-truncated dates
    divided by 7 — exact integers on both engines (date_trunc('week')
    is Monday-start in Spark AND DuckDB; a 'week'-unit datediff would
    instead count engine-specific boundary crossings). The cohort dim
    is user-cardinality → AQE picks the enrich strategy (it scales); the distinct count
    shuffles on (cohort, offset, user) — bounded by active pairs."""
    ev = load(spark, sf_dir, "events")
    cohorts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min(F.to_date("ts"))).cast("date").alias("cohort_week")
    )
    return (
        ev.join(cohorts, "user_id")
        .select(
            "user_id",
            "cohort_week",
            F.floor(
                F.datediff(
                    F.date_trunc("week", F.to_date("ts")).cast("date"),
                    F.col("cohort_week"),
                )
                / 7
            ).alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("active_users"))
    )


# THE single definition of the session semantics (30-min gap,
# (ts, event_id) tie order) — both events_sessionize's oracle and
# events_concurrency_sweep's oracle build on this one string, so the
# gap/tie rules cannot silently diverge (round-5 review find).
_SESSIONS_CTE = """
    ordered AS (
        SELECT user_id, event_id, ts,
               CAST(ROUND(value * 100) AS BIGINT) AS cents,
               lag(ts) OVER (PARTITION BY user_id
                             ORDER BY ts, event_id) AS prev_ts
        FROM events
    ), marked AS (
        SELECT user_id, event_id, ts, cents,
               CASE WHEN prev_ts IS NULL
                         OR ts > prev_ts + INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_sess
        FROM ordered
    ), numbered AS (
        SELECT user_id, ts, cents,
               CAST(SUM(new_sess) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id
                                        ROWS UNBOUNDED PRECEDING)
                    AS BIGINT) AS session_id
        FROM marked
    ), sessions AS (
        SELECT user_id, session_id,
               MIN(ts) AS session_start, MAX(ts) AS session_end,
               COUNT(*) AS n_events,
               CAST(SUM(cents) AS BIGINT) AS total_cents
        FROM numbered
        GROUP BY user_id, session_id
    )
"""


@query(
    "events_sessionize",
    f"""
    WITH {_SESSIONS_CTE}
    SELECT user_id, session_id, session_start, session_end,
           n_events, total_cents
    FROM sessions
    """,
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization by inactivity gap — the classic lag →
    new-session flag → running-sum session id → per-session rollup,
    the batch twin of ``stream_session``'s session_window.

    Scale: ONE shuffle on user_id serves both window passes and the
    final aggregate (same partition key throughout); the 30-minute gap
    compare stays full-precision (timestamp + interval, no epoch
    truncation)."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "ts",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = ev.withColumn("prev_ts", F.lag("ts").over(w)).withColumn(
        "new_sess",
        F.when(
            F.col("prev_ts").isNull()
            | (F.col("ts") > F.col("prev_ts") + F.expr("INTERVAL 30 MINUTES")),
            1,
        ).otherwise(0),
    )
    numbered = marked.withColumn(
        "session_id",
        F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return numbered.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
        F.sum("cents").alias("total_cents"),
    )


@query(
    "events_user_paths",
    """
    WITH ordered AS (
        SELECT user_id,
               string_agg(event_type, '>' ORDER BY ts ASC, event_id ASC)
                   FILTER (WHERE rn <= 5) AS path
        FROM (
            SELECT user_id, event_type, ts, event_id,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts ASC, event_id ASC) AS rn
            FROM events
        )
        GROUP BY user_id
    )
    SELECT path, CAST(COUNT(*) AS BIGINT) AS n_users
    FROM ordered GROUP BY path
    HAVING COUNT(*) >= 2
    """,
)
def events_user_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-journey path analysis: each user's first five event types
    joined into a '>'-delimited path, counted across users, thresholded
    to recurring journeys — the onboarding-funnel discovery query
    (which opening sequences actually happen, and how often).

    Scale shape: ONE user_id exchange serves both the ordering window
    and the per-user aggregation; the path strings are bounded (5
    types) so the second aggregation's keys are small and map-side
    combinable. The driver-safe encoding lesson applied from the
    start: the sequence is emitted as a delimited string, never an
    array cell. Exact oracle via ordered string_agg."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    first5 = (
        ev.select("user_id", "event_type", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 5)
    )
    paths = first5.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("rn"), F.col("event_type")))
                ),
                lambda s: s.getField("event_type"),
            ),
            ">",
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").cast("bigint").alias("n_users"))
        .filter(F.col("n_users") >= 2)
    )


@query(
    "events_concurrency_sweep",
    f"""
    WITH {_SESSIONS_CTE}, points AS (
        SELECT session_start AS ts, 0 AS kind, 1 AS delta,
               user_id, session_id
        FROM sessions
        UNION ALL
        SELECT session_end, 1, -1, user_id, session_id FROM sessions
    ), run AS (
        SELECT date_trunc('hour', ts) AS hour_ts,
               SUM(delta) OVER (ORDER BY ts, kind, user_id, session_id
                                ROWS UNBOUNDED PRECEDING) AS conc
        FROM points
    )
    SELECT hour_ts, CAST(MAX(conc) AS BIGINT) AS peak_concurrency
    FROM run GROUP BY hour_ts
    """,
)
def events_concurrency_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent sessions per hour via a DISTRIBUTED sweep line
    (round 5): session intervals become ±1 boundary points, the global
    running sum at each point is the instantaneous concurrency, and
    the hourly max is the capacity-planning readout (how many users
    were on at once). The classic interval-stabbing query — and the
    classic "needs a global prefix sum" trap, solved with the two-pass
    decomposition instead of one all-data-to-one-partition window:

    1. points aggregate per hour bucket (distributed, map-side
       combinable) → the bucket-total table is hours-sized;
    2. an exclusive prefix over THAT tiny table gives each bucket its
       carry-in offset (a single-partition window over hours, not
       events — the acceptable global step);
    3. the within-bucket running sum is a window PARTITIONED by
       bucket (fully distributed), plus the broadcast offset.

    The total order (ts, kind, user_id, session_id) is pinned
    identically in both engines, with session STARTS sorting before
    ends at equal timestamps (touching intervals count as concurrent,
    and the within-timestamp maximum is then order-independent)."""
    sessions = events_sessionize(spark, sf_dir).select(
        "user_id", "session_id", "session_start", "session_end"
    )
    starts = sessions.select(
        F.col("session_start").alias("ts"),
        F.lit(0).alias("kind"),
        F.lit(1).alias("delta"),
        "user_id",
        "session_id",
    )
    ends = sessions.select(
        F.col("session_end").alias("ts"),
        F.lit(1).alias("kind"),
        F.lit(-1).alias("delta"),
        "user_id",
        "session_id",
    )
    points = starts.unionByName(ends).withColumn(
        "hour_ts", F.date_trunc("hour", "ts")
    )
    # pass 1: per-bucket totals; pass 2: exclusive prefix over buckets
    bucket_tot = points.groupBy("hour_ts").agg(F.sum("delta").alias("tot"))
    w_buckets = (
        Window.orderBy("hour_ts")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = bucket_tot.select(
        "hour_ts",
        F.coalesce(F.sum("tot").over(w_buckets), F.lit(0)).alias("carry_in"),
    )
    w_in = (
        Window.partitionBy("hour_ts")
        .orderBy("ts", "kind", "user_id", "session_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = points.join(F.broadcast(offsets), "hour_ts").select(
        "hour_ts",
        (F.sum("delta").over(w_in) + F.col("carry_in")).alias("conc"),
    )
    return run.groupBy("hour_ts").agg(
        F.max("conc").cast("bigint").alias("peak_concurrency")
    )


@query(
    "join_interval_self",
    f"""
    WITH {_SESSIONS_CTE}, pairs AS (
        SELECT a.user_id AS user_a, a.session_id AS sess_a,
               b.user_id AS user_b, b.session_id AS sess_b
        FROM sessions a JOIN sessions b
          ON a.user_id < b.user_id
         AND a.session_start <= b.session_end
         AND b.session_start <= a.session_end
    )
    SELECT user_a, user_b, CAST(COUNT(*) AS BIGINT) AS n_overlaps
    FROM pairs GROUP BY user_a, user_b
    ORDER BY n_overlaps DESC, user_a, user_b
    LIMIT 20
    """,
)
def join_interval_self(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval SELF-join (round 5): pairs of users whose sessions
    overlap in time, counted per pair — co-presence analysis (who is
    online together), the self-join sibling of join_interval's
    events×windows stab. The scale decomposition is the one every
    distributed interval self-join uses: explode each interval onto
    its covered HOUR buckets (bounded by session length), equi-join on
    the bucket — a hash join, never a full theta join — apply the
    exact overlap predicate as a residual, and de-duplicate the
    session-pair 4-tuple (a pair sharing several hours must count
    once). The DuckDB oracle runs the plain theta join: the bucketed
    plan must reproduce it EXACTLY — any pair lost at a bucket
    boundary or double-counted across shared hours hash-mismatches.
    Top-20 with the full-order tiebreak is a TakeOrderedAndProject."""
    sessions = events_sessionize(spark, sf_dir).select(
        "user_id", "session_id", "session_start", "session_end"
    )
    hours = sessions.select(
        "user_id",
        "session_id",
        "session_start",
        "session_end",
        F.explode(
            F.sequence(
                F.date_trunc("hour", "session_start"),
                F.date_trunc("hour", "session_end"),
                F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("h"),
    )
    a = hours.alias("a")
    b = hours.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.user_id") < F.col("b.user_id"))
            & (F.col("a.session_start") <= F.col("b.session_end"))
            & (F.col("b.session_start") <= F.col("a.session_end")),
        )
        .select(
            F.col("a.user_id").alias("user_a"),
            F.col("a.session_id").alias("sess_a"),
            F.col("b.user_id").alias("user_b"),
            F.col("b.session_id").alias("sess_b"),
        )
        .distinct()
    )
    return (
        pairs.groupBy("user_a", "user_b")
        .agg(F.count("*").cast("bigint").alias("n_overlaps"))
        .orderBy(F.col("n_overlaps").desc(), "user_a", "user_b")
        .limit(20)
    )
