"""Dataset-management operators: stratified sampling, table profiling,
snapshot change-data-capture.

The operations that sit AROUND a 100 TB corpus rather than inside one
query: drawing a reproducible per-stratum sample for a training mix,
profiling a table before trusting it, and diffing two snapshots of a
mutable upstream (the datafeed's re-ingest/reorg story, SURVEY §3.3,
expressed as set reconciliation instead of per-row upserts).

Determinism discipline: sampling uses the md5-hex-prefix selection of
`sample_deterministic` (engine-portable, partition-independent);
profiling emits min/max through VARCHAR casts only for integer/string
columns (double formatting differs between engines); the CDC diff
compares only exactly-representable values.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from graphsense_datafeed_spark.registry import query
from graphsense_datafeed_spark.sources.tables import load


@query(
    "stratified_sample",
    """
    SELECT doc_id, lang, source
    FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)
          <= CASE WHEN lang = 'en' THEN '14' ELSE '46' END
    """,
)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum deterministic sample: downsample the majority
    language ('en' keeps ~8%) while keeping ~28% of everything else —
    the language-rebalancing step of a training-data mixture.

    The stratum only changes the THRESHOLD; membership stays a pure
    function of the row's key digest, so the sample is reproducible
    across engines, partitionings and retries, and composable with
    further hash-based splits (train/eval on a different digest
    prefix). One narrow filter on the scan — no shuffle, no
    per-stratum pass, unlike `sampleBy` whose per-partition RNG is
    neither engine-portable nor retry-stable."""
    docs = load(spark, sf_dir, "documents")
    digest = F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 2)
    threshold = F.when(F.col("lang") == "en", "14").otherwise("46")
    return docs.filter(digest <= threshold).select("doc_id", "lang", "source")


_PROFILE_COLS = ("l_orderkey", "l_suppkey", "l_linenumber", "l_returnflag", "l_linestatus")


@query(
    "profile_columns",
    " UNION ALL ".join(
        f"""
        SELECT '{c}' AS col_name,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_null,
               CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
               CAST(MIN({c}) AS VARCHAR) AS min_v,
               CAST(MAX({c}) AS VARCHAR) AS max_v
        FROM lineitem
        """
        for c in _PROFILE_COLS
    ),
)
def profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profile of lineitem: row/null/distinct counts and
    min/max per column, one output row per column.

    Round-15 plan split (guide §2.3/§3): the original single agg mixed
    five COUNT(DISTINCT)s with string-typed MIN/MAX — Catalyst planned
    the multi-distinct Expand AND fell back to SortAggregate for the
    string buffers, sorting |rows|×(cols+1) expanded wide rows twice
    (measured 7.6 s isolated at sf0.1). Now two cheap passes: (a) the
    non-distinct stats as one partial-aggregated HashAggregate row,
    (b) distinct counts from a narrow ``stack`` long-form (col_name,
    value-string) — injective for the profiled int/string columns —
    deduped by a hash partial agg before the exchange. Both reductions
    are map-side partial; the 5-row joins are broadcast. Measured
    0.9 s isolated at sf0.1, identical output. The oracle spells it
    as UNION ALL of per-column scans for clarity; the values are
    identical. Only integer/string columns are profiled through
    VARCHAR casts — double→string formatting is not engine-portable."""
    li = load(spark, sf_dir, "lineitem")
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            F.count("*").alias(f"{c}__rows"),
            (F.count("*") - F.count(c)).alias(f"{c}__null"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    wide = li.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__rows, {c}__null, {c}__min, {c}__max"
        for c in _PROFILE_COLS
    )
    stats = wide.selectExpr(
        f"stack({len(_PROFILE_COLS)}, {stack_args}) AS "
        "(col_name, n_rows, n_null, min_v, max_v)"
    )
    stack_vals = ", ".join(
        f"'{c}', CAST({c} AS STRING)" for c in _PROFILE_COLS
    )
    longform = li.selectExpr(
        f"stack({len(_PROFILE_COLS)}, {stack_vals}) AS (col_name, v)"
    )
    dcnt = (
        longform.filter(F.col("v").isNotNull())
        .groupBy("col_name", "v")
        .agg(F.lit(1))
        .groupBy("col_name")
        .agg(F.count("*").alias("n_distinct"))
    )
    return stats.join(F.broadcast(dcnt), "col_name", "left").select(
        "col_name",
        "n_rows",
        "n_null",
        F.coalesce("n_distinct", F.lit(0)).cast("bigint").alias("n_distinct"),
        "min_v",
        "max_v",
    )


@query(
    "cdc_snapshot_diff",
    """
    WITH snap_a AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice
      FROM orders WHERE CAST(o_orderdate AS DATE) < DATE '1997-07-01'
    ), snap_b AS (
      SELECT o_orderkey,
             CASE WHEN o_orderstatus = 'P' THEN 'F' ELSE o_orderstatus END
                 AS o_orderstatus,
             o_totalprice
      FROM orders WHERE CAST(o_orderdate AS DATE) < DATE '1998-07-01'
    )
    SELECT COALESCE(a.o_orderkey, b.o_orderkey) AS o_orderkey,
           CASE WHEN a.o_orderkey IS NULL THEN 'insert'
                ELSE 'update' END AS change_type
    FROM snap_a a FULL OUTER JOIN snap_b b ON a.o_orderkey = b.o_orderkey
    WHERE a.o_orderkey IS NULL
       OR b.o_orderkey IS NULL
       OR a.o_orderstatus <> b.o_orderstatus
    """,
)
def cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-capture between two snapshots of a mutable table:
    full-outer join on the primary key, classify each key as
    insert / update (delete falls out of the same CASE — the fixture
    snapshots are append-plus-amend, so none occur, but the branch is
    exercised by tests/test_datamgmt.py on a synthetic frame).

    Snapshot A is the table as of 1997-07; snapshot B a year later
    with pending orders finalized ('P'→'F') — a deterministic stand-in
    for the datafeed's re-ingest-after-reorg input. At scale both
    sides shuffle once on the PK (the join key IS the snapshot sort
    key, so with bucketed snapshots this is exchange-free), and the
    diff output is sized in changes, not table size."""
    orders = load(spark, sf_dir, "orders")
    snap_a = orders.filter(
        F.col("o_orderdate").cast("date") < F.lit("1997-07-01").cast("date")
    ).select(
        F.col("o_orderkey").alias("a_key"), F.col("o_orderstatus").alias("a_status")
    )
    snap_b = orders.filter(
        F.col("o_orderdate").cast("date") < F.lit("1998-07-01").cast("date")
    ).select(
        F.col("o_orderkey").alias("b_key"),
        F.when(F.col("o_orderstatus") == "P", "F")
        .otherwise(F.col("o_orderstatus"))
        .alias("b_status"),
    )
    joined = snap_a.join(snap_b, snap_a.a_key == snap_b.b_key, "full_outer")
    return joined.filter(
        F.col("a_key").isNull()
        | F.col("b_key").isNull()
        | (F.col("a_status") != F.col("b_status"))
    ).select(
        F.coalesce("a_key", "b_key").alias("o_orderkey"),
        F.when(F.col("a_key").isNull(), "insert")
        .when(F.col("b_key").isNull(), "delete")
        .otherwise("update")
        .alias("change_type"),
    )


@query(
    "layout_compact",
    """
    SELECT event_id, user_id, event_type,
           CAST(ROUND(value * 100) AS BIGINT) AS cents
    FROM events
    """,
)
def layout_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-files compaction — the table-maintenance pass every
    micro-batch-ingested 100 TB table needs: streaming sinks and
    per-batch upserts leave thousands of KB-sized files whose
    open/footer costs come to dominate scans.

    The sequence stages the events table fragmented into 64 shard
    files (simulated ingest debris), then compacts: repartitionByRange
    on the query key + sortWithinPartitions, so the rewritten files
    are both FEW and RANGE-CLUSTERED — each file covers a tight
    event_id/min-max band, which parquet row-group pruning and
    partition-level data skipping both exploit on every later read
    (same discipline as layout_zorder, one dimension). At scale the
    file-count target comes from total_bytes/128MB via
    ``spark.sql.files.maxRecordsPerFile``; locally 4 files stand in.

    The oracle is the full content of the source table: compaction
    that lost, duplicated, or mutated ANY row hash-mismatches —
    exactly the invariant a production compactor must prove before
    swapping the new layout in (staged-rename here, manifest commit in
    a table format). tests/test_datamgmt.py asserts the 64→≤4 file
    reduction and the clustered min/max bands."""
    import os
    import shutil
    import uuid

    from graphsense_datafeed_spark.sources.tables import staged_source_dir

    # fingerprint-keyed staging (see staged_source_dir): a regenerated
    # fixture re-stages instead of hash-mismatching the fresh oracle
    base = staged_source_dir(sf_dir, "gds_compact", "events")
    frag_dir, compact_dir = f"{base}/fragmented", f"{base}/compacted"
    ev = load(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    if not os.path.exists(frag_dir):
        stage = frag_dir + ".stage." + uuid.uuid4().hex[:8]
        ev.repartition(64).write.mode("overwrite").parquet(stage)
        try:
            os.rename(stage, frag_dir)
        except OSError:
            shutil.rmtree(stage, ignore_errors=True)
    frag = spark.read.parquet(frag_dir)
    stage = compact_dir + ".stage." + uuid.uuid4().hex[:8]
    (
        frag.repartitionByRange(4, "event_id")
        .sortWithinPartitions("event_id")
        .write.mode("overwrite")
        .parquet(stage)
    )
    shutil.rmtree(compact_dir, ignore_errors=True)
    os.rename(stage, compact_dir)
    return spark.read.parquet(compact_dir)


@query(
    "profile_skew",
    """
    WITH counts AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events GROUP BY user_id
    ), tot AS (SELECT CAST(SUM(n_events) AS BIGINT) AS total FROM counts)
    SELECT user_id, n_events,
           CAST(FLOOR(CAST(n_events AS DOUBLE) / total * 10000) AS BIGINT)
               AS share_e4,
           CAST(rk AS INT) AS rank
    FROM (
        SELECT user_id, n_events, total,
               row_number() OVER (ORDER BY n_events DESC, user_id ASC) AS rk
        FROM counts CROSS JOIN tot
    )
    WHERE rk <= 10
    """,
)
def profile_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnosis: the top-10 heaviest keys of the fact
    table with absolute counts and e4 traffic shares — the
    measurement that decides WHICH keys join_skew_conditional salts
    (its heavy-hitter threshold) and how AQE skew-join thresholds
    should be set, run as one cheap aggregation BEFORE committing a
    100 TB join strategy.

    Scale shape: one partial-aggregated count per key (map-side
    combine ⇒ shuffle carries |distinct keys| rows, not |fact|), the
    one-row total broadcast back, then a global rank window — run on
    the AGGREGATED key table only (|keys| rows; same bounded-input
    discipline as win_percent_cume), never on the fact. At extreme key
    cardinality the rank window degrades gracefully to a
    top-k-per-partition pre-filter + final top-k. Integer counts and
    floor-e4 shares keep the oracle exact."""
    ev = load(spark, sf_dir, "events")
    counts = ev.groupBy("user_id").agg(F.count("*").cast("bigint").alias("n_events"))
    total = counts.agg(F.sum("n_events").cast("bigint").alias("total"))
    from pyspark.sql import Window

    w = Window.orderBy(F.col("n_events").desc(), F.col("user_id").asc())
    return (
        counts.crossJoin(F.broadcast(total))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select(
            "user_id",
            "n_events",
            F.floor(F.col("n_events").cast("double") / F.col("total") * 10000)
            .cast("bigint")
            .alias("share_e4"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


@query(
    "scd_type2",
    """
    WITH seq AS (
        SELECT user_id, event_id, ts, event_type,
               lag(event_type) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        FROM events WHERE user_id < 50
    ), changes AS (
        SELECT user_id, event_id, ts AS valid_from, event_type
        FROM seq WHERE prev_type IS NULL OR prev_type <> event_type
    )
    SELECT user_id, event_type, valid_from,
           lead(valid_from) OVER
               (PARTITION BY user_id ORDER BY valid_from, event_id)
               AS valid_to,
           lead(valid_from) OVER
               (PARTITION BY user_id ORDER BY valid_from, event_id)
               IS NULL AS is_current
    FROM changes
    """,
)
def scd_type2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 build: a per-key change stream
    compressed to VERSIONED VALIDITY INTERVALS — consecutive rows with
    an unchanged attribute collapse away, each surviving change opens
    a version [valid_from, valid_to) closed by the next change (open
    interval = current version). The standard dimension-history shape
    every warehouse keeps, and the run-length compression that turns
    billions of redundant snapshot rows into the few that changed.

    Both windows share one user_id exchange (same partitionBy; Spark
    reuses the hash partitioning across the lag and lead specs), and
    ordering ties break on event_id so the interval chain is
    deterministic under equal timestamps. Output is sized in CHANGES,
    not events. At 100 TB: partition count follows key cardinality;
    the intervals land partitioned by key and the as-of lookup joins
    them with join_asof (§2.3) — the two operators are designed as a
    pair."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = (
        load(spark, sf_dir, "events")
        .filter(F.col("user_id") < 50)
        .select(
            "user_id",
            "event_id",
            "ts",
            "event_type",
            F.lag("event_type").over(w).alias("prev_type"),
        )
    )
    changes = seq.filter(
        F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type"))
    ).select("user_id", "event_id", F.col("ts").alias("valid_from"), "event_type")
    w2 = Window.partitionBy("user_id").orderBy("valid_from", "event_id")
    lead_from = F.lead("valid_from").over(w2)
    return changes.select(
        "user_id",
        "event_type",
        "valid_from",
        lead_from.alias("valid_to"),
        lead_from.isNull().alias("is_current"),
    )


@query(
    "batch_merge_upsert",
    """
    SELECT o_orderkey,
           CASE WHEN o_orderstatus = 'P' THEN 'F' ELSE o_orderstatus END
               AS o_orderstatus,
           o_totalprice
    FROM orders WHERE CAST(o_orderdate AS DATE) < DATE '1998-07-01'
    """,
)
def batch_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch MERGE INTO: apply a change set (the cdc_snapshot_diff
    scenario's inserts + updates) onto the base snapshot — changed
    keys take their new row, unchanged base rows pass through
    (anti-join), deletes would subtract (no deletes in the fixture
    scenario; the branch is exercised on a synthetic frame in
    tests/test_datamgmt.py). The oracle is the CLOSURE PROPERTY that
    makes MERGE trustworthy: base ⊕ diff(base, target) must equal the
    target snapshot EXACTLY — any dropped, duplicated, or stale row
    hash-mismatches.

    Scale: one primary-key shuffle for the anti-join (exchange-free
    with PK-bucketed snapshots); the applied change set is sized in
    changes, not table size, so the common case broadcasts. This is
    the batch twin of stream_rates_upsert's per-micro-batch upsert."""
    orders = load(spark, sf_dir, "orders")
    base = orders.filter(
        F.col("o_orderdate").cast("date") < F.lit("1997-07-01").cast("date")
    ).select("o_orderkey", "o_orderstatus", "o_totalprice")
    target = orders.filter(
        F.col("o_orderdate").cast("date") < F.lit("1998-07-01").cast("date")
    ).select(
        "o_orderkey",
        F.when(F.col("o_orderstatus") == "P", "F")
        .otherwise(F.col("o_orderstatus"))
        .alias("o_orderstatus"),
        "o_totalprice",
    )
    # change set: rows of TARGET whose key is new or whose row changed
    b = base.select(
        F.col("o_orderkey").alias("b_key"), F.col("o_orderstatus").alias("b_status")
    )
    changes = (
        target.join(b, target.o_orderkey == b.b_key, "left")
        .filter(F.col("b_key").isNull() | (F.col("o_orderstatus") != F.col("b_status")))
        .select(
            "o_orderkey",
            "o_orderstatus",
            "o_totalprice",
            F.when(F.col("b_key").isNull(), "insert")
            .otherwise("update")
            .alias("change_type"),
        )
    )
    return apply_changes(base, changes, "o_orderkey")


def apply_changes(base: DataFrame, changes: DataFrame, key: str) -> DataFrame:
    """MERGE INTO core: ``changes`` carries the key, the new payload
    columns, and ``change_type`` ∈ {insert, update, delete}.
    Inserts/updates contribute their new row; every changed key
    (deletes included) is anti-joined out of ``base``; untouched base
    rows pass through. One PK shuffle; the change set broadcasts when
    small. Delete semantics are pinned by
    tests/test_datamgmt.py::test_apply_changes_handles_deletes."""
    upserts = changes.filter(F.col("change_type") != "delete").drop("change_type")
    survivors = base.join(changes.select(key), key, "left_anti")
    return upserts.unionByName(survivors)


@query(
    "unpivot_longer",
    """
    SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric,
           l_quantity AS val
    FROM lineitem WHERE l_orderkey % 50 = 0
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
    FROM lineitem WHERE l_orderkey % 50 = 0
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
    FROM lineitem WHERE l_orderkey % 50 = 0
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_tax', l_tax
    FROM lineitem WHERE l_orderkey % 50 = 0
    """,
)
def unpivot_longer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long reshape (UNPIVOT / melt): four measure columns become
    (metric, val) rows — the shape feature stores, plotting layers,
    and metric-generic quality checks consume. Spark's native
    `DataFrame.unpivot` compiles to a single Expand node: ONE scan
    emits all four rows per input row, no self-union, no re-scan
    (the oracle spells it as UNION ALL because that is portable SQL —
    the plans differ, the result multiset must not).

    Scale: Expand multiplies rows 4× in the map stage with zero
    shuffle; column pruning still reaches the scan (only the 2 id +
    4 measure columns are read). The value columns must share one
    type (all doubles here) — heterogeneous unpivots cast first."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 50 == 0)
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "metric",
        "val",
    )


@query(
    "anon_k_suppress",
    """
    WITH sized AS (
        SELECT c_custkey, c_nationkey, c_mktsegment,
               COUNT(*) OVER (PARTITION BY c_nationkey, c_mktsegment)
                   AS group_n
        FROM customer
    )
    SELECT c_custkey,
           CASE WHEN group_n < 10 THEN NULL
                ELSE CAST(c_nationkey AS BIGINT) END AS nat_q,
           CASE WHEN group_n < 10 THEN NULL ELSE c_mktsegment END AS seg_q,
           CAST(group_n AS BIGINT) AS group_n,
           group_n < 10 AS is_suppressed
    FROM sized
    """,
)
def anon_k_suppress(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity suppression (k=10) over the quasi-identifier pair
    (nationkey, mktsegment): any row whose QI combination is shared by
    fewer than k individuals gets its quasi-identifiers NULLed — the
    release-gate pass a training-data pipeline runs before publishing
    per-user derived tables (small QI groups are re-identifiable by
    linkage). Row identity and measures survive; only the linkable
    attributes are redacted, and the group size is emitted for audit.

    One window count over the QI key — a single exchange, no join
    back. At 100 TB this is a groupBy-count (tiny: |QI combinations|)
    broadcast-joined onto the corpus instead of a window, same
    semantics; the window form is used here because the QI group
    count rides the same shuffle the output needs anyway."""
    w = Window.partitionBy("c_nationkey", "c_mktsegment")
    n = F.count("*").over(w)
    small = n < 10
    return load(spark, sf_dir, "customer").select(
        "c_custkey",
        F.when(small, F.lit(None))
        .otherwise(F.col("c_nationkey").cast("bigint"))
        .alias("nat_q"),
        F.when(small, F.lit(None)).otherwise(F.col("c_mktsegment")).alias("seg_q"),
        n.cast("bigint").alias("group_n"),
        small.alias("is_suppressed"),
    )


@query(
    "join_scd_lookup",
    """
    WITH seq AS (
        SELECT user_id, event_id, ts, event_type,
               lag(event_type) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        FROM events WHERE user_id < 50
    ), changes AS (
        SELECT user_id, event_id, ts AS valid_from, event_type
        FROM seq WHERE prev_type IS NULL OR prev_type <> event_type
    ), grid AS (
        SELECT user_id,
               unnest(generate_series(date_trunc('hour', MIN(ts)),
                                      date_trunc('hour', MAX(ts)),
                                      INTERVAL 1 HOUR)) AS ts
        FROM events WHERE user_id < 50 GROUP BY user_id
    ), tape AS (
        SELECT user_id, valid_from AS ts, 0 AS is_probe, event_type
        FROM changes
        UNION ALL
        SELECT user_id, ts, 1 AS is_probe, NULL AS event_type FROM grid
    ), resolved AS (
        SELECT user_id, ts, is_probe,
               last_value(event_type IGNORE NULLS) OVER (
                   PARTITION BY user_id
                   ORDER BY ts, is_probe, event_type
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS type_asof
        FROM tape
    )
    SELECT user_id, ts AS hour_ts, type_asof
    FROM resolved WHERE is_probe = 1
    """,
)
def join_scd_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time lookup against the scd_type2 dimension (round 5)
    — "what version was in effect at time t", resolved for an hourly
    probe grid per user. This is the consumer side of the SCD pair:
    scd_type2 compresses the change stream into validity intervals;
    this query answers as-of probes against them WITHOUT a join node —
    version-open rows and probe rows are unioned onto one per-key tape
    and a running `last(ignorenulls)` window carries the in-effect
    version forward onto every probe (the join_asof union+window
    trick). Every exchange hashes on user_id alone — the grid-bounds
    aggregate and the tape window (two, plan-audited); no interval
    predicate, no range join, no per-probe search.

    Tie semantics are pinned: at equal timestamps the state row sorts
    BEFORE the probe (is_probe 0 < 1), so a probe exactly at
    valid_from sees the NEW version — the [valid_from, valid_to)
    closed-open convention. Probes before a user's first version
    resolve to NULL (no history yet). At 100 TB the tape shape wins
    precisely because the dimension is duplicated nowhere and probes
    never fan out: bytes shuffled = |changes| + |probes|, partitioned
    by the same key the dimension is already stored under."""
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    dim = scd_type2(spark, sf_dir)
    states = dim.select(
        "user_id",
        F.col("valid_from").alias("ts"),
        F.lit(0).alias("is_probe"),
        "event_type",
    )
    probes = (
        ev.groupBy("user_id")
        .agg(
            F.date_trunc("hour", F.min("ts")).alias("h0"),
            F.date_trunc("hour", F.max("ts")).alias("h1"),
        )
        .select(
            "user_id",
            F.explode(F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))).alias("ts"),
        )
        .select(
            "user_id",
            "ts",
            F.lit(1).alias("is_probe"),
            F.lit(None).cast("string").alias("event_type"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_probe", "event_type")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tape = states.unionByName(probes).select(
        "user_id",
        "ts",
        "is_probe",
        F.last("event_type", ignorenulls=True).over(w).alias("type_asof"),
    )
    return tape.filter(F.col("is_probe") == 1).select(
        "user_id", F.col("ts").alias("hour_ts"), "type_asof"
    )


@query(
    "anon_l_diversity",
    """
    WITH g AS (
        SELECT c_nationkey, c_mktsegment,
               CAST(COUNT(*) AS BIGINT) AS group_n,
               CAST(COUNT(DISTINCT
                    CAST(FLOOR(c_acctbal / 1000) AS BIGINT)) AS BIGINT)
                   AS l_sensitive
        FROM customer GROUP BY 1, 2
    )
    SELECT CAST(c_nationkey AS BIGINT) AS nat_q, c_mktsegment AS seg_q,
           group_n, l_sensitive,
           (group_n >= 10 AND l_sensitive >= 3) AS releasable
    FROM g
    """,
)
def anon_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit (round 5 batch 6) — the privacy check
    k-anonymity alone fails: a quasi-identifier group can be large
    (k ≥ 10) yet still leak if every member shares one sensitive
    value (the classic homogeneity attack — 'all 12 people in that
    ZIP+age bucket have the same diagnosis'). Each
    (nation, segment) group is scored by size AND by the number of
    DISTINCT sensitive-attribute classes it contains (account-balance
    bands as the sensitive column); releasable = k ≥ 10 ∧ l ≥ 3,
    complementing anon_k_suppress's row-level suppression with the
    group-level release decision an anonymization pipeline actually
    gates on.

    One groupBy with a conditional distinct (the agg_count_if_distinct
    expand rewrite — one exchange for count + distinct together);
    bands floor-quantize in exact integer domain. Scale: group-keyed
    partial agg; the sensitive-class NDV per group is bounded by the
    band count, so distinct state never grows past it."""
    c = load(spark, sf_dir, "customer")
    band = F.floor(F.col("c_acctbal") / 1000).cast("bigint")
    g = c.groupBy(
        F.col("c_nationkey").cast("bigint").alias("nat_q"),
        F.col("c_mktsegment").alias("seg_q"),
    ).agg(
        F.count("*").cast("bigint").alias("group_n"),
        F.countDistinct(band).cast("bigint").alias("l_sensitive"),
    )
    return g.select(
        "nat_q",
        "seg_q",
        "group_n",
        "l_sensitive",
        ((F.col("group_n") >= 10) & (F.col("l_sensitive") >= 3)).alias(
            "releasable"
        ),
    )


@query(
    "events_ab_srm",
    """
    WITH assigned AS (
        SELECT user_id,
               CAST('0x' || substr(md5('exp42_' || CAST(user_id AS VARCHAR)),
                                   1, 7) AS BIGINT) % 2 AS arm
        FROM (SELECT DISTINCT user_id FROM events)
    ), counts AS (
        SELECT CAST(COUNT(*) FILTER (arm = 0) AS BIGINT) AS n_control,
               CAST(COUNT(*) FILTER (arm = 1) AS BIGINT) AS n_treat
        FROM assigned
    )
    SELECT n_control, n_treat,
           CAST(FLOOR(
               (CAST(n_control AS DOUBLE) - CAST(n_control + n_treat
                    AS DOUBLE) / 2)
               * (CAST(n_control AS DOUBLE) - CAST(n_control + n_treat
                      AS DOUBLE) / 2)
               / (CAST(n_control + n_treat AS DOUBLE) / 2) * 2 * 1000000)
               AS BIGINT) AS srm_chi2_e6,
           (CAST(n_control AS DOUBLE) - CAST(n_control + n_treat AS DOUBLE)
            / 2)
           * (CAST(n_control AS DOUBLE) - CAST(n_control + n_treat
                  AS DOUBLE) / 2)
           / (CAST(n_control + n_treat AS DOUBLE) / 2) * 2 > 3.84
               AS srm_alarm
    FROM counts
    """,
)
def events_ab_srm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B assignment + sample-ratio-mismatch guard (round 5 batch
    17): users split 50/50 by salted hash (the split_train_holdout
    discipline — stable under re-runs, new users land consistently,
    no coordination), then the 1-df χ² against the intended ratio.
    SRM is THE silent experiment killer (biased logging, bot
    filtering applied to one arm, redirect loss): if the realized
    split is detectably off 50/50, every downstream metric comparison
    is invalid — experimentation platforms gate on exactly this alarm
    (χ² > 3.84 ⇔ p < 0.05) before showing results.

    Counts are exact bigints; the χ² and the alarm evaluate in one
    shared double expression. Composes with agg_t_test_welch /
    agg_mann_whitney as the metric tests the gate protects.

    Scale: one distinct + one conditional-count agg; assignment is a
    narrow hash expression any metric pipeline re-derives for free
    (no assignment table to join at all — the hash IS the table)."""
    assigned = (
        load(spark, sf_dir, "events")
        .select("user_id")
        .distinct()
        .select(
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.lit("exp42_"),
                                F.col("user_id").cast("string"),
                            ).cast("binary")
                        ),
                        1,
                        7,
                    ),
                    16,
                    10,
                ).cast("bigint")
                % 2
            ).alias("arm")
        )
    )
    counts = assigned.agg(
        F.count_if(F.col("arm") == 0).cast("bigint").alias("n_control"),
        F.count_if(F.col("arm") == 1).cast("bigint").alias("n_treat"),
    )
    total = (F.col("n_control") + F.col("n_treat")).cast("double")
    dev = F.col("n_control").cast("double") - total / 2
    chi2 = dev * dev / (total / 2) * 2
    return counts.select(
        "n_control",
        "n_treat",
        F.floor(chi2 * 1000000).cast("bigint").alias("srm_chi2_e6"),
        (chi2 > 3.84).alias("srm_alarm"),
    )


@query(
    "events_ab_cuped",
    """
    WITH anchor AS (
        SELECT CAST(MIN(CAST(ts AS DATE)) AS DATE) AS d0,
               CAST(MAX(CAST(ts AS DATE)) AS DATE) AS d1
        FROM events
    ), per_user AS (
        SELECT user_id,
               CAST('0x' || substr(md5('exp42_' || CAST(user_id AS VARCHAR)),
                                   1, 7) AS BIGINT) % 2 AS arm,
               CAST(SUM(CASE WHEN CAST(ts AS DATE) <
                        (SELECT d0 FROM anchor)
                        + CAST(((SELECT d1 FROM anchor)
                                - (SELECT d0 FROM anchor)) // 2 AS INT)
                        THEN CAST(FLOOR(value * 100) AS BIGINT) ELSE 0 END)
                    AS BIGINT) AS x,
               CAST(SUM(CASE WHEN CAST(ts AS DATE) >=
                        (SELECT d0 FROM anchor)
                        + CAST(((SELECT d1 FROM anchor)
                                - (SELECT d0 FROM anchor)) // 2 AS INT)
                        THEN CAST(FLOOR(value * 100) AS BIGINT) ELSE 0 END)
                    AS BIGINT) AS y
        FROM events GROUP BY user_id
    ), s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * y) AS BIGINT) AS sxy,
               CAST(SUM(x * x) AS BIGINT) AS sxx,
               CAST(SUM(y * y) AS BIGINT) AS syy
        FROM per_user
    ), arms AS (
        SELECT arm, CAST(COUNT(*) AS BIGINT) AS n_arm,
               CAST(SUM(y) AS BIGINT) AS sy_arm,
               CAST(SUM(x) AS BIGINT) AS sx_arm
        FROM per_user GROUP BY arm
    )
    SELECT CAST(a.arm AS BIGINT) AS arm, a.n_arm,
           CAST(FLOOR(CAST(a.sy_arm AS DOUBLE) / a.n_arm) AS BIGINT)
               AS raw_mean_e2,
           CAST(FLOOR(
               CAST(a.sy_arm AS DOUBLE) / a.n_arm
               - ((CAST(s.n AS DOUBLE) * s.sxy
                   - CAST(s.sx AS DOUBLE) * s.sy)
                  / (CAST(s.n AS DOUBLE) * s.sxx
                     - CAST(s.sx AS DOUBLE) * s.sx))
                 * (CAST(a.sx_arm AS DOUBLE) / a.n_arm
                    - CAST(s.sx AS DOUBLE) / s.n)) AS BIGINT)
               AS cuped_mean_e2,
           CAST(FLOOR(
               ((CAST(s.n AS DOUBLE) * s.sxy - CAST(s.sx AS DOUBLE) * s.sy)
                * (CAST(s.n AS DOUBLE) * s.sxy - CAST(s.sx AS DOUBLE) * s.sy))
               / ((CAST(s.n AS DOUBLE) * s.sxx - CAST(s.sx AS DOUBLE) * s.sx)
                  * (CAST(s.n AS DOUBLE) * s.syy
                     - CAST(s.sy AS DOUBLE) * s.sy))
               * 1000000) AS BIGINT) AS var_reduction_e6
    FROM arms a, s
    """,
)
def events_ab_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction (round 5 batch 19; Deng et al.
    WSDM'13): each user's experiment-period metric y is adjusted by
    their PRE-period covariate x — ŷ = y − θ(x − x̄), θ = cov(x,y)/
    var(x) — which removes the between-user variance x explains and
    shrinks A/B confidence intervals by exactly ρ² (the emitted
    var_reduction_e6). The fixture splits its span in half:
    first half = pre-period, second = experiment; arms come from
    events_ab_srm's stable hash. This is the third piece of the
    experimentation kit: SRM gates validity, Welch/U test the metric,
    CUPED buys sensitivity.

    Exactness: per-user (x, y) are exact bigint cent sums; θ, the
    adjusted means and ρ² evaluate from the six exact global sums in
    shared double expressions (agg_corr_exact's discipline); the
    midpoint date derives from integer date arithmetic identical in
    both engines.

    Scale: one user-keyed agg (map-side combinable) + a 6-scalar fold
    + a 2-row arm join. θ is a corpus-level scalar — at 100 TB it is
    computed once and reused by every metric breakdown."""
    ev = load(spark, sf_dir, "events")
    anchor = ev.agg(
        F.min(F.col("ts").cast("date")).alias("d0"),
        F.max(F.col("ts").cast("date")).alias("d1"),
    )
    cents = F.floor(F.col("value") * 100).cast("bigint")
    j = ev.crossJoin(F.broadcast(anchor))
    mid = F.date_add(
        F.col("d0"), (F.datediff("d1", "d0") / 2).cast("int")
    )
    arm = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("exp42_"), F.col("user_id").cast("string")
                    ).cast("binary")
                ),
                1,
                7,
            ),
            16,
            10,
        ).cast("bigint")
        % 2
    )
    per_user = j.groupBy("user_id").agg(
        F.max(arm).alias("arm"),
        F.sum(
            F.when(F.col("ts").cast("date") < mid, cents).otherwise(F.lit(0))
        )
        .cast("bigint")
        .alias("x"),
        F.sum(
            F.when(F.col("ts").cast("date") >= mid, cents).otherwise(F.lit(0))
        )
        .cast("bigint")
        .alias("y"),
    )
    s = per_user.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
    )
    arms = per_user.groupBy("arm").agg(
        F.count("*").cast("bigint").alias("n_arm"),
        F.sum("y").cast("bigint").alias("sy_arm"),
        F.sum("x").cast("bigint").alias("sx_arm"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    theta = (d("n") * d("sxy") - d("sx") * d("sy")) / (
        d("n") * d("sxx") - d("sx") * d("sx")
    )
    rho2 = (
        (d("n") * d("sxy") - d("sx") * d("sy"))
        * (d("n") * d("sxy") - d("sx") * d("sy"))
    ) / (
        (d("n") * d("sxx") - d("sx") * d("sx"))
        * (d("n") * d("syy") - d("sy") * d("sy"))
    )
    out = arms.crossJoin(F.broadcast(s))
    return out.select(
        F.col("arm").cast("bigint").alias("arm"),
        "n_arm",
        F.floor(d("sy_arm") / F.col("n_arm")).cast("bigint").alias("raw_mean_e2"),
        F.floor(
            d("sy_arm") / F.col("n_arm")
            - theta * (d("sx_arm") / F.col("n_arm") - d("sx") / F.col("n"))
        )
        .cast("bigint")
        .alias("cuped_mean_e2"),
        F.floor(rho2 * 1000000).cast("bigint").alias("var_reduction_e6"),
    )


@query(
    "profile_format_masks",
    """
    WITH masked AS (
        SELECT regexp_replace(regexp_replace(regexp_replace(c_name,
                   '[0-9]', '9', 'g'),
                   '[A-Z]', 'A', 'g'),
                   '[a-z]', 'a', 'g') AS mask
        FROM customer
    )
    SELECT mask, CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM masked GROUP BY mask
    """,
)
def profile_format_masks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Format-mask profiling (round 5 batch 22): every customer name
    reduces to its character-CLASS pattern (digits→9, upper→A,
    lower→a, punctuation kept literally) and the masks are
    histogrammed — the data-quality profile that catches format drift
    (a new '+NN NN...' import, a column that suddenly carries free
    text) the moment it lands, where value-level profiling
    (profile_columns) sees only min/max/NDV and misses STRUCTURE. One
    dominant mask = healthy; a long tail = dirty ingest.

    Three global regex replaces (char-class patterns, no capture
    groups — the §2.12 replacement-syntax trap doesn't arise) then a
    map-side-combinable histogram on the mask key. The mask space is
    format-cardinality-sized (tiny), so the profile is effectively
    free on any scan.

    Scale: narrow + one small-key agg; per-column masks at 100 TB run
    in the same pass as ingest validation (scan_observe_metrics'
    ride-along discipline)."""
    c = load(spark, sf_dir, "customer")
    mask = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace("c_name", "[0-9]", "9"), "[A-Z]", "A"
        ),
        "[a-z]",
        "a",
    )
    return c.select(mask.alias("mask")).groupBy("mask").agg(
        F.count("*").cast("bigint").alias("n_rows")
    )


@query(
    "sample_neyman_allocation",
    """
    WITH strata AS (
        SELECT c_mktsegment,
               CAST(COUNT(*) AS BIGINT) AS n_h,
               CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT)
                   AS s,
               CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)
                        * CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT)
                   AS ss
        FROM customer GROUP BY c_mktsegment
    ), scored AS (
        SELECT c_mktsegment, n_h,
               CAST(n_h AS DOUBLE)
               * sqrt((CAST(ss AS DOUBLE)
                       - CAST(s AS DOUBLE) * s / n_h) / (n_h - 1)) AS w
        FROM strata
    ), alloc AS (
        SELECT c_mktsegment, n_h,
               CAST(FLOOR(w * 500 / SUM(w) OVER ()) AS BIGINT) AS n_alloc
        FROM scored
    )
    SELECT a.c_mktsegment, a.n_h, a.n_alloc,
           CAST(COUNT(*) FILTER (
               CAST('0x' || substr(md5('neyman_'
                    || CAST(c.c_custkey AS VARCHAR)), 1, 7) AS BIGINT)
               % 1000000
               < CAST(a.n_alloc AS DOUBLE) / a.n_h * 1000000
           ) AS BIGINT) AS n_sampled
    FROM alloc a JOIN customer c USING (c_mktsegment)
    GROUP BY a.c_mktsegment, a.n_h, a.n_alloc
    """,
)
def sample_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-optimal stratified sampling allocation (round 5 batch
    25): a 500-row budget split across market segments proportional
    to N_h·σ_h — variable strata get MORE samples, uniform strata
    fewer — which minimizes the variance of the stratified mean for
    a fixed budget (the textbook improvement over proportional
    allocation that stratified_sample implements; the referee
    compares the two allocations' realized estimator variance).
    Rows are then drawn per stratum by salted-hash thresholding at
    rate n_alloc/N_h — deterministic, coordination-free, re-runnable
    (split_train_holdout's discipline).

    σ_h comes from exact bigint (n, Σ, Σ²) per stratum; the weight
    and allocation are shared double expressions with ONE floored
    allocation per stratum; the sampling predicate is an integer
    hash-threshold comparison (binomial realization of the computed
    rate — achieved counts hover within noise of n_alloc, asserted).

    Scale: stratum stats = one map-side agg; allocation is
    |strata|-sized; the draw is a narrow predicate on the same scan
    the sample ships from."""
    c = load(spark, sf_dir, "customer")
    cents = F.round(F.col("c_acctbal") * 100).cast("bigint")
    strata = c.groupBy("c_mktsegment").agg(
        F.count("*").cast("bigint").alias("n_h"),
        F.sum(cents).cast("bigint").alias("s"),
        F.sum(cents * cents).cast("bigint").alias("ss"),
    )
    d = lambda col: F.col(col).cast("double")  # noqa: E731
    w = F.col("n_h").cast("double") * F.sqrt(
        (d("ss") - d("s") * d("s") / F.col("n_h")) / (F.col("n_h") - 1)
    )
    scored = strata.select("c_mktsegment", "n_h", w.alias("w"))
    alloc = scored.select(
        "c_mktsegment",
        "n_h",
        F.floor(F.col("w") * 500 / F.sum("w").over(Window.partitionBy()))
        .cast("bigint")
        .alias("n_alloc"),
    )
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("neyman_"), F.col("c_custkey").cast("string")
                    ).cast("binary")
                ),
                1,
                7,
            ),
            16,
            10,
        ).cast("bigint")
        % 1000000
    )
    j = c.join(F.broadcast(alloc), "c_mktsegment")
    sampled = F.count_if(
        u < F.col("n_alloc").cast("double") / F.col("n_h") * 1000000
    )
    return j.groupBy("c_mktsegment", "n_h", "n_alloc").agg(
        sampled.cast("bigint").alias("n_sampled")
    )


@query(
    "audit_totals_reconcile",
    """
    WITH line_sums AS (
        SELECT l_orderkey,
               CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount)
                                   * (1 + l_tax) * 100) AS BIGINT))
                    AS BIGINT) AS computed_cents,
               CAST(COUNT(*) AS BIGINT) AS n_lines
        FROM lineitem GROUP BY l_orderkey
    ), joined AS (
        SELECT o.o_orderkey,
               CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS header_cents,
               COALESCE(l.computed_cents, 0) AS computed_cents,
               COALESCE(l.n_lines, 0) AS n_lines
        FROM orders o LEFT JOIN line_sums l ON l.l_orderkey = o.o_orderkey
    ), classified AS (
        SELECT o_orderkey, header_cents, computed_cents, n_lines,
               header_cents - computed_cents AS diff_cents,
               CASE WHEN n_lines = 0 THEN 'orphan_header'
                    WHEN abs(header_cents - computed_cents)
                         <= n_lines THEN 'reconciled'
                    ELSE 'mismatch' END AS status
        FROM joined
    )
    SELECT status,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(abs(diff_cents)) AS BIGINT) AS abs_diff_cents,
           CAST(MAX(abs(diff_cents)) AS BIGINT) AS worst_diff_cents
    FROM classified GROUP BY status
    """,
)
def audit_totals_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table financial reconciliation audit (round 5 batch 27):
    does each order's HEADER total equal the sum of its LINES
    (extended price × (1−discount) × (1+tax))? — the
    invariant-between-tables audit every ledger-shaped warehouse runs
    nightly, which single-table profiling can never see (both tables
    can profile clean while disagreeing with each other). Orders are
    classified reconciled / mismatch / orphan_header (no lines at
    all) with the absolute and worst drifts per class — the triage
    readout, not just a pass/fail.

    Tolerance = n_lines cents: each line's computed amount floors
    independently, so the header may legitimately differ by up to one
    cent per line — the tolerance is derived from the arithmetic, not
    tuned. (On THIS synthetic fixture headers and lines are generated
    independently, so 'mismatch' dominates — which is exactly what
    the audit is for, and the referee asserts the classification
    arithmetic, not a clean ledger.) All cents exact bigint; the
    status CASE is pure integer comparison.

    Scale: one line-sum agg (map-side) + one key join; the audit
    output is class-sized. The incremental form audits only orders
    whose lines changed (cdc_snapshot_diff's delta feeds it)."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    line_cents = F.floor(
        F.col("l_extendedprice")
        * (1 - F.col("l_discount"))
        * (1 + F.col("l_tax"))
        * 100
    ).cast("bigint")
    line_sums = li.groupBy("l_orderkey").agg(
        F.sum(line_cents).cast("bigint").alias("computed_cents"),
        F.count("*").cast("bigint").alias("n_lines"),
    )
    joined = o.select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias(
            "header_cents"
        ),
    ).join(
        line_sums, o.o_orderkey == line_sums.l_orderkey, "left"
    ).select(
        "o_orderkey",
        "header_cents",
        F.coalesce(F.col("computed_cents"), F.lit(0)).alias("computed_cents"),
        F.coalesce(F.col("n_lines"), F.lit(0)).alias("n_lines"),
    )
    diff = F.col("header_cents") - F.col("computed_cents")
    status = (
        F.when(F.col("n_lines") == 0, "orphan_header")
        .when(F.abs(diff) <= F.col("n_lines"), "reconciled")
        .otherwise("mismatch")
    )
    classified = joined.select(
        status.alias("status"), F.abs(diff).alias("abs_diff")
    )
    return classified.groupBy("status").agg(
        F.count("*").cast("bigint").alias("n_orders"),
        F.sum("abs_diff").cast("bigint").alias("abs_diff_cents"),
        F.max("abs_diff").cast("bigint").alias("worst_diff_cents"),
    )


@query(
    "split_kfold_assign",
    """
    WITH assigned AS (
        SELECT doc_id,
               CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 7)
                    AS BIGINT) % 5 AS fold
        FROM documents
    )
    SELECT doc_id, CAST(fold AS BIGINT) AS fold,
           CAST(ROW_NUMBER() OVER (PARTITION BY fold ORDER BY doc_id)
                AS BIGINT) AS idx_in_fold
    FROM assigned
    """,
)
def split_kfold_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-fold assignment (round 6, k=5):
    split_train_holdout generalized to cross-validation — every doc
    lands in exactly one fold via the md5-28-bit uniform mod k (the
    content-hash selection discipline: stable across engines, retries,
    partitionings, and INSERTIONS — adding documents never moves an
    existing doc's fold, which a row_number-mod-k split cannot
    promise).  idx_in_fold (dense per-fold ordinal) rides along as the
    shard key downstream writers use.

    Scale: the assignment is a pure map; the ordinal is one keyed
    window (fold cardinality = k, so the exchange moves k partitions
    — at 100 TB swap the ordinal for a (fold, file) composite emitted
    at write time, documented here)."""
    docs = load(spark, sf_dir, "documents")
    fold = (
        F.conv(
            F.substring(
                F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 7
            ),
            16,
            10,
        ).cast("bigint")
        % 5
    )
    assigned = docs.select("doc_id", fold.alias("fold"))
    w = Window.partitionBy("fold").orderBy("doc_id")
    return assigned.select(
        "doc_id",
        F.col("fold").cast("bigint").alias("fold"),
        F.row_number().over(w).cast("bigint").alias("idx_in_fold"),
    )


@query(
    "layout_zone_overlap",
    """
    WITH zones AS (
        SELECT date_trunc('month', o_orderdate) AS zone,
               CAST(MIN(o_custkey) AS BIGINT) AS ck_min,
               CAST(MAX(o_custkey) AS BIGINT) AS ck_max,
               CAST(MIN(epoch_us(CAST(o_orderdate AS TIMESTAMP)))
                    AS BIGINT) AS dt_min,
               CAST(MAX(epoch_us(CAST(o_orderdate AS TIMESTAMP)))
                    AS BIGINT) AS dt_max
        FROM orders GROUP BY 1
    ), pairs AS (
        SELECT a.zone AS za, b.zone AS zb,
               CASE WHEN a.ck_min <= b.ck_max AND b.ck_min <= a.ck_max
                    THEN 1 ELSE 0 END AS ck_ov,
               CASE WHEN a.dt_min <= b.dt_max AND b.dt_min <= a.dt_max
                    THEN 1 ELSE 0 END AS dt_ov
        FROM zones a JOIN zones b ON a.zone < b.zone
    )
    SELECT col_name,
           CAST((SELECT COUNT(*) FROM zones) AS BIGINT) AS n_zones,
           n_overlapping_pairs
    FROM (
        SELECT 'o_custkey' AS col_name,
               CAST(SUM(ck_ov) AS BIGINT) AS n_overlapping_pairs
        FROM pairs
        UNION ALL
        SELECT 'o_orderdate' AS col_name,
               CAST(SUM(dt_ov) AS BIGINT) AS n_overlapping_pairs
        FROM pairs
    )
    """,
)
def layout_zone_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map OVERLAP audit (round 6): how effective would min/max
    data skipping be, per column, if the table is laid out in
    month-of-orderdate zones?  For each zone (a calendar month — the
    natural ingest layout, NO global sort needed) compute the min/max
    zone map of the sort column and of a non-clustered column, then
    count zone PAIRS whose ranges overlap: 0 overlapping pairs =
    perfect skipping (every predicate prunes to one zone),
    all-pairs-overlap = the zone map is useless for that column —
    exactly the measurement that justifies layout_zorder before
    anyone pays for the rewrite.

    orderdate zones are disjoint BY CONSTRUCTION (the audit's built-in
    referee) while custkey ranges overlap almost totally on an
    unclustered table — the two rows this emits.  All arithmetic is
    bigint (epoch-µs for dates); the pair join runs on the aggregated
    zone table (|months|² pairs — tens of rows), broadcast by size.

    Scale: one partial agg to |zones| rows + a tiny self-join; at
    100 TB zones = files/row-groups and the same audit reads footer
    stats instead of scanning — the shape is identical."""
    o = load(spark, sf_dir, "orders")
    us = F.unix_micros(F.col("o_orderdate").cast("timestamp"))
    zones = o.groupBy(
        F.date_trunc("month", "o_orderdate").alias("zone")
    ).agg(
        F.min("o_custkey").cast("bigint").alias("ck_min"),
        F.max("o_custkey").cast("bigint").alias("ck_max"),
        F.min(us).cast("bigint").alias("dt_min"),
        F.max(us).cast("bigint").alias("dt_max"),
    )
    a = zones.alias("a")
    b = zones.alias("b")
    pairs = a.join(b, F.col("a.zone") < F.col("b.zone")).select(
        F.when(
            (F.col("a.ck_min") <= F.col("b.ck_max"))
            & (F.col("b.ck_min") <= F.col("a.ck_max")),
            1,
        )
        .otherwise(0)
        .alias("ck_ov"),
        F.when(
            (F.col("a.dt_min") <= F.col("b.dt_max"))
            & (F.col("b.dt_min") <= F.col("a.dt_max")),
            1,
        )
        .otherwise(0)
        .alias("dt_ov"),
    )
    # n_zones joins in lazily (1-row cross join) — no driver action
    nz = zones.agg(F.count("*").cast("bigint").alias("n_zones"))
    summed = pairs.agg(
        F.sum("ck_ov").cast("bigint").alias("ck"),
        F.sum("dt_ov").cast("bigint").alias("dt"),
    ).crossJoin(F.broadcast(nz))
    return summed.select(
        F.lit("o_custkey").alias("col_name"),
        "n_zones",
        F.col("ck").alias("n_overlapping_pairs"),
    ).union(
        summed.select(
            F.lit("o_orderdate").alias("col_name"),
            "n_zones",
            F.col("dt").alias("n_overlapping_pairs"),
        )
    )


@query(
    "split_temporal_holdout",
    """
    WITH cut AS (
        SELECT epoch_us(MIN(ts))
               + CAST(FLOOR((epoch_us(MAX(ts)) - epoch_us(MIN(ts)))
                            * 0.8) AS BIGINT) AS cut_us
        FROM events
    ), tagged AS (
        SELECT e.user_id, e.ts,
               CASE WHEN epoch_us(e.ts) < c.cut_us THEN 'train'
                    ELSE 'test' END AS split
        FROM events e CROSS JOIN cut c
    )
    SELECT split,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(MIN(epoch_us(ts)) AS BIGINT) AS lo_us,
           CAST(MAX(epoch_us(ts)) AS BIGINT) AS hi_us
    FROM tagged GROUP BY split
    """,
)
def split_temporal_holdout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TEMPORAL train/holdout split at the 80% point of the observed
    time range (round 7) — the split a forecasting or recommendation
    pipeline must use where split_train_holdout's hash split would
    LEAK THE FUTURE into training: everything before the cutoff
    trains, everything at-or-after tests, and the emitted lo/hi
    bounds are the leakage audit (train.hi < test.lo, asserted in
    tests — a shuffled split fails it immediately).

    Exactness: the cutoff is integer µs arithmetic from exact
    min/max (one floored multiply); split tags are integer compares;
    counts exact.

    Scale: one min/max aggregate (1-row broadcast via the scalar
    cross join) + one tagged aggregate — two scans, or one with the
    cutoff precomputed by the daemon; no window."""
    ev = load(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    cut = ev.agg(
        (
            F.min(us)
            + F.floor((F.max(us) - F.min(us)) * 0.8).cast("bigint")
        ).alias("cut_us")
    )
    tagged = ev.crossJoin(F.broadcast(cut)).select(
        "user_id",
        "ts",
        F.when(us < F.col("cut_us"), "train").otherwise("test").alias(
            "split"
        ),
    )
    return tagged.groupBy("split").agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
        F.min(F.unix_micros(F.col("ts").cast("timestamp")))
        .cast("bigint")
        .alias("lo_us"),
        F.max(F.unix_micros(F.col("ts").cast("timestamp")))
        .cast("bigint")
        .alias("hi_us"),
    )


@query(
    "anon_t_closeness",
    """
    WITH banded AS (
        SELECT CAST(c_nationkey AS BIGINT) AS nat_q,
               c_mktsegment AS seg_q,
               CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS band
        FROM customer
    ), gdist AS (
        SELECT band, CAST(COUNT(*) AS BIGINT) AS c FROM banded
        GROUP BY band
    ), tot AS (
        SELECT CAST(SUM(c) AS BIGINT) AS n,
               CAST(COUNT(*) AS BIGINT) AS m
        FROM gdist
    ), grp AS (
        SELECT nat_q, seg_q, CAST(COUNT(*) AS BIGINT) AS gn
        FROM banded GROUP BY nat_q, seg_q
    ), spine AS (
        SELECT g.nat_q, g.seg_q, g.gn, gl.band, gl.c
        FROM grp g CROSS JOIN gdist gl
    ), gcounts AS (
        SELECT nat_q, seg_q, band, CAST(COUNT(*) AS BIGINT) AS gc
        FROM banded GROUP BY nat_q, seg_q, band
    ), cum AS (
        SELECT s.nat_q, s.seg_q, s.gn,
               SUM(COALESCE(gc.gc, 0) * t.n - s.c * s.gn)
                   OVER (PARTITION BY s.nat_q, s.seg_q ORDER BY s.band
                         ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS cnum,
               t.n, t.m
        FROM spine s
        LEFT JOIN gcounts gc ON gc.nat_q = s.nat_q
             AND gc.seg_q = s.seg_q AND gc.band = s.band
        CROSS JOIN tot t
    )
    SELECT nat_q, seg_q, CAST(MAX(gn) AS BIGINT) AS group_n,
           CAST(FLOOR(CAST(SUM(ABS(cnum)) AS DOUBLE) * 1000000
                      / ((MAX(m) - 1) * MAX(gn) * MAX(n)))
                AS BIGINT) AS t_e6,
           CAST(FLOOR(CAST(SUM(ABS(cnum)) AS DOUBLE) * 1000000
                      / ((MAX(m) - 1) * MAX(gn) * MAX(n)))
                AS BIGINT) <= 200000 AS releasable
    FROM cum GROUP BY nat_q, seg_q
    """,
)
def anon_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit (round 7) — completes the anonymization trio
    (anon_k_suppress: group SIZE; anon_l_diversity: sensitive-value
    VARIETY; this: sensitive-value DISTRIBUTION): a group can be
    large and diverse yet still leak by SKEW ('that ZIP's balances
    are 90% in the top band' tells you plenty about any member).  t =
    ordered-attribute Earth Mover's Distance between the group's
    band distribution and the global one, normalized by (m−1);
    releasable gates at t ≤ 0.2.

    Exactness: EMD over an ordered attribute is Σ_j |cum_j(p − q)|
    /(m−1); the cumulative differences are computed on the COMMON
    DENOMINATOR as exact bigints (gc·N − c·gn — no per-band float
    division), one floored division at the very end.  The band spine
    cross-joins every group with every global band so absent bands
    contribute their full deficit.

    Scale: bands and groups are both dimension-bounded (the spine is
    |groups|·|bands|); one keyed prefix window over the spine, one
    keyed rollup.  Overflow-safe: gc·N ≤ |rows|² per term."""
    c = load(spark, sf_dir, "customer")
    banded = c.select(
        F.col("c_nationkey").cast("bigint").alias("nat_q"),
        F.col("c_mktsegment").alias("seg_q"),
        F.floor(F.col("c_acctbal") / 1000).cast("bigint").alias("band"),
    )
    glob = banded.groupBy("band").agg(
        F.count("*").cast("bigint").alias("c")
    )
    tot = glob.agg(
        F.sum("c").cast("bigint").alias("n"),
        F.count("*").cast("bigint").alias("m"),
    )
    grp = banded.groupBy("nat_q", "seg_q").agg(
        F.count("*").cast("bigint").alias("gn")
    )
    spine = grp.crossJoin(F.broadcast(glob))
    gcounts = banded.groupBy("nat_q", "seg_q", "band").agg(
        F.count("*").cast("bigint").alias("gc")
    )
    cum_src = (
        spine.join(gcounts, ["nat_q", "seg_q", "band"], "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "nat_q",
            "seg_q",
            "gn",
            "band",
            "n",
            "m",
            (
                F.coalesce(F.col("gc"), F.lit(0)) * F.col("n")
                - F.col("c") * F.col("gn")
            ).alias("diff"),
        )
    )
    w = (
        Window.partitionBy("nat_q", "seg_q")
        .orderBy("band")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = cum_src.select(
        "nat_q",
        "seg_q",
        "gn",
        "n",
        "m",
        F.sum("diff").over(w).alias("cnum"),
    )
    t_e6 = F.floor(
        F.sum(F.abs(F.col("cnum"))).cast("double")
        * 1000000
        / ((F.max("m") - 1) * F.max("gn") * F.max("n"))
    ).cast("bigint")
    return cum.groupBy("nat_q", "seg_q").agg(
        F.max("gn").cast("bigint").alias("group_n"),
        t_e6.alias("t_e6"),
        (t_e6 <= 200000).alias("releasable"),
    )


@query(
    "sample_balanced_classes",
    """
    WITH counts AS (
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS c
        FROM documents GROUP BY lang
    ), target AS (
        SELECT CAST(MIN(c) AS BIGINT) AS m FROM counts
    ), ranked AS (
        SELECT doc_id, lang,
               ROW_NUMBER() OVER (PARTITION BY lang
                                  ORDER BY md5(CAST(doc_id AS VARCHAR)),
                                           doc_id) AS rk
        FROM documents
    )
    SELECT r.doc_id, r.lang
    FROM ranked r CROSS JOIN target t
    WHERE r.rk <= t.m
    """,
)
def sample_balanced_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced class downsample (round 7) — equalize class sizes by
    deterministic content-hash ranking: every language keeps exactly
    min(class size) documents, chosen by md5(doc_id) order — the
    class-imbalance fix a classifier-training pipeline applies before
    fitting (text_score_linear_model's training side), with the
    sample_deterministic reproducibility discipline (reruns, engines
    and partitionings all pick the SAME rows; no RNG state).

    Scale: per-class rank is a keyed window (WindowGroupLimit-style
    early pruning applies once the target broadcasts); the target is
    a 1-row broadcast.  Adding a class or re-sharding never changes
    another class's picks."""
    d = load(spark, sf_dir, "documents")
    counts = d.groupBy("lang").agg(F.count("*").cast("bigint").alias("c"))
    target = counts.agg(F.min("c").cast("bigint").alias("m"))
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string").cast("binary")), F.col("doc_id")
    )
    ranked = d.select(
        "doc_id", "lang", F.row_number().over(w).alias("rk")
    )
    return (
        ranked.crossJoin(F.broadcast(target))
        .filter(F.col("rk") <= F.col("m"))
        .select("doc_id", "lang")
    )


# z_{0.975} and z_{0.80}: fixed normal quantiles for alpha=0.05
# two-sided / 80% power -- literal constants so both engines evaluate
# the identical doubles (no quantile function needed).
_Z_ALPHA = 1.959963984540054
_Z_BETA = 0.8416212335729143


@query(
    "events_power_sample_size",
    f"""
    WITH base AS (
        SELECT CAST(COUNT(*) FILTER (event_type = 'purchase') AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS p1,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events
    )
    SELECT n_events,
           CAST(FLOOR(p1 * 1000000) AS BIGINT) AS p1_e6,
           CAST(FLOOR(p1 * 1.1 * 1000000) AS BIGINT) AS p2_e6,
           CAST(CEIL(
               ({_Z_ALPHA} + {_Z_BETA}) * ({_Z_ALPHA} + {_Z_BETA})
               * (p1 * (1.0 - p1) + (p1 * 1.1) * (1.0 - p1 * 1.1))
               / ((p1 * 1.1 - p1) * (p1 * 1.1 - p1))
           ) AS BIGINT) AS n_per_arm
    FROM base
    """,
)
def events_power_sample_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B-test POWER ANALYSIS (round 9): the sample-size step that
    precedes events_ab_srm and events_ab_cuped in any real
    experimentation loop — measure the baseline conversion rate p₁
    (purchase share of events), posit the minimum detectable
    effect (a relative 10% lift), and size each arm at
    n = (z_{{α/2}}+z_β)²·(p₁q₁+p₂q₂)/(p₂−p₁)² for α=0.05 two-sided,
    80% power. The z quantiles are literal constants (no normal-CDF
    function exists in either engine), so both sides evaluate an
    identical short double chain: p₁ from exact counts, three
    readouts (p₁, p₂ floored e6; n per arm ceiled to whole units).

    Scale: one pass over events with two map-side-combinable counts;
    the formula runs on a 1-row frame."""
    ev = load(spark, sf_dir, "events")
    base = ev.agg(
        (
            F.count_if(F.col("event_type") == "purchase").cast("double")
            / F.count("*").cast("double")
        ).alias("p1"),
        F.count("*").cast("bigint").alias("n_events"),
    )
    p1 = F.col("p1")
    p2 = p1 * 1.1
    zsum = F.lit(_Z_ALPHA + _Z_BETA)
    n = F.ceil(
        zsum * zsum * (p1 * (1.0 - p1) + p2 * (1.0 - p2)) / ((p2 - p1) * (p2 - p1))
    )
    return base.select(
        "n_events",
        F.floor(p1 * 1000000).cast("bigint").alias("p1_e6"),
        F.floor(p2 * 1000000).cast("bigint").alias("p2_e6"),
        n.cast("bigint").alias("n_per_arm"),
    )


@query(
    "split_grouped_holdout",
    """
    WITH assigned AS (
        SELECT user_id,
               CAST(CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 4)
                    AS BIGINT) % 5 AS BIGINT) AS fold,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events GROUP BY user_id
    ), tot AS (
        SELECT CAST(SUM(n_events) AS BIGINT) AS total FROM assigned
    )
    SELECT fold,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(n_events) AS BIGINT) AS n_events,
           CAST(FLOOR(CAST(SUM(n_events) AS DOUBLE)
                      / CAST((SELECT total FROM tot) AS DOUBLE)
                      * 1000000) AS BIGINT) AS share_e6
    FROM assigned GROUP BY fold ORDER BY fold
    """,
)
def split_grouped_holdout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP-aware holdout split (round 9): every event of a user
    lands in the same fold — the leakage-safe split for any model
    evaluated per-user (sessions, LTV, churn), where
    split_train_holdout's row-hash would scatter one user's history
    across train AND test and leak trivially. Group identity hashes
    once (md5(user_id) % 5, the events_ab_srm stable-assignment
    discipline); the readout is the fold census a practitioner checks
    before trusting the split: user count, event count, and event
    share per fold (shares drift from 20% exactly when heavy users
    skew folds — visible here, invisible in a row-wise split).

    Scale: one keyed user rollup (map-side combinable), a 5-row fold
    rollup, a 1-row total broadcast. The assignment column is the
    same expression a writer would partition by — no shuffle beyond
    the user key."""
    ev = load(spark, sf_dir, "events")
    assigned = ev.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n_events")
    ).select(
        (
            F.conv(
                F.substring(
                    F.md5(F.col("user_id").cast("string").cast("binary")),
                    1,
                    4,
                ),
                16,
                10,
            ).cast("bigint")
            % 5
        ).alias("fold"),
        "n_events",
    )
    tot = assigned.agg(F.sum("n_events").cast("bigint").alias("total"))
    return (
        assigned.groupBy("fold")
        .agg(
            F.count("*").cast("bigint").alias("n_users"),
            F.sum("n_events").cast("bigint").alias("n_events"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "fold",
            "n_users",
            "n_events",
            F.floor(
                F.col("n_events").cast("double")
                / F.col("total").cast("double")
                * 1000000
            )
            .cast("bigint")
            .alias("share_e6"),
        )
        .orderBy("fold")
    )


@query(
    "anon_dp_laplace_counts",
    """
    WITH c AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS true_n
        FROM events GROUP BY event_type
    ), u AS (
        SELECT event_type, true_n,
               (CAST('0x' || substr(md5('dp:' || event_type), 1, 13)
                     AS BIGINT) + 1.0) / 4503599627370497.0 AS uu
        FROM c
    )
    SELECT event_type, true_n,
           CAST(FLOOR(
               CAST(true_n AS DOUBLE)
               - 2.0 * (CASE WHEN uu - 0.5 < 0 THEN -1.0
                             WHEN uu - 0.5 > 0 THEN 1.0 ELSE 0.0 END)
                 * ln(1.0 - 2.0 * abs(uu - 0.5))
           ) AS BIGINT) AS released_n
    FROM u ORDER BY event_type
    """,
)
def anon_dp_laplace_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private count release (round 9), ε=0.5 Laplace
    mechanism — the fourth anonymization rung: k-suppress NULLs rare
    rows, l-diversity audits groups, t-closeness bounds distribution
    leakage, and DP noise bounds what ANY query reveals about ANY
    individual. Sensitivity of a count is 1, so noise ~ Laplace(1/ε)
    = Laplace(2); released = floor(true + noise).

    The noise is SEEDED, not sampled: u derives from md5('dp:'+key)
    (52-bit mantissa-scale uniform, +1 to exclude 0) and inverts the
    Laplace CDF in one literal double chain — deterministic,
    engine-portable, replayable, exactly the "frozen randomness"
    discipline of sample_weighted/agg_permutation_test applied to the
    DP mechanism. A production deployment swaps the md5 for a secret
    per-release seed; the mechanism's privacy analysis is unchanged
    because u is uniform in both cases — what matters here is the
    PIPELINE shape (noise added post-aggregation, per released cell,
    before any join-back).

    Scale: one keyed count + per-row scalar math — free on any
    aggregate readout."""
    ev = load(spark, sf_dir, "events")
    c = ev.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("true_n")
    )
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(F.lit("dp:"), F.col("event_type")).cast("binary")
                ),
                1,
                13,
            ),
            16,
            10,
        ).cast("bigint")
        + 1.0
    ) / 4503599627370497.0
    centered = u - 0.5
    sgn = (
        F.when(centered < 0, F.lit(-1.0))
        .when(centered > 0, F.lit(1.0))
        .otherwise(F.lit(0.0))
    )
    noise = -2.0 * sgn * F.log(1.0 - 2.0 * F.abs(centered))
    return c.select(
        "event_type",
        "true_n",
        F.floor(F.col("true_n").cast("double") + noise)
        .cast("bigint")
        .alias("released_n"),
    ).orderBy("event_type")


_IPF_ITERS = 3
_IPF_S = 10**9


def _ipf_oracle_sql(iters: int = _IPF_ITERS) -> str:
    """Unrolled DuckDB oracle for the quantized IPF raking: weights
    are carried as e9 bigints, each scaling is one double chain floored
    back to bigint (the graph_hits_bounded per-round discipline), so
    margin sums are order-free integer aggregates and every iteration
    reproduces bit-for-bit."""
    s = _IPF_S
    sql = f"""
    WITH cells AS MATERIALIZED (
        SELECT CAST(EXTRACT(hour FROM ts) // 6 AS BIGINT) AS d,
               event_type AS t, CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
    ), tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM cells
    ), colm AS MATERIALIZED (
        SELECT t, CAST(SUM(n) * {s} AS BIGINT) AS c FROM cells GROUP BY t
    ), w0 AS MATERIALIZED (
        SELECT d, t, n, CAST(n * {s} AS BIGINT) AS w FROM cells
    )"""
    for i in range(1, iters + 1):
        sql += f""", rs{i} AS (
        SELECT d, CAST(SUM(w) AS BIGINT) AS sd FROM w{i - 1} GROUP BY d
    ), wr{i} AS MATERIALIZED (
        SELECT w.d, w.t, w.n,
               CAST(FLOOR(CAST(w.w AS DOUBLE)
                          * (CAST((SELECT total FROM tot) AS DOUBLE)
                             * {s}.0 / 4.0)
                          / CAST(r.sd AS DOUBLE)) AS BIGINT) AS w
        FROM w{i - 1} w JOIN rs{i} r USING (d)
    ), cs{i} AS (
        SELECT t, CAST(SUM(w) AS BIGINT) AS st FROM wr{i} GROUP BY t
    ), w{i} AS MATERIALIZED (
        SELECT w.d, w.t, w.n,
               CAST(FLOOR(CAST(w.w AS DOUBLE) * CAST(c.c AS DOUBLE)
                          / CAST(cst.st AS DOUBLE)) AS BIGINT) AS w
        FROM wr{i} w JOIN colm c USING (t) JOIN cs{i} cst USING (t)
    )"""
    sql += f"""
    SELECT d, t, n, w AS w_e9 FROM w{iters} ORDER BY d, t"""
    return sql


@query("agg_ipf_raking", _ipf_oracle_sql())
def agg_ipf_raking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative proportional fitting / raking (round 9), 3 rounds:
    reweight the (daypart × event type) cell table so DAYPART margins
    become uniform (the target exposure) while EVENT-TYPE margins
    stay at their observed totals — the survey-weighting workhorse
    (post-stratification on two margins at once) and the correction
    step before any daypart-confounded comparison; the alternating
    row-scale / column-scale updates converge geometrically.

    Determinism is the graph_hits_bounded per-round discipline:
    weights live as e9 bigints; margin sums are order-free INTEGER
    aggregates; each of the six scalings is one IEEE-identical double
    chain floored straight back to bigint — so the unrolled-CTE
    oracle reproduces every round bit-for-bit, and the referee checks
    the raked margins actually converged onto their targets.

    Scale: the iteration runs on the CELL table (|dayparts|×|types|,
    margins-bounded, never row-bounded) — the corpus is touched once
    for the counts; at 100 TB the cell table is still 20 rows."""
    ev = load(spark, sf_dir, "events")
    s = _IPF_S
    cells = ev.groupBy(
        F.floor(F.hour("ts") / 6).cast("bigint").alias("d"),
        F.col("event_type").alias("t"),
    ).agg(F.count("*").cast("bigint").alias("n")).localCheckpoint()
    tot = cells.agg(F.sum("n").cast("bigint").alias("total"))
    colm = cells.groupBy("t").agg(
        (F.sum("n") * s).cast("bigint").alias("c")
    )
    w = cells.select("d", "t", "n", (F.col("n") * s).cast("bigint").alias("w"))
    dd = lambda c: F.col(c).cast("double")  # noqa: E731
    for _ in range(_IPF_ITERS):
        rs = w.groupBy("d").agg(F.sum("w").cast("bigint").alias("sd"))
        w = (
            w.join(rs, "d")
            .crossJoin(F.broadcast(tot))
            .select(
                "d",
                "t",
                "n",
                F.floor(
                    dd("w") * (dd("total") * float(s) / 4.0) / dd("sd")
                )
                .cast("bigint")
                .alias("w"),
            )
        )
        cs = w.groupBy("t").agg(F.sum("w").cast("bigint").alias("st"))
        w = (
            w.join(cs, "t")
            .join(F.broadcast(colm), "t")
            .select(
                "d",
                "t",
                "n",
                F.floor(dd("w") * dd("c") / dd("st"))
                .cast("bigint")
                .alias("w"),
            )
            .localCheckpoint()
        )
    return w.select("d", "t", "n", F.col("w").alias("w_e9")).orderBy("d", "t")


@query(
    "events_switchback_analysis",
    """
    WITH buckets AS (
        SELECT date_trunc('hour', ts) AS h,
               CAST(CAST('0x' || substr(md5('sb:' ||
                    strftime(date_trunc('hour', ts),
                             '%Y-%m-%d %H:%M:%S')), 1, 4)
                    AS BIGINT) % 2 AS BIGINT) AS arm,
               CAST(SUM(CAST(FLOOR(value * 10000) AS BIGINT)) AS BIGINT)
                   AS y_e4
        FROM events GROUP BY 1
    ), arms AS (
        SELECT arm, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(y_e4) AS BIGINT) AS s,
               CAST(SUM(y_e4 * y_e4) AS BIGINT) AS ss
        FROM buckets GROUP BY arm
    ), wide AS (
        SELECT MAX(CASE WHEN arm = 0 THEN n END) AS n0,
               MAX(CASE WHEN arm = 0 THEN s END) AS s0,
               MAX(CASE WHEN arm = 0 THEN ss END) AS ss0,
               MAX(CASE WHEN arm = 1 THEN n END) AS n1,
               MAX(CASE WHEN arm = 1 THEN s END) AS s1,
               MAX(CASE WHEN arm = 1 THEN ss END) AS ss1
        FROM arms
    )
    SELECT CAST(n0 AS BIGINT) AS n_buckets_0,
           CAST(n1 AS BIGINT) AS n_buckets_1,
           CAST(FLOOR((CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                       - CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE)) * 100.0)
                AS BIGINT) AS mean_diff_e6,
           CAST(FLOOR((CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                       - CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE))
               / sqrt(
                   ((CAST(ss1 AS DOUBLE) - CAST(s1 AS DOUBLE)
                     * CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE))
                    / (CAST(n1 AS DOUBLE) - 1.0)) / CAST(n1 AS DOUBLE)
                 + ((CAST(ss0 AS DOUBLE) - CAST(s0 AS DOUBLE)
                     * CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE))
                    / (CAST(n0 AS DOUBLE) - 1.0)) / CAST(n0 AS DOUBLE))
               * 10000) AS BIGINT) AS t_e4
    FROM wide
    """,
)
def events_switchback_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SWITCHBACK experiment analysis (round 9): when treatment can't
    be split by user (marketplace pricing, dispatch policies — one
    side's treatment leaks into the other's outcome), the standard
    design alternates the WHOLE system between arms in time slices;
    the analysis unit is the TIME BUCKET, not the user. Hour buckets
    hash to arms (md5-frozen, the events_ab_srm discipline on the
    bucket key); per-bucket outcome totals become the i.i.d.-ish
    samples, and the readout is Welch's t over BUCKET means — the
    conservative variance treatment interference forces (completing
    the experimentation kit: srm → power → cuped → switchback).

    Exactness: per-bucket totals are exact e4 bigints; per-arm
    (n, Σ, Σ²) exact; mean diff and Welch t are one literal double
    chain each, floored once (agg_t_test_welch's discipline at the
    bucket level).

    Scale: one keyed hour rollup (map-side combinable), a 2-row arm
    rollup, a 1-row finish — interference-safe analysis at any event
    volume."""
    ev = load(spark, sf_dir, "events")
    hcol = F.date_trunc("hour", F.col("ts"))
    arm = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("sb:"),
                        F.date_format(hcol, "yyyy-MM-dd HH:mm:ss"),
                    ).cast("binary")
                ),
                1,
                4,
            ),
            16,
            10,
        ).cast("bigint")
        % 2
    )
    buckets = ev.groupBy(hcol.alias("h")).agg(
        F.sum(F.floor(F.col("value") * 10000).cast("bigint"))
        .cast("bigint")
        .alias("y_e4")
    ).select(
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("sb:"),
                            F.date_format(F.col("h"), "yyyy-MM-dd HH:mm:ss"),
                        ).cast("binary")
                    ),
                    1,
                    4,
                ),
                16,
                10,
            ).cast("bigint")
            % 2
        ).alias("arm"),
        "y_e4",
    )
    arms = buckets.groupBy("arm").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("y_e4").cast("bigint").alias("s"),
        F.sum(F.col("y_e4") * F.col("y_e4")).cast("bigint").alias("ss"),
    )
    wide = arms.agg(
        F.max(F.when(F.col("arm") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("arm") == 0, F.col("s"))).alias("s0"),
        F.max(F.when(F.col("arm") == 0, F.col("ss"))).alias("ss0"),
        F.max(F.when(F.col("arm") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("arm") == 1, F.col("s"))).alias("s1"),
        F.max(F.when(F.col("arm") == 1, F.col("ss"))).alias("ss1"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    mdiff = d("s1") / d("n1") - d("s0") / d("n0")
    var1 = (d("ss1") - d("s1") * d("s1") / d("n1")) / (d("n1") - 1.0)
    var0 = (d("ss0") - d("s0") * d("s0") / d("n0")) / (d("n0") - 1.0)
    se = F.sqrt(var1 / d("n1") + var0 / d("n0"))
    return wide.select(
        F.col("n0").cast("bigint").alias("n_buckets_0"),
        F.col("n1").cast("bigint").alias("n_buckets_1"),
        F.floor(mdiff * 100.0).cast("bigint").alias("mean_diff_e6"),
        F.floor(mdiff / se * 10000).cast("bigint").alias("t_e4"),
    )


# O'Brien-Fleming-style boundary: z_k = z_final * sqrt(K/k) for looks
# k=1..4 with z_final = 2.024 (the standard 4-look OBF final boundary
# preserving overall alpha=0.05) -- literal constants, no quantile
# function needed.
_OBF_FINAL_Z = 2.024
_OBF_LOOKS = 4


@query(
    "events_sequential_probe_obf",
    f"""
    WITH assigned AS (
        SELECT CAST(FLOOR(value * 10000) AS BIGINT) AS v_e4,
               CAST(CAST('0x' || substr(md5('arm:' ||
                    CAST(user_id AS VARCHAR)), 1, 4) AS BIGINT) % 2
                    AS BIGINT) AS arm,
               CAST((EXTRACT(day FROM ts) - 1) // 7 + 1 AS BIGINT) AS wk
        FROM events
    ), looks AS (
        SELECT k.k, a.arm,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(v_e4) AS BIGINT) AS s,
               CAST(SUM(v_e4 * v_e4) AS BIGINT) AS ss
        FROM assigned a
        JOIN (SELECT unnest(range(1, {_OBF_LOOKS} + 1)) AS k) k
          ON a.wk <= k.k
        GROUP BY k.k, a.arm
    ), wide AS (
        SELECT k,
               MAX(CASE WHEN arm = 0 THEN n END) AS n0,
               MAX(CASE WHEN arm = 0 THEN s END) AS s0,
               MAX(CASE WHEN arm = 0 THEN ss END) AS ss0,
               MAX(CASE WHEN arm = 1 THEN n END) AS n1,
               MAX(CASE WHEN arm = 1 THEN s END) AS s1,
               MAX(CASE WHEN arm = 1 THEN ss END) AS ss1
        FROM looks GROUP BY k
    )
    SELECT CAST(k AS BIGINT) AS look,
           CAST(n0 + n1 AS BIGINT) AS n_total,
           CAST(FLOOR((CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                       - CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE))
               / sqrt(
                   ((CAST(ss1 AS DOUBLE) - CAST(s1 AS DOUBLE)
                     * CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE))
                    / (CAST(n1 AS DOUBLE) - 1.0)) / CAST(n1 AS DOUBLE)
                 + ((CAST(ss0 AS DOUBLE) - CAST(s0 AS DOUBLE)
                     * CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE))
                    / (CAST(n0 AS DOUBLE) - 1.0)) / CAST(n0 AS DOUBLE))
               * 10000) AS BIGINT) AS z_e4,
           CAST(FLOOR({_OBF_FINAL_Z}
                      * sqrt(CAST({_OBF_LOOKS} AS DOUBLE)
                             / CAST(k AS DOUBLE)) * 10000)
                AS BIGINT) AS boundary_e4,
           CAST(CASE WHEN ABS(
                   FLOOR((CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                          - CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE))
                   / sqrt(
                       ((CAST(ss1 AS DOUBLE) - CAST(s1 AS DOUBLE)
                         * CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE))
                        / (CAST(n1 AS DOUBLE) - 1.0)) / CAST(n1 AS DOUBLE)
                     + ((CAST(ss0 AS DOUBLE) - CAST(s0 AS DOUBLE)
                         * CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE))
                        / (CAST(n0 AS DOUBLE) - 1.0)) / CAST(n0 AS DOUBLE))
                   * 10000))
                >= FLOOR({_OBF_FINAL_Z}
                         * sqrt(CAST({_OBF_LOOKS} AS DOUBLE)
                                / CAST(k AS DOUBLE)) * 10000)
                THEN 1 ELSE 0 END AS BIGINT) AS crossed
    FROM wide ORDER BY look
    """,
)
def events_sequential_probe_obf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP-SEQUENTIAL monitoring with O'Brien-Fleming boundaries
    (round 9): the legal way to peek at an experiment weekly — naive
    repeated z>1.96 checks inflate false positives to ~14% over four
    looks; OBF spends almost no alpha early (look-1 boundary
    z≈4.05) and nearly the nominal 1.96-ish at the end (z≈2.02), so
    early stops happen only for overwhelming effects. Four weekly
    looks over the cumulative (hash-assigned) arms: each look is the
    running Welch z against boundary 2.024·√(K/k) — the literal-
    constant discipline of events_power_sample_size (no quantile
    functions exist in either engine).

    Exactness: cumulative per-look arm moments are exact bigints
    (each event joins every look it has entered — a 4× bounded
    expansion); z and boundary each floor through one literal double
    chain; the crossing flag compares the two floored integers.

    Scale: the look expansion is ×K (bounded), map-side combinable
    to (look, arm) partials; 1-row-per-look finish. The streaming
    form updates the same six sums per look key."""
    ev = load(spark, sf_dir, "events")
    arm = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("arm:"), F.col("user_id").cast("string")
                    ).cast("binary")
                ),
                1,
                4,
            ),
            16,
            10,
        ).cast("bigint")
        % 2
    )
    assigned = ev.select(
        F.floor(F.col("value") * 10000).cast("bigint").alias("v_e4"),
        arm.alias("arm"),
        (F.floor((F.dayofmonth("ts") - 1) / 7) + 1)
        .cast("bigint")
        .alias("wk"),
    )
    looks_dim = spark.range(1, _OBF_LOOKS + 1).select(
        F.col("id").cast("bigint").alias("k")
    )
    looks = (
        assigned.join(F.broadcast(looks_dim), F.col("wk") <= F.col("k"))
        .groupBy("k", "arm")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("v_e4").cast("bigint").alias("s"),
            F.sum(F.col("v_e4") * F.col("v_e4")).cast("bigint").alias("ss"),
        )
    )
    wide = looks.groupBy("k").agg(
        F.max(F.when(F.col("arm") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("arm") == 0, F.col("s"))).alias("s0"),
        F.max(F.when(F.col("arm") == 0, F.col("ss"))).alias("ss0"),
        F.max(F.when(F.col("arm") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("arm") == 1, F.col("s"))).alias("s1"),
        F.max(F.when(F.col("arm") == 1, F.col("ss"))).alias("ss1"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    mdiff = d("s1") / d("n1") - d("s0") / d("n0")
    var1 = (d("ss1") - d("s1") * d("s1") / d("n1")) / (d("n1") - 1.0)
    var0 = (d("ss0") - d("s0") * d("s0") / d("n0")) / (d("n0") - 1.0)
    z_e4 = F.floor(mdiff / F.sqrt(var1 / d("n1") + var0 / d("n0")) * 10000)
    bound_e4 = F.floor(
        F.lit(_OBF_FINAL_Z)
        * F.sqrt(F.lit(float(_OBF_LOOKS)) / d("k"))
        * 10000
    )
    return wide.select(
        F.col("k").cast("bigint").alias("look"),
        (F.col("n0") + F.col("n1")).cast("bigint").alias("n_total"),
        z_e4.cast("bigint").alias("z_e4"),
        bound_e4.cast("bigint").alias("boundary_e4"),
        F.when(F.abs(z_e4) >= bound_e4, 1)
        .otherwise(0)
        .cast("bigint")
        .alias("crossed"),
    ).orderBy("look")


@query(
    "agg_conformal_interval",
    """
    WITH labeled AS (
        SELECT event_type, CAST(FLOOR(value * 10000) AS BIGINT) AS v_e4,
               CAST(CAST('0x' || substr(md5('cf:' ||
                    CAST(event_id AS VARCHAR)), 1, 4) AS BIGINT) % 4
                    AS BIGINT) AS split
        FROM events
    ), pred AS (
        SELECT event_type,
               CAST(SUM(v_e4) // COUNT(*) AS BIGINT) AS yhat_e4
        FROM labeled WHERE split <= 1 GROUP BY event_type
    ), resid AS (
        SELECT l.event_type, ABS(l.v_e4 - p.yhat_e4) AS res,
               ROW_NUMBER() OVER (PARTITION BY l.event_type
                                  ORDER BY ABS(l.v_e4 - p.yhat_e4)) AS rn,
               CAST(COUNT(*) OVER (PARTITION BY l.event_type) AS BIGINT)
                   AS n_cal
        FROM labeled l JOIN pred p USING (event_type)
        WHERE l.split = 2
    ), cal AS (
        SELECT event_type, n_cal, CAST(res AS BIGINT) AS q_e4
        FROM resid
        WHERE rn = LEAST(n_cal, CAST(CEIL(0.9 * (n_cal + 1)) AS BIGINT))
    )
    SELECT c.event_type, c.n_cal, c.q_e4,
           CAST(COUNT(*) AS BIGINT) AS n_test,
           CAST(FLOOR(CAST(COUNT(*) FILTER (
                    ABS(l.v_e4 - p.yhat_e4) <= c.q_e4) AS DOUBLE)
                / CAST(COUNT(*) AS DOUBLE) * 1000000) AS BIGINT)
               AS coverage_e6
    FROM labeled l
    JOIN pred p USING (event_type)
    JOIN cal c ON c.event_type = l.event_type
    WHERE l.split = 3
    GROUP BY c.event_type, c.n_cal, c.q_e4
    ORDER BY c.event_type
    """,
)
def agg_conformal_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPLIT-CONFORMAL prediction intervals (round 9): the
    distribution-free way to attach a finite-sample coverage
    GUARANTEE to ANY point predictor — fit on train (hash splits 0-1),
    take the ⌈0.9(n+1)⌉-th smallest absolute residual (the k-th order
    statistic, via a keyed rank — both engines refuse data-dependent
    quantile levels) on the CALIBRATION split (2) as the half-width, and the marginal coverage on
    fresh data (split 3) is ≥90% by exchangeability alone, no
    distributional assumption. The predictor here is the humble
    per-group mean — deliberately: conformal wraps anything, and the
    readout (per-type half-width q, realized test coverage) is what a
    model-risk reviewer actually checks.

    Exactness: md5 splits are frozen; the predictor floors to one e4
    integer per group; residuals are integer; the calibration
    quantile is DISCRETE at the finite-sample-corrected level
    ⌈0.9(n+1)⌉/n (an actual residual, the conformal requirement —
    interpolated quantiles void the guarantee); coverage is a count
    ratio floored once.

    Scale: one labeled pass, group-keyed predictor + calibration
    quantile (bounded per group), broadcast join-back — the
    agg_levene shape with a guarantee on top."""
    ev = load(spark, sf_dir, "events")
    split = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("cf:"), F.col("event_id").cast("string")
                    ).cast("binary")
                ),
                1,
                4,
            ),
            16,
            10,
        ).cast("bigint")
        % 4
    )
    labeled = ev.select(
        "event_type",
        F.floor(F.col("value") * 10000).cast("bigint").alias("v_e4"),
        split.alias("split"),
    )
    pred = (
        labeled.filter(F.col("split") <= 1)
        .groupBy("event_type")
        .agg(F.expr("CAST(SUM(v_e4) DIV COUNT(*) AS BIGINT)").alias("yhat_e4"))
    )
    cal_rows = labeled.filter(F.col("split") == 2).join(
        F.broadcast(pred), "event_type"
    ).select(
        "event_type", F.abs(F.col("v_e4") - F.col("yhat_e4")).alias("res")
    )
    w_rank = Window.partitionBy("event_type").orderBy("res")
    w_cnt = Window.partitionBy("event_type")
    cal = (
        cal_rows.withColumn("rn", F.row_number().over(w_rank))
        .withColumn("n_cal", F.count("*").over(w_cnt).cast("bigint"))
        .filter(
            F.col("rn")
            == F.least(
                F.col("n_cal"),
                F.ceil(0.9 * (F.col("n_cal") + 1)).cast("bigint"),
            )
        )
        .select(
            "event_type", "n_cal", F.col("res").cast("bigint").alias("q_e4")
        )
    )
    test = labeled.filter(F.col("split") == 3).join(
        F.broadcast(pred), "event_type"
    ).join(F.broadcast(cal), "event_type")
    return (
        test.groupBy("event_type", "n_cal", "q_e4")
        .agg(
            F.count("*").cast("bigint").alias("n_test"),
            F.floor(
                F.count_if(
                    F.abs(F.col("v_e4") - F.col("yhat_e4")) <= F.col("q_e4")
                ).cast("double")
                / F.count("*").cast("double")
                * 1000000
            )
            .cast("bigint")
            .alias("coverage_e6"),
        )
        .select("event_type", "n_cal", "q_e4", "n_test", "coverage_e6")
        .orderBy("event_type")
    )


@query(
    "events_did_estimator",
    """
    WITH base AS (
        SELECT CAST(FLOOR(value * 10000) AS BIGINT) AS v_e4,
               CAST(CAST('0x' || substr(md5('did:' ||
                    CAST(user_id AS VARCHAR)), 1, 4) AS BIGINT) % 2
                    AS BIGINT) AS treat,
               CAST(CASE WHEN day(ts) >= 16 THEN 1 ELSE 0 END
                    AS BIGINT) AS post
        FROM events
    ), cell AS (
        SELECT treat, post,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(v_e4) AS BIGINT) AS s,
               CAST(SUM(v_e4 * v_e4) AS BIGINT) AS ss
        FROM base GROUP BY treat, post
    ), wide AS (
        SELECT MAX(CASE WHEN treat = 0 AND post = 0 THEN n END) AS n00,
               MAX(CASE WHEN treat = 0 AND post = 0 THEN s END) AS s00,
               MAX(CASE WHEN treat = 0 AND post = 0 THEN ss END) AS ss00,
               MAX(CASE WHEN treat = 0 AND post = 1 THEN n END) AS n01,
               MAX(CASE WHEN treat = 0 AND post = 1 THEN s END) AS s01,
               MAX(CASE WHEN treat = 0 AND post = 1 THEN ss END) AS ss01,
               MAX(CASE WHEN treat = 1 AND post = 0 THEN n END) AS n10,
               MAX(CASE WHEN treat = 1 AND post = 0 THEN s END) AS s10,
               MAX(CASE WHEN treat = 1 AND post = 0 THEN ss END) AS ss10,
               MAX(CASE WHEN treat = 1 AND post = 1 THEN n END) AS n11,
               MAX(CASE WHEN treat = 1 AND post = 1 THEN s END) AS s11,
               MAX(CASE WHEN treat = 1 AND post = 1 THEN ss END) AS ss11
        FROM cell
    )
    SELECT CAST(n00 AS BIGINT) AS n00, CAST(n01 AS BIGINT) AS n01,
           CAST(n10 AS BIGINT) AS n10, CAST(n11 AS BIGINT) AS n11,
           CAST(FLOOR((CAST(s11 AS DOUBLE) / n11
                       - CAST(s10 AS DOUBLE) / n10)
                      - (CAST(s01 AS DOUBLE) / n01
                         - CAST(s00 AS DOUBLE) / n00)) AS BIGINT)
               AS did_e4,
           CAST(FLOOR(sqrt(
               ((CAST(ss00 AS DOUBLE) - CAST(s00 AS DOUBLE)
                 * CAST(s00 AS DOUBLE) / n00) / (n00 - 1.0)) / n00
             + ((CAST(ss01 AS DOUBLE) - CAST(s01 AS DOUBLE)
                 * CAST(s01 AS DOUBLE) / n01) / (n01 - 1.0)) / n01
             + ((CAST(ss10 AS DOUBLE) - CAST(s10 AS DOUBLE)
                 * CAST(s10 AS DOUBLE) / n10) / (n10 - 1.0)) / n10
             + ((CAST(ss11 AS DOUBLE) - CAST(s11 AS DOUBLE)
                 * CAST(s11 AS DOUBLE) / n11) / (n11 - 1.0)) / n11))
               AS BIGINT) AS se_e4,
           CAST(FLOOR(
               (((CAST(s11 AS DOUBLE) / n11 - CAST(s10 AS DOUBLE) / n10)
                 - (CAST(s01 AS DOUBLE) / n01
                    - CAST(s00 AS DOUBLE) / n00))
                / sqrt(
               ((CAST(ss00 AS DOUBLE) - CAST(s00 AS DOUBLE)
                 * CAST(s00 AS DOUBLE) / n00) / (n00 - 1.0)) / n00
             + ((CAST(ss01 AS DOUBLE) - CAST(s01 AS DOUBLE)
                 * CAST(s01 AS DOUBLE) / n01) / (n01 - 1.0)) / n01
             + ((CAST(ss10 AS DOUBLE) - CAST(s10 AS DOUBLE)
                 * CAST(s10 AS DOUBLE) / n10) / (n10 - 1.0)) / n10
             + ((CAST(ss11 AS DOUBLE) - CAST(s11 AS DOUBLE)
                 * CAST(s11 AS DOUBLE) / n11) / (n11 - 1.0)) / n11))
               * 10000) AS BIGINT) AS t_e4
    FROM wide
    """,
)
def events_did_estimator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DIFFERENCE-IN-DIFFERENCES (round 9): the workhorse causal
    estimator when randomization is at the UNIT level but exposure
    turns on at a TIME cutoff — compare the treated arm's pre→post
    mean change against the control arm's, so any shared time trend
    (seasonality, launch-day surge) cancels instead of biasing the
    effect. Arms are the frozen md5 user hash (the events_ab_srm
    discipline); the cutoff splits January at day 16. Readout is the
    2×2 cell sizes, the DiD point estimate, its four-cell delta-method
    SE (Σ s²_ab/n_ab under independence), and the t statistic — what
    an experiment reviewer needs to sign off.

    Exactness: all four cells reduce to integer (n, Σv, Σv²) in e4
    units; the estimate/SE/t each floor through ONE double chain
    written identically in both engines (the events_sequential_probe
    discipline).

    Scale: one pass → 4-cell partial aggregate (map-side combinable),
    1-row finish on the driver-side-free conditional-max pivot; the
    same six-sums-per-cell state streams (events_ab_cuped note)."""
    ev = load(spark, sf_dir, "events")
    treat = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("did:"), F.col("user_id").cast("string")
                    ).cast("binary")
                ),
                1,
                4,
            ),
            16,
            10,
        ).cast("bigint")
        % 2
    )
    base = ev.select(
        F.floor(F.col("value") * 10000).cast("bigint").alias("v_e4"),
        treat.alias("treat"),
        F.when(F.dayofmonth("ts") >= 16, 1)
        .otherwise(0)
        .cast("bigint")
        .alias("post"),
    )
    cell = base.groupBy("treat", "post").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("v_e4").cast("bigint").alias("s"),
        F.sum(F.col("v_e4") * F.col("v_e4")).cast("bigint").alias("ss"),
    )

    def _pick(t: int, p: int, col: str):
        return F.max(
            F.when((F.col("treat") == t) & (F.col("post") == p), F.col(col))
        ).alias(f"{col}{t}{p}")

    wide = cell.groupBy().agg(
        *[_pick(t, p, c) for t in (0, 1) for p in (0, 1) for c in ("n", "s", "ss")]
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    did = (d("s11") / d("n11") - d("s10") / d("n10")) - (
        d("s01") / d("n01") - d("s00") / d("n00")
    )

    def _cell_var_over_n(t: int, p: int):
        n, s, ss = d(f"n{t}{p}"), d(f"s{t}{p}"), d(f"ss{t}{p}")
        return ((ss - s * s / n) / (n - 1.0)) / n

    se = F.sqrt(
        _cell_var_over_n(0, 0)
        + _cell_var_over_n(0, 1)
        + _cell_var_over_n(1, 0)
        + _cell_var_over_n(1, 1)
    )
    return wide.select(
        F.col("n00").cast("bigint").alias("n00"),
        F.col("n01").cast("bigint").alias("n01"),
        F.col("n10").cast("bigint").alias("n10"),
        F.col("n11").cast("bigint").alias("n11"),
        F.floor(did).cast("bigint").alias("did_e4"),
        F.floor(se).cast("bigint").alias("se_e4"),
        F.floor(did / se * 10000).cast("bigint").alias("t_e4"),
    )


_FD_CANDIDATES = (
    ("o_orderkey", "o_custkey"),
    ("o_custkey", "o_orderpriority"),
    ("o_custkey", "o_orderstatus"),
    ("o_orderpriority", "o_orderstatus"),
    ("o_orderstatus", "o_orderpriority"),
)


def _fd_oracle_sql() -> str:
    branches = []
    for lhs, rhs in _FD_CANDIDATES:
        branches.append(f"""
        SELECT '{lhs}' AS lhs, '{rhs}' AS rhs,
               CAST(SUM(sc) AS BIGINT) AS n_rows,
               CAST(COUNT(*) AS BIGINT) AS n_lhs,
               CAST(SUM(mx) AS BIGINT) AS sum_max,
               CAST(SUM(sc) - SUM(mx) AS BIGINT) AS viol,
               CAST(FLOOR((CAST(SUM(sc) AS DOUBLE)
                           - CAST(SUM(mx) AS DOUBLE))
                          / CAST(SUM(sc) AS DOUBLE) * 1000000)
                    AS BIGINT) AS g3_e6
        FROM (
            SELECT {lhs}, MAX(c) AS mx, SUM(c) AS sc
            FROM (
                SELECT {lhs}, {rhs}, COUNT(*) AS c
                FROM orders GROUP BY {lhs}, {rhs}
            ) GROUP BY {lhs}
        )""")
    return " UNION ALL ".join(branches) + " ORDER BY lhs, rhs"


@query("profile_functional_dependency", _fd_oracle_sql())
def profile_functional_dependency(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Approximate FUNCTIONAL-DEPENDENCY profiling (round 9), the
    TANE/g3 measure: for each candidate A→B, the violation count is
    the minimum number of rows you'd have to delete for the FD to
    hold exactly — N − Σ_a max_b count(a,b) — and g3 = viol/N is the
    standard approximate-FD score. This is the schema-discovery
    primitive a data catalog runs on every new feed: g3 = 0 certifies
    a key/denormalization (o_orderkey→o_custkey here), small g3
    flags near-FDs worth a constraint, large g3 refutes. The
    candidate list is literal (5 pairs on orders); the same plan
    parametrizes over any table's column pairs.

    Exactness: everything is integer counting until the single g3
    division — no floats anywhere else, so cross-engine parity is
    structural.

    Scale: per pair, two keyed partial aggregates (a,b)-counts then
    a-max — both map-side combinable, shuffled bytes bounded by
    |distinct pairs|; the 5 branches share one scan per branch and
    union 5 single rows. No windows, no collects; the same shape at
    100 TB is bounded by the (a,b) cardinality, which is the thing
    being measured."""
    orders = load(spark, sf_dir, "orders")
    frames = []
    for lhs, rhs in _FD_CANDIDATES:
        inner = orders.groupBy(lhs, rhs).agg(
            F.count("*").cast("bigint").alias("c")
        )
        mid = inner.groupBy(lhs).agg(
            F.max("c").alias("mx"), F.sum("c").alias("sc")
        )
        n_rows = F.sum("sc").cast("bigint")
        sum_max = F.sum("mx").cast("bigint")
        frames.append(
            mid.groupBy().agg(
                F.lit(lhs).alias("lhs"),
                F.lit(rhs).alias("rhs"),
                n_rows.alias("n_rows"),
                F.count("*").cast("bigint").alias("n_lhs"),
                sum_max.alias("sum_max"),
                (n_rows - sum_max).cast("bigint").alias("viol"),
                F.floor(
                    (n_rows.cast("double") - sum_max.cast("double"))
                    / n_rows.cast("double")
                    * 1000000
                )
                .cast("bigint")
                .alias("g3_e6"),
            )
        )
    out = frames[0]
    for fdf in frames[1:]:
        out = out.unionByName(fdf)
    return out.orderBy("lhs", "rhs")


@query(
    "agg_icc_design_effect",
    """
    WITH base AS (
        SELECT user_id, CAST(FLOOR(value * 100) AS BIGINT) AS v_e2
        FROM events
    ), clus AS (
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS m,
               CAST(SUM(v_e2) AS BIGINT) AS s
        FROM base GROUP BY user_id
    ), terms AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS k,
               CAST(SUM(m) AS BIGINT) AS n,
               CAST(SUM(s) AS BIGINT) AS stot,
               CAST(SUM(m * m) AS BIGINT) AS sm2,
               CAST(SUM(CAST(FLOOR(CAST(s AS DOUBLE) * s / m * 1000000)
                             AS BIGINT)) AS BIGINT) AS a_e6
        FROM clus
    ), sy AS (
        SELECT CAST(SUM(v_e2 * v_e2) AS BIGINT) AS sy2 FROM base
    )
    SELECT t.k, t.n,
           CAST(FLOOR((t.n - CAST(t.sm2 AS DOUBLE) / t.n)
                      / (t.k - 1.0) * 10000) AS BIGINT) AS m0_e4,
           CAST(FLOOR(
               (((CAST(t.a_e6 AS DOUBLE) / 1000000.0
                  - CAST(t.stot AS DOUBLE) * t.stot / t.n) / (t.k - 1.0))
                - ((s.sy2 - CAST(t.a_e6 AS DOUBLE) / 1000000.0)
                   / (t.n - t.k)))
               / (((CAST(t.a_e6 AS DOUBLE) / 1000000.0
                    - CAST(t.stot AS DOUBLE) * t.stot / t.n) / (t.k - 1.0))
                  + (((t.n - CAST(t.sm2 AS DOUBLE) / t.n) / (t.k - 1.0))
                     - 1.0)
                    * ((s.sy2 - CAST(t.a_e6 AS DOUBLE) / 1000000.0)
                       / (t.n - t.k)))
               * 1000000) AS BIGINT) AS icc_e6,
           CAST(FLOOR(
               (1.0 + (CAST(t.n AS DOUBLE) / t.k - 1.0)
                * ((((CAST(t.a_e6 AS DOUBLE) / 1000000.0
                      - CAST(t.stot AS DOUBLE) * t.stot / t.n)
                     / (t.k - 1.0))
                    - ((s.sy2 - CAST(t.a_e6 AS DOUBLE) / 1000000.0)
                       / (t.n - t.k)))
                   / (((CAST(t.a_e6 AS DOUBLE) / 1000000.0
                        - CAST(t.stot AS DOUBLE) * t.stot / t.n)
                       / (t.k - 1.0))
                      + (((t.n - CAST(t.sm2 AS DOUBLE) / t.n)
                          / (t.k - 1.0)) - 1.0)
                        * ((s.sy2 - CAST(t.a_e6 AS DOUBLE) / 1000000.0)
                           / (t.n - t.k)))))
               * 1000000) AS BIGINT) AS deff_e6
    FROM terms t, sy s
    """,
)
def agg_icc_design_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTRACLASS CORRELATION + survey DESIGN EFFECT (round 9):
    when observations cluster (events within users here; classrooms,
    shards, sessions in general), n independent-looking rows carry
    fewer than n effective samples. The one-way ANOVA estimator
    ICC = (MSB − MSW)/(MSB + (m₀−1)·MSW) with m₀ = (N − Σmᵢ²/N)/
    (k−1) (the unequal-cluster-size correction), and Kish's
    DEFF = 1 + (m̄−1)·ICC is the variance-inflation factor every
    cluster-randomized experiment must divide its effective sample
    size by — the missing piece next to events_power_sample_size
    (which assumes independence).

    Exactness: cluster (m, Σv, and Σv²) reduce exactly; the one
    unordered-rational reduction Σsᵢ²/mᵢ is made order-free by
    flooring each cluster's term at e6 BEFORE the integer sum (the
    ts_hurst_rs discipline — bias ≤ k·1e-6 in e2-squared units,
    referee-bounded); every output then floors through one literal-
    ordered chain from the same five integers. e2 value quanta keep
    sᵢ² inside bigint (headroom note: ~1e5 e2-events per cluster).

    Scale: one keyed aggregate per cluster + two 1-row reductions;
    map-side combinable, no windows, no row-scale joins."""
    ev = load(spark, sf_dir, "events")
    base = ev.select(
        "user_id",
        F.floor(F.col("value") * 100).cast("bigint").alias("v_e2"),
    )
    clus = base.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("m"),
        F.sum("v_e2").cast("bigint").alias("s"),
    )
    terms = clus.groupBy().agg(
        F.count("*").cast("bigint").alias("k"),
        F.sum("m").cast("bigint").alias("n"),
        F.sum("s").cast("bigint").alias("stot"),
        F.sum(F.col("m") * F.col("m")).cast("bigint").alias("sm2"),
        F.sum(
            F.floor(
                F.col("s").cast("double") * F.col("s") / F.col("m") * 1000000
            ).cast("bigint")
        )
        .cast("bigint")
        .alias("a_e6"),
    )
    sy = base.groupBy().agg(
        F.sum(F.col("v_e2") * F.col("v_e2")).cast("bigint").alias("sy2")
    )
    j = terms.crossJoin(F.broadcast(sy))
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    a = d("a_e6") / 1000000.0
    ssb = a - d("stot") * F.col("stot") / F.col("n")
    ssw = F.col("sy2") - a
    msb = ssb / (F.col("k") - 1.0)
    msw = ssw / (F.col("n") - F.col("k"))
    m0 = (F.col("n") - d("sm2") / F.col("n")) / (F.col("k") - 1.0)
    icc = (msb - msw) / (msb + (m0 - 1.0) * msw)
    deff = 1.0 + (d("n") / F.col("k") - 1.0) * icc
    return j.select(
        "k",
        "n",
        F.floor(m0 * 10000).cast("bigint").alias("m0_e4"),
        F.floor(icc * 1000000).cast("bigint").alias("icc_e6"),
        F.floor(deff * 1000000).cast("bigint").alias("deff_e6"),
    )


@query(
    "profile_ndv_sample_gee",
    """
    WITH rows_t AS (
        SELECT l_partkey AS part,
               CAST(CAST('0x' || substr(md5('ndv:' ||
                    CAST(l_orderkey AS VARCHAR) || ':' ||
                    CAST(l_linenumber AS VARCHAR)), 1, 6) AS BIGINT)
                    % 100 AS BIGINT) AS bucket
        FROM lineitem
    ), tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_total,
               CAST(COUNT(DISTINCT part) AS BIGINT) AS d_exact
        FROM rows_t
    ), samp AS (
        SELECT part, CAST(COUNT(*) AS BIGINT) AS c
        FROM rows_t WHERE bucket < 10 GROUP BY part
    ), sagg AS (
        SELECT CAST(SUM(c) AS BIGINT) AS n_sample,
               CAST(COUNT(*) AS BIGINT) AS d_sample,
               CAST(COUNT(*) FILTER (c = 1) AS BIGINT) AS f1
        FROM samp
    )
    SELECT t.n_total, t.d_exact, s.n_sample, s.d_sample, s.f1,
           CAST(FLOOR(sqrt(CAST(t.n_total AS DOUBLE) / s.n_sample)
                      * s.f1 + (s.d_sample - s.f1)) AS BIGINT) AS gee,
           CAST(FLOOR(ABS(FLOOR(sqrt(CAST(t.n_total AS DOUBLE)
                                     / s.n_sample)
                                * s.f1 + (s.d_sample - s.f1))
                          - CAST(t.d_exact AS DOUBLE))
                      / t.d_exact * 1000000) AS BIGINT) AS err_e6
    FROM tot t, sagg s
    """,
)
def profile_ndv_sample_gee(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sampled NDV estimation with the GEE estimator (round 9) —
    the optimizer-statistics problem: a 10% row sample SEES only
    some distinct keys, and the naive "scale d_sample" answer is
    badly biased. Charikar et al.'s Guaranteed-Error Estimator
    D̂ = √(N/n)·f₁ + (d_sample − f₁) — singletons in the sample are
    the evidence for unseen values — achieves the provable √(N/n)
    error ratio bound that paper shows is optimal. The operator runs
    BOTH the sample estimate and the exact NDV and reports the
    realized relative error: exactly how a stats-collection job
    validates its sampling rate before trusting it at 100 TB.

    Exactness: the sample is the frozen md5 row-hash (re-runnable,
    engine-portable), all counts are integers, and the two outputs
    floor through one sqrt chain; the realized-error column reuses
    the FLOORED estimator so both engines divide identical integers.

    Scale: the sample aggregate touches 10% of rows with a keyed
    groupBy; the exact side is one COUNT(DISTINCT) — the expensive
    reconciliation path the estimator exists to avoid, carried here
    as the referee."""
    li = load(spark, sf_dir, "lineitem")
    bucket = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("ndv:"),
                        F.col("l_orderkey").cast("string"),
                        F.lit(":"),
                        F.col("l_linenumber").cast("string"),
                    ).cast("binary")
                ),
                1,
                6,
            ),
            16,
            10,
        ).cast("bigint")
        % 100
    )
    rows_t = li.select(
        F.col("l_partkey").alias("part"), bucket.alias("bucket")
    )
    tot = rows_t.agg(
        F.count("*").cast("bigint").alias("n_total"),
        F.countDistinct("part").cast("bigint").alias("d_exact"),
    )
    samp = (
        rows_t.filter(F.col("bucket") < 10)
        .groupBy("part")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    sagg = samp.agg(
        F.sum("c").cast("bigint").alias("n_sample"),
        F.count("*").cast("bigint").alias("d_sample"),
        F.count_if(F.col("c") == 1).cast("bigint").alias("f1"),
    )
    j = tot.crossJoin(F.broadcast(sagg))
    gee = F.floor(
        F.sqrt(F.col("n_total").cast("double") / F.col("n_sample"))
        * F.col("f1")
        + (F.col("d_sample") - F.col("f1"))
    )
    return j.select(
        "n_total",
        "d_exact",
        "n_sample",
        "d_sample",
        "f1",
        gee.cast("bigint").alias("gee"),
        F.floor(
            F.abs(gee - F.col("d_exact").cast("double"))
            / F.col("d_exact")
            * 1000000
        )
        .cast("bigint")
        .alias("err_e6"),
    )


@query(
    "anon_randomized_response_freq",
    """
    WITH types AS (
        SELECT event_type,
               ROW_NUMBER() OVER (ORDER BY event_type) - 1 AS idx,
               CAST(COUNT(*) OVER () AS BIGINT) AS k
        FROM (SELECT DISTINCT event_type FROM events)
    ), coined AS (
        SELECT e.event_type AS true_type,
               CAST(CAST('0x' || substr(md5(CAST(e.event_id AS VARCHAR)
                    || ':rr'), 1, 4) AS BIGINT) % 4 AS BIGINT) AS keep,
               CAST(CAST('0x' || substr(md5(CAST(e.event_id AS VARCHAR)
                    || ':alt'), 1, 4) AS BIGINT)
                    % (SELECT MAX(k) FROM types) AS BIGINT) AS alt_idx
        FROM events e
    ), reported AS (
        SELECT CASE WHEN c.keep < 3 THEN c.true_type
                    ELSE t.event_type END AS rep_type,
               c.true_type
        FROM coined c JOIN types t ON t.idx = c.alt_idx
    ), obs AS (
        SELECT rep_type AS event_type,
               CAST(COUNT(*) AS BIGINT) AS o
        FROM reported GROUP BY rep_type
    ), tru AS (
        SELECT true_type AS event_type,
               CAST(COUNT(*) AS BIGINT) AS t_count
        FROM reported GROUP BY true_type
    ), n AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n FROM reported
    ), tk AS (
        SELECT MAX(k) AS k FROM types
    )
    SELECT o.event_type, o.o AS reported_count, tr.t_count AS true_count,
           CAST(FLOOR(CAST(4 * tk.k * o.o - n.n AS DOUBLE) * 1000000
                      / (3 * tk.k * n.n)) AS BIGINT) AS est_share_e6,
           CAST(FLOOR(CAST(tr.t_count AS DOUBLE) * 1000000 / n.n)
                AS BIGINT) AS true_share_e6
    FROM obs o JOIN tru tr USING (event_type), n, tk
    ORDER BY o.event_type
    """,
)
def anon_randomized_response_freq(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """RANDOMIZED RESPONSE frequency release (round 9) — the
    LOCAL-privacy member completing the anonymization kit
    (anon_k_suppress/l_diversity/t_closeness protect a published
    TABLE, anon_dp_laplace_counts perturbs CENTRAL counts; RR
    perturbs each RECORD before collection — Warner 1965, the
    mechanism behind RAPPOR-style telemetry): each event keeps its
    true type w.p. p = 3/4, else reports a uniform draw over the k
    types; the collector sees only perturbed labels yet debiases the
    marginal exactly — π̂_j = (o_j/n − (1−p)/k)/p, which with p=3/4
    clears to (4k·o_j − n)/(3kn), a ratio of exact bigints.
    Per-record ε = ln(p·k/(1−p)+1) ≈ ln 16.

    Determinism: both coins are md5(event_id:salt) draws (the
    agg_permutation_test discipline) — engine-portable, re-runnable,
    no RNG state; the alt draw maps through the ORDERED distinct
    type table so both engines pick the identical replacement.

    Exactness: counts exact; the debiased share and the true share
    (emitted for audit — a real collector never sees it) each floor
    once; negative estimates floor toward −∞ identically.

    Scale: one coin map over the scan (no shuffle), two keyed
    counts, a k-row broadcast type table, a 1-row n anchor."""
    ev = load(spark, sf_dir, "events")
    w_idx = Window.orderBy("event_type")
    w_all = Window.partitionBy()
    types = (
        ev.select("event_type")
        .distinct()
        .select(
            "event_type",
            (F.row_number().over(w_idx) - 1).alias("idx"),
            F.count("*").over(w_all).cast("bigint").alias("k"),
        )
    )
    k_row = types.agg(F.max("k").alias("k"))
    coin = lambda salt: F.conv(  # noqa: E731
        F.substring(
            F.md5(
                F.concat(
                    F.col("event_id").cast("string"), F.lit(salt)
                ).cast("binary")
            ),
            1,
            4,
        ),
        16,
        10,
    ).cast("bigint")
    coined = ev.crossJoin(F.broadcast(k_row)).select(
        F.col("event_type").alias("true_type"),
        (coin(":rr") % 4).alias("keep"),
        (coin(":alt") % F.col("k")).alias("alt_idx"),
    )
    reported = coined.join(
        F.broadcast(types.select(F.col("idx").alias("alt_idx"),
                                 F.col("event_type").alias("alt_type"))),
        "alt_idx",
    ).select(
        F.when(F.col("keep") < 3, F.col("true_type"))
        .otherwise(F.col("alt_type"))
        .alias("rep_type"),
        "true_type",
    )
    obs = reported.groupBy(F.col("rep_type").alias("event_type")).agg(
        F.count("*").cast("bigint").alias("reported_count")
    )
    tru = reported.groupBy(F.col("true_type").alias("event_type")).agg(
        F.count("*").cast("bigint").alias("true_count")
    )
    n_row = reported.agg(F.count("*").cast("bigint").alias("n"))
    out = (
        obs.join(tru, "event_type")
        .crossJoin(F.broadcast(n_row))
        .crossJoin(F.broadcast(k_row))
    )
    return out.select(
        "event_type",
        "reported_count",
        "true_count",
        F.floor(
            (4 * F.col("k") * F.col("reported_count") - F.col("n"))
            .cast("double")
            * 1000000
            / (3 * F.col("k") * F.col("n"))
        )
        .cast("bigint")
        .alias("est_share_e6"),
        F.floor(
            F.col("true_count").cast("double") * 1000000 / F.col("n")
        )
        .cast("bigint")
        .alias("true_share_e6"),
    ).orderBy("event_type")


_CORR_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def _corr_matrix_oracle_sql() -> str:
    cols = _CORR_COLS
    quant = {c: f"CAST(FLOOR({c} * 10000) AS BIGINT)" for c in cols}
    selects = []
    for i, ca in enumerate(cols):
        for cb in cols[i + 1 :]:
            selects.append(f"""
    SELECT '{ca}' AS col_a, '{cb}' AS col_b, n,
           CAST(FLOOR(
               CAST(n * s_{ca}_{cb} - CAST(s_{ca} AS HUGEINT) * s_{cb}
                    AS DOUBLE)
               / sqrt(CAST(n * q_{ca} - CAST(s_{ca} AS HUGEINT) * s_{ca}
                           AS DOUBLE))
               / sqrt(CAST(n * q_{cb} - CAST(s_{cb} AS HUGEINT) * s_{cb}
                           AS DOUBLE))
               * 1000000) AS BIGINT) AS pearson_e6
    FROM m""")
    sums = [f"CAST(COUNT(*) AS BIGINT) AS n"]
    for c in cols:
        sums.append(f"CAST(SUM({quant[c]}) AS BIGINT) AS s_{c}")
        sums.append(
            f"SUM(CAST({quant[c]} AS HUGEINT) * {quant[c]}) AS q_{c}"
        )
    for i, ca in enumerate(cols):
        for cb in cols[i + 1 :]:
            sums.append(
                f"SUM(CAST({quant[ca]} AS HUGEINT) * {quant[cb]})"
                f" AS s_{ca}_{cb}"
            )
    return f"""
    WITH m AS (
        SELECT {", ".join(sums)}
        FROM lineitem
    )
    {" UNION ALL ".join(selects)}
    ORDER BY col_a, col_b"""


@query("profile_numeric_correlation_matrix", _corr_matrix_oracle_sql())
def profile_numeric_correlation_matrix(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Pairwise Pearson CORRELATION MATRIX over the fact table's
    numeric columns (round 9) — the EDA staple that completes the
    profiling family (profile_columns: per-column stats,
    profile_skew: key distribution, profile_functional_dependency:
    determinism between columns; this: LINEAR coupling among
    measures) — the first table a feature-engineering pass reads
    (collinear features waste model capacity; a surprise correlation
    flags leakage), and agg_corr_exact generalized from one pinned
    pair to the full upper triangle.

    Exactness: ALL power/cross sums for every pair ride ONE
    map-side-combinable aggregate (a single corpus pass, |cols|²/2
    accumulators — not one pass per pair); numerators/denominators
    are n-cleared exact 128-bit integers; each correlation is one
    literal-order double chain (IEEE sqrt) floored e6.

    Scale: one scan, one 1-row moment table; the pair expansion is
    driver-free literal projection over that row."""
    li = load(spark, sf_dir, "lineitem")
    dec = "decimal(38,0)"
    cols = _CORR_COLS
    q = {
        c: F.floor(F.col(c) * 10000).cast("bigint").alias(f"x_{c}")
        for c in cols
    }
    base = li.select(*q.values())
    aggs = [F.count("*").cast("bigint").alias("n")]
    for c in cols:
        xc = F.col(f"x_{c}")
        aggs.append(F.sum(xc).cast("bigint").alias(f"s_{c}"))
        aggs.append(F.sum(xc.cast(dec) * xc).alias(f"q_{c}"))
    for i, ca in enumerate(cols):
        for cb in cols[i + 1 :]:
            aggs.append(
                F.sum(F.col(f"x_{ca}").cast(dec) * F.col(f"x_{cb}"))
                .alias(f"s_{ca}_{cb}")
            )
    m = base.agg(*aggs)
    frames = []
    nd = F.col("n").cast(dec)
    for i, ca in enumerate(cols):
        for cb in cols[i + 1 :]:
            num = (
                nd * F.col(f"s_{ca}_{cb}")
                - F.col(f"s_{ca}").cast(dec) * F.col(f"s_{cb}")
            ).cast("double")
            da = F.sqrt(
                (
                    nd * F.col(f"q_{ca}")
                    - F.col(f"s_{ca}").cast(dec) * F.col(f"s_{ca}")
                ).cast("double")
            )
            db = F.sqrt(
                (
                    nd * F.col(f"q_{cb}")
                    - F.col(f"s_{cb}").cast(dec) * F.col(f"s_{cb}")
                ).cast("double")
            )
            frames.append(
                m.select(
                    F.lit(ca).alias("col_a"),
                    F.lit(cb).alias("col_b"),
                    "n",
                    F.floor(num / da / db * 1000000)
                    .cast("bigint")
                    .alias("pearson_e6"),
                )
            )
    out = frames[0]
    for fr in frames[1:]:
        out = out.unionByName(fr)
    return out.orderBy("col_a", "col_b")


@query(
    "events_stratified_effect",
    """
    WITH base AS (
        SELECT event_type,
               CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END AS t,
               CAST(FLOOR(value * 10000) AS BIGINT) AS y
        FROM events
    ), strat AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_s,
               CAST(COUNT(*) FILTER (t = 1) AS BIGINT) AS n1,
               CAST(COUNT(*) FILTER (t = 0) AS BIGINT) AS n0,
               CAST(SUM(y) FILTER (t = 1) AS BIGINT) AS s1,
               CAST(SUM(y) FILTER (t = 0) AS BIGINT) AS s0
        FROM base GROUP BY event_type
    ), tot AS (
        SELECT event_type, n_s, n1, n0, s1, s0,
               CAST(SUM(n_s) OVER () AS BIGINT) AS n,
               CAST(SUM(n1) OVER () AS BIGINT) AS n1_tot,
               CAST(SUM(n0) OVER () AS BIGINT) AS n0_tot,
               CAST(SUM(s1) OVER () AS BIGINT) AS s1_tot,
               CAST(SUM(s0) OVER () AS BIGINT) AS s0_tot
        FROM strat
    ), terms AS (
        SELECT event_type, n_s, n1, n0,
               CAST(FLOOR((CAST(s1 AS DOUBLE) / n1
                           - CAST(s0 AS DOUBLE) / n0) * 100000)
                    AS BIGINT) AS gap_e9,
               CAST(FLOOR(CAST(n_s AS DOUBLE)
                          * (CAST(s1 AS DOUBLE) / n1
                             - CAST(s0 AS DOUBLE) / n0)
                          / n * 100000) AS BIGINT) AS term_e9,
               CAST(FLOOR((CAST(s1_tot AS DOUBLE) / n1_tot
                           - CAST(s0_tot AS DOUBLE) / n0_tot) * 100000)
                    AS BIGINT) AS crude_gap_e9
        FROM tot
    )
    SELECT event_type, n_s, n1, n0, gap_e9, term_e9, crude_gap_e9,
           CAST(SUM(term_e9) OVER () AS BIGINT) AS ate_e9
    FROM terms ORDER BY event_type
    """,
)
def events_stratified_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STRATIFIED (post-stratification) effect estimate (round 9) —
    the third observational-causal member: events_ab_cuped adjusts a
    RANDOMIZED gap with a covariate, events_did_estimator needs a
    control GROUP over time; stratification is the adjustment when
    you have neither — the weekend-vs-weekday value gap recomputed
    WITHIN each event type and averaged with n_s/n weights, so any
    confounding carried by the type MIX (weekends sampling a
    different behavior blend) is removed by construction.  Reading
    crude vs adjusted side-by-side IS the diagnostic: a large
    difference says the mix was lying (Simpson's territory), near
    equality certifies the crude number.

    Exactness: all stratum counts/sums exact bigints; per-stratum
    gap and its n_s/n-weighted term run one literal double chain
    each, floored e9 (values are e4-quantized, so ×10⁵ lands in e9
    units); the adjusted total is an order-free bigint window sum
    over the |types|-row table; dayofweek parity uses the
    agg_kl_divergence weekend pin (Spark −1 shift).

    Scale: one map-side-combinable conditional-moment aggregate;
    every window runs on the pre-reduced stratum table."""
    ev = load(spark, sf_dir, "events")
    dow = F.dayofweek("ts") - 1
    t = F.when(dow.isin(0, 6), 1).otherwise(0)
    base = ev.select(
        "event_type",
        t.alias("t"),
        F.floor(F.col("value") * 10000).cast("bigint").alias("y"),
    )
    strat = base.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_s"),
        F.count_if(F.col("t") == 1).cast("bigint").alias("n1"),
        F.count_if(F.col("t") == 0).cast("bigint").alias("n0"),
        F.sum(F.when(F.col("t") == 1, F.col("y"))).cast("bigint").alias("s1"),
        F.sum(F.when(F.col("t") == 0, F.col("y"))).cast("bigint").alias("s0"),
    )
    w_all = Window.partitionBy()
    tot = strat.select(
        "*",
        F.sum("n_s").over(w_all).cast("bigint").alias("n"),
        F.sum("n1").over(w_all).cast("bigint").alias("n1_tot"),
        F.sum("n0").over(w_all).cast("bigint").alias("n0_tot"),
        F.sum("s1").over(w_all).cast("bigint").alias("s1_tot"),
        F.sum("s0").over(w_all).cast("bigint").alias("s0_tot"),
    )
    gap = (
        F.col("s1").cast("double") / F.col("n1")
        - F.col("s0").cast("double") / F.col("n0")
    )
    crude = (
        F.col("s1_tot").cast("double") / F.col("n1_tot")
        - F.col("s0_tot").cast("double") / F.col("n0_tot")
    )
    terms = tot.select(
        "event_type",
        "n_s",
        "n1",
        "n0",
        F.floor(gap * 100000).cast("bigint").alias("gap_e9"),
        F.floor(F.col("n_s").cast("double") * gap / F.col("n") * 100000)
        .cast("bigint")
        .alias("term_e9"),
        F.floor(crude * 100000).cast("bigint").alias("crude_gap_e9"),
    )
    return terms.select(
        "*",
        F.sum("term_e9").over(w_all).cast("bigint").alias("ate_e9"),
    ).orderBy("event_type")


@query(
    "anon_generalize_ladder",
    """
    WITH lv AS (
        SELECT UNNEST([0, 1, 2, 3, 4, 5, 6, 7]) AS level
    ), binned AS (
        SELECT l.level,
               CAST(1000 * power(2, l.level) AS BIGINT) AS width,
               CAST(FLOOR(CAST(CAST(ROUND(c.c_acctbal * 100) AS BIGINT)
                               AS DOUBLE)
                          / (1000 * power(2, l.level))) AS BIGINT)
                   AS bin
        FROM customer c, lv l
    ), per_bin AS (
        SELECT level, width, bin, CAST(COUNT(*) AS BIGINT) AS k
        FROM binned GROUP BY 1, 2, 3
    )
    SELECT level, width,
           CAST(COUNT(*) AS BIGINT) AS n_bins,
           CAST(MIN(k) AS BIGINT) AS k_min,
           CAST(SUM(CASE WHEN k < 5 THEN k ELSE 0 END) AS BIGINT)
               AS n_rows_below_k5,
           CASE WHEN MIN(k) >= 5 THEN 1 ELSE 0 END AS k5_satisfied
    FROM per_bin GROUP BY 1, 2 ORDER BY level
    """,
)
def anon_generalize_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GENERALIZATION LADDER for k-anonymity (round 10): bin the
    quasi-identifier (account balance, cents) at doubling widths
    1000·2ˡ for l = 0..7 and report, per rung, the bin count, the
    SMALLEST equivalence class k_min, the row mass still living in
    sub-k classes, and whether k ≥ 5 holds — the table a privacy
    review reads to pick the COARSEST level that satisfies k, which
    is the whole k-anonymity generalization trade (coarser = safer,
    finer = more useful).  Complements anon_k_suppress (which DROPS
    sub-k rows at one fixed granularity): the ladder finds the
    granularity where nothing needs dropping, and the two compose —
    generalize to the best rung, suppress the remainder.

    Exactness: bins floor a DOUBLE division (exact: |cents| < 2⁵³,
    widths are small integers; FLOOR not integer division because
    the two engines disagree on negative integer-division rounding
    and balances go negative); every readout is an exact count.

    Scale: one |levels|-row broadcast cross, one map-side-combinable
    (level, bin) count, one |levels·bins| rollup — the scan is
    touched once for all 8 rungs."""
    cust = load(spark, sf_dir, "customer")
    lv = spark.range(8).select(F.col("id").cast("int").alias("level"))
    cents = F.round(F.col("c_acctbal") * 100).cast("bigint")
    binned = cust.select(cents.alias("v")).crossJoin(F.broadcast(lv)).select(
        "level",
        (F.lit(1000) * F.pow(F.lit(2.0), F.col("level")))
        .cast("bigint")
        .alias("width"),
        F.floor(
            F.col("v").cast("double")
            / (F.lit(1000) * F.pow(F.lit(2.0), F.col("level")))
        )
        .cast("bigint")
        .alias("bin"),
    )
    per_bin = binned.groupBy("level", "width", "bin").agg(
        F.count("*").cast("bigint").alias("k")
    )
    return (
        per_bin.groupBy("level", "width")
        .agg(
            F.count("*").cast("bigint").alias("n_bins"),
            F.min("k").cast("bigint").alias("k_min"),
            F.sum(F.when(F.col("k") < 5, F.col("k")).otherwise(0))
            .cast("bigint")
            .alias("n_rows_below_k5"),
            F.when(F.min("k") >= 5, 1).otherwise(0).alias("k5_satisfied"),
        )
        .orderBy("level")
    )


@query(
    "agg_smr_indirect",
    """
    WITH strata AS (
        SELECT CAST(month(o_orderdate) AS BIGINT) AS stratum,
               CAST(COUNT(*) AS BIGINT) AS n_s,
               CAST(COUNT(*) FILTER (o_orderstatus = 'F') AS BIGINT)
                   AS o_s
        FROM orders GROUP BY 1
    ), cells AS (
        SELECT o_orderpriority AS grp,
               CAST(month(o_orderdate) AS BIGINT) AS stratum,
               CAST(COUNT(*) AS BIGINT) AS n_gs,
               CAST(COUNT(*) FILTER (o_orderstatus = 'F') AS BIGINT)
                   AS obs_gs
        FROM orders GROUP BY 1, 2
    ), g AS (
        SELECT c.grp,
               CAST(SUM(c.n_gs) AS BIGINT) AS n_g,
               CAST(SUM(c.obs_gs) AS BIGINT) AS observed,
               CAST(SUM(c.n_gs * s.o_s * 1000000 // s.n_s) AS BIGINT)
                   AS expected_e6
        FROM cells c JOIN strata s ON c.stratum = s.stratum
        GROUP BY 1
    )
    SELECT grp, n_g, observed, expected_e6,
           CASE WHEN expected_e6 > 0
                THEN CAST(observed * 1000000000000 // expected_e6
                          AS BIGINT)
                ELSE NULL END AS smr_e6
    FROM g ORDER BY grp
    """,
)
def agg_smr_indirect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INDIRECT STANDARDIZATION / SMR (round 10): is a group's event
    rate high BECAUSE of the group, or because of its mix?  Expected
    events per priority class = Σ over month strata of n_gs·r_s,
    where r_s is the REFERENCE (whole-population) finished-rate of
    that month; SMR = observed/expected.  The epidemiology
    standard (standardized mortality ratio) that ops/risk teams
    reuse as "mix-adjusted incident rate" — and the ESTIMATION
    companion to agg_cmh_test (CMH tests the stratified association;
    SMR quantifies each group's deviation after the same mix
    adjustment).  SMR > 1 with events_stratified_effect flat means
    the excess is composition, not behavior.

    ZERO floats: each cell's expectation n_gs·o_s·1e6 // n_s floors
    once as an exact integer division (order-free bigint sum), and
    SMR is one more exact integer division.  int64 sizing: the cell
    numerator n_gs·o_s·1e6 tops out ~1.6e17 at sf10 (250k × 625k
    cells over 12 month strata) and the SMR numerator observed·1e12
    at ~7.5e18 — both inside int64 through sf10; beyond that the
    same chains move to decimal(38,0)/hugeint (the agg_gamma_fit
    discipline).

    Scale: two map-side-combinable aggregations over the same scan +
    a |strata|-row broadcast join — the agg_chi_square shape with a
    reference-rate join instead of margins."""
    o = load(spark, sf_dir, "orders")
    strata = o.groupBy(F.month("o_orderdate").cast("bigint").alias("stratum")).agg(
        F.count("*").cast("bigint").alias("n_s"),
        F.count_if(F.col("o_orderstatus") == "F").cast("bigint").alias("o_s"),
    )
    cells = o.groupBy(
        F.col("o_orderpriority").alias("grp"),
        F.month("o_orderdate").cast("bigint").alias("stratum"),
    ).agg(
        F.count("*").cast("bigint").alias("n_gs"),
        F.count_if(F.col("o_orderstatus") == "F")
        .cast("bigint")
        .alias("obs_gs"),
    )
    g = (
        cells.join(F.broadcast(strata), "stratum")
        .groupBy("grp")
        .agg(
            F.sum("n_gs").cast("bigint").alias("n_g"),
            F.sum("obs_gs").cast("bigint").alias("observed"),
            F.sum(F.expr("n_gs * o_s * 1000000 DIV n_s"))
            .cast("bigint")
            .alias("expected_e6"),
        )
    )
    return g.select(
        "grp",
        "n_g",
        "observed",
        "expected_e6",
        F.when(
            F.col("expected_e6") > 0,
            F.expr("CAST(observed * 1000000000000 DIV expected_e6 AS BIGINT)"),
        ).alias("smr_e6"),
    ).orderBy("grp")


from graphsense_datafeed_spark.ingest.facade import _DUCK_BLOCKS as _DM_BLOCKS


@query(
    "anon_pseudonymize_consistent",
    f"""
    WITH txr AS (
        SELECT unnest(txs) AS tx FROM {_DM_BLOCKS}
    ), flows AS (
        SELECT (o).address[1] AS address, (o).value AS sat
        FROM (SELECT unnest((tx).outputs) AS o FROM txr)
    ), pseud AS (
        SELECT address,
               'anon_' || substr(md5('gds-pepper-v1:' || address), 1, 12)
                   AS pseudonym,
               CAST(SUM(sat) AS BIGINT) AS total_received,
               CAST(COUNT(*) AS BIGINT) AS n_outputs
        FROM flows GROUP BY address
    )
    SELECT pseudonym, total_received, n_outputs,
           CAST(COUNT(*) OVER (PARTITION BY pseudonym) AS BIGINT)
               AS collision_width
    FROM pseud ORDER BY pseudonym
    """,
)
def anon_pseudonymize_consistent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONSISTENT PSEUDONYMIZATION (round 10): replace every address
    with a peppered-hash pseudonym — the privacy transform that keeps
    REFERENTIAL INTEGRITY (the same address maps to the same
    pseudonym in every table, so joins, balances and graph structure
    survive) while severing the link to the real identifier; the
    12-hex-char truncation is the utility/linkability knob and the
    emitted collision_width column is its audit (truncate harder and
    two addresses may share a pseudonym — the audit catches it
    BEFORE analysts silently merge entities).  The pepper is a
    deployment secret; rotating it unlinks all history — the GDPR
    'erasure by key destruction' pattern.  Completes the anon family:
    k-suppress / l-diversity / t-closeness bound INFERENCE,
    DP-laplace bounds AGGREGATES, this bounds IDENTIFIER linkage.

    Exactness: md5 is engine-portable (the split/sample discipline);
    totals are exact satoshi bigints; output keys on the pseudonym so
    the oracle never sees a raw address.

    Scale: one address-keyed aggregation + a pseudonym-keyed window
    over |addresses| rows; the map is stateless per row, so it
    applies identically in the streaming ingest path."""
    from graphsense_datafeed_spark.sources.scans import BLOCKS_JSONL  # noqa: F401
    from graphsense_datafeed_spark.ingest.facade import (
        normalize_blocks,
        read_blocks_json,
    )

    raw = normalize_blocks(read_blocks_json(spark))
    outs = (
        raw.select(F.explode("txs").alias("tx"))
        .select(F.explode("tx.outputs").alias("o"))
        .select(
            F.col("o.address")[0].alias("address"),
            F.col("o.value").alias("sat"),
        )
    )
    pseud = outs.groupBy("address").agg(
        F.sum("sat").cast("bigint").alias("total_received"),
        F.count("*").cast("bigint").alias("n_outputs"),
    ).select(
        F.concat(
            F.lit("anon_"),
            F.substring(
                F.md5(
                    F.concat(F.lit("gds-pepper-v1:"), F.col("address")).cast(
                        "binary"
                    )
                ),
                1,
                12,
            ),
        ).alias("pseudonym"),
        "total_received",
        "n_outputs",
    )
    return pseud.select(
        "pseudonym",
        "total_received",
        "n_outputs",
        F.count("*")
        .over(Window.partitionBy("pseudonym"))
        .cast("bigint")
        .alias("collision_width"),
    ).orderBy("pseudonym")


@query(
    "dq_expectation_checks",
    """
    WITH checks AS (
        SELECT 'orderkey_not_null' AS check_name,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(*) FILTER (o_orderkey IS NULL) AS BIGINT)
                   AS n_violations
        FROM orders
        UNION ALL
        SELECT 'totalprice_positive',
               CAST(COUNT(*) AS BIGINT),
               CAST(COUNT(*) FILTER (o_totalprice <= 0) AS BIGINT)
        FROM orders
        UNION ALL
        SELECT 'status_in_domain',
               CAST(COUNT(*) AS BIGINT),
               CAST(COUNT(*) FILTER (o_orderstatus NOT IN ('F','O','P'))
                    AS BIGINT)
        FROM orders
        UNION ALL
        SELECT 'priority_format',
               CAST(COUNT(*) AS BIGINT),
               CAST(COUNT(*) FILTER (NOT regexp_matches(o_orderpriority,
                    '^[1-5]-[A-Z ]+$')) AS BIGINT)
        FROM orders
        UNION ALL
        SELECT 'orderkey_unique',
               CAST(COUNT(*) AS BIGINT),
               CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT)
        FROM orders
        UNION ALL
        SELECT 'custkey_referential',
               CAST(COUNT(*) AS BIGINT),
               CAST(COUNT(*) FILTER (c_custkey IS NULL) AS BIGINT)
        FROM orders LEFT JOIN customer ON c_custkey = o_custkey
    )
    SELECT check_name, n_rows, n_violations,
           CASE WHEN n_violations = 0 THEN 1 ELSE 0 END AS passed
    FROM checks ORDER BY check_name
    """,
)
def dq_expectation_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DECLARATIVE DATA-QUALITY expectation suite (round 10) — the
    great-expectations-style contract every landing table needs: six
    check CLASSES over orders (not-null, range, domain membership,
    regex format, key uniqueness, referential integrity into
    customer), each returning (rows, violations, passed) — the table
    a data SLA dashboard renders and a circuit-breaker gates
    downstream jobs on.  Complements profile_columns (which DESCRIBES
    the data; this ASSERTS against a contract) and
    audit_totals_reconcile (cross-table totals; this is
    within-feed shape).

    Exactness: every check is an exact conditional count; the
    referential check is a broadcast left join counting unmatched
    keys.

    Scale: the five single-table checks share ONE scan (union of
    conditional aggregates over the same frame — AQE reuses the
    exchange-free scans); the referential check adds one broadcast
    dim join.  At 100 TB the suite runs per-partition on arrival and
    the pass/fail table merges incrementally."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")

    def check(name, violation_col):
        return o.agg(
            F.lit(name).alias("check_name"),
            F.count("*").cast("bigint").alias("n_rows"),
            violation_col.cast("bigint").alias("n_violations"),
        )

    checks = (
        check("orderkey_not_null", F.count_if(F.col("o_orderkey").isNull()))
        .unionAll(
            check("totalprice_positive", F.count_if(F.col("o_totalprice") <= 0))
        )
        .unionAll(
            check(
                "status_in_domain",
                F.count_if(~F.col("o_orderstatus").isin("F", "O", "P")),
            )
        )
        .unionAll(
            check(
                "priority_format",
                F.count_if(
                    ~F.col("o_orderpriority").rlike("^[1-5]-[A-Z ]+$")
                ),
            )
        )
        .unionAll(
            check(
                "orderkey_unique",
                F.count("*") - F.countDistinct("o_orderkey"),
            )
        )
        .unionAll(
            o.join(
                F.broadcast(c.select("c_custkey")),
                o.o_custkey == F.col("c_custkey"),
                "left",
            ).agg(
                F.lit("custkey_referential").alias("check_name"),
                F.count("*").cast("bigint").alias("n_rows"),
                F.count_if(F.col("c_custkey").isNull())
                .cast("bigint")
                .alias("n_violations"),
            )
        )
    )
    return checks.select(
        "check_name",
        "n_rows",
        "n_violations",
        F.when(F.col("n_violations") == 0, 1).otherwise(0).alias("passed"),
    ).orderBy("check_name")


@query(
    "cdc_column_level_diff",
    """
    WITH snap_a AS (
      SELECT o_orderkey, o_orderstatus,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS total_cents,
             o_orderpriority
      FROM orders WHERE CAST(o_orderdate AS DATE) < DATE '1997-07-01'
    ), snap_b AS (
      SELECT o_orderkey,
             CASE WHEN o_orderstatus = 'P' THEN 'F'
                  ELSE o_orderstatus END AS o_orderstatus,
             CAST(ROUND(o_totalprice * 100) AS BIGINT)
                 + CASE WHEN o_orderkey % 97 = 0 THEN 500 ELSE 0 END
                 AS total_cents,
             o_orderpriority
      FROM orders WHERE CAST(o_orderdate AS DATE) < DATE '1997-07-01'
    ), matched AS (
      SELECT a.o_orderkey,
             CASE WHEN a.o_orderstatus <> b.o_orderstatus
                  THEN 1 ELSE 0 END AS status_changed,
             CASE WHEN a.total_cents <> b.total_cents
                  THEN 1 ELSE 0 END AS total_changed,
             CASE WHEN a.o_orderpriority <> b.o_orderpriority
                  THEN 1 ELSE 0 END AS priority_changed
      FROM snap_a a JOIN snap_b b ON a.o_orderkey = b.o_orderkey
    )
    SELECT o_orderkey, status_changed, total_changed, priority_changed,
           status_changed + total_changed + priority_changed
               AS n_cols_changed
    FROM matched
    WHERE status_changed + total_changed + priority_changed > 0
    ORDER BY o_orderkey
    """,
)
def cdc_column_level_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COLUMN-LEVEL CDC diff (round 10): for keys present in both
    snapshots, WHICH columns changed — the refinement of
    cdc_snapshot_diff's row-level insert/update/delete that incremental
    downstream consumers actually need (a status flip invalidates the
    status rollup but NOT the revenue cube; column-level change sets
    are what lets each consumer re-aggregate only its own inputs —
    the selective-invalidation pattern behind every incremental
    materialized view).  Snapshot B deterministically finalizes 'P'
    statuses and amends every 97th order's total by 5.00, so both
    change classes occur and compose.

    Exactness: per-column flags are exact integer comparisons
    (money compared in cents, never float equality); the output is
    sized in CHANGED ROWS.

    Scale: one PK-keyed join (exchange-free on bucketed snapshots,
    like cdc_snapshot_diff) with the per-column CASEs riding the
    join projection — no extra pass per column."""
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").cast("date") < F.lit("1997-07-01").cast("date")
    )
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    snap_a = orders.select(
        F.col("o_orderkey").alias("key"),
        F.col("o_orderstatus").alias("a_status"),
        cents.alias("a_cents"),
        F.col("o_orderpriority").alias("a_prio"),
    )
    snap_b = orders.select(
        F.col("o_orderkey").alias("bkey"),
        F.when(F.col("o_orderstatus") == "P", "F")
        .otherwise(F.col("o_orderstatus"))
        .alias("b_status"),
        (
            cents
            + F.when(F.col("o_orderkey") % 97 == 0, 500).otherwise(0)
        ).alias("b_cents"),
        F.col("o_orderpriority").alias("b_prio"),
    )
    m = snap_a.join(snap_b, snap_a.key == snap_b.bkey)
    sc = (F.col("a_status") != F.col("b_status")).cast("int").alias("status_changed")
    tc = (F.col("a_cents") != F.col("b_cents")).cast("int").alias("total_changed")
    pc = (F.col("a_prio") != F.col("b_prio")).cast("int").alias("priority_changed")
    out = m.select(F.col("key").alias("o_orderkey"), sc, tc, pc)
    return (
        out.withColumn(
            "n_cols_changed",
            F.col("status_changed")
            + F.col("total_changed")
            + F.col("priority_changed"),
        )
        .filter(F.col("n_cols_changed") > 0)
        .orderBy("o_orderkey")
    )


@query(
    "events_covariate_balance_smd",
    """
    WITH base AS (
        SELECT CAST('0x' || substr(md5('exp42_' || CAST(user_id AS VARCHAR)),
                                   1, 7) AS BIGINT) % 2 AS arm,
               CAST(FLOOR(value * 10000) AS BIGINT) AS v_value,
               CAST(json_extract(props, '$.k') AS BIGINT) AS v_k,
               CAST(EXTRACT(hour FROM ts) AS BIGINT) AS v_hour
        FROM events
    ), long AS (
        SELECT arm, 'value_e4' AS covariate, v_value AS v FROM base
        UNION ALL SELECT arm, 'props_k', v_k FROM base
        UNION ALL SELECT arm, 'hour_of_day', v_hour FROM base
    ), stats AS (
        SELECT covariate,
               CAST(COUNT(*) FILTER (arm = 1) AS BIGINT) AS n1,
               CAST(SUM(v) FILTER (arm = 1) AS BIGINT) AS s1,
               CAST(SUM(v * v) FILTER (arm = 1) AS BIGINT) AS q1,
               CAST(COUNT(*) FILTER (arm = 0) AS BIGINT) AS n0,
               CAST(SUM(v) FILTER (arm = 0) AS BIGINT) AS s0,
               CAST(SUM(v * v) FILTER (arm = 0) AS BIGINT) AS q0
        FROM long GROUP BY 1
    )
    SELECT covariate, n1, n0,
           CAST(FLOOR((CAST(s1 AS DOUBLE) / n1 - CAST(s0 AS DOUBLE) / n0)
                / sqrt(((CAST(q1 AS DOUBLE) / n1
                         - (CAST(s1 AS DOUBLE) / n1)
                           * (CAST(s1 AS DOUBLE) / n1))
                        + (CAST(q0 AS DOUBLE) / n0
                           - (CAST(s0 AS DOUBLE) / n0)
                             * (CAST(s0 AS DOUBLE) / n0))) / 2.0)
                * 1000000) AS BIGINT) AS smd_e6
    FROM stats ORDER BY covariate
    """,
)
def events_covariate_balance_smd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COVARIATE BALANCE table (round 10): the standardized mean
    difference (m₁−m₀)/√((v₁+v₀)/2) of every pre-treatment covariate
    between the two hash arms — the FIRST table in any observational
    study or experiment report (|SMD| < 0.1 is the balance
    convention), and the missing prerequisite check for the repo's
    whole causal kit: events_ab_cuped, events_did_estimator,
    events_stratified_effect and events_uplift_qini all ASSUME the
    arms are comparable; this measures it.  Under the frozen md5
    assignment the referee bounds every |SMD| near 0 — wiring it to
    a real (possibly confounded) treatment flag is the one-line
    change, and then the table IS the confounding alarm.

    Exactness: per-covariate per-arm sufficient statistics are exact
    bigints off one unpivoted pass; each SMD is one double chain
    floored e6.

    Scale: the unpivot triples map-stage rows but keeps ONE
    map-side-combinable aggregate — the covariate list extends
    without new passes."""
    ev = load(spark, sf_dir, "events")
    arm = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("exp42_"), F.col("user_id").cast("string")
                    ).cast("binary")
                ),
                1,
                7,
            ),
            16,
            10,
        ).cast("bigint")
        % 2
    )
    base = ev.select(
        arm.alias("arm"),
        F.floor(F.col("value") * 10000).cast("bigint").alias("v_value"),
        F.get_json_object("props", "$.k").cast("bigint").alias("v_k"),
        F.hour("ts").cast("bigint").alias("v_hour"),
    )
    long = (
        base.select("arm", F.lit("value_e4").alias("covariate"), F.col("v_value").alias("v"))
        .unionAll(base.select("arm", F.lit("props_k"), F.col("v_k")))
        .unionAll(base.select("arm", F.lit("hour_of_day"), F.col("v_hour")))
    )
    stats = long.groupBy("covariate").agg(
        F.count_if(F.col("arm") == 1).cast("bigint").alias("n1"),
        F.sum(F.when(F.col("arm") == 1, F.col("v"))).cast("bigint").alias("s1"),
        F.sum(F.when(F.col("arm") == 1, F.col("v") * F.col("v")))
        .cast("bigint")
        .alias("q1"),
        F.count_if(F.col("arm") == 0).cast("bigint").alias("n0"),
        F.sum(F.when(F.col("arm") == 0, F.col("v"))).cast("bigint").alias("s0"),
        F.sum(F.when(F.col("arm") == 0, F.col("v") * F.col("v")))
        .cast("bigint")
        .alias("q0"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    m1, m0 = d("s1") / d("n1"), d("s0") / d("n0")
    v1 = d("q1") / d("n1") - m1 * m1
    v0 = d("q0") / d("n0") - m0 * m0
    return stats.select(
        "covariate",
        "n1",
        "n0",
        F.floor((m1 - m0) / F.sqrt((v1 + v0) / 2.0) * 1000000)
        .cast("bigint")
        .alias("smd_e6"),
    ).orderBy("covariate")


@query(
    "events_iv_wald",
    """
    WITH users AS (
        SELECT user_id,
               CAST(CAST('0x' || substr(md5('iv:' ||
                    CAST(user_id AS VARCHAR)), 1, 4) AS BIGINT) % 2
                    AS BIGINT) AS z,
               CAST(SUM(CAST(FLOOR(value * 10000) AS BIGINT))
                    // COUNT(*) AS BIGINT) AS y,
               CAST(CASE WHEN COUNT(*) FILTER (event_type = 'click') > 0
                    THEN 1 ELSE 0 END AS BIGINT) AS d
        FROM events GROUP BY 1
    ), arms AS (
        SELECT z, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(y * y) AS BIGINT) AS syy,
               CAST(SUM(d) AS BIGINT) AS sd,
               CAST(SUM(y * d) AS BIGINT) AS syd
        FROM users GROUP BY 1
    ), wide AS (
        SELECT MAX(CASE WHEN z = 0 THEN n END) AS n0,
               MAX(CASE WHEN z = 0 THEN sy END) AS sy0,
               MAX(CASE WHEN z = 0 THEN syy END) AS syy0,
               MAX(CASE WHEN z = 0 THEN sd END) AS sd0,
               MAX(CASE WHEN z = 0 THEN syd END) AS syd0,
               MAX(CASE WHEN z = 1 THEN n END) AS n1,
               MAX(CASE WHEN z = 1 THEN sy END) AS sy1,
               MAX(CASE WHEN z = 1 THEN syy END) AS syy1,
               MAX(CASE WHEN z = 1 THEN sd END) AS sd1,
               MAX(CASE WHEN z = 1 THEN syd END) AS syd1
        FROM arms
    )
    SELECT CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1,
           CAST(FLOOR(CAST(sy1 AS DOUBLE) / n1
                      - CAST(sy0 AS DOUBLE) / n0) AS BIGINT) AS itt_y_e4,
           CAST(FLOOR((CAST(sd1 AS DOUBLE) / n1
                       - CAST(sd0 AS DOUBLE) / n0) * 1000000) AS BIGINT)
               AS itt_d_e6,
           CASE WHEN sd1 * n0 = sd0 * n1 THEN NULL
                ELSE CAST(FLOOR(
                    (CAST(sy1 AS DOUBLE) / n1 - CAST(sy0 AS DOUBLE) / n0)
                    / (CAST(sd1 AS DOUBLE) / n1
                       - CAST(sd0 AS DOUBLE) / n0)) AS BIGINT) END
               AS wald_e4,
           CASE WHEN sd1 * n0 = sd0 * n1 THEN NULL
                ELSE CAST(FLOOR(SQRT((
                    ((CAST(syy1 AS DOUBLE) - CAST(sy1 AS DOUBLE)
                      * CAST(sy1 AS DOUBLE) / n1) / (n1 - 1.0)) / n1
                  + ((CAST(syy0 AS DOUBLE) - CAST(sy0 AS DOUBLE)
                      * CAST(sy0 AS DOUBLE) / n0) / (n0 - 1.0)) / n0
                  + POW((CAST(sy1 AS DOUBLE) / n1
                         - CAST(sy0 AS DOUBLE) / n0)
                        / (CAST(sd1 AS DOUBLE) / n1
                           - CAST(sd0 AS DOUBLE) / n0), 2)
                    * (((CAST(sd1 AS DOUBLE)
                         - CAST(sd1 AS DOUBLE) * CAST(sd1 AS DOUBLE) / n1)
                        / (n1 - 1.0)) / n1
                       + ((CAST(sd0 AS DOUBLE)
                           - CAST(sd0 AS DOUBLE) * CAST(sd0 AS DOUBLE) / n0)
                          / (n0 - 1.0)) / n0)
                  - 2.0 * ((CAST(sy1 AS DOUBLE) / n1
                            - CAST(sy0 AS DOUBLE) / n0)
                           / (CAST(sd1 AS DOUBLE) / n1
                              - CAST(sd0 AS DOUBLE) / n0))
                    * (((CAST(syd1 AS DOUBLE) - CAST(sy1 AS DOUBLE)
                         * CAST(sd1 AS DOUBLE) / n1) / (n1 - 1.0)) / n1
                       + ((CAST(syd0 AS DOUBLE) - CAST(sy0 AS DOUBLE)
                           * CAST(sd0 AS DOUBLE) / n0) / (n0 - 1.0)) / n0))
                  / POW(CAST(sd1 AS DOUBLE) / n1
                        - CAST(sd0 AS DOUBLE) / n0, 2))) AS BIGINT) END
               AS se_e4
    FROM wide
    """,
)
def events_iv_wald(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INSTRUMENTAL-VARIABLE WALD ESTIMATOR (round 11): with the
    frozen md5 user hash as the randomized ENCOURAGEMENT z and
    'ever clicked' as the endogenous takeup d, the Wald LATE is
    ITT_y / ITT_d (on the per-user MEAN e4 outcome — the exact
    integer-division mean, domain-bounded so Σy² cannot overflow at
    any SF; a per-user value SUM squared overflows int64 at sf10,
    caught by this round's decade spot-check) — the effect on
    compliers when you could only
    randomize the nudge, not the behavior.  Completes the causal
    family's identification ladder: ab (randomized exposure), cuped
    (variance reduction), did (parallel trends), rdd (cutoff),
    IV (encouragement); the delta-method SE carries all three
    variance pieces (outcome diff, takeup diff, their covariance).

    Exactness: per-user (z, y, d) reduce to exact bigints
    (y = Σ e4-value, d binary); per-arm five-sums are exact; the
    Wald point and SE fold in ONE double chain each, floored e4;
    a weak-instrument ZERO takeup difference is detected by the
    cleared integer comparison sd1·n0 = sd0·n1 (never a float) and
    returns NULL rather than ±inf (ANSI-safe both engines).

    Scale: one keyed user aggregate → 2-arm partial aggregate →
    1-row conditional-max pivot — the events_did_estimator shape."""
    ev = load(spark, sf_dir, "events")
    z = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("iv:"), F.col("user_id").cast("string")
                    ).cast("binary")
                ),
                1,
                4,
            ),
            16,
            10,
        ).cast("bigint")
        % 2
    )
    users = ev.groupBy("user_id").agg(
        F.max(z).cast("bigint").alias("z"),
        # exact int64 DIV matching the oracle's `//` (ADVICE r11):
        # double `/` + cast rounds before truncating past 2^53
        F.expr(
            "CAST(sum(CAST(floor(value * 10000) AS BIGINT))"
            " DIV count(*) AS BIGINT)"
        ).alias("y"),
        F.when(F.count_if(F.col("event_type") == "click") > 0, 1)
        .otherwise(0)
        .cast("bigint")
        .alias("d"),
    )
    arms = users.groupBy("z").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
        F.sum("d").cast("bigint").alias("sd"),
        F.sum(F.col("y") * F.col("d")).cast("bigint").alias("syd"),
    )

    def _pick(zv: int, col: str):
        return (
            F.max(F.when(F.col("z") == zv, F.col(col)))
            .alias(f"{col}{zv}")
        )

    wide = arms.groupBy().agg(
        *[_pick(zv, c) for zv in (0, 1) for c in ("n", "sy", "syy", "sd", "syd")]
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    itt_y = d("sy1") / d("n1") - d("sy0") / d("n0")
    itt_d = d("sd1") / d("n1") - d("sd0") / d("n0")
    weak = F.col("sd1") * F.col("n0") == F.col("sd0") * F.col("n1")
    wald = itt_y / itt_d

    def _var(s: str, ss, n: str):
        return ((ss - F.col(s).cast("double") ** 2 / d(n)) / (d(n) - 1.0)) / d(n)

    var_y = _var("sy1", d("syy1"), "n1") + _var("sy0", d("syy0"), "n0")
    var_d = _var("sd1", d("sd1"), "n1") + _var("sd0", d("sd0"), "n0")
    cov = (
        ((d("syd1") - d("sy1") * d("sd1") / d("n1")) / (d("n1") - 1.0)) / d("n1")
        + ((d("syd0") - d("sy0") * d("sd0") / d("n0")) / (d("n0") - 1.0))
        / d("n0")
    )
    se = F.sqrt(
        (var_y + wald * wald * var_d - 2.0 * wald * cov) / (itt_d * itt_d)
    )
    return wide.select(
        F.col("n0").cast("bigint").alias("n0"),
        F.col("n1").cast("bigint").alias("n1"),
        F.floor(itt_y).cast("bigint").alias("itt_y_e4"),
        F.floor(itt_d * 1000000).cast("bigint").alias("itt_d_e6"),
        F.when(~weak, F.floor(wald).cast("bigint")).alias("wald_e4"),
        F.when(~weak, F.floor(se).cast("bigint")).alias("se_e4"),
    )


@query(
    "events_rdd_sharp",
    """
    WITH users AS (
        SELECT user_id,
               CAST(CAST('0x' || substr(md5('rdd:' ||
                    CAST(user_id AS VARCHAR)), 1, 4) AS BIGINT) % 1000
                    - 500 AS BIGINT) AS r,
               CAST(SUM(CAST(FLOOR(value * 10000) AS BIGINT))
                    // COUNT(*) AS BIGINT) AS y
        FROM events GROUP BY 1
    ), sides AS (
        SELECT CASE WHEN r >= 0 THEN 1 ELSE 0 END AS side,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(r) AS BIGINT) AS sr,
               CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(r * r) AS BIGINT) AS srr,
               CAST(SUM(r * y) AS BIGINT) AS sry,
               CAST(SUM(y * y) AS BIGINT) AS syy
        FROM users WHERE r > -250 AND r < 250 GROUP BY 1
    ), wide AS (
        SELECT MAX(CASE WHEN side = 0 THEN n END) AS nl,
               MAX(CASE WHEN side = 0 THEN sr END) AS srl,
               MAX(CASE WHEN side = 0 THEN sy END) AS syl,
               MAX(CASE WHEN side = 0 THEN srr END) AS srrl,
               MAX(CASE WHEN side = 0 THEN sry END) AS sryl,
               MAX(CASE WHEN side = 0 THEN syy END) AS syyl,
               MAX(CASE WHEN side = 1 THEN n END) AS nr,
               MAX(CASE WHEN side = 1 THEN sr END) AS srr_,
               MAX(CASE WHEN side = 1 THEN sy END) AS syr,
               MAX(CASE WHEN side = 1 THEN srr END) AS srrr,
               MAX(CASE WHEN side = 1 THEN sry END) AS sryr,
               MAX(CASE WHEN side = 1 THEN syy END) AS syyr
        FROM sides
    )
    SELECT CAST(nl AS BIGINT) AS n_left, CAST(nr AS BIGINT) AS n_right,
           CAST(FLOOR((CAST(syl AS DOUBLE) * srrl
                       - CAST(srl AS DOUBLE) * sryl)
                      / (CAST(nl AS DOUBLE) * srrl
                         - CAST(srl AS DOUBLE) * srl)) AS BIGINT)
               AS alpha_left_e4,
           CAST(FLOOR((CAST(syr AS DOUBLE) * srrr
                       - CAST(srr_ AS DOUBLE) * sryr)
                      / (CAST(nr AS DOUBLE) * srrr
                         - CAST(srr_ AS DOUBLE) * srr_)) AS BIGINT)
               AS alpha_right_e4,
           CAST(FLOOR(
               (CAST(syr AS DOUBLE) * srrr - CAST(srr_ AS DOUBLE) * sryr)
               / (CAST(nr AS DOUBLE) * srrr - CAST(srr_ AS DOUBLE) * srr_)
             - (CAST(syl AS DOUBLE) * srrl - CAST(srl AS DOUBLE) * sryl)
               / (CAST(nl AS DOUBLE) * srrl - CAST(srl AS DOUBLE) * srl))
               AS BIGINT) AS tau_e4,
           CAST(FLOOR(SQRT(
               ((CAST(nl AS DOUBLE) * syyl - CAST(syl AS DOUBLE) * syl)
                  * (CAST(nl AS DOUBLE) * srrl - CAST(srl AS DOUBLE) * srl)
                - POW(CAST(nl AS DOUBLE) * sryl
                      - CAST(srl AS DOUBLE) * syl, 2))
               / (CAST(nl AS DOUBLE)
                  * (CAST(nl AS DOUBLE) * srrl - CAST(srl AS DOUBLE) * srl))
               / (nl - 2.0) * CAST(srrl AS DOUBLE)
               / (CAST(nl AS DOUBLE) * srrl - CAST(srl AS DOUBLE) * srl)
             + ((CAST(nr AS DOUBLE) * syyr - CAST(syr AS DOUBLE) * syr)
                  * (CAST(nr AS DOUBLE) * srrr
                     - CAST(srr_ AS DOUBLE) * srr_)
                - POW(CAST(nr AS DOUBLE) * sryr
                      - CAST(srr_ AS DOUBLE) * syr, 2))
               / (CAST(nr AS DOUBLE)
                  * (CAST(nr AS DOUBLE) * srrr
                     - CAST(srr_ AS DOUBLE) * srr_))
               / (nr - 2.0) * CAST(srrr AS DOUBLE)
               / (CAST(nr AS DOUBLE) * srrr - CAST(srr_ AS DOUBLE) * srr_)
               )) AS BIGINT) AS se_e4
    FROM wide
    """,
)
def events_rdd_sharp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHARP REGRESSION DISCONTINUITY (round 11): users get a frozen
    md5 pseudo-score in [−500, 500); treatment switches on at 0;
    within the ±250 bandwidth, fit a LOCAL LINEAR regression of mean
    user value on the score SEPARATELY on each side and read the
    jump between the two intercepts at the cutoff — the design you
    reach for when eligibility is a hard threshold (credit score,
    minimum balance) and randomization never happened.  Slopes are
    deliberately side-specific (the pooled-slope shortcut biases τ
    when trends differ).

    Exactness: per-user y is the exact integer-division e4 mean
    (domain-bounded, the ts_granger_1lag discipline); per-side
    five-sums are exact bigints; each intercept is the closed-form
    (Σy·Σr² − Σr·Σry)/(nΣr² − (Σr)²) and the SE folds
    RSS/(n−2)·Σr²/Sxx per side — ONE double chain each, floored e4.

    Scale: keyed user aggregate → bandwidth filter → 2-side partial
    aggregate → 1-row pivot; no windows."""
    ev = load(spark, sf_dir, "events")
    score = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("rdd:"), F.col("user_id").cast("string")
                    ).cast("binary")
                ),
                1,
                4,
            ),
            16,
            10,
        ).cast("bigint")
        % 1000
        - 500
    )
    users = ev.groupBy("user_id").agg(
        F.max(score).cast("bigint").alias("r"),
        (
            F.sum(F.floor(F.col("value") * 10000).cast("bigint"))
            / F.count("*")
        )
        .cast("bigint")
        .alias("y"),
    )
    sides = (
        users.filter((F.col("r") > -250) & (F.col("r") < 250))
        .groupBy(
            F.when(F.col("r") >= 0, 1).otherwise(0).alias("side")
        )
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("r").cast("bigint").alias("sr"),
            F.sum("y").cast("bigint").alias("sy"),
            F.sum(F.col("r") * F.col("r")).cast("bigint").alias("srr"),
            F.sum(F.col("r") * F.col("y")).cast("bigint").alias("sry"),
            F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
        )
    )
    suffix = {0: "l", 1: "r_"}
    cols = ("n", "sr", "sy", "srr", "sry", "syy")
    rename = {
        (0, "n"): "nl", (0, "sr"): "srl", (0, "sy"): "syl",
        (0, "srr"): "srrl", (0, "sry"): "sryl", (0, "syy"): "syyl",
        (1, "n"): "nr", (1, "sr"): "srr_", (1, "sy"): "syr",
        (1, "srr"): "srrr", (1, "sry"): "sryr", (1, "syy"): "syyr",
    }
    wide = sides.groupBy().agg(
        *[
            F.max(F.when(F.col("side") == s, F.col(c))).alias(rename[(s, c)])
            for s in (0, 1)
            for c in cols
        ]
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731

    def _alpha(n, sr, sy, srr, sry):
        return (d(sy) * d(srr) - d(sr) * d(sry)) / (
            d(n) * d(srr) - d(sr) * d(sr)
        )

    def _var_alpha(n, sr, sy, srr, sry, syy):
        b = d(n) * d(srr) - d(sr) * d(sr)
        c_ = d(n) * d(syy) - d(sy) * d(sy)
        a = d(n) * d(sry) - d(sr) * d(sy)
        # RSS = (B*C - A^2)/(n*B); s^2 = RSS/(n-2); Var(alpha) = s^2*Σr²/B
        return (c_ * b - a * a) / (d(n) * b) / (d(n) - 2.0) * d(srr) / b

    al = _alpha("nl", "srl", "syl", "srrl", "sryl")
    ar = _alpha("nr", "srr_", "syr", "srrr", "sryr")
    se = F.sqrt(
        _var_alpha("nl", "srl", "syl", "srrl", "sryl", "syyl")
        + _var_alpha("nr", "srr_", "syr", "srrr", "sryr", "syyr")
    )
    return wide.select(
        F.col("nl").cast("bigint").alias("n_left"),
        F.col("nr").cast("bigint").alias("n_right"),
        F.floor(al).cast("bigint").alias("alpha_left_e4"),
        F.floor(ar).cast("bigint").alias("alpha_right_e4"),
        F.floor(ar - al).cast("bigint").alias("tau_e4"),
        F.floor(se).cast("bigint").alias("se_e4"),
    )


@query(
    "anon_microaggregate",
    """
    WITH base AS (
        SELECT c_mktsegment,
               c_custkey,
               CAST(FLOOR(c_acctbal * 100) AS BIGINT) AS v
        FROM customer
    ), ranked AS (
        SELECT c_mktsegment, v,
               CAST((row_number() OVER (PARTITION BY c_mktsegment
                                        ORDER BY v ASC, c_custkey ASC) - 1)
                    // 10 AS BIGINT) AS group_id
        FROM base
    ), grouped AS (
        SELECT c_mktsegment, group_id,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(v) // COUNT(*) AS BIGINT) AS mean_bal_e2
        FROM ranked GROUP BY 1, 2
    )
    SELECT g.c_mktsegment, g.group_id, g.n, g.mean_bal_e2,
           CAST(SUM((r.v - g.mean_bal_e2) * (r.v - g.mean_bal_e2))
                AS BIGINT) AS ss_loss
    FROM ranked r
    JOIN grouped g
      ON r.c_mktsegment = g.c_mktsegment AND r.group_id = g.group_id
    GROUP BY g.c_mktsegment, g.group_id, g.n, g.mean_bal_e2
    ORDER BY g.c_mktsegment, g.group_id
    """,
)
def anon_microaggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MICROAGGREGATION k=10 (round 11): within each market segment,
    sort balances and fuse consecutive runs of 10 records into their
    group mean — the numeric-attribute anonymization that k-anonymity
    (anon_k_suppress: categorical suppression) cannot do: every
    published balance is now shared by ≥10 customers, and the per-
    group SSE is the information-loss ledger the privacy officer
    trades off against k.  The fixed-size sorted-run heuristic is the
    univariate optimal-in-class MDAV special case.

    Exactness: balances as e2 integers; group means are exact integer
    division; SSE terms are exact bigint squares around that integer
    mean — no floats in the output at all.

    Scale: the ranking window is KEYED by segment (never global); two
    keyed aggregates and one keyed join — the scd/batch shapes.  At
    100 TB the segment key is whatever partitions the table; a
    single monster segment range-partitions on (v, custkey) with a
    distributed rank."""
    cust = load(spark, sf_dir, "customer")
    base = cust.select(
        "c_mktsegment",
        "c_custkey",
        F.floor(F.col("c_acctbal") * 100).cast("bigint").alias("v"),
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("v").asc(), F.col("c_custkey").asc()
    )
    ranked = base.select(
        "c_mktsegment",
        "v",
        (F.row_number().over(w) - 1).alias("rn0"),
    ).select(
        "c_mktsegment",
        "v",
        # exact int64 DIV matching the oracle's `//` (ADVICE r11)
        F.expr("CAST(rn0 DIV 10 AS BIGINT)").alias("group_id"),
    )
    grouped = ranked.groupBy("c_mktsegment", "group_id").agg(
        F.count("*").cast("bigint").alias("n"),
        F.expr("CAST(sum(v) DIV count(*) AS BIGINT)").alias(
            "mean_bal_e2"
        ),
    )
    return (
        ranked.join(grouped, ["c_mktsegment", "group_id"])
        .groupBy("c_mktsegment", "group_id", "n", "mean_bal_e2")
        .agg(
            F.sum(
                (F.col("v") - F.col("mean_bal_e2"))
                * (F.col("v") - F.col("mean_bal_e2"))
            )
            .cast("bigint")
            .alias("ss_loss")
        )
        .orderBy("c_mktsegment", "group_id")
    )


@query(
    "events_parallel_trends_placebo",
    """
    WITH base AS (
        SELECT CAST(FLOOR(value * 10000) AS BIGINT) AS v_e4,
               CAST(CAST('0x' || substr(md5('did:' ||
                    CAST(user_id AS VARCHAR)), 1, 4) AS BIGINT) % 2
                    AS BIGINT) AS treat,
               CAST(CASE WHEN day(ts) >= 8 THEN 1 ELSE 0 END
                    AS BIGINT) AS post
        FROM events WHERE day(ts) <= 15
    ), cell AS (
        SELECT treat, post,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(v_e4) AS BIGINT) AS s,
               CAST(SUM(v_e4 * v_e4) AS BIGINT) AS ss
        FROM base GROUP BY treat, post
    ), wide AS (
        SELECT MAX(CASE WHEN treat = 0 AND post = 0 THEN n END) AS n00,
               MAX(CASE WHEN treat = 0 AND post = 0 THEN s END) AS s00,
               MAX(CASE WHEN treat = 0 AND post = 0 THEN ss END) AS ss00,
               MAX(CASE WHEN treat = 0 AND post = 1 THEN n END) AS n01,
               MAX(CASE WHEN treat = 0 AND post = 1 THEN s END) AS s01,
               MAX(CASE WHEN treat = 0 AND post = 1 THEN ss END) AS ss01,
               MAX(CASE WHEN treat = 1 AND post = 0 THEN n END) AS n10,
               MAX(CASE WHEN treat = 1 AND post = 0 THEN s END) AS s10,
               MAX(CASE WHEN treat = 1 AND post = 0 THEN ss END) AS ss10,
               MAX(CASE WHEN treat = 1 AND post = 1 THEN n END) AS n11,
               MAX(CASE WHEN treat = 1 AND post = 1 THEN s END) AS s11,
               MAX(CASE WHEN treat = 1 AND post = 1 THEN ss END) AS ss11
        FROM cell
    )
    SELECT CAST(n00 AS BIGINT) AS n00, CAST(n01 AS BIGINT) AS n01,
           CAST(n10 AS BIGINT) AS n10, CAST(n11 AS BIGINT) AS n11,
           CAST(FLOOR((CAST(s11 AS DOUBLE) / n11
                       - CAST(s10 AS DOUBLE) / n10)
                      - (CAST(s01 AS DOUBLE) / n01
                         - CAST(s00 AS DOUBLE) / n00)) AS BIGINT)
               AS placebo_did_e4,
           CAST(FLOOR(
               (((CAST(s11 AS DOUBLE) / n11 - CAST(s10 AS DOUBLE) / n10)
                 - (CAST(s01 AS DOUBLE) / n01
                    - CAST(s00 AS DOUBLE) / n00))
                / sqrt(
               ((CAST(ss00 AS DOUBLE) - CAST(s00 AS DOUBLE)
                 * CAST(s00 AS DOUBLE) / n00) / (n00 - 1.0)) / n00
             + ((CAST(ss01 AS DOUBLE) - CAST(s01 AS DOUBLE)
                 * CAST(s01 AS DOUBLE) / n01) / (n01 - 1.0)) / n01
             + ((CAST(ss10 AS DOUBLE) - CAST(s10 AS DOUBLE)
                 * CAST(s10 AS DOUBLE) / n10) / (n10 - 1.0)) / n10
             + ((CAST(ss11 AS DOUBLE) - CAST(s11 AS DOUBLE)
                 * CAST(s11 AS DOUBLE) / n11) / (n11 - 1.0)) / n11))
               * 10000) AS BIGINT) AS placebo_t_e4
    FROM wide
    """,
)
def events_parallel_trends_placebo(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PARALLEL-TRENDS PLACEBO (round 11): rerun events_did_estimator
    ENTIRELY INSIDE the pre-period (days 1-7 vs 8-15, same frozen
    md5 'did:' arms as the real estimator — deliberately the same
    prefix, because the placebo must test the arms you actually
    use), where the true effect is zero by construction.  A placebo
    t beyond ±2 means the arms were already trending apart before
    the cutoff and the headline DiD is uninterpretable — the ONE
    diagnostic every DiD referee asks for first; the estimator and
    its refutation test now ship as a pair.

    Exactness: identical cell-sum machinery to events_did_estimator
    (exact e4 bigint three-sums per cell, ONE double chain for the
    point and t, floored e4).

    Scale: one filtered pass → 4-cell partial aggregate → 1-row
    pivot — the events_did_estimator shape exactly."""
    ev = load(spark, sf_dir, "events")
    treat = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("did:"), F.col("user_id").cast("string")
                    ).cast("binary")
                ),
                1,
                4,
            ),
            16,
            10,
        ).cast("bigint")
        % 2
    )
    base = ev.filter(F.dayofmonth("ts") <= 15).select(
        F.floor(F.col("value") * 10000).cast("bigint").alias("v_e4"),
        treat.alias("treat"),
        F.when(F.dayofmonth("ts") >= 8, 1)
        .otherwise(0)
        .cast("bigint")
        .alias("post"),
    )
    cell = base.groupBy("treat", "post").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("v_e4").cast("bigint").alias("s"),
        F.sum(F.col("v_e4") * F.col("v_e4")).cast("bigint").alias("ss"),
    )

    def _pick(t: int, p: int, col: str):
        return F.max(
            F.when((F.col("treat") == t) & (F.col("post") == p), F.col(col))
        ).alias(f"{col}{t}{p}")

    wide = cell.groupBy().agg(
        *[_pick(t, p, c) for t in (0, 1) for p in (0, 1) for c in ("n", "s", "ss")]
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    did = (d("s11") / d("n11") - d("s10") / d("n10")) - (
        d("s01") / d("n01") - d("s00") / d("n00")
    )

    def _cell_var_over_n(t: int, p: int):
        n, s, ss = d(f"n{t}{p}"), d(f"s{t}{p}"), d(f"ss{t}{p}")
        return ((ss - s * s / n) / (n - 1.0)) / n

    se = F.sqrt(
        _cell_var_over_n(0, 0)
        + _cell_var_over_n(0, 1)
        + _cell_var_over_n(1, 0)
        + _cell_var_over_n(1, 1)
    )
    return wide.select(
        F.col("n00").cast("bigint").alias("n00"),
        F.col("n01").cast("bigint").alias("n01"),
        F.col("n10").cast("bigint").alias("n10"),
        F.col("n11").cast("bigint").alias("n11"),
        F.floor(did).cast("bigint").alias("placebo_did_e4"),
        F.floor(did / se * 10000).cast("bigint").alias("placebo_t_e4"),
    )


_ENTROPY_COLUMNS = ("o_orderstatus", "o_orderpriority")


def _entropy_oracle_sql() -> str:
    branches = []
    for col in _ENTROPY_COLUMNS:
        branches.append(f"""
        SELECT '{col}' AS col_name,
               CAST(t.nr AS BIGINT) AS n_rows,
               CAST(COUNT(*) AS BIGINT) AS n_distinct,
               CAST(SUM(CAST(FLOOR(CAST(cc.c AS DOUBLE)
                        * LN(CAST(t.nr AS DOUBLE)
                             / CAST(cc.c AS DOUBLE)) * 1000000) AS BIGINT))
                    AS BIGINT) AS s_terms_e6
        FROM (
            SELECT {col}, CAST(COUNT(*) AS BIGINT) AS c
            FROM orders GROUP BY 1
        ) cc, (SELECT CAST(COUNT(*) AS BIGINT) AS nr FROM orders) t
        GROUP BY t.nr""")
    return (
        "SELECT col_name, n_rows, n_distinct, "
        "CAST(s_terms_e6 // n_rows AS BIGINT) AS entropy_e6, "
        "CASE WHEN n_distinct > 1 THEN "
        "CAST(FLOOR(CAST(s_terms_e6 // n_rows AS DOUBLE) "
        "     / LN(CAST(n_distinct AS DOUBLE)) ) AS BIGINT) END "
        "AS norm_entropy_e6 "
        "FROM (" + " UNION ALL ".join(branches) + ") ORDER BY col_name"
    )


@query("profile_column_entropy", _entropy_oracle_sql())
def profile_column_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PER-COLUMN SHANNON ENTROPY profile (round 11) over the orders
    categoricals: H = Σ (c/N)·ln(N/c) plus the ln(k)-normalized form
    — the one-number answer to 'is this column worth a dictionary /
    a partition key / a zorder slot': H near ln(k) means uniform
    (partition-friendly, dictionary-cheap), H near 0 means one
    dominant value (predicate-selectivity trap; skew-join risk).
    The datamgmt complement to profile_skew (per-KEY counts) and
    agg_entropy (one column) — a fixed audited column LIST, the
    profile_functional_dependency pattern.

    Exactness: value counts exact; each count's c·ln(N/c) term floors
    e6 BEFORE the order-free bigint sum; entropy is the exact integer
    division of that sum by N; normalization is one double chain.

    Scale: one keyed aggregate per audited column (unioned — one scan
    each, map-side partials; a shared-scan rewrite via grouping sets
    is the 100 TB refinement); value-domain-bounded finish."""
    orders = load(spark, sf_dir, "orders")
    outs = []
    for col in _ENTROPY_COLUMNS:
        counts = orders.groupBy(F.col(col).alias("val")).agg(
            F.count("*").cast("bigint").alias("c")
        )
        tot = counts.agg(F.sum("c").cast("bigint").alias("n_rows"))
        folded = (
            counts.crossJoin(F.broadcast(tot))
            .agg(
                F.max("n_rows").cast("bigint").alias("n_rows"),
                F.count("*").cast("bigint").alias("n_distinct"),
                F.sum(
                    F.floor(
                        F.col("c").cast("double")
                        * F.log(
                            F.col("n_rows").cast("double")
                            / F.col("c").cast("double")
                        )
                        * 1000000
                    ).cast("bigint")
                )
                .cast("bigint")
                .alias("s_terms_e6"),
            )
            .select(
                F.lit(col).alias("col_name"),
                "n_rows",
                "n_distinct",
                # exact int64 DIV matching the oracle's `//`, and a
                # single-valued-column guard: ln(n_distinct)=0 would
                # push NaN/inf into FLOOR::BIGINT (ADVICE r11)
                F.expr(
                    "CAST(s_terms_e6 DIV n_rows AS BIGINT)"
                ).alias("entropy_e6"),
                F.when(
                    F.col("n_distinct") > 1,
                    F.floor(
                        F.expr(
                            "CAST(s_terms_e6 DIV n_rows AS BIGINT)"
                        ).cast("double")
                        / F.log(F.col("n_distinct").cast("double"))
                    ).cast("bigint"),
                ).alias("norm_entropy_e6"),
            )
        )
        outs.append(folded)
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("col_name")


@query(
    "sample_systematic_interval",
    """
    WITH ranked AS (
        SELECT o_orderkey, o_custkey, o_totalprice,
               row_number() OVER (ORDER BY o_orderkey) AS rn
        FROM orders
    )
    SELECT o_orderkey, o_custkey,
           CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS price_e2
    FROM ranked
    WHERE (rn - 1) % 10 = CAST(CAST('0x' || substr(md5('sys:seed'), 1, 4)
                                AS BIGINT) % 10 AS BIGINT)
    ORDER BY o_orderkey
    """,
)
def sample_systematic_interval(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """SYSTEMATIC INTERVAL SAMPLE (round 11): every 10th order in key
    order, with the phase drawn from a frozen md5 seed — the survey-
    methods member the sampling family was missing (deterministic
    hash sampling = per-row Bernoulli-like; reservoir = fixed-size;
    stratified/Neyman = allocation; SYSTEMATIC = fixed interval over
    an ordered frame, the pattern auditors and quality inspectors
    specify because coverage is guaranteed to be evenly spread over
    the ordering — and the one that silently BREAKS when the
    ordering is periodic with the interval, which is why the frozen
    random phase matters).

    Exactness: rank over the unique key is a total order; the phase
    is the shared md5 literal; membership is pure modular
    arithmetic.

    Scale: the global row_number is the one honest cost — at 100 TB
    you derive rank from a monotonic key range-partition (zipWithIndex
    per sorted partition + offset cumsum), the documented
    seq_global_two_pass shape this op composes with."""
    orders = load(spark, sf_dir, "orders")
    w = Window.orderBy("o_orderkey")
    phase = (
        F.conv(F.substring(F.md5(F.lit("sys:seed").cast("binary")), 1, 4), 16, 10)
        .cast("bigint")
        % 10
    )
    ranked = orders.select(
        "o_orderkey",
        "o_custkey",
        F.floor(F.col("o_totalprice") * 100).cast("bigint").alias("price_e2"),
        F.row_number().over(w).alias("rn"),
    )
    return (
        ranked.filter((F.col("rn") - 1) % 10 == phase)
        .select("o_orderkey", "o_custkey", "price_e2")
        .orderBy("o_orderkey")
    )


@query(
    "events_quantile_treatment_effect",
    """
    WITH base AS (
        SELECT CAST(FLOOR(value * 10000) AS BIGINT) AS v,
               CAST(CAST('0x' || substr(md5('did:' ||
                    CAST(user_id AS VARCHAR)), 1, 4) AS BIGINT) % 2
                    AS BIGINT) AS treat
        FROM events
    ), arms AS (
        SELECT treat,
               CAST(quantile_disc(v, 0.1) AS BIGINT) AS q1,
               CAST(quantile_disc(v, 0.2) AS BIGINT) AS q2,
               CAST(quantile_disc(v, 0.3) AS BIGINT) AS q3,
               CAST(quantile_disc(v, 0.4) AS BIGINT) AS q4,
               CAST(quantile_disc(v, 0.5) AS BIGINT) AS q5,
               CAST(quantile_disc(v, 0.6) AS BIGINT) AS q6,
               CAST(quantile_disc(v, 0.7) AS BIGINT) AS q7,
               CAST(quantile_disc(v, 0.8) AS BIGINT) AS q8,
               CAST(quantile_disc(v, 0.9) AS BIGINT) AS q9
        FROM base GROUP BY treat
    ), long AS (
        SELECT treat, CAST(k.k AS BIGINT) AS decile,
               CASE k.k WHEN 1 THEN q1 WHEN 2 THEN q2 WHEN 3 THEN q3
                        WHEN 4 THEN q4 WHEN 5 THEN q5 WHEN 6 THEN q6
                        WHEN 7 THEN q7 WHEN 8 THEN q8 ELSE q9 END AS q
        FROM arms, (SELECT unnest(range(1, 10)) AS k) k
    )
    SELECT t.decile, t.q AS q_treat, c.q AS q_ctrl,
           CAST(t.q - c.q AS BIGINT) AS qte_e4
    FROM long t JOIN long c
      ON t.decile = c.decile AND t.treat = 1 AND c.treat = 0
    ORDER BY t.decile
    """,
)
def events_quantile_treatment_effect(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """QUANTILE TREATMENT EFFECTS (round 11): the per-decile gap
    between the treated and control value distributions (same frozen
    md5 'did:' arms as the DiD family) — the DISTRIBUTIONAL causal
    readout an average effect hides: a zero ATE with positive upper-
    decile QTE and negative lower-decile QTE means the treatment
    helped heavy users at light users' expense, which changes the
    launch decision entirely.  Completes the causal kit's estimand
    axis: ATE (did/ab), LATE (iv), cutoff-local (rdd), and now the
    quantile process.

    Exactness: both arms' deciles are discrete (type-1) quantiles of
    exact e4 integers — no interpolation anywhere; the QTE per
    decile is an exact integer difference.

    Scale: one pass → per-arm disc-quantile aggregate (the
    agg_quantiles_grouped shape); 9-row finish."""
    ev = load(spark, sf_dir, "events")
    treat = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("did:"), F.col("user_id").cast("string")
                    ).cast("binary")
                ),
                1,
                4,
            ),
            16,
            10,
        ).cast("bigint")
        % 2
    )
    base = ev.select(
        F.floor(F.col("value") * 10000).cast("bigint").alias("v"),
        treat.alias("treat"),
    )
    # Spark's percentile_disc needs a FOLDABLE fraction, so the nine
    # deciles are nine literal aggregates per arm, unpivoted after.
    arms = base.groupBy("treat").agg(
        *[
            F.expr(
                f"percentile_disc({k / 10.0}) WITHIN GROUP (ORDER BY v)"
            )
            .cast("bigint")
            .alias(f"q{k}")
            for k in range(1, 10)
        ]
    )
    stack = F.expr(
        "stack(9, "
        + ", ".join(f"CAST({k} AS BIGINT), q{k}" for k in range(1, 10))
        + ") AS (decile, q)"
    )
    long = arms.select("treat", stack)
    qt = long.filter(F.col("treat") == 1).select(
        "decile", F.col("q").alias("q_treat")
    )
    qc = long.filter(F.col("treat") == 0).select(
        "decile", F.col("q").alias("q_ctrl")
    )
    return (
        qt.join(qc, "decile")
        .select(
            "decile",
            "q_treat",
            "q_ctrl",
            (F.col("q_treat") - F.col("q_ctrl"))
            .cast("bigint")
            .alias("qte_e4"),
        )
        .orderBy("decile")
    )


@query(
    "anon_rank_swap",
    """
    WITH ranked AS (
        SELECT c_mktsegment,
               CAST(FLOOR(c_acctbal * 100) AS BIGINT) AS v,
               CAST(row_number() OVER (PARTITION BY c_mktsegment
                    ORDER BY c_acctbal, c_custkey) AS BIGINT) AS rnk,
               CAST(COUNT(*) OVER (PARTITION BY c_mktsegment) AS BIGINT)
                   AS n
        FROM customer
    ), swapped AS (
        SELECT r.c_mktsegment, r.v,
               CAST(COALESCE(p.v, r.v) AS BIGINT) AS v_swapped
        FROM ranked r
        LEFT JOIN ranked p
          ON p.c_mktsegment = r.c_mktsegment
         AND p.rnk = CASE WHEN r.rnk % 2 = 1 AND r.rnk < r.n
                          THEN r.rnk + 1
                          WHEN r.rnk % 2 = 0 THEN r.rnk - 1
                          ELSE r.rnk END
    )
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(*) FILTER (v != v_swapped) AS BIGINT) AS n_swapped,
           CAST(SUM(ABS(v - v_swapped)) AS BIGINT) AS sum_abs_disp_e2,
           CAST(SUM(v) AS BIGINT) AS sum_orig_e2,
           CAST(SUM(v_swapped) AS BIGINT) AS sum_swapped_e2
    FROM swapped GROUP BY 1 ORDER BY 1
    """,
)
def anon_rank_swap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANK SWAPPING (round 11): within each segment, sort balances
    and exchange rank-adjacent pairs (1↔2, 3↔4, …; an odd tail keeps
    its value) — the classic statistical-disclosure-control
    perturbation that BREAKS record linkage (no published value
    belongs to its record) while PROVABLY preserving every
    segment-level distributional statistic exactly (the published
    multiset of values is identical — the audit columns show
    sum_orig == sum_swapped by construction while sum_abs_disp
    measures the per-record protection distance).  Complements
    anon_microaggregate (fuse to means, lossy) with the
    permutation-based member (lossless in distribution, lossy in
    linkage).

    Exactness: ranks over a total order, partner lookup by exact rank
    arithmetic, all sums exact e2 bigints.

    Scale: one keyed rank window + one self-join on (segment, rank) —
    both shuffle on the segment key the table is already
    partitioned by."""
    cust = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    wn = Window.partitionBy("c_mktsegment")
    ranked = cust.select(
        "c_mktsegment",
        F.floor(F.col("c_acctbal") * 100).cast("bigint").alias("v"),
        F.row_number().over(w).cast("bigint").alias("rnk"),
        F.count("*").over(wn).cast("bigint").alias("n"),
    )
    partner = F.when(
        (F.col("rnk") % 2 == 1) & (F.col("rnk") < F.col("n")),
        F.col("rnk") + 1,
    ).when(F.col("rnk") % 2 == 0, F.col("rnk") - 1).otherwise(F.col("rnk"))
    r = ranked.select(
        "c_mktsegment", "v", "rnk", partner.alias("p_rnk")
    )
    p = ranked.select(
        F.col("c_mktsegment").alias("p_seg"),
        F.col("v").alias("p_v"),
        F.col("rnk").alias("p_rnk2"),
    )
    swapped = r.join(
        p,
        (F.col("c_mktsegment") == F.col("p_seg"))
        & (F.col("p_rnk") == F.col("p_rnk2")),
        "left",
    ).select(
        "c_mktsegment",
        "v",
        F.coalesce(F.col("p_v"), F.col("v")).cast("bigint").alias("v_swapped"),
    )
    return (
        swapped.groupBy("c_mktsegment")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.count_if(F.col("v") != F.col("v_swapped"))
            .cast("bigint")
            .alias("n_swapped"),
            F.sum(F.abs(F.col("v") - F.col("v_swapped")))
            .cast("bigint")
            .alias("sum_abs_disp_e2"),
            F.sum("v").cast("bigint").alias("sum_orig_e2"),
            F.sum("v_swapped").cast("bigint").alias("sum_swapped_e2"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "events_did_event_study",
    """
    WITH base AS (
        SELECT CAST(day(ts) AS BIGINT) AS d,
               CAST(FLOOR(value * 10000) AS BIGINT) AS v,
               CAST(CAST('0x' || substr(md5('did:' ||
                    CAST(user_id AS VARCHAR)), 1, 4) AS BIGINT) % 2
                    AS BIGINT) AS treat
        FROM events
    ), cells AS (
        SELECT d, treat,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(v) AS BIGINT) AS s
        FROM base GROUP BY 1, 2
    ), gaps AS (
        SELECT t.d,
               CAST(t.d - 16 AS BIGINT) AS rel_day,
               t.n AS n_treat, c.n AS n_ctrl,
               CAST(FLOOR(CAST(t.s AS DOUBLE) / t.n
                          - CAST(c.s AS DOUBLE) / c.n) AS BIGINT)
                   AS gap_e4
        FROM cells t JOIN cells c ON t.d = c.d
        WHERE t.treat = 1 AND c.treat = 0
    ), pre AS (
        SELECT CAST(SUM(gap_e4) // COUNT(*) AS BIGINT) AS pre_mean
        FROM gaps WHERE rel_day < 0
    )
    SELECT g.rel_day, g.n_treat, g.n_ctrl, g.gap_e4,
           CAST(g.gap_e4 - p.pre_mean AS BIGINT) AS centered_gap_e4
    FROM gaps g, pre p ORDER BY g.rel_day
    """,
)
def events_did_event_study(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DYNAMIC DiD / EVENT STUDY (round 11): the per-day treated-vs-
    control mean gap for EVERY day relative to the day-16 cutoff,
    centered on the pre-period average gap — the leads-and-lags plot
    modern DiD practice demands before trusting any pooled estimate
    (events_did_estimator gives ONE number; events_parallel_trends_
    placebo tests ONE pre-split; this shows the whole dynamic path:
    flat leads = credible design, drifting leads = the r10 placebo
    would also have caught it, and the lags show effect ramp/decay
    that a pooled post coefficient averages away).  Same frozen
    'did:' arms as the rest of the family, deliberately.

    Exactness: per-(day, arm) cell sums exact; each day's gap is ONE
    double chain floored e4; the pre-period centering is an exact
    integer division and subtraction of already-floored integers.

    Scale: one pass → |days|×2 cell aggregate (map-side) → a
    day-keyed self-join of the tiny cell table → calendar-bounded
    finish."""
    ev = load(spark, sf_dir, "events")
    treat = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("did:"), F.col("user_id").cast("string")
                    ).cast("binary")
                ),
                1,
                4,
            ),
            16,
            10,
        ).cast("bigint")
        % 2
    )
    base = ev.select(
        F.dayofmonth("ts").cast("bigint").alias("d"),
        F.floor(F.col("value") * 10000).cast("bigint").alias("v"),
        treat.alias("treat"),
    )
    cells = base.groupBy("d", "treat").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("v").cast("bigint").alias("s"),
    )
    t = cells.filter(F.col("treat") == 1).select(
        "d",
        F.col("n").alias("n_treat"),
        F.col("s").alias("s_t"),
    )
    c = cells.filter(F.col("treat") == 0).select(
        "d",
        F.col("n").alias("n_ctrl"),
        F.col("s").alias("s_c"),
    )
    gaps = t.join(c, "d").select(
        (F.col("d") - 16).cast("bigint").alias("rel_day"),
        "n_treat",
        "n_ctrl",
        F.floor(
            F.col("s_t").cast("double") / F.col("n_treat").cast("double")
            - F.col("s_c").cast("double") / F.col("n_ctrl").cast("double")
        )
        .cast("bigint")
        .alias("gap_e4"),
    )
    pre = gaps.filter(F.col("rel_day") < 0).agg(
        # exact int64 DIV matching the oracle's `//` (ADVICE r11)
        F.expr("CAST(sum(gap_e4) DIV count(*) AS BIGINT)").alias(
            "pre_mean"
        )
    )
    return (
        gaps.crossJoin(F.broadcast(pre))
        .select(
            "rel_day",
            "n_treat",
            "n_ctrl",
            "gap_e4",
            (F.col("gap_e4") - F.col("pre_mean"))
            .cast("bigint")
            .alias("centered_gap_e4"),
        )
        .orderBy("rel_day")
    )


@query(
    "events_ab_srm_check",
    """
    WITH users AS (
        SELECT user_id,
               CAST(CAST('0x' || substr(md5('srm:' ||
                    CAST(user_id AS VARCHAR)), 1, 4) AS BIGINT) % 2
                    AS BIGINT) AS arm
        FROM events GROUP BY 1
    ), arms AS (
        SELECT CAST(COUNT(*) FILTER (arm = 0) AS BIGINT) AS n0,
               CAST(COUNT(*) FILTER (arm = 1) AS BIGINT) AS n1
        FROM users
    )
    SELECT n0, n1,
           CAST(FLOOR(POW(CAST(n0 - n1 AS DOUBLE), 2)
                      / (n0 + n1) * 1000000) AS BIGINT) AS chi2_e6,
           CAST(FLOOR(CAST(n0 - n1 AS DOUBLE)
                      / SQRT(CAST(n0 + n1 AS DOUBLE)) * 10000)
                AS BIGINT) AS z_e4,
           ABS(CAST(n0 - n1 AS DOUBLE))
               / SQRT(CAST(n0 + n1 AS DOUBLE)) > 3.0 AS srm_flag
    FROM arms
    """,
)
def events_ab_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAMPLE-RATIO MISMATCH check (round 12): is the md5 arm split
    actually 50/50 at the USER level?  The A/B hygiene gate every
    outcome test in this registry (two_proportion_z, iv_wald, uplift,
    DiD placebo) silently assumes — a biased assignment hash, a
    bot-filter applied to one arm, or a logging drop makes every
    downstream effect estimate wrong BEFORE statistics start; SRM
    χ²(1) = (n₀−n₁)²/N against the designed 1:1 is the standard
    pre-test, flagged at |z| > 3 (the industry trigger).

    Exactness: arm counts are exact integers off the user rollup;
    χ² and z are one double chain each floored; the flag compares
    the SAME double both engines compute.

    Scale: one user-keyed reduction to a 1-row readout — nothing
    else; runs before any outcome scan needs to."""
    ev = load(spark, sf_dir, "events")
    arm = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("srm:"), F.col("user_id").cast("string")
                    ).cast("binary")
                ),
                1,
                4,
            ),
            16,
            10,
        ).cast("bigint")
        % 2
    )
    users = ev.groupBy("user_id").agg(F.max(arm).alias("arm"))
    arms = users.agg(
        F.count_if(F.col("arm") == 0).cast("bigint").alias("n0"),
        F.count_if(F.col("arm") == 1).cast("bigint").alias("n1"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    diff = d("n0") - d("n1")
    tot = d("n0") + d("n1")
    return arms.select(
        "n0",
        "n1",
        F.floor(diff * diff / tot * 1000000).cast("bigint").alias(
            "chi2_e6"
        ),
        F.floor(diff / F.sqrt(tot) * 10000).cast("bigint").alias("z_e4"),
        (F.abs(diff) / F.sqrt(tot) > 3.0).alias("srm_flag"),
    )


@query(
    "events_cuped_adjustment",
    """
    WITH users AS (
        SELECT user_id,
               CAST(CAST('0x' || substr(md5('srm:' ||
                    CAST(user_id AS VARCHAR)), 1, 4) AS BIGINT) % 2
                    AS BIGINT) AS arm,
               CAST(SUM(CASE WHEN day(ts) <= 15
                    THEN CAST(FLOOR(value * 10000) AS BIGINT)
                    ELSE 0 END) AS BIGINT) AS pre,
               CAST(SUM(CASE WHEN day(ts) > 15
                    THEN CAST(FLOOR(value * 10000) AS BIGINT)
                    ELSE 0 END) AS BIGINT) AS post
        FROM events GROUP BY 1
    ), s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(pre) AS BIGINT) AS sx,
               CAST(SUM(post) AS BIGINT) AS sy,
               CAST(SUM(CAST(pre AS HUGEINT) * pre) AS DECIMAL(38, 0))
                   AS sxx,
               CAST(SUM(CAST(pre AS HUGEINT) * post) AS DECIMAL(38, 0))
                   AS sxy,
               CAST(SUM(CAST(post AS HUGEINT) * post) AS DECIMAL(38, 0))
                   AS syy,
               CAST(COUNT(*) FILTER (arm = 1) AS BIGINT) AS n1,
               CAST(SUM(post) FILTER (arm = 1) AS BIGINT) AS sy1,
               CAST(SUM(pre) FILTER (arm = 1) AS BIGINT) AS sx1
        FROM users
    ), theta AS (
        SELECT n, n1, sx, sy, sx1, sy1,
               (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                - CAST(sx AS DOUBLE) * sy)
               / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * sx) AS th,
               1.0 - (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                      - CAST(sx AS DOUBLE) * sy)
                     * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                        - CAST(sx AS DOUBLE) * sy)
                     / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * sx)
                        * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                           - CAST(sy AS DOUBLE) * sy)) AS var_ratio
        FROM s
    )
    SELECT n, n1,
           CAST(FLOOR((CAST(sy1 AS DOUBLE) / n1
                       - CAST(sy - sy1 AS DOUBLE) / (n - n1))) AS BIGINT)
               AS raw_effect_e4,
           CAST(FLOOR(((CAST(sy1 AS DOUBLE) / n1
                        - th * (CAST(sx1 AS DOUBLE) / n1))
                       - (CAST(sy - sy1 AS DOUBLE) / (n - n1)
                          - th * (CAST(sx - sx1 AS DOUBLE) / (n - n1)))))
                AS BIGINT) AS cuped_effect_e4,
           CAST(FLOOR(th * 1000000) AS BIGINT) AS theta_e6,
           CAST(FLOOR(var_ratio * 1000000) AS BIGINT) AS var_ratio_e6
    FROM theta
    """,
)
def events_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance-reduced A/B estimator (round 12): adjust each
    arm's post-period mean by θ·(pre-period mean), θ =
    cov(pre,post)/var(pre) — Deng et al.'s industry-standard trick
    that removes the share of outcome variance explained by
    pre-experiment behavior (var_ratio = 1−ρ² is the fraction of
    variance REMAINING — the experiment-duration multiplier you
    save). Completes the causal shelf from the other end than
    events_did_event_study: DiD needs parallel trends; CUPED only
    needs pre-period correlation and a randomized split (whose
    health events_ab_srm_check gates — the two rows share the same
    md5 arm draw deliberately).

    Exactness: per-user pre/post sums are exact e4 integers; the
    five global moments accumulate in decimal(38,0)/HUGEINT
    (pre·post products overflow int64 at sf10 user volumes — the
    gini discipline at design time); θ, both effects and the
    variance ratio are ONE shared double chain each, floored.

    Scale: one user-keyed reduction, a 1-row moment table, a 1-row
    readout — the whole adjustment is free at any corpus size."""
    ev = load(spark, sf_dir, "events")
    arm = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("srm:"), F.col("user_id").cast("string")
                    ).cast("binary")
                ),
                1,
                4,
            ),
            16,
            10,
        ).cast("bigint")
        % 2
    )
    v = F.floor(F.col("value") * 10000).cast("bigint")
    users = ev.groupBy("user_id").agg(
        F.max(arm).alias("arm"),
        F.sum(F.when(F.dayofmonth("ts") <= 15, v).otherwise(0))
        .cast("bigint")
        .alias("pre"),
        F.sum(F.when(F.dayofmonth("ts") > 15, v).otherwise(0))
        .cast("bigint")
        .alias("post"),
    )
    d38 = "decimal(38,0)"
    s = users.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("pre").cast("bigint").alias("sx"),
        F.sum("post").cast("bigint").alias("sy"),
        F.sum(F.col("pre").cast(d38) * F.col("pre")).cast(d38).alias("sxx"),
        F.sum(F.col("pre").cast(d38) * F.col("post"))
        .cast(d38)
        .alias("sxy"),
        F.sum(F.col("post").cast(d38) * F.col("post"))
        .cast(d38)
        .alias("syy"),
        F.count_if(F.col("arm") == 1).cast("bigint").alias("n1"),
        F.sum(F.when(F.col("arm") == 1, F.col("post")))
        .cast("bigint")
        .alias("sy1"),
        F.sum(F.when(F.col("arm") == 1, F.col("pre")))
        .cast("bigint")
        .alias("sx1"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    num = d("n") * d("sxy") - d("sx") * F.col("sy")
    dx = d("n") * d("sxx") - d("sx") * F.col("sx")
    dy = d("n") * d("syy") - d("sy") * F.col("sy")
    th = num / dx
    var_ratio = 1.0 - num * num / (dx * dy)
    raw = d("sy1") / F.col("n1") - (d("sy") - F.col("sy1")) / (
        F.col("n") - F.col("n1")
    )
    cuped = (d("sy1") / F.col("n1") - th * (d("sx1") / F.col("n1"))) - (
        (d("sy") - F.col("sy1")) / (F.col("n") - F.col("n1"))
        - th
        * ((d("sx") - F.col("sx1")) / (F.col("n") - F.col("n1")))
    )
    return s.select(
        "n",
        "n1",
        F.floor(raw).cast("bigint").alias("raw_effect_e4"),
        F.floor(cuped).cast("bigint").alias("cuped_effect_e4"),
        F.floor(th * 1000000).cast("bigint").alias("theta_e6"),
        F.floor(var_ratio * 1000000).cast("bigint").alias("var_ratio_e6"),
    )


@query(
    "sample_ess_diagnostic",
    """
    WITH weighted AS (
        SELECT source,
               CAST(n_chars AS BIGINT) AS w,
               CAST(LEAST(n_chars, 2000) AS BIGINT) AS wc
        FROM documents
    ), cells AS (
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(w) AS BIGINT) AS sw,
               CAST(SUM(w * w) AS BIGINT) AS sww,
               CAST(SUM(wc) AS BIGINT) AS swc,
               CAST(SUM(wc * wc) AS BIGINT) AS swwc
        FROM weighted GROUP BY source
    )
    SELECT source, n_docs, sw, sww,
           CAST(FLOOR(CAST(sw AS DOUBLE) * sw / sww) AS BIGINT) AS ess,
           CAST(FLOOR(CAST(sw AS DOUBLE) * sw / sww / n_docs * 1000000)
                AS BIGINT) AS ess_share_e6,
           CAST(FLOOR(CAST(swc AS DOUBLE) * swc / swwc) AS BIGINT)
               AS ess_clipped,
           CAST(FLOOR(CAST(swc AS DOUBLE) * swc / swwc / n_docs
                      * 1000000) AS BIGINT) AS ess_clipped_share_e6,
           CAST(((sw - swc) * 1000000) // sw AS BIGINT)
               AS clipped_mass_e6
    FROM cells ORDER BY source
    """,
)
def sample_ess_diagnostic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EFFECTIVE SAMPLE SIZE of importance weights, per source (round
    12 cont.): ESS = (Σw)²/Σw² — the one number that says whether a
    weighted corpus mixture (text_dsir_weights, sample_weighted,
    sample_temperature_mixture) actually behaves like n documents or
    like the handful carrying most of the mass; plus the CLIPPED twin
    (w capped at 2000) every practical importance sampler ships,
    with the exact share of weight the clip removed — the
    bias-variance dial read in one row.  ESS/n near 1 = healthy;
    near 0 = the mixture is secretly a few whales.

    Exactness: weights are exact integers (n_chars — the
    length-proportional weight the chunking/packing family already
    treats as mass); Σw/Σw² exact bigints (w² ≤ ~4e7 · 6M docs — int64
    safe through sf10 with clipping, and unclipped Σw² referee-bounded);
    each ESS readout is ONE double chain (sw² may pass 2^53 — the
    int64→double rounding is IEEE-identical both engines); the
    clipped-mass share is an exact integer division of nonnegatives.

    Scale: one corpus pass, 5-integer cells per source, map-side
    combinable — no join, no window."""
    docs = load(spark, sf_dir, "documents")
    weighted = docs.select(
        "source",
        F.col("n_chars").cast("bigint").alias("w"),
        F.least(F.col("n_chars"), F.lit(2000)).cast("bigint").alias("wc"),
    )
    cells = weighted.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("w").cast("bigint").alias("sw"),
        F.sum(F.col("w") * F.col("w")).cast("bigint").alias("sww"),
        F.sum("wc").cast("bigint").alias("swc"),
        F.sum(F.col("wc") * F.col("wc")).cast("bigint").alias("swwc"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    return cells.select(
        "source",
        "n_docs",
        "sw",
        "sww",
        F.floor(d("sw") * F.col("sw") / F.col("sww"))
        .cast("bigint")
        .alias("ess"),
        F.floor(d("sw") * F.col("sw") / F.col("sww") / F.col("n_docs") * 1000000)
        .cast("bigint")
        .alias("ess_share_e6"),
        F.floor(d("swc") * F.col("swc") / F.col("swwc"))
        .cast("bigint")
        .alias("ess_clipped"),
        F.floor(
            d("swc") * F.col("swc") / F.col("swwc") / F.col("n_docs") * 1000000
        )
        .cast("bigint")
        .alias("ess_clipped_share_e6"),
        F.expr("((sw - swc) * 1000000) DIV sw").alias("clipped_mass_e6"),
    ).orderBy("source")


@query(
    "sample_pps_systematic",
    """
    WITH base AS (
        SELECT o_orderkey,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS w
        FROM orders
    ), cum AS (
        SELECT o_orderkey, w,
               CAST(SUM(w) OVER (ORDER BY o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cw,
               CAST(SUM(w) OVER () AS BIGINT) AS tw
        FROM base
    ), marked AS (
        SELECT o_orderkey, w, cw, tw,
               ((cw * 200) // tw) - (((cw - w) * 200) // tw) AS hits
        FROM cum
    )
    SELECT o_orderkey, w, CAST(hits AS BIGINT) AS n_hits
    FROM marked WHERE hits > 0
    """,
)
def sample_pps_systematic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PPS SYSTEMATIC SAMPLE (round 12 cont.): ~200 orders drawn with
    probability proportional to spend via the cumulative-weight
    skip-interval method — the survey-methods sampler behind every
    'audit the big accounts harder' design (monetary-unit sampling in
    audit practice): a unit is hit once per threshold its cumulative
    weight band crosses, so whales can be hit multiple times (n_hits
    > 1 is the certainty-unit signal) while dust aggregates to its
    fair probability.  Completes the sampling family:
    equal-probability systematic exists (sample_systematic_interval);
    this is its size-biased sibling.

    Exactness: ALL-INTEGER — weights are exact cents, the cumulative
    band [cw−w, cw) crossing count is a difference of two floor
    divisions (nonneg operands: `//`/DIV agree), no phase float, no
    sort ambiguity (o_orderkey is unique).

    Scale: the ordered cumsum is the documented seq_global_two_pass
    shape (range-partition + offset cumsum at 100 TB); everything
    else is per-row arithmetic."""
    orders = load(spark, sf_dir, "orders")
    base = orders.select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("w"),
    )
    w_cum = Window.orderBy("o_orderkey").rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_all = Window.partitionBy()
    cum = base.select(
        "o_orderkey",
        "w",
        F.sum("w").over(w_cum).cast("bigint").alias("cw"),
        F.sum("w").over(w_all).cast("bigint").alias("tw"),
    )
    marked = cum.select(
        "o_orderkey",
        "w",
        (
            F.expr("(cw * 200) DIV tw")
            - F.expr("((cw - w) * 200) DIV tw")
        ).alias("hits"),
    )
    return marked.filter(F.col("hits") > 0).select(
        "o_orderkey", "w", F.col("hits").cast("bigint").alias("n_hits")
    )


@query(
    "anon_synthetic_marginals",
    """
    WITH cells AS (
        SELECT c_mktsegment AS segment,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM customer GROUP BY 1
    ), cum AS (
        SELECT segment, c,
               CAST(SUM(c) OVER (ORDER BY segment) AS BIGINT) AS cw,
               CAST(SUM(c) OVER () AS BIGINT) AS tw
        FROM cells
    ), draws AS (
        SELECT CAST(CAST('0x' || substr(md5('synth:'
                        || CAST(i AS VARCHAR)), 1, 7) AS BIGINT)
                    % (SELECT MAX(tw) FROM cum) AS BIGINT) AS u
        FROM (SELECT unnest(generate_series(0, 999)) AS i)
    ), assigned AS (
        SELECT c2.segment
        FROM draws d JOIN cum c2
          ON d.u >= c2.cw - c2.c AND d.u < c2.cw
    ), synth AS (
        SELECT segment, CAST(COUNT(*) AS BIGINT) AS n_synth
        FROM assigned GROUP BY segment
    )
    SELECT c2.segment, c2.c AS n_real,
           CAST((c2.c * 1000000) // c2.tw AS BIGINT) AS real_share_e6,
           CAST(COALESCE(s.n_synth, 0) AS BIGINT) AS n_synth,
           CAST((COALESCE(s.n_synth, 0) * 1000000) // 1000 AS BIGINT)
               AS synth_share_e6,
           CAST(FLOOR((CAST(COALESCE(s.n_synth, 0) AS DOUBLE)
                       - 1000.0 * c2.c / c2.tw)
                      * (CAST(COALESCE(s.n_synth, 0) AS DOUBLE)
                         - 1000.0 * c2.c / c2.tw)
                      / (1000.0 * c2.c / c2.tw) * 1000000) AS BIGINT)
               AS chi2_term_e6
    FROM cum c2 LEFT JOIN synth s USING (segment)
    ORDER BY c2.segment
    """,
)
def anon_synthetic_marginals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SYNTHETIC DATA by marginal-preserving inverse-CDF draw (round
    12 cont.): 1000 synthetic segment labels drawn from the REAL
    market-segment distribution via deterministic md5 uniforms — the
    privacy-side generator the anon family was missing (suppression/
    generalization/swapping REDACT real rows; this RELEASES no row at
    all, only the marginal, which is the k=∞ end of the disclosure
    spectrum), and the per-segment χ² terms referee how faithfully
    the draw tracks its target.

    Exactness: the inverse CDF is an exact integer band probe
    (u ∈ [cw−c, cw), same discipline as sample_pps_systematic's
    bands); md5 uniforms are the shared 7-hex-digit literal lane;
    shares are exact integer divisions; only the χ² terms run a
    double chain, floored per segment.

    Scale: the band probe is a broadcast range join of the 1000-row
    draw frame against |segments| rows; the segment rollup is
    map-side; generating 1e9 synthetic rows instead of 1e3 changes
    nothing but the range width."""
    c = load(spark, sf_dir, "customer")
    cells = c.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count("*").cast("bigint").alias("c")
    )
    w_ord = Window.orderBy("segment").rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_all = Window.partitionBy()
    cum = cells.select(
        "segment",
        "c",
        F.sum("c").over(w_ord).cast("bigint").alias("cw"),
        F.sum("c").over(w_all).cast("bigint").alias("tw"),
    )
    tw_row = cum.agg(F.max("tw").alias("tw_v"))
    draws = (
        spark.range(0, 1000)
        .crossJoin(F.broadcast(tw_row))
        .select(
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.lit("synth:"), F.col("id").cast("string")
                            ).cast("binary")
                        ),
                        1,
                        7,
                    ),
                    16,
                    10,
                ).cast("bigint")
                % F.col("tw_v")
            ).alias("u")
        )
    )
    assigned = draws.join(
        F.broadcast(cum),
        (F.col("u") >= F.col("cw") - F.col("c"))
        & (F.col("u") < F.col("cw")),
    ).select("segment")
    synth = assigned.groupBy("segment").agg(
        F.count("*").cast("bigint").alias("n_synth")
    )
    j = cum.join(F.broadcast(synth), "segment", "left").select(
        "segment",
        "c",
        "tw",
        F.coalesce(F.col("n_synth"), F.lit(0)).cast("bigint").alias(
            "ns"
        ),
    )
    expect = 1000.0 * F.col("c") / F.col("tw")
    return j.select(
        "segment",
        F.col("c").alias("n_real"),
        F.expr("(c * 1000000) DIV tw").alias("real_share_e6"),
        F.col("ns").alias("n_synth"),
        F.expr("(ns * 1000000) DIV 1000").alias("synth_share_e6"),
        F.floor(
            (F.col("ns").cast("double") - expect)
            * (F.col("ns").cast("double") - expect)
            / expect
            * 1000000
        )
        .cast("bigint")
        .alias("chi2_term_e6"),
    ).orderBy("segment")


@query(
    "profile_monotonicity_audit",
    """
    WITH seq AS (
        SELECT o_custkey,
               o_orderkey,
               CAST(o_orderdate AS DATE) AS d,
               lag(CAST(o_orderdate AS DATE))
                   OVER (PARTITION BY o_custkey ORDER BY o_orderkey)
                   AS prev_d
        FROM orders
    ), steps AS (
        SELECT o_custkey,
               CAST(COUNT(*) FILTER (prev_d IS NOT NULL) AS BIGINT)
                   AS n_steps,
               CAST(COUNT(*) FILTER (prev_d IS NOT NULL
                                     AND d < prev_d) AS BIGINT)
                   AS n_descents
        FROM seq GROUP BY o_custkey
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(n_steps) AS BIGINT) AS n_steps,
           CAST(SUM(n_descents) AS BIGINT) AS n_descents,
           CAST(COUNT(*) FILTER (n_descents = 0 AND n_steps > 0)
                AS BIGINT) AS n_monotone_keys,
           CAST((SUM(n_descents) * 1000000)
                // GREATEST(SUM(n_steps), 1) AS BIGINT)
               AS descent_rate_e6
    FROM steps
    """,
)
def profile_monotonicity_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PER-KEY MONOTONICITY AUDIT (round 12 cont.): is each
    customer's order date nondecreasing in order-key sequence? — the
    physical-order diagnostic the profiling family was missing:
    ingestion pipelines assume 'key order ≈ time order' for pruning,
    as-of joins and incremental reads (scan_manifest_incremental_read),
    and this measures exactly how true that is (descent rate per
    adjacent key pair, plus how many keys are perfectly monotone).
    A rising descent rate after a backfill is the classic silent
    breakage of every downstream LOCF/as-of assumption.

    Exactness: ALL-INTEGER — adjacent-pair descents are date
    comparisons over a keyed lag, counts exact, the rate one integer
    division of nonnegatives.

    Scale: one keyed lag window (partitioned by customer — never
    global) + a map-side rollup; the audit touches each row once."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    seq = o.select(
        "o_custkey",
        F.to_date("o_orderdate").alias("d"),
        F.lag(F.to_date("o_orderdate")).over(w).alias("prev_d"),
    )
    steps = seq.groupBy("o_custkey").agg(
        F.count_if(F.col("prev_d").isNotNull())
        .cast("bigint")
        .alias("n_steps"),
        F.count_if(
            F.col("prev_d").isNotNull() & (F.col("d") < F.col("prev_d"))
        )
        .cast("bigint")
        .alias("n_descents"),
    )
    return steps.agg(
        F.count("*").cast("bigint").alias("n_keys"),
        F.sum("n_steps").cast("bigint").alias("n_steps"),
        F.sum("n_descents").cast("bigint").alias("n_descents"),
        F.count_if((F.col("n_descents") == 0) & (F.col("n_steps") > 0))
        .cast("bigint")
        .alias("n_monotone_keys"),
        F.expr(
            "(SUM(n_descents) * 1000000)"
            " DIV GREATEST(SUM(n_steps), 1L)"
        ).alias("descent_rate_e6"),
    )
