"""Semantic checks for the round-5 operators — properties the parity
hash can't express (the hash proves Spark≡DuckDB; these prove both
mean what the operator claims)."""

import math

import pyspark.sql.functions as F

from graphsense_datafeed_spark import registry
from graphsense_datafeed_spark.sources.tables import load

registry.load_all_operators()
Q = registry.QUERIES


def test_ewma_matches_python_fold(spark, sf_dir):
    """The Spark fold must equal the textbook recurrence computed in
    Python over the same (ts, event_id)-ordered series."""
    rows = (
        load(spark, sf_dir, "events")
        .filter(F.col("user_id") < 30)
        .select("user_id", "ts", "event_id", "value")
        .collect()
    )
    series: dict[int, list] = {}
    for r in rows:
        series.setdefault(r["user_id"], []).append(
            (r["ts"], r["event_id"], r["value"])
        )
    want = {}
    for uid, seq in series.items():
        seq.sort()
        s = seq[0][2]
        for _, _, v in seq[1:]:
            s = s * 0.5 + v * 0.5
        want[uid] = (len(seq), math.floor(s * 1_000_000))
    got = {
        r["user_id"]: (r["n_obs"], r["ewma_e6"])
        for r in Q["ts_ewma"](spark, sf_dir).collect()
    }
    assert got == want


def test_zscore_anomaly_cold_start_guard(spark, sf_dir):
    rows = Q["ts_zscore_anomaly"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        if r["n_window"] < 8:
            assert not r["is_anomaly"], r


def test_cusum_first_row_unflagged_and_exact(spark, sf_dir):
    """Row i=1 has C_1 = v_1 - mu; with the 5σ√i limit it should very
    rarely flag — more importantly every series must END at C_n ≈ 0
    (sum of deviations over the whole series is exactly zero up to the
    floor-e4 integerization)."""
    df = Q["ts_changepoint_cusum"](spark, sf_dir)
    # C_n = S_n - n*mu = S_n - S_n = 0 exactly → cusum_units ∈ {-1, 0}
    # (floor of a value in (-1, 1)). The series' last row is the max
    # of the (ts, event_id) ORDER key, not max(event_id) — derive it
    # from the events table the same way the operator orders.
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(F.desc("ts"), F.desc("event_id"))
    last_ids = {
        r["event_id"]
        for r in ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id")
        .collect()
    }
    finals = [
        r["cusum_units"]
        for r in df.collect()
        if r["event_id"] in last_ids
    ]
    assert finals and all(c in (-1, 0) for c in finals), finals


def test_retention_offset_zero_equals_cohort_size(spark, sf_dir):
    """Week-0 of every cohort counts the whole cohort: each user is by
    definition active in their own first week."""
    ret = {
        (r["cohort_week"], r["week_offset"]): r["n_active"]
        for r in Q["events_retention"](spark, sf_dir).collect()
    }
    ev = load(spark, sf_dir, "events")
    cohort_sizes = {
        r["w"]: r["n"]
        for r in ev.select(
            "user_id", F.date_trunc("week", "ts").alias("week")
        )
        .groupBy("user_id")
        .agg(F.min("week").alias("cw"))
        .groupBy(F.to_date("cw").alias("w"))
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    for w, n in cohort_sizes.items():
        assert ret.get((w, 0)) == n, (w, n, ret.get((w, 0)))
    # retention never exceeds the cohort
    for (w, off), n in ret.items():
        assert n <= cohort_sizes[w], (w, off)


def test_unpivot_multiplies_rows_by_four(spark, sf_dir):
    base = (
        load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 50 == 0).count()
    )
    out = Q["unpivot_longer"](spark, sf_dir)
    assert out.count() == 4 * base
    assert set(r["metric"] for r in out.select("metric").distinct().collect()) == {
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_tax",
    }


def test_anon_k_suppress_threshold(spark, sf_dir):
    rows = Q["anon_k_suppress"](spark, sf_dir).collect()
    assert rows
    seen = {True: 0, False: 0}
    for r in rows:
        seen[bool(r["is_suppressed"])] += 1
        if r["is_suppressed"]:
            assert r["group_n"] < 10 and r["nat_q"] is None and r["seg_q"] is None
        else:
            assert r["group_n"] >= 10 and r["nat_q"] is not None
    # which classes exist depends on SF (sf0.001 has no group >= 10;
    # sf0.01 has both — the driver-gate SF exercises both branches);
    # recompute the expectation from the data instead of hardcoding
    want_kept = (
        load(spark, sf_dir, "customer")
        .groupBy("c_nationkey", "c_mktsegment")
        .count()
        .filter(F.col("count") >= 10)
        .count()
        > 0
    )
    assert seen[True] > 0
    assert (seen[False] > 0) == want_kept


def test_dedup_rank_quality_keeper_is_longest(spark, sf_dir):
    got = Q["dedup_rank_quality"](spark, sf_dir).collect()
    lens = {
        r["doc_id"]: r["n_chars"]
        for r in load(spark, sf_dir, "documents").select("doc_id", "n_chars").collect()
    }
    by_key: dict[str, list] = {}
    for r in got:
        by_key.setdefault(r["content_key"], []).append(r)
    assert by_key
    for key, members in by_key.items():
        keepers = [m for m in members if m["is_keeper"]]
        assert len(keepers) == 1, key
        kmax = max(lens[m["doc_id"]] for m in members)
        assert lens[keepers[0]["doc_id"]] == kmax, key


def test_corr_exact_bounded_and_self_consistent(spark, ddb, sf_dir):
    rows = Q["agg_corr_exact"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        # corr_e6 = floor(r * 1e6) with r in [-1, 1]
        assert -1_000_000 <= r["corr_e6"] <= 1_000_000, r


def test_reservoir_and_weighted_sample_shapes(spark, sf_dir):
    res = Q["sample_reservoir"](spark, sf_dir).collect()
    per_type: dict[str, int] = {}
    for r in res:
        per_type[r["event_type"]] = max(per_type.get(r["event_type"], 0), r["rnk"])
        assert 1 <= r["rnk"] <= 10
    n_types = (
        load(spark, sf_dir, "events").select("event_type").distinct().count()
    )
    assert len(per_type) == n_types
    # deterministic: a second run draws the identical sample
    again = Q["sample_reservoir"](spark, sf_dir).collect()
    assert sorted(map(tuple, res)) == sorted(map(tuple, again))

    wt = Q["sample_weighted"](spark, sf_dir).collect()
    assert wt and all(1 <= r["rnk"] <= 5 for r in wt)


def test_weighted_sample_prefers_long_docs(spark, sf_dir):
    """With P ∝ n_chars the selected docs should on average be longer
    than the corpus median — a weak but real check that the weight
    actually enters the key (an unweighted bug would center them)."""
    docs = load(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    med = docs.agg(F.percentile("n_chars", F.lit(0.5)).alias("m")).collect()[0]["m"]
    picked_ids = [r["doc_id"] for r in Q["sample_weighted"](spark, sf_dir).collect()]
    picked = (
        docs.filter(F.col("doc_id").isin(picked_ids))
        .agg(F.avg("n_chars").alias("a"))
        .collect()[0]["a"]
    )
    assert picked > med * 0.9, (picked, med)


def test_null_safe_join_keeps_null_bucket(spark, sf_dir):
    rows = Q["join_null_safe"](spark, sf_dir).collect()
    ks = [r["k"] for r in rows]
    assert None in ks, "null bucket vanished — join is not null-safe"


def test_ngram_topk_is_ranked_prefix(spark, sf_dir):
    rows = Q["text_ngram_topk"](spark, sf_dir).collect()
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append((r["rnk"], r["n"], r["gram"]))
    assert by_lang
    for lang, seq in by_lang.items():
        seq.sort()
        assert [rk for rk, _, _ in seq] == list(range(1, len(seq) + 1))
        counts = [n for _, n, _ in seq]
        assert counts == sorted(counts, reverse=True), (lang, counts)


def test_string_agg_ordered_by_key(spark, sf_dir):
    rows = Q["agg_string_agg"](spark, sf_dir).collect()
    assert rows
    cust = {
        r["c_name"]: r["c_custkey"]
        for r in load(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 40 == 0)
        .collect()
    }
    for r in rows:
        names = r["names"].split(",") if r["names"] else []
        assert len(names) == r["n_members"]
        keys = [cust[n] for n in names]
        assert keys == sorted(keys), r["c_mktsegment"]
