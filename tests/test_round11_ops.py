"""Round-11 pins.

Feed-independence of the corpus-quadratic embedding audits (VERDICT
r10 item 7): ``embed_hubness`` and ``embed_intrinsic_dim_twonn`` accept
a candidate-pair frame (the ANN-shortlist substitution path their
docstrings promise) and run the SAME downstream occ/moment (resp.
nn-ratio) pipeline over it.  Proven two ways:

- an exact top-10 shortlist (a strict subset, ~2% of all pairs, that
  provably CONTAINS each query's true top-5/top-2) must reproduce the
  all-pairs audit bit-for-bit — audit-over-shortlist ==
  audit-over-allpairs whenever the shortlist covers the true top-k,
  which is the containment contract an ANN feed is tuned for;
- the real ``lsh_candidate_pairs`` feed must run end-to-end with the
  same schema and the invariants a partial-recall feed still owes
  (full-corpus denominator, s1 <= 5n).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from graphsense_datafeed_spark.operators.llm_similarity import (
    _all_pairs_scored,
    embed_hubness,
    embed_intrinsic_dim_twonn,
    lsh_candidate_pairs,
)
from graphsense_datafeed_spark.sources.tables import load


def _exact_topk_pairs(spark, sf_dir, k):
    """Exact top-k shortlist: the (query_id, neighbor_id) frame an
    ideal ANN index would emit — strict subset of all pairs, contains
    the true top-k by construction."""
    scored = _all_pairs_scored(load(spark, sf_dir, "embeddings"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("dot").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank_k", F.row_number().over(w))
        .filter(F.col("rank_k") <= k)
        .select("query_id", "neighbor_id")
    )


def test_hubness_shortlist_feed_identical(spark, sf_dir):
    short = _exact_topk_pairs(spark, sf_dir, 10)
    allpairs = embed_hubness(spark, sf_dir).collect()
    shortlist = embed_hubness(spark, sf_dir, candidate_pairs=short).collect()
    assert [r.asDict() for r in allpairs] == [r.asDict() for r in shortlist]


def test_twonn_shortlist_feed_identical(spark, sf_dir):
    short = _exact_topk_pairs(spark, sf_dir, 10)
    allpairs = embed_intrinsic_dim_twonn(spark, sf_dir).collect()
    shortlist = embed_intrinsic_dim_twonn(
        spark, sf_dir, candidate_pairs=short
    ).collect()
    assert [r.asDict() for r in allpairs] == [r.asDict() for r in shortlist]


def test_hubness_over_lsh_shortlist_invariants(spark, sf_dir):
    """The production LSH feed has partial top-5 recall (documented),
    so equality with all-pairs is NOT asserted; the audit must still
    cover the whole corpus in its denominator (left-join discipline)
    and respect the occupancy budget."""
    cand = lsh_candidate_pairs(spark, sf_dir)
    row = embed_hubness(spark, sf_dir, candidate_pairs=cand).collect()[0]
    n_corpus = load(spark, sf_dir, "embeddings").count()
    assert row["n"] == n_corpus
    assert row["s1"] <= 5 * n_corpus
    assert row["max_occ"] >= 1
    allpairs = embed_hubness(spark, sf_dir).collect()[0]
    assert set(row.asDict()) == set(allpairs.asDict())  # same schema


def test_twonn_over_lsh_shortlist_invariants(spark, sf_dir):
    cand = lsh_candidate_pairs(spark, sf_dir)
    row = embed_intrinsic_dim_twonn(
        spark, sf_dir, candidate_pairs=cand
    ).collect()[0]
    n_corpus = load(spark, sf_dir, "embeddings").count()
    assert 0 < row["n_used"] <= n_corpus
    assert row["id_twonn_e6"] is not None and row["id_twonn_e6"] > 0


# ---------------------------------------------------------------------------
# Semantic-intent referees for round-11 operators — these pin WHAT the
# operators mean, beyond the cross-engine parity the driver already checks.
# ---------------------------------------------------------------------------


def test_sample_domain_cap_never_exceeds_cap(spark, sf_dir):
    from graphsense_datafeed_spark.registry import QUERIES

    rows = QUERIES["sample_domain_cap"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_kept"] <= 25
        assert r["n_kept"] + r["n_capped"] == r["n_docs"]


def test_locf_max_gap_nulls_beyond_cutoff(spark, sf_dir):
    from graphsense_datafeed_spark.registry import QUERIES

    rows = QUERIES["ts_locf_max_gap"](spark, sf_dir).collect()
    stale = [r for r in rows if r["gap_hours"] is not None and r["gap_hours"] > 6]
    filled = [r for r in rows if r["was_filled"]]
    # beyond the 6h cap the value must be NULL, never a stale carry
    for r in stale:
        assert r["n_events_filled"] is None
    # every filled row is within the cap
    for r in filled:
        assert r["gap_hours"] <= 6


def test_epoch_cap_schedule_invariants(spark, sf_dir):
    from graphsense_datafeed_spark.registry import QUERIES

    rows = QUERIES["sample_epoch_cap_schedule"](spark, sf_dir).collect()
    budget = 3 * sum(r["toks"] for r in rows)
    total_alloc = sum(r["alloc_final"] for r in rows)
    for r in rows:
        assert r["alloc_final"] <= r["cap"], "epoch cap violated"
        assert r["epochs_e2"] <= 400, "more than 4 epochs allocated"
    # one documented redistribution pass: never over budget, and the
    # honest slack is bounded by what the capped sources returned
    assert total_alloc <= budget


def test_iv_wald_weak_instrument_guard(spark, sf_dir):
    """If takeup is identical in both arms the Wald point/SE must be
    NULL (cleared-integer compare), never inf.  The referee recomputes
    the EXACT guard condition sd1*n0 == sd0*n1 from the arm sums
    (ADVICE r11: the floored itt_d_e6 == 0 proxy fires spuriously for
    0 < ITT_d < 1e-6, where wald_e4 is legitimately non-NULL)."""
    import pyspark.sql.functions as F

    from graphsense_datafeed_spark.registry import QUERIES
    from graphsense_datafeed_spark.sources.tables import load

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
    arms = (
        ev.groupBy("user_id")
        .agg(
            F.max(z).alias("z"),
            F.when(F.count_if(F.col("event_type") == "click") > 0, 1)
            .otherwise(0)
            .alias("d"),
        )
        .groupBy("z")
        .agg(F.count("*").alias("n"), F.sum("d").alias("sd"))
        .collect()
    )
    n = {int(r["z"]): int(r["n"]) for r in arms}
    sd = {int(r["z"]): int(r["sd"]) for r in arms}
    weak = sd[1] * n[0] == sd[0] * n[1]

    row = QUERIES["events_iv_wald"](spark, sf_dir).collect()[0]
    if weak:
        assert row["wald_e4"] is None and row["se_e4"] is None
    else:
        assert row["wald_e4"] is not None


def test_session_window_forms_agree(spark, sf_dir):
    """The native batch session_window op and a manual gaps-islands
    rollup with the SAME >= boundary convention must produce identical
    session aggregates."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window as W

    from graphsense_datafeed_spark.registry import QUERIES
    from graphsense_datafeed_spark.sources.tables import load

    native = {
        (r["user_id"], r["session_start"]): (r["n_events"], r["val_e4"])
        for r in QUERIES["batch_session_window"](spark, sf_dir).collect()
    }
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 40)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    marked = ev.select(
        "user_id",
        "ts",
        F.floor(F.col("value") * 10000).cast("bigint").alias("v"),
        F.when(
            prev.isNull()
            | (F.col("ts") >= prev + F.expr("INTERVAL 30 MINUTES")),
            1,
        )
        .otherwise(0)
        .alias("is_start"),
    )
    manual = (
        marked.select(
            "user_id",
            "ts",
            "v",
            F.sum("is_start")
            .over(W.partitionBy("user_id").orderBy("ts"))
            .alias("sn"),
        )
        .groupBy("user_id", "sn")
        .agg(
            F.min("ts").alias("session_start"),
            F.count("*").cast("bigint").alias("n_events"),
            F.sum("v").cast("bigint").alias("val_e4"),
        )
        .collect()
    )
    assert len(manual) == len(native)
    for r in manual:
        assert native[(r["user_id"], r["session_start"])] == (
            r["n_events"],
            r["val_e4"],
        )


def test_luhn_known_vectors(spark):
    """The Luhn fold must agree with the textbook test vectors."""
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [("79927398713", True), ("79927398710", False), ("4539148803436467", True)],
        "digits string, expected boolean",
    )
    n = F.length("digits")
    luhn = F.aggregate(
        F.sequence(F.lit(1), n),
        F.lit(0).cast("bigint"),
        lambda acc, i: acc
        + F.when(
            (n + 1 - i) % 2 == 0,
            F.when(
                2 * F.substring(F.col("digits"), i.cast("int"), 1).cast("bigint") > 9,
                2 * F.substring(F.col("digits"), i.cast("int"), 1).cast("bigint") - 9,
            ).otherwise(
                2 * F.substring(F.col("digits"), i.cast("int"), 1).cast("bigint")
            ),
        ).otherwise(F.substring(F.col("digits"), i.cast("int"), 1).cast("bigint")),
    )
    rows = df.select("expected", (luhn % 10 == 0).alias("got")).collect()
    for r in rows:
        assert r["got"] == r["expected"]


def test_rmst_bounded_by_tau_and_km(spark, sf_dir):
    from graphsense_datafeed_spark.registry import QUERIES

    row = QUERIES["events_survival_rmst"](spark, sf_dir).collect()[0]
    assert row["tau_days"] == 14
    # RMST in day-e6 units is bounded by tau (survival <= 1)
    assert 0 < row["rmst_day_e6"] <= 14 * 1000000


def test_qte_deciles_monotone_within_arm(spark, sf_dir):
    from graphsense_datafeed_spark.registry import QUERIES

    rows = QUERIES["events_quantile_treatment_effect"](spark, sf_dir).collect()
    assert [r["decile"] for r in rows] == list(range(1, 10))
    qt = [r["q_treat"] for r in rows]
    qc = [r["q_ctrl"] for r in rows]
    assert qt == sorted(qt) and qc == sorted(qc)
