"""Round-13 operator referees: plan pins and identity cross-checks for
the reusable LSH similarity join, plus the frozen-quantizer ANN flips
(invariants the oracle hash-match cannot express)."""

import pyspark.sql.functions as F

from graphsense_datafeed_spark.registry import QUERIES, load_all_operators
from graphsense_datafeed_spark.sources.tables import load

load_all_operators()

SF01 = "/root/testdata/sf0.01"


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_lsh_join_plan_no_cartesian(spark):
    """The banded similarity join must be equi-join + broadcast verify
    end-to-end: no CartesianProduct, no BroadcastNestedLoopJoin — the
    'bucket-capped, no cartesian' pin VERDICT r12 item 7 asks for."""
    df = QUERIES["join_lsh_similarity"](spark, SF01)
    plan = _executed_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan  # the candidate-verify broadcast


def test_lsh_join_matches_dedup_near_parity_slice(spark):
    """Identity: joining the even-id half against the odd-id half must
    produce EXACTLY the opposite-parity subset of dedup_near's verified
    pairs (same shingles, same hash family, same threshold — the only
    difference is which pairs are eligible)."""
    near = QUERIES["dedup_near"](spark, SF01).collect()
    want = {}
    for r in near:
        a, b = r["doc_a"], r["doc_b"]
        if a % 2 != b % 2:
            left, right = (a, b) if a % 2 == 0 else (b, a)
            want[(left, right)] = r["jaccard_e4"]
    got = {
        (r["left_id"], r["right_id"]): r["jaccard_e4"]
        for r in QUERIES["join_lsh_similarity"](spark, SF01).collect()
    }
    assert got == want
    assert len(got) > 0  # the fixture plants cross-parity near-dups


def test_lsh_join_per_side_bucket_cap(spark):
    """A degenerate side (300 identical docs -> one crushing bucket on
    every band) must be dropped by the PER-SIDE cap before pair
    generation: with the cap the planted block contributes no pairs;
    with the cap disabled the fan-out is quadratic in the block."""
    from graphsense_datafeed_spark.operators.llm_dedup import (
        lsh_similarity_join,
    )

    base = load(spark, SF01, "documents").select("doc_id", "text")
    block = (
        spark.range(300)
        .select(
            (F.col("id") + 10_000_000).alias("doc_id"),
            F.lit("spam spam spam spam spam spam spam spam").alias("text"),
        )
    )
    left = base.filter(F.col("doc_id") % 2 == 0).unionByName(block)
    right = base.filter(F.col("doc_id") % 2 == 1).unionByName(
        block.select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
    )
    capped = lsh_similarity_join(left, right, max_bucket=256)
    spam = capped.filter(F.col("left_id") >= 10_000_000)
    assert spam.count() == 0
    uncapped = lsh_similarity_join(left, right, max_bucket=None)
    assert (
        uncapped.filter(F.col("left_id") >= 10_000_000).count() == 300 * 300
    )


def test_ivf_frozen_assignment_matches_cell_index(spark):
    """sim_ann_ivf's rk=1 assignment must be IDENTICAL to the
    hash-matched sim_ivf_cell_index quantizer — the invariant that
    makes the round-13 oracle flip sound."""
    from graphsense_datafeed_spark.operators.llm_similarity import (
        _ivf_ranked_cells,
    )

    ranked = (
        _ivf_ranked_cells(spark, SF01)
        .filter(F.col("rk") == 1)
        .select("vec_id", "cell")
        .collect()
    )
    idx = QUERIES["sim_ivf_cell_index"](spark, SF01).collect()
    assert {(r["vec_id"], r["cell"]) for r in ranked} == {
        (r["vec_id"], r["cell"]) for r in idx
    }


def test_pq_codebooks_are_corpus_slices(spark):
    """Round-0 codebooks must be exact sub-vector slices of the first
    16 corpus vectors — no training drift, the property that lets the
    DuckDB oracle state them as data rows."""
    import numpy as np

    from graphsense_datafeed_spark.operators.llm_dedup import _ARR_CACHE  # noqa: F401
    from graphsense_datafeed_spark.operators.llm_similarity import (
        _PQ_K,
        _PQ_M,
        _pq_codebooks,
    )

    books = _pq_codebooks(spark, SF01)
    e = load(spark, SF01, "embeddings")
    first = np.array(
        [r.embedding for r in e.orderBy("vec_id").limit(_PQ_K).collect()],
        dtype=np.float64,
    )
    d = first.shape[1] // _PQ_M
    for m in range(_PQ_M):
        assert np.array_equal(books[m], first[:, m * d : (m + 1) * d])
