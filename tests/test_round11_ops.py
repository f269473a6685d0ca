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
