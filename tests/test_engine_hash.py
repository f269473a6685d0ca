"""Referee for the engine-side order-insensitive value hash
(scripts/verify_driver_style.py, VERDICT r14 item 2).

The census's sf10 "harness-bound" class (SCALE.md §Round-14) gets its
VALUE evidence from one reduced row computed INSIDE each engine:
canonical per-row text -> md5 -> two summed 60-bit slices + COUNT(*).
That is only evidence if the canonical-text rules are bit-identical
across engines for every supported type, so this suite pins:

1. AGREEMENT: for queries covering every supported output type
   (BIGINT, VARCHAR, DATE, TIMESTAMP_NTZ, DOUBLE), the Spark triple
   equals the DuckDB triple at sf0.001 — the same pairs the collect
   referee already proves equal, so a mismatch here is a formatting
   bug in the hash mode itself.
2. SENSITIVITY: perturbing one value / dropping one row changes the
   triple (the sum is not blind to sign-balanced edits of this shape).
3. NULL disambiguation: (NULL,'x') vs ('x',NULL) hash differently —
   the concat_ws-skips-NULL alias the sentinel exists to prevent.
"""

from __future__ import annotations

import importlib.util
import os
import sys

import duckdb
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.001")

_spec = importlib.util.spec_from_file_location(
    "verify_driver_style", os.path.join(REPO, "scripts", "verify_driver_style.py")
)
vds = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(vds)

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

# Coverage of every supported canonical type across the exact rows the
# sf10 census uses this mode for:
#   join_interval      -> DATE, BIGINT, TIMESTAMP_NTZ
#   set_union_by_name  -> BIGINT, DOUBLE, VARCHAR
#   set_intersect_all  -> BIGINT, VARCHAR (duplicate-preserving: the
#                         multiset semantics the sum must respect)
AGREEMENT_QIDS = ["join_interval", "set_union_by_name", "set_intersect_all"]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


@pytest.fixture(scope="module")
def reg(spark):
    from graphsense_datafeed_spark import registry

    registry.load_all_operators()
    return registry


@pytest.mark.parametrize("qid", AGREEMENT_QIDS)
def test_engine_hash_agreement(spark, duck, reg, qid):
    sdf = reg.QUERIES[qid](spark, SF_DIR)
    s_cols, sn, sh1, sh2 = vds._spark_engine_hash(sdf)
    d_cols, dn, dh1, dh2 = vds._duck_engine_hash(duck, reg.ORACLES[qid], qid)
    assert s_cols == d_cols
    assert sn > 0, f"{qid}: empty result can't exercise the hash"
    assert (sn, sh1, sh2) == (dn, dh1, dh2)


def test_engine_hash_sensitivity(duck, reg):
    """One changed cell and one dropped row must each move the triple."""
    qid = "set_union_by_name"
    base_sql = reg.ORACLES[qid]
    _, n0, h1_0, h2_0 = vds._duck_engine_hash(duck, base_sql, qid)
    # perturb one cell (bump the min id's bal by a cent — 10000
    # quantization steps of the e6 double canonicalization, so the
    # edit is guaranteed visible post-floor)
    mutated = (
        f"SELECT id, CASE WHEN id = (SELECT MIN(id) FROM ({base_sql}) m) "
        f"THEN bal + 1e-2 ELSE bal END AS bal, kind FROM ({base_sql}) b"
    )
    _, n1, h1_1, h2_1 = vds._duck_engine_hash(duck, mutated, qid)
    assert n1 == n0 and (h1_1, h2_1) != (h1_0, h2_0)
    # drop one row
    dropped = (
        f"SELECT * FROM ({base_sql}) d WHERE NOT (id = "
        f"(SELECT MIN(id) FROM ({base_sql}) m2) AND kind = 'customer')"
    )
    _, n2, h1_2, h2_2 = vds._duck_engine_hash(duck, dropped, qid)
    assert n2 < n0 and (h1_2, h2_2) != (h1_0, h2_0)


def test_engine_hash_null_vs_swapped(duck):
    """(NULL,'x') and ('x',NULL) must not alias (the coalesce-sentinel
    rule; raw concat_ws would collapse both to 'x')."""
    a = vds._duck_engine_hash(
        duck, "SELECT NULL::VARCHAR AS a, 'x' AS b", "null_left"
    )
    b = vds._duck_engine_hash(
        duck, "SELECT 'x' AS a, NULL::VARCHAR AS b", "null_right"
    )
    assert a[1:] != b[1:]


def test_engine_hash_rejects_unsupported_types(duck):
    with pytest.raises(ValueError, match="unsupported DuckDB type"):
        vds._duck_engine_hash(duck, "SELECT [1, 2] AS arr", "bad_type")
