"""Fixture-drift tripwire.

The driver REGENERATED the testdata between rounds 2 and 3, changing
`events.ts` from timestamp[ns] to timestamp[us]; the loader's baked-in
ns assumption then silently shifted every event to 1970 and broke five
driver-checked queries while every local gate stayed green (they ran
the same broken loader against the same regenerated data).

These tests pin the EXPECTATIONS the engine holds about the fixtures —
column names, arrow types, non-emptiness — directly against the parquet
footers at every scale factor, so the next regeneration that moves
anything fails HERE, loudly, before any oracle run.
"""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

from graphsense_datafeed_spark.schemas import TABLES

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]

# column -> set of acceptable arrow type strings (events.ts is the one
# column the generator has shipped in two units; both are loadable via
# sources/tables.py:events_ts_unit).
EXPECTED = {
    "region": {"r_regionkey": {"int32"}, "r_name": {"string", "large_string"}},
    "nation": {
        "n_nationkey": {"int32"},
        "n_name": {"string", "large_string"},
        "n_regionkey": {"int32"},
    },
    "customer": {
        "c_custkey": {"int64"},
        "c_name": {"string", "large_string"},
        "c_nationkey": {"int32"},
        "c_acctbal": {"double"},
        "c_mktsegment": {"string", "large_string"},
    },
    "supplier": {
        "s_suppkey": {"int64"},
        "s_name": {"string", "large_string"},
        "s_nationkey": {"int32"},
        "s_acctbal": {"double"},
    },
    "part": {
        "p_partkey": {"int64"},
        "p_name": {"string", "large_string"},
        "p_brand": {"string", "large_string"},
        "p_type": {"string", "large_string"},
        "p_size": {"int32"},
        "p_retailprice": {"double"},
    },
    "orders": {
        "o_orderkey": {"int64"},
        "o_custkey": {"int64"},
        "o_orderstatus": {"string", "large_string"},
        "o_totalprice": {"double"},
        "o_orderdate": {"timestamp[us]", "timestamp[ns]", "date32[day]"},
        "o_orderpriority": {"string", "large_string"},
    },
    "lineitem": {
        "l_orderkey": {"int64"},
        "l_partkey": {"int64"},
        "l_suppkey": {"int64"},
        "l_linenumber": {"int32"},
        "l_quantity": {"double"},
        "l_extendedprice": {"double"},
        "l_discount": {"double"},
        "l_tax": {"double"},
        "l_returnflag": {"string", "large_string"},
        "l_linestatus": {"string", "large_string"},
        "l_shipdate": {"timestamp[us]", "timestamp[ns]", "date32[day]"},
    },
    "events": {
        "event_id": {"int64"},
        "ts": {"timestamp[us]", "timestamp[ns]"},
        "user_id": {"int64"},
        "event_type": {"string", "large_string"},
        "value": {"double"},
        "props": {"string", "large_string"},
    },
    "documents": {
        "doc_id": {"int64"},
        "text": {"string", "large_string"},
        "lang": {"string", "large_string"},
        "source": {"string", "large_string"},
        "n_chars": {"int64"},
    },
    "embeddings": {
        "vec_id": {"int64"},
        "embedding": {"list<element: float>", "list<item: float>"},
        "label": {"int32"},
    },
}


@pytest.mark.parametrize("sf_dir", SF_DIRS)
@pytest.mark.parametrize("table", TABLES)
def test_fixture_schema_matches_expectation(sf_dir, table):
    f = pq.ParquetFile(f"{sf_dir}/{table}.parquet")
    got = {fld.name: str(fld.type) for fld in f.schema_arrow}
    want = EXPECTED[table]
    assert set(got) == set(want), (
        f"{sf_dir}/{table}: column drift — got {sorted(got)}, "
        f"expected {sorted(want)}"
    )
    for col, ok_types in want.items():
        assert got[col] in ok_types, (
            f"{sf_dir}/{table}.{col}: type drift — got {got[col]}, "
            f"accepted {sorted(ok_types)} (if the generator legitimately "
            f"moved again, teach the loaders first, then widen this set)"
        )
    assert f.metadata.num_rows > 0, f"{sf_dir}/{table}: empty fixture"
