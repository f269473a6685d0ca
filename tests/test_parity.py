"""The workhorse suite: every registered (query, oracle) pair must
hash-match DuckDB — exactly what the driver's t2 gate does at sf0.01.

Queries registered WITHOUT an oracle get a rows-only smoke check,
mirroring the driver's weaker path.
"""

import pytest

from graphsense_datafeed_spark import registry

registry.load_all_operators()

from tests.helpers import assert_parity  # noqa: E402

_WITH_ORACLE = sorted(registry.ORACLES)
_NO_ORACLE = sorted(set(registry.QUERIES) - set(registry.ORACLES))


@pytest.mark.parametrize("qid", _WITH_ORACLE)
def test_oracle_parity(spark, ddb, sf_dir, qid):
    assert_parity(spark, ddb, qid, sf_dir)


@pytest.mark.parametrize("qid", _NO_ORACLE)
def test_rows_only(spark, sf_dir, qid):
    df = registry.QUERIES[qid](spark, sf_dir)
    rows = df.collect()
    assert rows is not None
    assert df.columns  # stable, non-empty schema


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert len(df.collect()) > 0


def test_oracle_keys_subset():
    assert set(registry.ORACLES) <= set(registry.QUERIES)
