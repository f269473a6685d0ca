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
    from tests.helpers import assert_spark_driver_safe_schema

    df = registry.QUERIES[qid](spark, sf_dir)
    # the driver pandas-canonicalizes rows-only outputs too — complex
    # columns crash it even without an oracle (r4 embed_pca red row)
    assert_spark_driver_safe_schema(df, qid)
    rows = df.collect()
    assert rows is not None
    assert df.columns  # stable, non-empty schema


def test_gate_rejects_array_spark_output(spark, sf_dir):
    """Regression (round-4 driver crash): a Spark result with an
    array column is unhashable in the driver's pandas lexsort. The
    Spark-side schema gate must reject LIST/STRUCT/MAP outputs."""
    from pyspark.sql import functions as F

    from tests.helpers import assert_spark_driver_safe_schema

    df = spark.range(3).select(F.array(F.col("id"), F.col("id")).alias("a"))
    with pytest.raises(AssertionError, match="pandas"):
        assert_spark_driver_safe_schema(df, "deliberate_array")
    df2 = spark.range(3).select(F.struct(F.col("id")).alias("s"))
    with pytest.raises(AssertionError, match="pandas"):
        assert_spark_driver_safe_schema(df2, "deliberate_struct")


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert len(df.collect()) > 0


def test_oracle_keys_subset():
    assert set(registry.ORACLES) <= set(registry.QUERIES)


def test_gate_rejects_hugeint_oracle(ddb):
    """Regression (round-1 driver failure): an uncast integer SUM yields
    DuckDB HUGEINT, which the driver's type-sensitive hash rejects even
    when values match. The hardened local gate must fail it too."""
    from tests.helpers import assert_driver_safe_types

    rel = ddb.sql("SELECT SUM(o_custkey) AS s FROM orders")
    with pytest.raises(AssertionError, match="HUGEINT"):
        assert_driver_safe_types(rel.columns, rel.types, "deliberate_hugeint")


def test_gate_rejects_nested_hugeint_oracle(ddb):
    """The unsafe-type scan must see through list/struct element types."""
    from tests.helpers import assert_driver_safe_types

    rel = ddb.sql("SELECT [SUM(o_custkey)] AS s FROM orders")
    with pytest.raises(AssertionError, match="HUGEINT"):
        assert_driver_safe_types(rel.columns, rel.types, "nested_hugeint")


def test_no_oracle_emits_unsafe_types(ddb):
    """Sweep every registered oracle: zero HUGEINT/DECIMAL/unsigned
    output columns (the driver-hash-safe invariant, VERDICT r1 item 1)."""
    from tests.helpers import assert_driver_safe_types

    for qid, sql in sorted(registry.ORACLES.items()):
        rel = ddb.sql(sql)
        assert_driver_safe_types(rel.columns, rel.types, qid)
