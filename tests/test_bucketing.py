"""The 100 TB co-location story, proven locally: bucketed tables make
the orders⋈lineitem join exchange-free (SCALE.md's bucketing claim)."""

import io
from contextlib import redirect_stdout

import pyspark.sql.functions as F
import pytest

from graphsense_datafeed_spark.sources.tables import load


@pytest.fixture(scope="module")
def bucketed_warehouse(spark, sf_dir):
    spark.sql("CREATE DATABASE IF NOT EXISTS gds_bucketed")
    for t, key in [("orders", "o_orderkey"), ("lineitem", "l_orderkey")]:
        (
            load(spark, sf_dir, t)
            .write.bucketBy(8, key)
            .sortBy(key)
            .mode("overwrite")
            .saveAsTable(f"gds_bucketed.{t}")
        )
    yield "gds_bucketed"
    spark.sql("DROP DATABASE gds_bucketed CASCADE")


def test_bucketed_join_has_no_exchange(spark, bucketed_warehouse):
    """Both sides bucketed by the join key → sort-merge join with NO
    shuffle exchange: at 100 TB this is the difference between moving
    terabytes and moving nothing."""
    o = spark.table(f"{bucketed_warehouse}.orders")
    li = spark.table(f"{bucketed_warehouse}.lineitem")
    joined = o.join(li, o.o_orderkey == li.l_orderkey).groupBy(
        "o_orderstatus"
    ).agg(F.count("*").alias("n"))
    buf = io.StringIO()
    with redirect_stdout(buf):
        joined.explain("formatted")
    plan = buf.getvalue()
    join_section = plan.split("HashAggregate")[0]
    assert "Exchange" not in join_section, join_section
    # and the result matches the unbucketed computation
    want = sorted(
        tuple(r)
        for r in load(spark, "/root/testdata/sf0.001", "orders")
        .join(
            load(spark, "/root/testdata/sf0.001", "lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    got = sorted(tuple(r) for r in joined.collect())
    assert got == want
