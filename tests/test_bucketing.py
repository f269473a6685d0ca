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


def test_zorder_layout_narrows_file_spans(spark, tmp_path):
    """Files written in z-value order must each cover a narrow range of
    BOTH interleaved keys (multi-dimensional pruning), while a
    hash-random layout's files span essentially the full range of
    each. 256x256 grid, 8 files: z-ordered spans collapse to <=~0.55 /
    ~0.3 of the domain per file; random layout stays ~1.0."""
    import pyspark.sql.functions as F

    from graphsense_datafeed_spark.sources.scans import zvalue_col

    grid = spark.range(256 * 256).select(
        (F.col("id") % 256).alias("x"), (F.col("id") / 256).cast("long").alias("y")
    )
    grid = grid.withColumn("zval", zvalue_col(F.col("x"), F.col("y")))
    zdir, ndir = str(tmp_path / "z"), str(tmp_path / "n")
    (
        grid.repartitionByRange(8, "zval")
        .sortWithinPartitions("zval")
        .write.parquet(zdir)
    )
    grid.repartition(8).write.parquet(ndir)

    def mean_spans(d):
        df = spark.read.parquet(d).withColumn("f", F.input_file_name())
        rows = df.groupBy("f").agg(
            (F.max("x") - F.min("x")).alias("xs"),
            (F.max("y") - F.min("y")).alias("ys"),
        ).collect()
        return (
            sum(r["xs"] for r in rows) / len(rows),
            sum(r["ys"] for r in rows) / len(rows),
        )

    zx, zy = mean_spans(zdir)
    nx, ny = mean_spans(ndir)
    # random layout: every file sees (almost) the whole domain
    assert nx > 0.9 * 255 and ny > 0.9 * 255
    # z layout: strictly sub-domain spans in BOTH dimensions
    assert zx < 0.7 * nx, (zx, nx)
    assert zy < 0.7 * ny, (zy, ny)
