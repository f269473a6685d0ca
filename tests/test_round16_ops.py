"""Round-16 optimization referees.

Each test pins the CORRECTNESS contract of an operator whose internals
changed in the round-16 optimization pass — the optimization is only
allowed to change the plan, never the rows.
"""

import pyspark.sql.functions as F
import pytest
from pyspark.sql import Window

from graphsense_datafeed_spark import registry


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


class TestUdtfGroupedMapCarry:
    """udtf_grouped_map moved from one-Python-call-per-group
    applyInPandas to a sorted-stream mapInPandas that carries the
    batch-straddling group's running count.  The carry is the risky
    part: force TINY Arrow batches so every partition splits groups
    across many batches, and compare against the JVM window oracle."""

    def test_matches_window_oracle_under_tiny_batches(self, spark, sf_dir):
        from graphsense_datafeed_spark.functions.udfs import udtf_grouped_map
        from graphsense_datafeed_spark.sources.tables import load

        prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
        try:
            got = _rows(udtf_grouped_map(spark, sf_dir))
        finally:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)

        ev = load(spark, sf_dir, "events").select(
            "user_id", "event_id", "event_type"
        )
        w = (
            Window.partitionBy("user_id")
            .orderBy("event_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        want = _rows(
            ev.select(
                "user_id",
                "event_id",
                F.sum((F.col("event_type") == "purchase").cast("bigint"))
                .over(w)
                .cast("bigint")
                .alias("purchases_so_far"),
            )
        )
        assert got == want
