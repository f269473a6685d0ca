"""SURVEY §2.8 — date/time functions.

[REF] provenance: the datafeed stores unix-seconds ints and converts at
the edges (SURVEY §1.2); `date_unix` is that exact surface. Known
cross-engine traps handled here: day-of-week numbering (Spark
1=Sunday…7 vs DuckDB dow 0=Sunday…6 → +1 in the oracle), Spark
months_between being fractional (restricted to month-truncated inputs
where it is exactly integral), and interval arithmetic returning
TIMESTAMP in DuckDB where Spark yields DATE (explicit casts).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from graphsense_datafeed_spark.registry import query
from graphsense_datafeed_spark.sources.tables import load


@query(
    "date_extract",
    """
    SELECT event_id,
           CAST(date_part('year', ts)  AS INT) AS y,
           CAST(date_part('month', ts) AS INT) AS mo,
           CAST(date_part('day', ts)   AS INT) AS d,
           CAST(date_part('hour', ts)  AS INT) AS h,
           CAST(date_part('minute', ts) AS INT) AS mi,
           CAST(date_part('dow', ts) + 1 AS INT) AS dow_sunday1,
           CAST(date_part('doy', ts) AS INT) AS doy
    FROM events WHERE event_id < 2000
    """,
)
def date_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    return ev.select(
        "event_id",
        F.year("ts").alias("y"),
        F.month("ts").alias("mo"),
        F.dayofmonth("ts").alias("d"),
        F.hour("ts").alias("h"),
        F.minute("ts").alias("mi"),
        F.dayofweek("ts").alias("dow_sunday1"),
        F.dayofyear("ts").alias("doy"),
    )


@query(
    "date_trunc_arith",
    """
    SELECT o_orderkey,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 1 DAY * (o_orderkey % 30)
                AS DATE) AS shifted,
           CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
                AS INT) AS days_since_95,
           CAST(date_diff('month', date_trunc('month', TIMESTAMP '1995-01-01'),
                          date_trunc('month', o_orderdate)) AS DOUBLE) AS months_since_95,
           last_day(CAST(o_orderdate AS DATE)) AS month_end
    FROM orders WHERE o_orderkey < 2000
    """,
)
def date_trunc_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """months_between is Spark-fractional; on month-truncated operands
    it is exactly integral, which is the only form given an oracle
    (SURVEY §2.8 `date_trunc_arith` note)."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    od = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.date_trunc("month", "o_orderdate").cast("timestamp_ntz").alias("month_start"),
        F.date_add(od, (F.col("o_orderkey") % 30).cast("int")).alias("shifted"),
        F.datediff(od, F.lit("1995-01-01").cast("date")).alias("days_since_95"),
        F.months_between(
            F.date_trunc("month", "o_orderdate").cast("timestamp"),
            F.lit("1995-01-01").cast("timestamp"),
        ).alias("months_since_95"),
        F.last_day(od).alias("month_end"),
    )


@query(
    "date_unix",
    """
    SELECT event_id,
           CAST(epoch_us(ts) // 1000000 AS BIGINT) AS unix_secs,
           CAST(epoch_us(ts) AS BIGINT) AS unix_micros,
           make_timestamp(CAST(epoch_us(ts) // 1000000 AS BIGINT) * 1000000)
               AS ts_roundtrip,
           CAST(ts AS DATE) AS event_date,
           strftime(ts, '%Y-%m-%d %H:%M') AS formatted
    FROM events WHERE event_id < 2000
    """,
)
def date_unix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[REF] unix-secs↔timestamp conversions (the datafeed's storage
    format for block timestamps)."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    ts_ltz = F.col("ts").cast("timestamp")
    return ev.select(
        "event_id",
        F.unix_timestamp(ts_ltz).alias("unix_secs"),
        F.unix_micros(ts_ltz).alias("unix_micros"),
        F.timestamp_seconds(F.unix_timestamp(ts_ltz))
        .cast("timestamp_ntz")
        .alias("ts_roundtrip"),
        F.to_date("ts").alias("event_date"),
        F.date_format("ts", "yyyy-MM-dd HH:mm").alias("formatted"),
    )

@query(
    "date_business_days",
    """
    SELECT o.o_orderkey,
           CAST(o.o_orderdate AS DATE) AS start_d,
           CAST(COUNT(*) FILTER (
               isodow(CAST(o.o_orderdate AS DATE) + CAST(i.i AS INTEGER)) < 6
           ) AS BIGINT) AS biz_days
    FROM (SELECT o_orderkey, o_orderdate FROM orders
          WHERE o_orderkey < 200) o,
         (SELECT unnest(range(1, 31)) AS i) i
    GROUP BY 1, 2 ORDER BY 1
    """,
)
def date_business_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BUSINESS-DAY COUNT (round 11): weekdays (Mon-Fri) among the 30
    days following each order date — the SLA arithmetic every
    fulfillment/settlement pipeline needs and no engine ships as a
    builtin.  Implemented by explicit enumeration of the bounded
    30-day offset domain rather than a closed-form dow formula: the
    enumeration is self-evidently correct, identical in both engines
    (the dow-arithmetic shortcut has 7 boundary cases and engines
    disagree on week-start conventions — Spark dayofweek is
    Sun-based, DuckDB isodow Mon-based; counting sidesteps the
    convention entirely), and extends to holiday calendars by one
    anti-join against a holiday table.

    Exactness: pure calendar/integer program.

    Scale: a constant 30× fan-out on the filtered slice — the
    explode is bounded by the OFFSET domain, not the data; the
    aggregate collapses it right back (map-side)."""
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 200)
    days = orders.select(
        "o_orderkey",
        F.to_date("o_orderdate").alias("start_d"),
        F.explode(F.sequence(F.lit(1), F.lit(30))).alias("i"),
    )
    is_weekday = ~F.dayofweek(
        F.date_add(F.col("start_d"), F.col("i"))
    ).isin(1, 7)
    return (
        days.groupBy("o_orderkey", "start_d")
        .agg(F.count_if(is_weekday).cast("bigint").alias("biz_days"))
        .orderBy("o_orderkey")
    )
