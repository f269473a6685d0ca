"""SURVEY §2.8 — math + conditional scalar functions.

Cross-engine traps handled (SURVEY §2.12):
- pmod: Spark pmod is always-nonnegative; SQL % keeps the dividend
  sign → oracle spells out ((a % b) + b) % b.
- round: only applied where the true value's decimals ≤ the rounding
  digits (no HALF_UP/HALF_EVEN ties possible).
- log/pow on doubles: libm results can differ in the last ulp between
  engines → rounded to 6 places.
- try_divide ↔ nullif-guarded division (ANSI mode raises on /0 in BOTH
  engines — parity of the error is useless, parity of NULL is testable).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from graphsense_datafeed_spark.registry import query
from graphsense_datafeed_spark.sources.tables import load


@query(
    "math_basic",
    """
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice, 1) AS price_r1,
           ABS(l_discount - 0.05) AS disc_dev,
           CAST(CEIL(l_extendedprice)  AS BIGINT) AS price_ceil,
           CAST(FLOOR(l_extendedprice) AS BIGINT) AS price_floor,
           CAST(((CAST(l_quantity AS INT) - 25) % 7 + 7) % 7 AS INT) AS qty_pmod7,
           ROUND(pow(l_quantity, 2), 4) AS qty_sq,
           ROUND(ln(l_extendedprice), 6) AS price_ln,
           ROUND(sqrt(l_quantity), 6) AS qty_sqrt,
           CAST(sign(l_discount - 0.05) AS INT) AS disc_sign
    FROM lineitem WHERE l_orderkey < 1000
    """,
)
def math_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """price_r1 note: l_extendedprice has exactly 2 decimals, so
    rounding at 1 digit can tie (x.x5) — but the HALF_UP/HALF_EVEN
    divergence needs the stored double to sit EXACTLY on the tie, and
    no 2-decimal non-.0/.5 fraction is exactly representable in
    binary; both engines see the same off-tie double and agree.
    (Verified over every fixture price at sf0.1.)"""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 1000)
    qty_int = F.col("l_quantity").cast("int")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("price_r1"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.ceil("l_extendedprice").cast("bigint").alias("price_ceil"),
        F.floor("l_extendedprice").cast("bigint").alias("price_floor"),
        F.pmod(qty_int - 25, F.lit(7)).cast("int").alias("qty_pmod7"),
        F.round(F.pow("l_quantity", F.lit(2)), 4).alias("qty_sq"),
        F.round(F.log(F.col("l_extendedprice")), 6).alias("price_ln"),
        F.round(F.sqrt("l_quantity"), 6).alias("qty_sqrt"),
        F.signum(F.col("l_discount") - 0.05).cast("int").alias("disc_sign"),
    )


@query(
    "cond_case",
    """
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 250000.0 THEN 'high'
                WHEN o_totalprice > 100000.0 THEN 'mid'
                ELSE 'low' END AS price_band,
           coalesce(nullif(o_orderstatus, 'O'), 'open') AS status_or_open,
           greatest(o_totalprice, 150000.0) AS at_least_150k,
           least(CAST(o_orderkey % 100 AS BIGINT), CAST(o_custkey % 100 AS BIGINT))
               AS min_mod,
           CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS is_urgent
    FROM orders WHERE o_orderkey < 2000
    """,
)
def cond_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 250000.0, "high")
        .when(F.col("o_totalprice") > 100000.0, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("open")).alias(
            "status_or_open"
        ),
        F.greatest(F.col("o_totalprice"), F.lit(150000.0)).alias("at_least_150k"),
        F.least(
            (F.col("o_orderkey") % 100).cast("bigint"),
            (F.col("o_custkey") % 100).cast("bigint"),
        ).alias("min_mod"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1)
        .otherwise(0)
        .cast("int")
        .alias("is_urgent"),
    )


@query(
    "math_safe_div",
    """
    SELECT l_orderkey, l_linenumber,
           CAST(FLOOR(l_extendedprice / nullif(l_quantity, 0.0) * 10000) AS BIGINT)
               AS unit_price_e4,
           l_extendedprice / nullif(l_discount - l_discount, 0.0) AS div_by_null,
           CAST(FLOOR(COALESCE(l_tax / nullif(l_discount, 0.0), -1.0) * 10000)
               AS BIGINT) AS tax_per_disc_e4
    FROM lineitem WHERE l_orderkey < 500
    """,
)
def math_safe_div(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe division: try_divide ↔ nullif-guard (both engines
    raise on bare /0 under ANSI — SURVEY §2.12-4).

    Division results are emitted floor-scaled, not ROUNDed: the IEEE
    quotient is bit-identical cross-engine, so FLOOR is deterministic,
    while ROUND diverges on exact half-ties (HALF_UP vs HALF_EVEN —
    caught live at sf0.01)."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 500)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.floor(F.try_divide("l_extendedprice", "l_quantity") * 10000)
        .cast("bigint")
        .alias("unit_price_e4"),
        F.try_divide(
            F.col("l_extendedprice"),
            F.nullif(F.col("l_discount") - F.col("l_discount"), F.lit(0.0)),
        ).alias("div_by_null"),
        F.floor(
            F.coalesce(
                F.try_divide("l_tax", F.nullif(F.col("l_discount"), F.lit(0.0))),
                F.lit(-1.0),
            )
            * 10000
        )
        .cast("bigint")
        .alias("tax_per_disc_e4"),
    )


@query(
    "cast_try",
    """
    SELECT event_id,
           TRY_CAST(json_extract_string(props, '$.k') AS INT) AS k_ok,
           TRY_CAST(json_extract_string(props, '$.k') || 'x' AS INT) AS k_bad,
           TRY_CAST(event_type AS DOUBLE) AS et_num,
           TRY_CAST(NULL AS BIGINT) AS null_thru
    FROM events WHERE event_id < 1000
    """,
)
def cast_try(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe casting: under ANSI mode (Spark 4's default) a
    malformed CAST raises and kills the 100 TB job at task 9,999 of
    10,000 — `try_cast` turns per-row garbage into NULLs the pipeline
    can quarantine instead (the scan_json_corrupt philosophy applied
    to scalar conversion). Valid numeric string → value; corrupted
    string / non-numeric text → NULL; NULL propagates. Identical
    TRY_CAST semantics in the oracle."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") < 1000)
    k = F.get_json_object("props", "$.k")
    return ev.select(
        "event_id",
        k.try_cast("int").alias("k_ok"),
        F.concat(k, F.lit("x")).try_cast("int").alias("k_bad"),
        F.col("event_type").try_cast("double").alias("et_num"),
        F.lit(None).try_cast("bigint").alias("null_thru"),
    )
