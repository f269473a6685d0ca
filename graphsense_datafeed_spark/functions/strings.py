"""SURVEY §2.8 — string functions (basic / regex / hashing).

The reference's parse-normalize stage is dominated by exactly this
scalar work: hex↔bytes tx-hash handling, field cleanup (SURVEY §2.8
provenance). All functions here are JVM built-ins inside whole-stage
codegen — zero Python boundary, so per-row cost is nanoseconds and the
operators are scan-bound at 100 TB.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from graphsense_datafeed_spark.registry import query
from graphsense_datafeed_spark.sources.tables import load


@query(
    "str_basic",
    """
    SELECT c_custkey,
           concat(c_name, '/', c_mktsegment) AS tagged,
           upper(c_name)  AS name_uc,
           lower(c_mktsegment) AS seg_lc,
           CAST(length(c_name) AS INT) AS name_len,
           trim(concat('  ', c_name, ' ')) AS trimmed,
           substring(c_name, 1, 8) AS name_prefix,
           lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS key_padded
    FROM customer WHERE c_custkey < 500
    """,
)
def str_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").filter(F.col("c_custkey") < 500)
    return c.select(
        "c_custkey",
        F.concat(F.col("c_name"), F.lit("/"), F.col("c_mktsegment")).alias("tagged"),
        F.upper("c_name").alias("name_uc"),
        F.lower("c_mktsegment").alias("seg_lc"),
        F.length("c_name").cast("int").alias("name_len"),
        F.trim(F.concat(F.lit("  "), F.col("c_name"), F.lit(" "))).alias("trimmed"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("key_padded"),
    )


@query(
    "str_split_regex",
    """
    SELECT p_partkey,
           array_to_string(str_split(p_name, ' '), '|') AS name_words,
           CAST(len(str_split(p_name, ' ')) AS INT) AS n_words,
           regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
           regexp_replace(p_type, '[AEIOU]', '_', 'g') AS type_devoweled
    FROM part WHERE p_partkey < 500
    """,
)
def str_split_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex patterns kept POSIX-simple — Java vs RE2-ish dialect
    differences only bite on exotic syntax (SURVEY §2.8). Spark
    regexp_replace is replace-ALL; DuckDB needs the explicit 'g' flag.

    The split array is emitted re-joined ('|') plus its length: the
    driver's pandas row sort crashes on ndarray cells (r2 lesson), so
    the array op is exercised but presented scalar-encoded."""
    p = load(spark, sf_dir, "part").filter(F.col("p_partkey") < 500)
    words = F.split("p_name", " ")
    return p.select(
        "p_partkey",
        F.array_join(words, "|").alias("name_words"),
        F.size(words).alias("n_words"),
        F.regexp_extract("p_brand", "([0-9]+)", 1).alias("brand_num"),
        F.regexp_replace("p_type", "[AEIOU]", "_").alias("type_devoweled"),
    )


@query(
    "str_hash",
    """
    SELECT doc_id,
           sha256(text) AS text_sha256,
           md5(text)    AS text_md5,
           upper(md5(lang)) AS lang_md5_uc,
           to_base64(encode(source)) AS source_b64
    FROM documents WHERE doc_id < 300
    """,
)
def str_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[REF] tx-hash handling: digest + encode surface. sha2/md5 emit
    lowercase hex in both engines; base64 standard alphabet both."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    return d.select(
        "doc_id",
        F.sha2(F.col("text"), 256).alias("text_sha256"),
        F.md5(F.col("text").cast("binary")).alias("text_md5"),
        F.upper(F.md5(F.col("lang").cast("binary"))).alias("lang_md5_uc"),
        F.base64(F.col("source").cast("binary")).alias("source_b64"),
    )


@query(
    "str_collation",
    """
    SELECT segment, n FROM (
      SELECT lower(seg) AS segment, COUNT(*) AS n
      FROM (
        SELECT CASE WHEN c_custkey % 2 = 0
                    THEN upper(substr(c_mktsegment, 1, 1)) ||
                         lower(substr(c_mktsegment, 2))
                    ELSE c_mktsegment END AS seg
        FROM customer
      )
      GROUP BY lower(seg)
    )
    """,
)
def str_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Case-insensitive semantics via Spark 4 COLLATIONS rather than
    lower() rewrites: the input segments are deterministically
    case-mangled (every even custkey → Initcap), then grouped under
    UTF8_LCASE collation — 'BUILDING' and 'Building' are the SAME
    group to the hash aggregate, no normalization expression in the
    grouping key. The output key is lower(any_value) (all group
    members are case-variants of one word, so it is deterministic);
    the oracle states the equivalent lower()-grouping.

    Scale: collation-aware grouping keeps the comparison inside the
    hash agg's binary comparator instead of materializing a second
    normalized column — fewer bytes shuffled on wide text keys."""
    cust = load(spark, sf_dir, "customer")
    seg = F.when(
        F.col("c_custkey") % 2 == 0, F.initcap(F.lower("c_mktsegment"))
    ).otherwise(F.col("c_mktsegment"))
    return (
        cust.select(seg.alias("seg"))
        .groupBy(F.collate("seg", "UTF8_LCASE").alias("k"))
        .agg(F.lower(F.any_value("seg")).alias("segment"), F.count("*").alias("n"))
        .select("segment", "n")
    )


@query(
    "str_luhn_validate",
    """
    WITH cand AS (
        SELECT o_orderkey,
               substr(regexp_replace(md5(CAST(o_orderkey AS VARCHAR)),
                                     '[a-f]', '', 'g') || '0000000000000000',
                      1, 12) AS digits
        FROM orders WHERE o_orderkey < 300
    ), summed AS (
        SELECT o_orderkey, digits,
               CAST(list_reduce(list_transform(range(1, 13), i ->
                   CASE WHEN (13 - i) % 2 = 0 THEN
                       CASE WHEN 2 * CAST(substr(digits,
                                CAST(i AS INT), 1) AS BIGINT) > 9
                            THEN 2 * CAST(substr(digits,
                                CAST(i AS INT), 1) AS BIGINT) - 9
                            ELSE 2 * CAST(substr(digits,
                                CAST(i AS INT), 1) AS BIGINT) END
                   ELSE CAST(substr(digits, CAST(i AS INT), 1) AS BIGINT)
                   END), (a, b) -> a + b) AS BIGINT) AS luhn_sum
        FROM cand
    )
    SELECT o_orderkey, digits, luhn_sum,
           luhn_sum % 10 = 0 AS is_valid
    FROM summed ORDER BY o_orderkey
    """,
)
def str_luhn_validate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LUHN CHECKSUM VALIDATION (round 11): the mod-10 double-every-
    second-digit-from-the-right check over deterministic 12-digit
    candidates (md5 digits, zero-padded) — the validation rung ABOVE
    text_pii_scrub's regex detection: a 16-digit run that fails Luhn
    is a serial number, not a card, and scrubbing it is a false
    positive that destroys legitimate data.  Shipping the checksum
    as a first-class scalar program (pure transform/aggregate
    lambdas, no UDF) is what lets the PII pipeline run it inline at
    scan speed.

    Exactness: digit extraction and the doubled-digit fold are pure
    integer programs over bounded 12-element index ranges, identical
    in both engines; position parity is computed from the RIGHT
    ((13−i) even ⇔ doubled), the part every hand-rolled Luhn gets
    wrong first.

    Scale: narrow per-row transform, no shuffle, no Python."""
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 300)
    digits = F.substring(
        F.concat(
            F.regexp_replace(
                F.md5(F.col("o_orderkey").cast("string").cast("binary")),
                "[a-f]",
                "",
            ),
            F.lit("0000000000000000"),
        ),
        1,
        12,
    )
    cand = orders.select("o_orderkey", digits.alias("digits"))
    luhn_sum = F.aggregate(
        F.sequence(F.lit(1), F.lit(12)),
        F.lit(0).cast("bigint"),
        lambda acc, i: acc
        + F.when(
            (13 - i) % 2 == 0,
            F.when(
                2 * F.substring(F.col("digits"), i.cast("int"), 1).cast("bigint") > 9,
                2 * F.substring(F.col("digits"), i.cast("int"), 1).cast("bigint") - 9,
            ).otherwise(
                2 * F.substring(F.col("digits"), i.cast("int"), 1).cast("bigint")
            ),
        ).otherwise(F.substring(F.col("digits"), i.cast("int"), 1).cast("bigint")),
    )
    return (
        cand.select(
            "o_orderkey",
            "digits",
            luhn_sum.cast("bigint").alias("luhn_sum"),
        )
        .withColumn("is_valid", F.col("luhn_sum") % 10 == 0)
        .orderBy("o_orderkey")
    )
