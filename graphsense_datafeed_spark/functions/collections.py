"""SURVEY §2.8 — array / higher-order / map / JSON functions.

[REF] provenance: the datafeed's signature shape is nested
array-of-struct (tx inputs/outputs) flattened one row per element, plus
`map<text,float>` exchange rates and raw block JSON (SURVEY §1.2). The
fixtures exercise the same surface via documents tokens, embedding
vectors, the rates CSV and events.props.

Engineering notes:
- Higher-order functions (transform/filter/aggregate/zip_with) run
  JVM-side inside codegen — this is the no-UDF way to do vector math
  on array columns and the backbone of llm_similarity/multimodal.
- Float lists: elements are widened float→double identically by both
  engines; left-fold accumulation order is deterministic and equal, so
  rounded results hash-match.
- MAP-typed columns are never emitted in checked queries (engines
  disagree on the client-side representation); derived scalars are.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from graphsense_datafeed_spark.registry import query
from graphsense_datafeed_spark.sources.tables import load
from graphsense_datafeed_spark.sources.scans import RATES_CSV, read_rates_csv


@query(
    "arr_explode",
    """
    SELECT doc_id,
           unnest(str_split(text, ' ')) AS word,
           CAST(generate_subscripts(str_split(text, ' '), 1) - 1 AS INT) AS pos
    FROM documents WHERE doc_id < 60
    """,
)
def arr_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode array→rows — THE datafeed shape (tx outputs to one
    row per output; SURVEY §2.8 arr_explode). Explode multiplies rows
    before any shuffle: at scale, project to the minimal column set
    first so the blow-up carries no dead weight."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 60)
    return d.select(
        "doc_id",
        F.posexplode(F.split("text", " ")).alias("pos", "word"),
    ).select("doc_id", "word", F.col("pos").cast("int"))


@query(
    "arr_funcs",
    """
    SELECT doc_id,
           CAST(len(str_split(text, ' ')) AS INT) AS n_words,
           list_contains(str_split(text, ' '), 'spark') AS has_spark,
           array_to_string(list_sort(list_distinct(str_split(text, ' '))), '|')
               AS vocab,
           array_to_string(str_split(text, ' ')[1:5], '|') AS first5,
           array_to_string(flatten([str_split(text, ' ')[1:2],
                                    str_split(text, ' ')[3:4]]), '|')
               AS stitched
    FROM documents WHERE doc_id < 60
    """,
)
def arr_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """size/contains/sort/slice/distinct/flatten. array_distinct
    preserves first-occurrence order in Spark but is unspecified in
    DuckDB → always sort after distinct when order matters. Array
    results are emitted '|'-joined: the driver's pandas row sort
    crashes on ndarray cells (r2 lesson)."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 60)
    words = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(words).alias("n_words"),
        F.array_contains(words, "spark").alias("has_spark"),
        F.array_join(F.array_sort(F.array_distinct(words)), "|").alias("vocab"),
        F.array_join(F.slice(words, 1, 5), "|").alias("first5"),
        F.array_join(
            F.flatten(F.array(F.slice(words, 1, 2), F.slice(words, 3, 2))), "|"
        ).alias("stitched"),
    )


@query(
    "arr_lambda",
    """
    SELECT vec_id,
           ROUND(list_reduce(list_transform(embedding,
                     x -> CAST(x AS DOUBLE) * x), (a, b) -> a + b), 4)
               AS norm_sq,
           ROUND(list_reduce(list_transform(list_zip(embedding,
                     list_reverse(embedding)),
                     p -> CAST(p[1] AS DOUBLE) * p[2]), (a, b) -> a + b), 4)
               AS dot_reversed,
           CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_positive
    FROM embeddings WHERE vec_id < 300
    """,
)
def arr_lambda(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order lambdas doing vector math JVM-side (no UDF): the
    exact pattern llm_similarity scales up. Left-fold order is
    deterministic and identical cross-engine → rounded parity."""
    e = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 300)
    dbl = lambda x: x.cast("double")  # noqa: E731
    return e.select(
        "vec_id",
        F.round(
            F.aggregate(
                "embedding", F.lit(0.0), lambda acc, x: acc + dbl(x) * x
            ),
            4,
        ).alias("norm_sq"),
        F.round(
            F.aggregate(
                F.zip_with("embedding", F.reverse("embedding"), lambda x, y: dbl(x) * y),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ),
            4,
        ).alias("dot_reversed"),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_positive"),
    )


@query(
    "map_funcs",
    f"""
    SELECT date,
           map_extract(MAP {{'usd': usd, 'eur': eur}}, 'usd')[1] AS usd_rate,
           map_extract(MAP {{'usd': usd, 'eur': eur}}, 'eur')[1] AS eur_rate,
           array_to_string(list_sort(map_keys(MAP {{'usd': usd, 'eur': eur}})), '|')
               AS currencies,
           CAST(cardinality(MAP {{'usd': usd, 'eur': eur}}) AS INT) AS n_currencies
    FROM read_csv('{RATES_CSV}', header=true,
                  columns={{'date':'DATE','usd':'DOUBLE','eur':'DOUBLE'}})
    WHERE date < DATE '2009-06-01'
    """,
)
def map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[REF] `exchange_rates map<text,float>` — build, probe and
    enumerate a map column; only derived scalars are emitted (the key
    list '|'-joined — array cells crash the driver's pandas sort)."""
    r = read_rates_csv(spark).filter(F.col("date") < F.lit("2009-06-01").cast("date"))
    m = F.create_map(
        F.lit("usd"), F.col("usd"), F.lit("eur"), F.col("eur")
    )
    return r.select(
        "date",
        F.element_at(m, "usd").alias("usd_rate"),
        F.element_at(m, "eur").alias("eur_rate"),
        F.array_join(F.array_sort(F.map_keys(m)), "|").alias("currencies"),
        F.size(m).alias("n_currencies"),
    )


@query(
    "json_funcs",
    """
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_int,
           CAST(to_json(struct_pack(k := CAST(json_extract_string(props, '$.k')
                AS INT))) AS VARCHAR) AS rebuilt,
           CAST(json_extract_string(props, '$.missing') AS VARCHAR) AS absent
    FROM events WHERE event_id < 2000
    """,
)
def json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[REF] block-JSON field extraction; events.props is the JSON
    fixture. get_json_object for ad-hoc paths; from_json → typed struct
    when the schema is known (always known in the ingest facade)."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    parsed = F.from_json("props", "k INT")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        parsed.getField("k").alias("k_int"),
        F.to_json(F.struct(parsed.getField("k").alias("k"))).alias("rebuilt"),
        F.get_json_object("props", "$.missing").alias("absent"),
    )


@query(
    "json_variant",
    """
    SELECT CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_bucket,
           COUNT(*) AS n,
           MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS min_k
    FROM events GROUP BY 1
    """,
)
def json_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured JSON through Spark 4's VARIANT type:
    parse_json keeps the document in a binary-encoded form (parsed
    once, no re-tokenization per field access — the at-scale
    difference vs get_json_object, which re-parses the string per
    call) and variant_get path-extracts with a target type. DuckDB
    side uses its native JSON extraction — same values, different
    encodings, so the oracle compares the extracted typed results."""
    e = load(spark, sf_dir, "events")
    v = e.select(F.parse_json("props").alias("v"))
    k = F.variant_get(F.col("v"), "$.k", "bigint")
    return v.select((k % 10).alias("k_bucket"), k.alias("kk")).groupBy(
        "k_bucket"
    ).agg(F.count("*").alias("n"), F.min("kk").alias("min_k"))


@query(
    "arr_set_algebra",
    """
    WITH t AS (
        SELECT doc_id,
               str_split(text, ' ')[1:12]  AS head,
               str_split(text, ' ')[7:18] AS mid
        FROM documents WHERE doc_id < 60
    )
    SELECT doc_id,
           array_to_string(list_sort(list_distinct(
               flatten([head, mid]))), '|') AS union_words,
           array_to_string(list_sort(list_intersect(
               list_distinct(head), list_distinct(mid))), '|')
               AS common_words,
           array_to_string(list_sort(list_filter(list_distinct(head),
               w -> NOT list_contains(mid, w))), '|') AS head_only,
           list_has_any(head, mid) AS overlaps
    FROM t
    """,
)
def arr_set_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set algebra — union/intersect/except/overlap on the two
    (overlapping) leading windows of each document's tokens. Results
    sorted then '|'-joined (set-op output order is engine-unspecified;
    array cells crash the driver compare). arrays_overlap gives the
    cheap existence probe that short-circuits before materializing an
    intersection."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 60)
    words = F.split("text", " ")
    head, mid = F.slice(words, 1, 12), F.slice(words, 7, 12)
    dedup = F.array_distinct
    return d.select(
        "doc_id",
        F.array_join(F.array_sort(dedup(F.concat(head, mid))), "|").alias(
            "union_words"
        ),
        F.array_join(
            F.array_sort(F.array_intersect(dedup(head), dedup(mid))), "|"
        ).alias("common_words"),
        F.array_join(F.array_sort(F.array_except(dedup(head), mid)), "|").alias(
            "head_only"
        ),
        F.arrays_overlap(head, mid).alias("overlaps"),
    )
