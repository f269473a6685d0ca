"""Explicit StructType schemas for every fixture table.

The reference declares its data model as fixed CQL DDL (the GraphSense
``schema.cql`` convention — SURVEY.md §1.2); this module is the Spark
counterpart: production reads never rely on schema inference
(SURVEY.md §1.3). Schemas below were extracted from the real parquet
files (FIXTURES.md) and are asserted against them in tests.

``events.ts`` has two raw schemas because the fixture generator has
shipped BOTH ``timestamp[ns]`` (rounds 1-2) and ``timestamp[us]``
(round 3) files. For ns files, ``spark.sql.legacy.parquet.nanosAsLong
=true`` (session.py) surfaces ts as int64 and the loader truncates to
µs; for µs files the column maps straight to TIMESTAMP_NTZ. Either
way the loaded column is bit-identical to DuckDB's read of the same
file. The loader detects the unit from the file footer per path
(sources/tables.py:events_ts_unit).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)


def _s(*fields: tuple) -> StructType:
    return StructType([StructField(n, t, True) for n, t in fields])


REGION = _s(("r_regionkey", IntegerType()), ("r_name", StringType()))

NATION = _s(
    ("n_nationkey", IntegerType()),
    ("n_name", StringType()),
    ("n_regionkey", IntegerType()),
)

SUPPLIER = _s(
    ("s_suppkey", LongType()),
    ("s_name", StringType()),
    ("s_nationkey", IntegerType()),
    ("s_acctbal", DoubleType()),
)

CUSTOMER = _s(
    ("c_custkey", LongType()),
    ("c_name", StringType()),
    ("c_nationkey", IntegerType()),
    ("c_acctbal", DoubleType()),
    ("c_mktsegment", StringType()),
)

PART = _s(
    ("p_partkey", LongType()),
    ("p_name", StringType()),
    ("p_brand", StringType()),
    ("p_type", StringType()),
    ("p_size", IntegerType()),
    ("p_retailprice", DoubleType()),
)

ORDERS = _s(
    ("o_orderkey", LongType()),
    ("o_custkey", LongType()),
    ("o_orderstatus", StringType()),
    ("o_totalprice", DoubleType()),
    ("o_orderdate", TimestampNTZType()),
    ("o_orderpriority", StringType()),
)

LINEITEM = _s(
    ("l_orderkey", LongType()),
    ("l_partkey", LongType()),
    ("l_suppkey", LongType()),
    ("l_linenumber", IntegerType()),
    ("l_quantity", DoubleType()),
    ("l_extendedprice", DoubleType()),
    ("l_discount", DoubleType()),
    ("l_tax", DoubleType()),
    ("l_returnflag", StringType()),
    ("l_linestatus", StringType()),
    ("l_shipdate", TimestampNTZType()),
)

# Raw as-read schema for NANOSECOND files (ts = int64 ns via
# nanosAsLong; see module docstring).  The fixture generator has
# shipped both units across rounds, so the loader detects the unit per
# file (sources/tables.py) and picks the matching schema.
EVENTS_RAW = _s(
    ("event_id", LongType()),
    ("ts", LongType()),
    ("user_id", LongType()),
    ("event_type", StringType()),
    ("value", DoubleType()),
    ("props", StringType()),
)

# Schema for MICROSECOND files (naive timestamp[us] → TIMESTAMP_NTZ,
# identical to DuckDB's read — no conversion needed).
EVENTS_US = _s(
    ("event_id", LongType()),
    ("ts", TimestampNTZType()),
    ("user_id", LongType()),
    ("event_type", StringType()),
    ("value", DoubleType()),
    ("props", StringType()),
)

DOCUMENTS = _s(
    ("doc_id", LongType()),
    ("text", StringType()),
    ("lang", StringType()),
    ("source", StringType()),
    ("n_chars", LongType()),
)

EMBEDDINGS = _s(
    ("vec_id", LongType()),
    ("embedding", ArrayType(FloatType())),
    ("label", IntegerType()),
)

TABLE_SCHEMAS: dict[str, StructType] = {
    "region": REGION,
    "nation": NATION,
    "supplier": SUPPLIER,
    "customer": CUSTOMER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS_RAW,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}

TABLES = tuple(TABLE_SCHEMAS)

# Dimensionality of the fixture embedding vectors (FIXTURES.md).
EMBEDDING_DIM = 64
