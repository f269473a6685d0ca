"""Local replica of the driver's t2 comparison (SURVEY §0.1).

Driver semantics being mirrored: row-count + schema + order-insensitive
value-hash, with columns sorted by name before hashing. We compare
canonicalized sorted row multisets directly (small SF), which is
strictly at least as strong as comparing hashes of the same.
"""

from __future__ import annotations

import datetime
import math
import re
from decimal import Decimal

# Types the driver's hash cannot be trusted with (round-1 lesson: DuckDB
# SUM(BIGINT) -> HUGEINT hash-failed 3 queries whose VALUES matched,
# because the driver's value-hash is type-sensitive while our canon_value
# collapses HUGEINT/Decimal into int/float).  The pattern is matched
# against the full DuckDB type string, so list/struct element types are
# covered too (e.g. "STRUCT(v HUGEINT)[]").
#
# Round-2 lesson: the driver's compare converts both sides to pandas and
# sorts rows with DataFrame.sort_values over every column; ndarray /
# bytearray / dict cells are unhashable there, so LIST/STRUCT/MAP/BLOB
# output columns CRASH its compare (agg_collect, str_split_regex, …).
# Oracle-checked queries must scalar-encode them (array_join / sha256).
_UNSAFE_DUCK_TYPE = re.compile(
    r"HUGEINT|DECIMAL|UBIGINT|UINTEGER|USMALLINT|UTINYINT"
    r"|\[\]|LIST|STRUCT|MAP|BLOB|UNION"
)


def assert_driver_safe_types(columns, types, qid: str = "query") -> None:
    """Fail if any DuckDB oracle output column has a type the driver's
    type-sensitive value-hash would diverge on (HUGEINT, DECIMAL, and
    unsigned ints). Oracles must CAST such expressions to
    BIGINT/DOUBLE so both engines hand the driver the same wire type."""
    bad = [(c, str(t)) for c, t in zip(columns, types) if _UNSAFE_DUCK_TYPE.search(str(t))]
    if bad:
        raise AssertionError(
            f"{qid}: oracle output types unsafe for the driver hash: {bad}; "
            "wrap the expression in CAST(... AS BIGINT) / CAST(... AS DOUBLE)"
        )


def assert_spark_driver_safe_schema(sdf, qid: str = "query") -> None:
    """Fail if the SPARK result schema contains ARRAY/MAP/STRUCT
    columns. The driver canonicalizes EVERY query's Spark output —
    oracle-checked or rows-only — through a pandas lexsort before
    hashing, and ndarray/dict cells are unhashable there (round-4 red
    row: `embed_pca` returned array<double> and the driver recorded
    `TypeError: unhashable type: 'numpy.ndarray'` instead of even a
    rows-only pass). Scalar-encode complex columns instead
    (array_join / concat_ws / sha256 digest)."""
    from pyspark.sql import types as T

    bad = [
        (f.name, f.dataType.simpleString())
        for f in sdf.schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]
    if bad:
        raise AssertionError(
            f"{qid}: Spark output columns unsafe for the driver's pandas "
            f"canonicalization: {bad}; encode them to scalars "
            "(array_join / concat_ws / sha2)"
        )


def canon_value(v):
    """Canonicalize one cell for cross-engine comparison."""
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, (int,)):
        return f"i:{v}"
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "f:nan"
        # exact repr — engines must agree to the bit after our own
        # rounding discipline (SURVEY §2.12-3/6); normalize -0.0 and
        # integral floats so 5.0 (Spark double) == 5 (duckdb HUGEINT).
        if v == 0.0:
            v = 0.0
        return f"f:{v!r}"
    if isinstance(v, datetime.datetime):
        return "t:" + v.isoformat(timespec="microseconds")
    if isinstance(v, datetime.date):
        return "d:" + v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return "x:" + bytes(v).hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_value(x) for x in v) + "]"
    if isinstance(v, dict):
        items = sorted((str(k), canon_value(x)) for k, x in v.items())
        return "{" + ",".join(f"{k}={x}" for k, x in items) + "}"
    return "s:" + str(v)


def _row_multiset(cols: list[str], rows) -> list[str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        "|".join(canon_value(row[i]) for i in order) for row in rows
    )


def assert_parity(spark, ddb, qid: str, sf_dir: str, queries=None, oracles=None):
    """Run queries()[qid] on Spark and oracle_sql()[qid] on DuckDB, then
    compare column-name sets and order-insensitive canonical rows."""
    from graphsense_datafeed_spark import registry

    queries = queries or registry.QUERIES
    oracles = oracles or registry.ORACLES
    sdf = queries[qid](spark, sf_dir)
    assert_spark_driver_safe_schema(sdf, qid)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]

    rel = ddb.sql(oracles[qid])
    d_cols = rel.columns
    assert_driver_safe_types(d_cols, rel.types, qid)
    d_rows = rel.fetchall()

    assert sorted(s_cols) == sorted(d_cols), (
        f"{qid}: column mismatch spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), (
        f"{qid}: row count spark={len(s_rows)} duckdb={len(d_rows)}"
    )
    sm = _row_multiset(list(s_cols), s_rows)
    dm = _row_multiset(list(d_cols), d_rows)
    if sm != dm:
        diffs = [(a, b) for a, b in zip(sm, dm) if a != b][:5]
        raise AssertionError(f"{qid}: value mismatch; first diffs: {diffs}")
