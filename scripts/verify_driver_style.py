"""Driver-style verification gate — run from ANY directory:

    python /root/repo/scripts/verify_driver_style.py [qid ...]

Replicates what the grading driver does (SURVEY §0.1): builds a BARE
SparkSession (none of the repo's builder confs — loaders must
self-heal), imports /root/repo/__spark_entry__.py, smoke-runs entry(),
then for every oracle pair runs the Spark query and the DuckDB SQL at
sf0.01 and compares columns + order-insensitive canonical rows;
queries without an oracle get the driver's weaker rows-only check.
Pass query ids to restrict to a changed subset.

Exit code 0 = green. This is the pre-commit gate: pytest alone cannot
catch worker-pickling and runtime-conf regressions that only appear in
a bare session launched outside the repo (round-1 lesson).
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

import os

SF_DIR = os.environ.get("GDS_VERIFY_SF_DIR", "/root/testdata/sf0.01")


# Queries ALLOWED to emit the runtime `WindowExec: No Partition
# Defined` warning: the plan-audit allowlisted single-partition
# entries plus the audit-benign "pre-reduced input" windows (global
# rank/cume over a keyed-aggregate result — bounded by the value
# domain, not the row count; see plan_audit._unreduced_single_part).
# Any OTHER query emitting it fails the sweep: an unbounded
# single-partition window can't land silently among the budgeted ones
# (VERDICT r7 item 4).
def _window_warn_budget() -> set[str]:
    import json

    allow_path = os.path.join(os.path.dirname(__file__), "plan_audit_allowlist.json")
    with open(allow_path) as fh:
        allow = json.load(fh)
    return set(allow.get("single_part", [])) | set(
        allow.get("window_warn_prereduced", [])
    )


_WINDOW_WARN = "No Partition Defined"


def main() -> int:
    only = set(sys.argv[1:])
    import tempfile

    # Capture EVERYTHING on fd 2 (the JVM writes log4j there) so
    # runtime WindowExec warnings can be attributed per-query; keep a
    # dup of the original stderr for our own status lines.  Must
    # happen BEFORE the JVM launches — it inherits fd 2 at fork.
    real_err = os.fdopen(os.dup(2), "w")
    cap = tempfile.NamedTemporaryFile(
        mode="w+", suffix=".log", prefix="gds_verify_stderr_", delete=False
    )
    os.dup2(cap.fileno(), 2)

    def warn_count() -> int:
        sys.stderr.flush()
        with open(cap.name) as fh:
            return sum(_WINDOW_WARN in line for line in fh)

    rc = 1
    try:
        rc = _sweep(only, real_err, warn_count)
        return rc
    finally:
        # restore the original stderr so a crash traceback (or the
        # caller's subsequent output) isn't swallowed by the capture
        os.dup2(real_err.fileno(), 2)
        cap.close()
        if rc == 0:
            os.unlink(cap.name)  # keep the JVM log only on failure
        else:
            print(f"stderr capture kept for debugging: {cap.name}", file=real_err)


def _sweep(only, real_err, warn_count) -> int:
    import duckdb
    from pyspark.sql import SparkSession

    from helpers import (
        assert_driver_safe_types,
        assert_spark_driver_safe_schema,
        canon_value,
    )

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "entry", "/root/repo/__spark_entry__.py"
    )
    entry_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry_mod)

    n_entry = len(entry_mod.entry(spark).collect())
    print(f"entry rows: {n_entry}", file=real_err)
    ok = n_entry > 0

    queries, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    failures: list[tuple[str, str]] = []
    warn_emitters: list[str] = []
    warns_before_all = warn_count()
    for qid in sorted(queries):
        if only and qid not in only:
            continue
        warns_before = warn_count()
        try:
            try:
                sdf = queries[qid](spark, SF_DIR)
                # the driver pandas-canonicalizes EVERY query's Spark
                # output, rows-only ones included — complex-typed columns
                # crash it there even when no oracle exists (r4 embed_pca)
                assert_spark_driver_safe_schema(sdf, qid)
                s_cols = sdf.columns
                s_rows = sorted(
                    "|".join(canon_value(r[c]) for c in sorted(s_cols))
                    for r in sdf.collect()
                )
                if qid not in oracles:
                    continue  # rows-only: reaching here without raising is the check
                rel = con.sql(oracles[qid])
                d_cols = rel.columns
                # the driver's hash is type-sensitive: HUGEINT/DECIMAL
                # oracle outputs hash-fail even when values match
                assert_driver_safe_types(d_cols, rel.types, qid)
                idx = [d_cols.index(c) for c in sorted(d_cols)]
                d_rows = sorted(
                    "|".join(canon_value(row[i]) for i in idx) for row in rel.fetchall()
                )
                if sorted(s_cols) != sorted(d_cols):
                    failures.append((qid, f"cols {sorted(s_cols)} != {sorted(d_cols)}"))
                elif s_rows != d_rows:
                    diff = next(
                        (f"{a} != {b}" for a, b in zip(s_rows, d_rows) if a != b),
                        f"row counts {len(s_rows)} vs {len(d_rows)}",
                    )
                    failures.append((qid, f"values: {diff[:160]}"))
            except Exception as ex:  # noqa: BLE001 — report, don't abort the sweep
                failures.append((qid, f"ERROR {str(ex)[:160]}"))
        finally:
            # finally (not loop tail): the rows-only `continue` above
            # must still attribute this query's window warnings
            if warn_count() > warns_before:
                warn_emitters.append(qid)

    budget = _window_warn_budget()
    unbudgeted = sorted(set(warn_emitters) - budget)
    for qid in unbudgeted:
        failures.append(
            (qid, "unbudgeted single-partition WindowExec warning — add a "
                  "bounded-input argument to plan_audit_allowlist.json or "
                  "repartition the window")
        )

    checked = len(only) if only else len(queries)
    print(f"checked: {checked} queries ({len(oracles)} oracles registered)")
    print(
        f"single-partition window warnings: {warn_count() - warns_before_all} "
        f"from {len(warn_emitters)} queries (budget list: {len(budget)}): "
        f"{sorted(warn_emitters)}"
    )
    print(f"FAILURES: {failures or 'none'}")
    spark.stop()
    return 0 if (ok and not failures) else 1


if __name__ == "__main__":
    raise SystemExit(main())
