"""The plan-audit tool itself: flag detection on planted plans and
allowlist hygiene (every allowlisted qid must still exist)."""

import json
import os
import sys

sys.path.insert(0, "/root/repo/scripts")

from plan_audit import ALLOWLIST_PATH, audit_plan  # noqa: E402


def test_audit_flags_planted_shapes(spark, sf_dir):
    from graphsense_datafeed_spark.sources.tables import load

    import io
    from contextlib import redirect_stdout

    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    cart = n.crossJoin(r)  # deliberate cartesian
    buf = io.StringIO()
    with redirect_stdout(buf):
        cart.explain("formatted")
    flags = audit_plan(buf.getvalue())
    assert flags["cartesian"] or flags["bnlj"]  # small side may broadcast

    clean = n.join(r, n.n_regionkey == r.r_regionkey).groupBy("r_name").count()
    buf = io.StringIO()
    with redirect_stdout(buf):
        clean.explain("formatted")
    flags = audit_plan(buf.getvalue())
    assert not flags["cartesian"]
    assert not flags["row_udf"]


def test_allowlist_entries_are_live_queries():
    from graphsense_datafeed_spark.registry import QUERIES, load_all_operators

    load_all_operators()
    allow = json.load(open(ALLOWLIST_PATH))
    dead = {
        qid
        for qids in allow.values()
        for qid in qids
        if qid not in QUERIES
    }
    assert not dead, f"allowlist references deleted queries: {dead}"
    # the audit's whole point: no cartesian is ever acceptable
    assert allow["cartesian"] == []
