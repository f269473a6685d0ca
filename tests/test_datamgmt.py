"""Dataset-management operators: the branches the fixture data cannot
exercise (CDC deletes) plus structural sanity of the graph stats.

The registered queries themselves are exact-oracle checked by
test_parity.py; these tests cover what the oracles can't."""

import pyspark.sql.functions as F


def test_cdc_delete_branch(spark):
    """A key present only in snapshot A must classify as 'delete' —
    the fixture snapshots are append-plus-amend so the oracle never
    sees one; exercise the branch on synthetic frames with the same
    classification expression as cdc_snapshot_diff."""
    a = spark.createDataFrame(
        [(1, "O"), (2, "P"), (3, "F")], ["a_key", "a_status"]
    )
    b = spark.createDataFrame(
        [(2, "F"), (3, "F"), (4, "O")], ["b_key", "b_status"]
    )
    joined = a.join(b, a.a_key == b.b_key, "full_outer")
    out = {
        r["o_orderkey"]: r["change_type"]
        for r in joined.filter(
            F.col("a_key").isNull()
            | F.col("b_key").isNull()
            | (F.col("a_status") != F.col("b_status"))
        )
        .select(
            F.coalesce("a_key", "b_key").alias("o_orderkey"),
            F.when(F.col("a_key").isNull(), "insert")
            .when(F.col("b_key").isNull(), "delete")
            .otherwise("update")
            .alias("change_type"),
        )
        .collect()
    }
    assert out == {1: "delete", 2: "update", 4: "insert"}


def test_triangle_count_known_graph(spark):
    """K4 minus one edge contains exactly 2 triangles; verify the
    oriented wedge-close program on a graph whose answer is known
    (independent of the fixture edge set)."""
    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d")],
        ["src", "dst"],
    )
    e1, e2, e3 = edges.alias("e1"), edges.alias("e2"), edges.alias("e3")
    n = (
        e1.join(e2, F.col("e2.src") == F.col("e1.dst"))
        .join(
            e3,
            (F.col("e3.src") == F.col("e1.src"))
            & (F.col("e3.dst") == F.col("e2.dst")),
            "left_semi",
        )
        .count()
    )
    assert n == 2


def test_prefix_filter_prunes_candidates(spark, sf_dir):
    """The rarity-ordered prefix must generate strictly fewer candidate
    pairs than the plain shared-any-shingle join — the sub-quadratic
    claim, measured, not asserted from theory."""
    import pyspark.sql.functions as F

    from graphsense_datafeed_spark.operators.llm_dedup import shingle_arrays
    from graphsense_datafeed_spark.sources.tables import load

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    sh = shingle_arrays(docs).select("doc_id", F.explode("arr").alias("s"))
    plain = (
        sh.alias("x")
        .join(
            sh.alias("y"),
            (F.col("x.s") == F.col("y.s"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select("x.doc_id", "y.doc_id")
        .distinct()
        .count()
    )
    df_tab = sh.groupBy("s").agg(F.count("*").alias("df"))
    pre = (
        sh.join(F.broadcast(df_tab), "s")
        .groupBy("doc_id")
        .agg(
            F.sort_array(F.collect_list(F.struct("df", "s"))).alias("o"),
            F.count("*").alias("n"),
        )
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.slice(
                        "o", 1,
                        (F.col("n") - F.ceil(F.col("n") * F.lit(0.5)) + 1).cast("int"),
                    ),
                    lambda x: x["s"],
                )
            ).alias("s"),
        )
    )
    pruned = (
        pre.alias("x")
        .join(
            pre.alias("y"),
            (F.col("x.s") == F.col("y.s"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select("x.doc_id", "y.doc_id")
        .distinct()
        .count()
    )
    assert 0 < pruned < plain, (pruned, plain)


def test_layout_compact_file_count_and_clustering(spark, sf_dir):
    """Compaction must collapse the 64 staged shards into ≤4
    range-clustered files whose event_id bands do not overlap (the
    property row-group pruning relies on), preserving every row."""
    import glob

    import pyarrow.parquet as pq

    from graphsense_datafeed_spark.registry import QUERIES
    from graphsense_datafeed_spark.sources.tables import load, staged_source_dir

    out = QUERIES["layout_compact"](spark, sf_dir)
    assert out.count() == load(spark, sf_dir, "events").count()

    # same fingerprint-keyed staging base the operator uses
    base = staged_source_dir(sf_dir, "gds_compact", "events")
    frag = glob.glob(f"{base}/fragmented/*.parquet")
    comp = glob.glob(f"{base}/compacted/*.parquet")
    assert len(frag) == 64
    assert 0 < len(comp) <= 4
    bands = []
    for f in comp:
        t = pq.read_table(f, columns=["event_id"])
        ids = t.column("event_id").to_pylist()
        bands.append((min(ids), max(ids)))
    bands.sort()
    for (_, hi), (lo, _) in zip(bands, bands[1:]):
        assert hi < lo  # non-overlapping ranges → min/max skipping works


def test_profile_skew_shares_and_rank(spark, sf_dir):
    """Top-10 heavy hitters: ranks 1..10, counts non-increasing, and
    every share_e4 consistent with the full table's totals."""
    from graphsense_datafeed_spark.registry import QUERIES
    from graphsense_datafeed_spark.sources.tables import load

    rows = QUERIES["profile_skew"](spark, sf_dir).orderBy("rank").collect()
    total = load(spark, sf_dir, "events").count()
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    counts = [r["n_events"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    for r in rows:
        assert r["share_e4"] == int(r["n_events"] / total * 10000)


def test_win_count_distinct_monotone_and_bounded(spark, sf_dir):
    """Cumulative distinct count per user: non-decreasing along the
    event order and finally equal to the user's true distinct count."""
    import pyspark.sql.functions as F

    from graphsense_datafeed_spark.registry import QUERIES
    from graphsense_datafeed_spark.sources.tables import load

    out = QUERIES["win_count_distinct"](spark, sf_dir)
    final = {
        r["user_id"]: r["mx"]
        for r in out.groupBy("user_id").agg(F.max("distinct_types_so_far").alias("mx")).collect()
    }
    truth = {
        r["user_id"]: r["d"]
        for r in load(spark, sf_dir, "events")
        .filter(F.col("user_id") < 40)
        .groupBy("user_id")
        .agg(F.countDistinct("event_type").alias("d"))
        .collect()
    }
    assert final == truth


def test_scd_type2_intervals_tile_and_compress(spark, sf_dir):
    """Version chains must tile (each valid_to equals the next
    valid_from), end open (exactly one current version per key), and
    be maximally compressed (adjacent versions always differ)."""
    from graphsense_datafeed_spark.registry import QUERIES

    rows = QUERIES["scd_type2"](spark, sf_dir).collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    assert by_user
    for uid, vs in by_user.items():
        vs.sort(key=lambda r: r["valid_from"])
        assert sum(1 for r in vs if r["is_current"]) == 1, uid
        assert vs[-1]["valid_to"] is None and vs[-1]["is_current"]
        for a, b in zip(vs, vs[1:]):
            assert a["valid_to"] == b["valid_from"], uid
            assert a["event_type"] != b["event_type"], uid


def test_apply_changes_handles_deletes(spark):
    """MERGE closure incl. the delete branch (the fixture scenario has
    none): insert adds, update replaces, delete removes, untouched
    rows survive."""
    from graphsense_datafeed_spark.operators.datamgmt import apply_changes

    base = spark.createDataFrame(
        [(1, "A"), (2, "B"), (3, "C")], "k bigint, v string"
    )
    changes = spark.createDataFrame(
        [(4, "D", "insert"), (2, "B2", "update"), (3, None, "delete")],
        "k bigint, v string, change_type string",
    )
    got = {(r["k"], r["v"]) for r in apply_changes(base, changes, "k").collect()}
    assert got == {(1, "A"), (2, "B2"), (4, "D")}


def test_staged_dirs_rebuild_on_fixture_regeneration(spark, sf_dir, tmp_path):
    """The ADVICE-r3 hazard, rehearsed: staged /tmp derivatives must
    REBUILD when the source fixture is regenerated in place (the
    driver does this between rounds), not serve the stale copy. Builds
    a private sf_dir, runs the staged operators, rewrites events and
    supplier with fewer rows at the same paths, and asserts the
    second run reflects the new contents."""
    import os
    import shutil

    from graphsense_datafeed_spark.registry import QUERIES
    from graphsense_datafeed_spark.schemas import TABLES

    d = str(tmp_path / "sf_regen")
    os.makedirs(d)
    for t in TABLES:
        shutil.copy(f"{sf_dir}/{t}.parquet", f"{d}/{t}.parquet")

    n_compact_1 = QUERIES["layout_compact"](spark, d).count()
    n_orc_1 = QUERIES["scan_orc"](spark, d).count()

    # "regenerate" events and supplier in place with a strict subset
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").limit(500)
    ev.coalesce(1).write.mode("overwrite").parquet(f"{d}/tmp_ev")
    sup = spark.read.parquet(f"{sf_dir}/supplier.parquet").limit(3)
    sup.coalesce(1).write.mode("overwrite").parquet(f"{d}/tmp_sup")
    for src_dir, dst in (("tmp_ev", "events.parquet"), ("tmp_sup", "supplier.parquet")):
        part = next(
            f for f in os.listdir(f"{d}/{src_dir}") if f.endswith(".parquet")
        )
        os.replace(f"{d}/{src_dir}/{part}", f"{d}/{dst}")
        shutil.rmtree(f"{d}/{src_dir}")

    n_compact_2 = QUERIES["layout_compact"](spark, d).count()
    n_orc_2 = QUERIES["scan_orc"](spark, d).count()
    assert n_compact_2 == 500 != n_compact_1
    assert 0 < n_orc_2 <= 3 and n_orc_2 != n_orc_1
