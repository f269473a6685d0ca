"""Semantic checks for the round-5 batch-2 operators — brute-force
Python referees for the properties the parity hash can't express (the
hash proves Spark≡DuckDB; these prove both mean what the operator
claims)."""

import hashlib
import io
import math
from contextlib import redirect_stdout
from decimal import Decimal

import pyspark.sql.functions as F

from graphsense_datafeed_spark import registry
from graphsense_datafeed_spark.sources.tables import load

registry.load_all_operators()
Q = registry.QUERIES


def test_agg_decimal_exact_matches_python_decimal(spark, sf_dir):
    """The decimal-domain sum must equal the exact Decimal sum
    computed in Python — no float drift for ANY partition order."""
    rows = load(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_totalprice"
    ).collect()
    want: dict[str, Decimal] = {}
    for r in rows:
        d = Decimal(repr(r["o_totalprice"])).quantize(Decimal("0.01"))
        want[r["o_orderpriority"]] = want.get(r["o_orderpriority"], Decimal(0)) + d
    got = {
        r["o_orderpriority"]: r["total_e4"]
        for r in Q["agg_decimal_exact"](spark, sf_dir).collect()
    }
    assert got == {k: int(v * 10000) for k, v in want.items()}


def test_histogram_equidepth_balanced_and_ordered(spark, sf_dir):
    rows = sorted(
        Q["histogram_equidepth"](spark, sf_dir).collect(),
        key=lambda r: r["bucket"],
    )
    assert [r["bucket"] for r in rows] == list(range(1, 9))
    counts = [r["n_orders"] for r in rows]
    total = load(spark, sf_dir, "orders").count()
    assert sum(counts) == total
    assert max(counts) - min(counts) <= 1  # equal depth
    for prev, nxt in zip(rows, rows[1:]):
        assert prev["hi_fl"] <= nxt["lo_fl"]  # value-ordered bands


def test_bucketed_join_plan_is_exchange_free_and_correct(spark, sf_dir):
    from graphsense_datafeed_spark.operators.joins import _bucketed_table

    o = _bucketed_table(spark, sf_dir, "orders", "o_orderkey")
    li = _bucketed_table(spark, sf_dir, "lineitem", "l_orderkey")
    joined = o.hint("merge").join(li, o.o_orderkey == li.l_orderkey)
    buf = io.StringIO()
    with redirect_stdout(buf):
        joined.explain("formatted")
    assert "Exchange" not in buf.getvalue(), buf.getvalue()
    # and the registered query's result equals the plain join
    want = sorted(
        tuple(r)
        for r in load(spark, sf_dir, "orders")
        .join(
            load(spark, sf_dir, "lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").cast("bigint").alias("n_items"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("revenue_cents"),
        )
        .collect()
    )
    got = sorted(
        tuple(r) for r in Q["join_bucketed_colocated"](spark, sf_dir).collect()
    )
    assert got == want


def test_scd_lookup_matches_bruteforce_asof(spark, sf_dir):
    """Every hourly probe must resolve to the event_type of the latest
    change at-or-before it (closed-open interval semantics), NULL
    before a user's first version."""
    ev = sorted(
        (
            (r["user_id"], r["ts"], r["event_id"], r["event_type"])
            for r in load(spark, sf_dir, "events")
            .filter(F.col("user_id") < 50)
            .collect()
        ),
    )
    changes: dict[int, list] = {}
    spans: dict[int, list] = {}
    for uid, ts, _eid, etype in ev:
        spans.setdefault(uid, [ts, ts])
        spans[uid][0] = min(spans[uid][0], ts)
        spans[uid][1] = max(spans[uid][1], ts)
        seq = changes.setdefault(uid, [])
        if not seq or seq[-1][1] != etype:
            seq.append((ts, etype))
    want = {}
    for uid, (lo, hi) in spans.items():
        t = lo.replace(minute=0, second=0, microsecond=0)
        end = hi.replace(minute=0, second=0, microsecond=0)
        while t <= end:
            cur = None
            for cts, ctype in changes[uid]:
                if cts <= t:
                    cur = ctype
                else:
                    break
            want[(uid, t)] = cur
            t += __import__("datetime").timedelta(hours=1)
    got = {
        (r["user_id"], r["hour_ts"]): r["type_asof"]
        for r in Q["join_scd_lookup"](spark, sf_dir).collect()
    }
    assert got == want


def test_common_neighbors_matches_bruteforce_jaccard(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    bip = set(
        (r["o_custkey"], r["l_partkey"])
        for r in li.join(orders, li.l_orderkey == orders.o_orderkey).collect()
    )
    parts: dict[int, set] = {}
    for cust, part in bip:
        parts.setdefault(cust, set()).add(part)
    custs = sorted(parts)
    scored = []
    for i, a in enumerate(custs):
        for b in custs[i + 1 :]:
            common = len(parts[a] & parts[b])
            if common >= 3:
                j = math.floor(common * 10000.0 / len(parts[a] | parts[b]))
                scored.append((-j, a, b, common))
    scored.sort()
    want = [(a, b, c, -nj) for nj, a, b, c in scored[:20]]
    got = [
        (r["cust_a"], r["cust_b"], r["common_parts"], r["jaccard_e4"])
        for r in Q["graph_common_neighbors"](spark, sf_dir).collect()
    ]
    assert got == want


def test_knn_graph_mutual_and_exact(spark, sf_dir):
    """Edges must be exactly the reciprocated pairs of the directed
    top-5 computed by a left-fold dot product (the engines' fold
    order) in Python."""
    vecs = {
        r["vec_id"]: r["embedding"]
        for r in load(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 200)
        .collect()
    }
    ids = sorted(vecs)

    def dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += float(x) * float(y)
        return acc

    topk = {}
    for q in ids:
        scored = sorted(
            ((-dot(vecs[q], vecs[c]), c) for c in ids if c != q)
        )[:5]
        topk[q] = {(c, -negd) for negd, c in scored}
    want = set()
    for a in ids:
        for b, d in topk[a]:
            if a < b and any(x == a for x, _ in topk[b]):
                want.add((a, b, math.floor(d * 10000)))
    got = {
        (r["src"], r["dst"], r["cosine_e4"])
        for r in Q["embed_knn_graph"](spark, sf_dir).collect()
    }
    assert got == want


def test_bpe_pair_counts_matches_bruteforce(spark, sf_dir):
    texts = [
        r["text"] for r in load(spark, sf_dir, "documents").collect()
    ]
    counts: dict[str, int] = {}
    for t in texts:
        for w in t.split(" "):
            if not w:
                continue
            for i in range(len(w) - 1):
                p = w[i : i + 2]
                counts[p] = counts.get(p, 0) + 1
    want = sorted(((-n, p) for p, n in counts.items()))[:20]
    want = [(p, -n) for n, p in want]
    got = [
        (r["pair"], r["merge_count"])
        for r in Q["bpe_pair_counts"](spark, sf_dir).collect()
    ]
    assert got == want


def test_winnowing_matches_bruteforce(spark, sf_dir):
    """Full referee: shingle→window-min selection→df cap→pair counts
    recomputed in Python must match exactly."""
    docs = {
        r["doc_id"]: r["text"]
        for r in load(spark, sf_dir, "documents").collect()
    }
    sel: dict[int, set] = {}
    for did, text in docs.items():
        ws = text.split(" ")
        hs = [
            hashlib.md5(" ".join(ws[i : i + 3]).encode()).hexdigest()
            for i in range(len(ws) - 2)
        ]
        fps = {min(hs[i : i + 4]) for i in range(len(hs) - 3)}
        if fps:
            sel[did] = fps
    df: dict[str, int] = {}
    for fps in sel.values():
        for h in fps:
            df[h] = df.get(h, 0) + 1
    kept = {d: {h for h in fps if df[h] <= 16} for d, fps in sel.items()}
    want = {}
    dids = sorted(kept)
    for i, a in enumerate(dids):
        for b in dids[i + 1 :]:
            n = len(kept[a] & kept[b])
            if n >= 2:
                want[(a, b)] = n
    got = {
        (r["doc_a"], r["doc_b"]): r["shared_fps"]
        for r in Q["text_winnowing"](spark, sf_dir).collect()
    }
    assert got == want


def test_containment_matches_bruteforce(spark, sf_dir):
    """Directional containment referee: shingle sets, df cap, c(A,B)
    recomputed in Python must match exactly."""
    docs = {
        r["doc_id"]: r["text"]
        for r in load(spark, sf_dir, "documents").collect()
    }
    sh: dict[int, set] = {}
    for did, text in docs.items():
        ws = text.split(" ")
        sh[did] = {
            hashlib.md5(" ".join(ws[i : i + 3]).encode()).hexdigest()
            for i in range(len(ws) - 2)
        }
    df: dict[str, int] = {}
    for s in sh.values():
        for h in s:
            df[h] = df.get(h, 0) + 1
    kept = {d: {h for h in s if df[h] <= 16} for d, s in sh.items()}
    want = {}
    for a in sh:
        for b in sh:
            if a == b:
                continue
            common = len(kept[a] & kept[b])
            if common and common * 2 >= len(sh[a]):
                want[(a, b)] = (
                    common,
                    math.floor(common * 10000.0 / len(sh[a])),
                )
    got = {
        (r["doc_a"], r["doc_b"]): (r["n_common"], r["containment_e4"])
        for r in Q["dedup_containment"](spark, sf_dir).collect()
    }
    assert got == want
    # the fixture's planted exact dups must show full containment
    assert any(v[1] == 10000 for v in got.values())


def test_m4_matches_bruteforce(spark, sf_dir):
    rows = (
        load(spark, sf_dir, "events")
        .filter(F.col("user_id") < 40)
        .collect()
    )
    groups: dict = {}
    for r in rows:
        b = r["ts"].replace(minute=0, second=0, microsecond=0)
        groups.setdefault((r["user_id"], b), []).append(
            (r["ts"], r["event_id"], round(r["value"] * 100))
        )
    want = {}
    for key, pts in groups.items():
        by_time = sorted(pts, key=lambda p: (p[0], p[1]))
        by_val = sorted(pts, key=lambda p: (p[2], p[0], p[1]))
        by_val_desc = sorted(pts, key=lambda p: (-p[2], p[0], p[1]))
        want[key] = (
            len(pts),
            by_time[0][2],
            by_val[0][2],
            by_val_desc[0][2],
            by_time[-1][2],
            by_val[0][0],
            by_val_desc[0][0],
        )
    got = {
        (r["user_id"], r["bucket"]): (
            r["n_pts"],
            r["first_cents"],
            r["min_cents"],
            r["max_cents"],
            r["last_cents"],
            r["min_ts"],
            r["max_ts"],
        )
        for r in Q["ts_downsample_m4"](spark, sf_dir).collect()
    }
    assert got == want


def test_matryoshka_error_and_symmetry(spark, sf_dir):
    """Referee a sample of pairs with a left-fold dot; err must be the
    integer difference of the two floored readouts."""
    vecs = {
        r["vec_id"]: r["embedding"]
        for r in load(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 60)
        .collect()
    }

    def dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += float(x) * float(y)
        return acc

    got = Q["embed_matryoshka_truncate"](spark, sf_dir).collect()
    assert len(got) == len(vecs) * (len(vecs) - 1) // 2
    for r in got[:50]:
        a, b = vecs[r["id_a"]], vecs[r["id_b"]]
        full = math.floor(dot(a, b) * 10000)
        na = math.sqrt(dot(a[:16], a[:16]))
        nb = math.sqrt(dot(b[:16], b[:16]))
        c16 = math.floor(dot(a[:16], b[:16]) / (na * nb) * 10000)
        assert (r["cos_full_e4"], r["cos16_e4"], r["err_e4"]) == (
            full,
            c16,
            abs(full - c16),
        )


def test_embedding_pipeline_composes_its_stages(spark, sf_dir):
    """Survivor ids = gate-passed minus semantic-removed-over-gated;
    quantized payload matches the standalone quantizer for those ids."""
    from graphsense_datafeed_spark.operators.llm_dedup import (
        semantic_dedup_frame,
    )

    gate_ids = {
        r["vec_id"]
        for r in Q["embed_quality_gate"](spark, sf_dir)
        .filter("passed")
        .collect()
    }
    e = load(spark, sf_dir, "embeddings")
    gated = e.filter(F.col("vec_id").isin(gate_ids))
    removed = {
        r["vec_id"] for r in semantic_dedup_frame(gated).collect()
    }
    want_ids = gate_ids - removed
    out = {r["vec_id"]: r for r in Q["embedding_pipeline"](spark, sf_dir).collect()}
    assert set(out) == want_ids
    quant = {
        r["vec_id"]: r
        for r in Q["embed_quantize_int8"](spark, sf_dir).collect()
    }
    for vid in list(want_ids)[:20]:
        assert out[vid]["q"] == quant[vid]["q"]
        assert out[vid]["scale"] == quant[vid]["scale"]


def test_asof_tolerance_expires_stale_matches(spark, sf_dir):
    """Referee: per user, the latest signup at-or-before each event;
    matches older than 6 h must be NULL, fresher ones must carry the
    exact integral age."""
    rows = sorted(
        (
            (r["user_id"], r["ts"], r["event_id"], r["event_type"])
            for r in load(spark, sf_dir, "events").collect()
        )
    )
    sig: dict[int, list] = {}
    for uid, ts, _eid, et in rows:
        if et == "signup":
            sig.setdefault(uid, []).append(ts)
    got = Q["join_asof_tolerance"](spark, sf_dir).collect()
    assert len(got) == len(rows)
    n_expired = n_fresh = 0
    for r in got:
        cand = [t for t in sig.get(r["user_id"], []) if t <= r["ts"]]
        if not cand:
            assert r["signup_ts_tol"] is None and r["age_us"] is None
            continue
        latest = max(cand)
        d = r["ts"] - latest
        age_us = (d.days * 86_400 + d.seconds) * 1_000_000 + d.microseconds
        if age_us <= 21_600_000_000:
            assert (r["signup_ts_tol"], r["age_us"]) == (latest, age_us), r
            n_fresh += 1
        else:
            assert r["signup_ts_tol"] is None and r["age_us"] is None, r
            n_expired += 1
    assert n_fresh > 0 and n_expired > 0  # both branches exercised


def test_manifest_commit_isolates_debris_and_snapshots(spark, sf_dir):
    """The committed snapshot must equal the full projection; debris
    files in the data tree must be invisible; the v1 manifest must
    still describe exactly the even-id half (time travel)."""
    import glob
    import json
    import os

    from graphsense_datafeed_spark.sources.tables import staged_source_dir

    out = Q["sink_manifest_commit"](spark, sf_dir)
    total = load(spark, sf_dir, "events").count()
    assert out.count() == total
    base = staged_source_dir(sf_dir, "gds_manifest", "events")
    with open(os.path.join(base, "CURRENT")) as fh:
        assert fh.read().strip() == "manifest-2.json"
    all_files = glob.glob(os.path.join(base, "data", "*", "*.parquet"))
    with open(os.path.join(base, "manifest-2.json")) as fh:
        m2 = json.load(fh)["files"]
    assert len(all_files) > len(m2)  # debris exists on disk, unreferenced
    with open(os.path.join(base, "manifest-1.json")) as fh:
        m1 = json.load(fh)["files"]
    v1 = spark.read.parquet(*m1)
    evens = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_id") % 2 == 0)
        .count()
    )
    assert v1.count() == evens


def test_date_spine_has_no_holes_and_exact_totals(spark, sf_dir):
    import datetime

    rows = sorted(
        Q["date_spine_fill"](spark, sf_dir).collect(),
        key=lambda r: r["order_date"],
    )
    days = [r["order_date"] for r in rows]
    assert days[0] + datetime.timedelta(days=len(days) - 1) == days[-1]
    for a, b in zip(days, days[1:]):
        assert b - a == datetime.timedelta(days=1)  # gap-free spine
    want: dict = {}
    for r in load(spark, sf_dir, "orders").collect():
        d = r["o_orderdate"].date()
        n, c = want.get(d, (0, 0))
        want[d] = (n + 1, c + round(r["o_totalprice"] * 100))
    for r in rows:
        if r["is_gap"]:
            assert (r["n_orders"], r["total_cents"]) == (0, 0)
            assert r["order_date"] not in want
        else:
            assert (r["n_orders"], r["total_cents"]) == want[r["order_date"]]


def test_gram_operators_survive_short_documents(spark, tmp_path):
    """Round-5 code-review regression: F.sequence(1, last) DESCENDS for
    last < 1 ([1, 0]), so unguarded/greatest()-guarded offset ranges
    either crash under ANSI (element_at/slice at 0) or fabricate
    phantom grams on short inputs. The fixtures' docs are all long, so
    this builds a corpus of degenerate documents (empty, 1-2 words,
    1-2 chars) and requires every gram-family operator to stay
    parity-exact against its own DuckDB oracle."""
    import duckdb
    import pandas as pd

    from helpers import assert_parity

    docs = pd.DataFrame(
        {
            "doc_id": list(range(1, 31)),
            "text": (
                ["", "a", "ab", "a b", "one two", "x y z"] * 4
                + ["the quick brown fox jumps over the lazy dog again ok"]
                * 6
            ),
            "lang": ["en", "de"] * 15,
            "source": ["web", "wiki", "web"] * 10,
            "n_chars": [0] * 30,
        }
    )
    docs["n_chars"] = docs["text"].str.len()
    sf = str(tmp_path / "shortsf")
    import os as _os

    _os.makedirs(sf, exist_ok=True)
    docs.to_parquet(_os.path.join(sf, "documents.parquet"))
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet')"
    )
    for qid in (
        "text_ngram_topk",
        "dedup_containment",
        "text_winnowing",
        "text_repetition_filter",
        "text_decontaminate",
        "text_fingerprint",
        "bpe_pair_counts",
    ):
        assert_parity(spark, con, qid, sf)
    con.close()


def test_itemset_pairs_matches_bruteforce(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    baskets: dict[int, set] = {}
    for r in li.join(part, li.l_partkey == part.p_partkey).collect():
        baskets.setdefault(r["l_orderkey"], set()).add(r["p_brand"])
    support: dict = {}
    for items in baskets.values():
        s = sorted(items)
        for i, x in enumerate(s):
            for y in s[i + 1 :]:
                support[(x, y)] = support.get((x, y), 0) + 1
    want = sorted(((-n, a, b) for (a, b), n in support.items()))[:20]
    want = [(a, b, -n) for n, a, b in want]
    got = [
        (r["brand_a"], r["brand_b"], r["support"])
        for r in Q["agg_itemset_pairs"](spark, sf_dir).collect()
    ]
    assert got == want


def test_multimodal_dedup_groups_match_text_dups(spark, sf_dir):
    """Payloads derive deterministically from text, so binary dup
    groups must coincide exactly with exact-text dup groups."""
    texts: dict[str, list] = {}
    for r in load(spark, sf_dir, "documents").collect():
        texts.setdefault(r["text"], []).append(r["doc_id"])
    want = {
        (len(ids), min(ids))
        for ids in texts.values()
        if len(ids) >= 2
    }
    got = {
        (r["n_copies"], r["keeper_id"])
        for r in Q["multimodal_dedup_exact"](spark, sf_dir).collect()
    }
    assert got == want  # may be empty at this SF — dups planted at sf0.1


def test_multimodal_dedup_catches_planted_binary_dups(spark, tmp_path):
    """Planted byte-identical payloads must group with the lowest id
    as keeper, parity-exact vs the oracle."""
    import os as _os

    import duckdb
    import pandas as pd

    from helpers import assert_parity

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5, 6],
            "text": ["same text", "unique a", "same text", "unique b",
                     "same text", "other dup"],
            "lang": ["en"] * 6,
            "source": ["web"] * 6,
            "n_chars": [9, 8, 9, 8, 9, 9],
        }
    )
    sf = str(tmp_path / "dupsf")
    _os.makedirs(sf, exist_ok=True)
    docs.to_parquet(_os.path.join(sf, "documents.parquet"))
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet')"
    )
    assert_parity(spark, con, "multimodal_dedup_exact", sf)
    rows = Q["multimodal_dedup_exact"](spark, sf).collect()
    assert [(r["n_copies"], r["keeper_id"]) for r in rows] == [(3, 1)]
    con.close()


def test_round5_staged_ops_rebuild_on_fixture_regeneration(spark, tmp_path):
    """The round-5 staged operators (manifest snapshots, bucketed
    tables) must REBUILD when the source fixture is regenerated —
    serving stale staged bytes against a fresh oracle is the proven
    r3/r4 failure mode the fingerprint keying exists to prevent."""
    import os as _os
    import shutil as _sh

    import pandas as pd

    sf = str(tmp_path / "regen_sf")
    _os.makedirs(sf, exist_ok=True)
    for t in ("events", "orders", "lineitem"):
        _sh.copy(f"/root/testdata/sf0.001/{t}.parquet", f"{sf}/{t}.parquet")

    n1 = Q["sink_manifest_commit"](spark, sf).count()
    full_events = pd.read_parquet(f"{sf}/events.parquet")
    assert n1 == len(full_events)
    j1 = {
        r["o_orderstatus"]: r["revenue_cents"]
        for r in Q["join_bucketed_colocated"](spark, sf).collect()
    }

    # regenerate: half the events, half the orders (new inode + size)
    full_events.iloc[: len(full_events) // 2].to_parquet(
        f"{sf}/events.parquet"
    )
    orders = pd.read_parquet(f"{sf}/orders.parquet")
    orders.iloc[: len(orders) // 2].to_parquet(f"{sf}/orders.parquet")

    n2 = Q["sink_manifest_commit"](spark, sf).count()
    assert n2 == len(full_events) // 2  # rebuilt, not stale

    j2 = {
        r["o_orderstatus"]: r["revenue_cents"]
        for r in Q["join_bucketed_colocated"](spark, sf).collect()
    }
    import pyspark.sql.functions as _F

    from graphsense_datafeed_spark.sources.tables import load as _load

    want = {
        r["o_orderstatus"]: r["rc"]
        for r in _load(spark, sf, "orders")
        .join(
            _load(spark, sf, "lineitem"),
            _F.col("o_orderkey") == _F.col("l_orderkey"),
        )
        .groupBy("o_orderstatus")
        .agg(
            _F.sum(
                _F.round(_F.col("l_extendedprice") * 100).cast("bigint")
            )
            .cast("bigint")
            .alias("rc")
        )
        .collect()
    }
    assert j2 == want and j2 != j1  # fresh build over the halved orders


def test_vocab_coverage_matches_bruteforce(spark, sf_dir):
    docs = {
        r["doc_id"]: r["text"].split(" ")
        for r in load(spark, sf_dir, "documents").collect()
    }
    counts: dict[str, int] = {}
    for ws in docs.values():
        for w in ws:
            counts[w] = counts.get(w, 0) + 1
    vocab = {
        t for _, t in sorted(((-n, t) for t, n in counts.items()))[:1000]
    }
    want = {}
    for did, ws in docs.items():
        oov = sum(1 for w in ws if w not in vocab)
        want[did] = (len(ws), oov, math.floor(oov * 10000.0 / len(ws)))
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_oov"], r["oov_e4"])
        for r in Q["vocab_coverage"](spark, sf_dir).collect()
    }
    assert got == want


def test_hll_window_rollup_matches_bruteforce(spark, sf_dir):
    """Trailing-3h distinct users per hour, sketch-merged, must equal
    the exact distinct count at fixture NDV (sparse-mode exactness)."""
    import datetime

    rows = [
        (r["user_id"], r["ts"].replace(minute=0, second=0, microsecond=0))
        for r in load(spark, sf_dir, "events").collect()
    ]
    hours = sorted({h for _, h in rows})
    want = {}
    for h in hours:
        lo = h - datetime.timedelta(hours=2)
        want[h] = len({u for u, hh in rows if lo <= hh <= h})
    got = {
        r["hour_ts"]: r["ndv_users_3h"]
        for r in Q["agg_hll_window_rollup"](spark, sf_dir).collect()
    }
    assert got == want


def test_concurrency_sweep_matches_bruteforce(spark, sf_dir):
    """Hourly peak concurrency must equal a Python sweep line over the
    same sessions with the same starts-before-ends tie order."""
    sessions = [
        (r["user_id"], r["session_id"], r["session_start"], r["session_end"])
        for r in Q["events_sessionize"](spark, sf_dir).collect()
    ]
    points = []
    for uid, sid, s, e in sessions:
        points.append((s, 0, uid, sid, 1))
        points.append((e, 1, uid, sid, -1))
    points.sort(key=lambda p: (p[0], p[1], p[2], p[3]))
    want: dict = {}
    conc = 0
    for ts, _k, _u, _s, d in points:
        conc += d
        h = ts.replace(minute=0, second=0, microsecond=0)
        want[h] = max(want.get(h, conc), conc)
    got = {
        r["hour_ts"]: r["peak_concurrency"]
        for r in Q["events_concurrency_sweep"](spark, sf_dir).collect()
    }
    assert got == want
    assert max(want.values()) > 1  # concurrency actually observed


def test_manifest_vacuum_removes_orphans_keeps_live(spark, sf_dir):
    """After expiry+vacuum: debris and expired-only files are gone,
    every live-manifest file survives, and the snapshot reads
    byte-complete. The commit operator's own staging is untouched."""
    import glob
    import json
    import os as _os

    from graphsense_datafeed_spark.sources.tables import staged_source_dir

    out = Q["sink_manifest_vacuum"](spark, sf_dir)
    assert out.count() == load(spark, sf_dir, "events").count()
    base = staged_source_dir(sf_dir, "gds_manifest_vac", "events")
    with open(_os.path.join(base, "manifest-2.json")) as fh:
        live_files = set(json.load(fh)["files"])
    on_disk = set(glob.glob(_os.path.join(base, "data", "*", "*.parquet")))
    assert on_disk == live_files  # nothing orphaned, nothing lost
    assert not _os.path.exists(_os.path.join(base, "manifest-1.json"))
    # the sibling commit staging still has its debris + v1 history
    sib = staged_source_dir(sf_dir, "gds_manifest", "events")
    if _os.path.exists(_os.path.join(sib, "CURRENT")):
        sib_disk = glob.glob(_os.path.join(sib, "data", "*", "*.parquet"))
        with open(_os.path.join(sib, "manifest-2.json")) as fh:
            sib_live = json.load(fh)["files"]
        assert len(sib_disk) > len(sib_live)
        assert _os.path.exists(_os.path.join(sib, "manifest-1.json"))


def test_bfs_layers_matches_python_bfs(spark, sf_dir):
    from collections import deque

    from graphsense_datafeed_spark.ingest.graphstats import (
        cooccurrence_edges,
    )

    adj: dict[str, set] = {}
    for r in cooccurrence_edges(spark).collect():
        adj.setdefault(r["src"], set()).add(r["dst"])
        adj.setdefault(r["dst"], set()).add(r["src"])
    seed = min(adj)
    want = {seed: 0}
    dq = deque([seed])
    while dq:
        u = dq.popleft()
        if want[u] >= 10:
            continue
        for v in adj[u]:
            if v not in want:
                want[v] = want[u] + 1
                dq.append(v)
    got = {
        r["addr"]: r["dist"]
        for r in Q["graph_bfs_layers"](spark, sf_dir).collect()
    }
    assert got == want
    assert max(want.values()) >= 2  # genuinely multi-layer


def test_interval_self_join_matches_bruteforce(spark, sf_dir):
    sessions = [
        (r["user_id"], r["session_id"], r["session_start"], r["session_end"])
        for r in Q["events_sessionize"](spark, sf_dir).collect()
    ]
    counts: dict = {}
    for i, (ua, _sa, s1, e1) in enumerate(sessions):
        for ub, _sb, s2, e2 in sessions[i + 1 :]:
            x, y = ((ua, ub) if ua < ub else (ub, ua)) if ua != ub else (None, None)
            if ua != ub and s1 <= e2 and s2 <= e1:
                counts[(x, y)] = counts.get((x, y), 0) + 1
    want = sorted(((-n, a, b) for (a, b), n in counts.items()))[:20]
    want = [(a, b, -n) for n, a, b in want]
    got = [
        (r["user_a"], r["user_b"], r["n_overlaps"])
        for r in Q["join_interval_self"](spark, sf_dir).collect()
    ]
    assert got == want


def test_seasonality_profile_matches_bruteforce(spark, sf_dir):
    """Cells must partition the event stream exactly: totals
    recompose, dow is Spark's 1=Sunday..7 numbering."""
    rows = load(spark, sf_dir, "events").collect()
    want: dict = {}
    for r in rows:
        # Python weekday(): 0=Mon..6=Sun → Spark dayofweek 1=Sun..7
        dow = (r["ts"].weekday() + 1) % 7 + 1
        key = (dow, r["ts"].hour)
        n, users, cents = want.get(key, (0, set(), 0))
        users = users | {r["user_id"]}
        want[key] = (n + 1, users, cents + round(r["value"] * 100))
    got = {
        (r["dow"], r["hod"]): (r["n_events"], r["n_users"], r["total_cents"])
        for r in Q["ts_seasonality_profile"](spark, sf_dir).collect()
    }
    assert got == {
        k: (n, len(users), cents) for k, (n, users, cents) in want.items()
    }
    assert sum(n for n, _, _ in got.values()) == len(rows)


def test_percentile_disc_returns_actual_elements(spark, sf_dir):
    """PERCENTILE_DISC must return the smallest element whose
    cumulative share reaches p — an ACTUAL value, never interpolated."""
    import bisect

    groups: dict[str, list] = {}
    for r in load(spark, sf_dir, "events").collect():
        groups.setdefault(r["event_type"], []).append(round(r["value"] * 100))
    got = {
        r["event_type"]: (r["med_cents_disc"], r["p90_cents_disc"])
        for r in Q["agg_percentile_disc"](spark, sf_dir).collect()
    }
    for et, vals in groups.items():
        vals.sort()
        n = len(vals)
        import math as _m

        med = vals[_m.ceil(0.5 * n) - 1]
        p90 = vals[_m.ceil(0.9 * n) - 1]
        assert got[et] == (med, p90), (et, got[et], (med, p90))
        assert bisect.bisect_left(vals, got[et][0]) < n  # element of group


def test_weighted_median_matches_bruteforce(spark, sf_dir):
    """The weighted median must be the smallest value whose cumulative
    weight reaches half the total — checked against a Python scan."""
    groups: dict = {}
    for r in load(spark, sf_dir, "lineitem").collect():
        cents = round(r["l_extendedprice"] * 100)
        w = math.floor(r["l_quantity"])
        g = groups.setdefault(r["l_returnflag"], {})
        g[cents] = g.get(cents, 0) + w
    want = {}
    for flag, g in groups.items():
        tot = sum(g.values())
        cum = 0
        for cents in sorted(g):
            cum += g[cents]
            if 2 * cum >= tot:
                want[flag] = (cents, tot)
                break
    got = {
        r["l_returnflag"]: (r["weighted_median_cents"], r["total_weight"])
        for r in Q["agg_weighted_median"](spark, sf_dir).collect()
    }
    assert got == want


def test_gini_matches_bruteforce_and_bounds(spark, sf_dir):
    spend: dict = {}
    for r in load(spark, sf_dir, "orders").collect():
        spend[r["o_custkey"]] = spend.get(r["o_custkey"], 0) + round(
            r["o_totalprice"] * 100
        )
    xs = [c for _, c in sorted(spend.items(), key=lambda kv: (kv[1], kv[0]))]
    n, tot = len(xs), sum(xs)
    iw = sum((i + 1) * x for i, x in enumerate(xs))
    gini = 2.0 * iw / (n * tot) - (n + 1.0) / n
    row = Q["agg_gini_concentration"](spark, sf_dir).collect()[0]
    assert (row["n_customers"], row["total_cents"]) == (n, tot)
    assert row["gini_e6"] == math.floor(gini * 1000000)
    assert 0 <= row["gini_e6"] < 1000000  # bounded like a Gini must be


def test_lorenz_deciles_monotone_and_complete(spark, sf_dir):
    """Shares must be monotone non-decreasing by decile (Lorenz
    property), counts balanced, and sums recompose the total."""
    rows = sorted(
        Q["agg_lorenz_deciles"](spark, sf_dir).collect(),
        key=lambda r: r["decile"],
    )
    assert [r["decile"] for r in rows] == list(range(1, 11))
    counts = [r["n_customers"] for r in rows]
    assert max(counts) - min(counts) <= 1
    cents = [r["decile_cents"] for r in rows]
    assert cents == sorted(cents)  # ascending-rank deciles
    spend: dict = {}
    for r in load(spark, sf_dir, "orders").collect():
        spend[r["o_custkey"]] = spend.get(r["o_custkey"], 0) + round(
            r["o_totalprice"] * 100
        )
    assert sum(cents) == sum(spend.values())
    assert sum(counts) == len(spend)
    tot = sum(cents)
    for r in rows:
        assert r["share_e4"] == math.floor(r["decile_cents"] * 10000.0 / tot)


def test_histogram_log2_buckets_are_bit_lengths(spark, sf_dir):
    rows = Q["agg_histogram_log2"](spark, sf_dir).collect()
    total = 0
    for r in rows:
        b = r["bucket_log2"]
        assert r["lo_cents"].bit_length() == b
        assert r["hi_cents"].bit_length() == b
        assert 2 ** (b - 1) <= r["lo_cents"] <= r["hi_cents"] < 2**b
        total += r["n_orders"]
    assert total == load(spark, sf_dir, "orders").count()
