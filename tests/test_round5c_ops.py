"""Semantic checks for the round-5 continuation operators (batches
6-29) — brute-force Python referees for the properties the parity hash
can't express (the hash proves Spark≡DuckDB; these prove both mean
what the operator claims)."""

import math

import pyspark.sql.functions as F

from graphsense_datafeed_spark import registry
from graphsense_datafeed_spark.sources.tables import load

registry.load_all_operators()
Q = registry.QUERIES


def test_ks_two_sample_matches_bruteforce(spark, sf_dir):
    """D_num must equal max|n_b·cumA − n_a·cumB| over the merged
    support, computed independently in Python."""
    rows = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "purchase"))
        .select("event_type", "value")
        .collect()
    )
    a = sorted(math.floor(r["value"] * 10000) for r in rows if r["event_type"] == "click")
    b = sorted(math.floor(r["value"] * 10000) for r in rows if r["event_type"] == "purchase")
    support = sorted(set(a) | set(b))
    import bisect

    d_num = max(
        abs(len(b) * bisect.bisect_right(a, x) - len(a) * bisect.bisect_right(b, x))
        for x in support
    )
    got = Q["agg_ks_two_sample"](spark, sf_dir).collect()[0]
    assert got["n_a"] == len(a) and got["n_b"] == len(b)
    assert got["d_num"] == d_num
    assert got["d_e6"] == math.floor(d_num / (len(a) * len(b)) * 1_000_000)


def test_chi_square_matches_bruteforce(spark, sf_dir):
    """Every cell's floor-e6 χ² term and the grand total must match a
    contingency table built in plain Python."""
    rows = (
        load(spark, sf_dir, "events")
        .select("event_type", (F.dayofweek("ts") - 1).alias("dow"))
        .collect()
    )
    obs: dict[tuple, int] = {}
    for r in rows:
        obs[(r["event_type"], r["dow"])] = obs.get((r["event_type"], r["dow"]), 0) + 1
    n = sum(obs.values())
    rm = {}
    cm = {}
    for (et, dw), o in obs.items():
        rm[et] = rm.get(et, 0) + o
        cm[dw] = cm.get(dw, 0) + o
    want = {}
    for (et, dw), o in obs.items():
        diff = o * n - rm[et] * cm[dw]
        want[(et, dw)] = math.floor(diff * diff / (n * rm[et] * cm[dw]) * 1_000_000)
    got = Q["agg_chi_square"](spark, sf_dir).collect()
    assert len(got) == len(obs)
    total = sum(want.values())
    for r in got:
        key = (r["event_type"], r["dow"])
        assert r["o"] == obs[key]
        assert r["term_e6"] == want[key]
        assert r["chi2_sum_e6"] == total


def test_moving_median_matches_bruteforce(spark, sf_dir):
    """Trailing 11-row median per series must equal the sorted-frame
    midpoint replayed in Python."""
    ev = (
        load(spark, sf_dir, "events")
        .select("event_id", "event_type", "ts", "value")
        .collect()
    )
    series: dict[str, list] = {}
    for r in sorted(ev, key=lambda r: (r["ts"], r["event_id"])):
        series.setdefault(r["event_type"], []).append(
            (r["event_id"], math.floor(r["value"] * 10000))
        )
    want = {}
    for et, items in series.items():
        vals = [v for _, v in items]
        for i, (eid, _) in enumerate(items):
            frame = sorted(vals[max(0, i - 10) : i + 1])
            k = len(frame)
            lo = frame[(k + 1) // 2 - 1]
            hi = frame[-(-(k + 1) // 2) - 1]
            want[eid] = (k, math.floor((lo + hi) / 2.0 * 10))
    got = Q["win_moving_median"](spark, sf_dir).collect()
    assert len(got) == len(want)
    for r in got:
        assert (r["n_window"], r["med_e5"]) == want[r["event_id"]]


def test_acf_matches_bruteforce(spark, sf_dir):
    """Per-(series, lag) Pearson over the lagged pairs, replayed in
    exact Python integers + one float formula."""
    ev = load(spark, sf_dir, "events").select(
        "event_id", "event_type", "ts", "value"
    ).collect()
    series: dict[str, list[int]] = {}
    for r in sorted(ev, key=lambda r: (r["ts"], r["event_id"])):
        series.setdefault(r["event_type"], []).append(math.floor(r["value"] * 100))
    want = {}
    for et, xs in series.items():
        for k in (1, 2, 3):
            pairs = [(xs[i], xs[i - k]) for i in range(k, len(xs))]
            n = len(pairs)
            sx = sum(x for x, _ in pairs)
            sy = sum(y for _, y in pairs)
            sxy = sum(x * y for x, y in pairs)
            sxx = sum(x * x for x, _ in pairs)
            syy = sum(y * y for _, y in pairs)
            num = float(n) * float(sxy) - float(sx) * float(sy)
            den = math.sqrt(
                (float(n) * float(sxx) - float(sx) * float(sx))
                * (float(n) * float(syy) - float(sy) * float(sy))
            )
            want[(et, k)] = (n, math.floor(num / den * 1_000_000))
    got = Q["ts_acf"](spark, sf_dir).collect()
    assert len(got) == len(want)
    for r in got:
        assert (r["n"], r["acf_e6"]) == want[(r["event_type"], r["lag_k"])]
    # sanity: autocorrelation is a correlation — bounded
    assert all(-1_000_000 <= r["acf_e6"] <= 1_000_000 for r in got)


def test_attribution_matches_bruteforce(spark, sf_dir):
    """Replaying each user's event stream in Python must assign every
    purchase the same last eligible touch."""
    ev = load(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type"
    ).collect()
    by_user: dict[int, list] = {}
    for r in sorted(ev, key=lambda r: (r["ts"], r["event_id"])):
        by_user.setdefault(r["user_id"], []).append(r)
    want = {}
    for uid, items in by_user.items():
        last_touch = None
        for r in items:
            if r["event_type"] == "purchase" and last_touch is not None:
                delta = r["ts"] - last_touch["ts"]
                gap = (
                    delta.days * 86_400 + delta.seconds
                ) * 1_000_000 + delta.microseconds
                want[r["event_id"]] = (
                    last_touch["event_id"],
                    last_touch["event_type"],
                    gap,
                )
            if r["event_type"] != "purchase":
                last_touch = r
    got = Q["events_attribution"](spark, sf_dir).collect()
    assert len(got) == len(want)
    for r in got:
        tid, ttype, gap = want[r["purchase_id"]]
        assert r["touch_id"] == tid
        assert r["touch_type"] == ttype
        assert r["gap_us"] == gap


def test_rfm_segment_properties(spark, sf_dir):
    """Quartiles must be balanced NTILEs, the code must compose the
    three digits, and the population must be exactly the purchasing
    users."""
    got = Q["events_rfm_segment"](spark, sf_dir).collect()
    n_users = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("user_id")
        .distinct()
        .count()
    )
    assert len(got) == n_users
    for col in ("r_q", "f_q", "m_q"):
        counts = [0] * 5
        for r in got:
            assert 1 <= r[col] <= 4
            counts[r[col]] += 1
        assert max(counts[1:]) - min(counts[1:]) <= 1  # NTILE balance
    for r in got:
        assert r["rfm_code"] == r["r_q"] * 100 + r["f_q"] * 10 + r["m_q"]
        assert r["r_days"] >= 0 and r["f"] >= 1 and r["m_cents"] > 0


def test_dsir_weights_matches_bruteforce(spark, sf_dir):
    """Per-doc log importance weight must equal the smoothed-LM ratio
    replayed in Python with the identical e6 floor-per-vocab-entry."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "lang", "text").collect()
    raw: dict[str, int] = {}
    tgt: dict[str, int] = {}
    toks_by_doc = {}
    for r in docs:
        toks = r["text"].split(" ")
        toks_by_doc[r["doc_id"]] = toks
        for t in toks:
            raw[t] = raw.get(t, 0) + 1
            if r["lang"] == "en":
                tgt[t] = tgt.get(t, 0) + 1
    n_raw = float(sum(raw.values()))
    n_tgt = float(sum(tgt.values()))
    v = float(len(raw))
    w_e6 = {
        t: math.floor(
            (math.log((tgt.get(t, 0) + 1.0) / (n_tgt + v)) - math.log(c / n_raw))
            * 1_000_000
        )
        for t, c in raw.items()
    }
    got = {r["doc_id"]: r for r in Q["text_dsir_weights"](spark, sf_dir).collect()}
    assert len(got) == len(toks_by_doc)
    for doc_id, toks in toks_by_doc.items():
        s = sum(w_e6[t] for t in toks)
        assert got[doc_id]["n_tokens"] == len(toks)
        assert got[doc_id]["logw_sum_e6"] == s
        assert got[doc_id]["avg_logw_e6"] == math.floor(s / len(toks))
    # English docs should skew toward higher weight than non-English
    by_lang: dict[str, list] = {}
    for r in docs:
        by_lang.setdefault(r["lang"], []).append(got[r["doc_id"]]["avg_logw_e6"])
    if "en" in by_lang and len(by_lang) > 1:
        others = [v for k, vs in by_lang.items() if k != "en" for v in vs]
        en_mean = sum(by_lang["en"]) / len(by_lang["en"])
        assert en_mean > sum(others) / len(others)


def test_bpe_merge_apply_matches_bruteforce(spark, sf_dir):
    """The merged-vocab pair counts must match a Python replay of
    greedy replace + recount; the sentinel must render as '(pair)'."""
    docs = load(spark, sf_dir, "documents").select("text").collect()
    words: dict[str, int] = {}
    for r in docs:
        for w in r["text"].split(" "):
            if w:
                words[w] = words.get(w, 0) + 1
    pairs: dict[str, int] = {}
    for w, n in words.items():
        for i in range(len(w) - 1):
            pairs[w[i : i + 2]] = pairs.get(w[i : i + 2], 0) + n
    top = min(pairs, key=lambda p: (-pairs[p], p))
    pairs2: dict[str, int] = {}
    for w, n in words.items():
        m = w.replace(top, "\x01")
        for i in range(len(m) - 1):
            pairs2[m[i : i + 2]] = pairs2.get(m[i : i + 2], 0) + n
    want = sorted(pairs2.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    want = [(p.replace("\x01", f"({top})"), c) for p, c in want]
    got = [
        (r["pair"], r["merge_count"])
        for r in Q["bpe_merge_apply"](spark, sf_dir).collect()
    ]
    assert sorted(got) == sorted(want)


def test_gopher_rules_matches_bruteforce(spark, sf_dir):
    """Every sub-metric and the rule bitmask must match a Python
    replay of the rule battery."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text").collect()
    got = {r["doc_id"]: r for r in Q["text_gopher_rules"](spark, sf_dir).collect()}
    assert len(got) == len(docs)
    for d in docs:
        ws = d["text"].split(" ")
        n_words = len(ws)
        nonspace = len(d["text"]) - n_words + 1
        n_alpha = sum(1 for ch in d["text"] if "a" <= ch <= "z")
        avg_wlen_e2 = math.floor(nonspace / n_words * 100)
        symbol_e4 = math.floor((1.0 - n_alpha / nonspace) * 10000)
        alpha_word_e4 = math.floor(
            sum(1 for w in ws if w and all("a" <= c <= "z" for c in w))
            / n_words
            * 10000
        )
        n_stop = sum(
            1
            for w in ws
            if w in ("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")
        )
        r = got[d["doc_id"]]
        assert r["n_words"] == n_words
        assert r["avg_wlen_e2"] == avg_wlen_e2
        assert r["symbol_ratio_e4"] == symbol_e4
        assert r["alpha_word_e4"] == alpha_word_e4
        assert r["n_stop"] == n_stop
        mask = (
            (10 <= n_words <= 5000)
            + (300 <= avg_wlen_e2 <= 1000) * 2
            + (symbol_e4 <= 1000) * 4
            + (alpha_word_e4 >= 8000) * 8
            + (n_stop >= 2) * 16
        )
        assert r["rules_mask"] == mask
        assert r["passes"] == (mask == 31)


def test_l_diversity_matches_bruteforce(spark, sf_dir):
    """Group sizes, sensitive-class NDV and the release verdict must
    match a Python contingency replay."""
    rows = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal"
    ).collect()
    size: dict[tuple, int] = {}
    classes: dict[tuple, set] = {}
    for r in rows:
        k = (r["c_nationkey"], r["c_mktsegment"])
        size[k] = size.get(k, 0) + 1
        classes.setdefault(k, set()).add(math.floor(r["c_acctbal"] / 1000))
    got = Q["anon_l_diversity"](spark, sf_dir).collect()
    assert len(got) == len(size)
    for r in got:
        k = (r["nat_q"], r["seg_q"])
        assert r["group_n"] == size[k]
        assert r["l_sensitive"] == len(classes[k])
        assert r["releasable"] == (size[k] >= 10 and len(classes[k]) >= 3)


def test_t_test_welch_matches_bruteforce(spark, sf_dir):
    """t statistic must match the Welch formula computed from exact
    Python integer sums."""
    rows = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "purchase"))
        .select("event_type", "value")
        .collect()
    )
    g = {"click": [], "purchase": []}
    for r in rows:
        g[r["event_type"]].append(math.floor(r["value"] * 10000))
    n1, n2 = len(g["click"]), len(g["purchase"])
    s1, s2 = sum(g["click"]), sum(g["purchase"])
    ss1 = sum(v * v for v in g["click"])
    ss2 = sum(v * v for v in g["purchase"])
    mdiff = s1 / n1 - s2 / n2
    var1 = (ss1 - s1 * s1 / n1) / (n1 - 1)
    var2 = (ss2 - s2 * s2 / n2) / (n2 - 1)
    t = mdiff / math.sqrt(var1 / n1 + var2 / n2)
    got = Q["agg_t_test_welch"](spark, sf_dir).collect()[0]
    assert (got["n1"], got["n2"]) == (n1, n2)
    assert got["mean_diff_e4"] == math.floor(mdiff)
    assert got["t_e4"] == math.floor(t * 10000)


def test_mann_whitney_matches_bruteforce(spark, sf_dir):
    """U values (doubled units) must match tie-averaged rank sums
    computed in Python; U1+U2 must equal 2·n1·n2 by identity."""
    rows = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "purchase"))
        .select("event_type", "value")
        .collect()
    )
    both = sorted(
        (math.floor(r["value"] * 10000), r["event_type"]) for r in rows
    )
    n1 = sum(1 for _, t in both if t == "click")
    n2 = len(both) - n1
    # tie-averaged ranks in doubled units
    r1_x2 = 0
    i = 0
    while i < len(both):
        j = i
        while j < len(both) and both[j][0] == both[i][0]:
            j += 1
        rank2 = 2 * i + (j - i) + 1  # 2*prev + c + 1
        r1_x2 += sum(rank2 for k in range(i, j) if both[k][1] == "click")
        i = j
    u1_x2 = 2 * n1 * n2 + n1 * (n1 + 1) - r1_x2
    got = Q["agg_mann_whitney"](spark, sf_dir).collect()[0]
    assert (got["n1"], got["n2"]) == (n1, n2)
    assert got["u1_x2"] == u1_x2
    assert got["u1_x2"] + got["u2_x2"] == 2 * n1 * n2
    z = (u1_x2 / 2.0 - n1 * n2 / 2.0) / math.sqrt(n1 * n2 * (n1 + n2 + 1) / 12.0)
    assert got["z_e4"] == math.floor(z * 10000)


def _python_graph(spark):
    from graphsense_datafeed_spark.ingest.graphstats import cooccurrence_edges

    edges = [(r["src"], r["dst"]) for r in cooccurrence_edges(spark).collect()]
    adj: dict[str, set] = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    return edges, adj


def test_clustering_coeff_matches_bruteforce(spark, sf_dir):
    edges, adj = _python_graph(spark)
    eset = set(edges)
    got = {r["node"]: r for r in Q["graph_clustering_coeff"](spark, sf_dir).collect()}
    assert len(got) == len(adj)
    for node, nbrs in adj.items():
        ns = sorted(nbrs)
        closed = sum(
            1
            for i in range(len(ns))
            for j in range(i + 1, len(ns))
            if (ns[i], ns[j]) in eset
        )
        d = len(ns)
        r = got[node]
        assert r["degree"] == d
        assert r["n_closed"] == closed
        want_cc = math.floor(2 * closed * 10000 / (d * (d - 1))) if d >= 2 else 0
        assert r["cc_e4"] == want_cc


def test_kcore_peel_reaches_fixpoint(spark, sf_dir):
    """The fixed 4-round unroll must produce the TRUE 3-core (i.e.
    peeling to convergence in Python gives the same node set), and
    every survivor must keep core_degree ≥ 3."""
    _, adj = _python_graph(spark)
    live = set(adj)
    while True:
        drop = {n for n in live if sum(1 for m in adj[n] if m in live) < 3}
        if not drop:
            break
        live -= drop
    got = {r["node"]: r["core_degree"] for r in Q["graph_kcore_peel"](spark, sf_dir).collect()}
    assert set(got) == live
    for n, d in got.items():
        assert d >= 3
        assert d == sum(1 for m in adj[n] if m in live)


def test_keywords_topk_matches_bruteforce(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select("doc_id", "text").collect()
    tf: dict[tuple, int] = {}
    dfc: dict[str, set] = {}
    for r in docs:
        for t in r["text"].split(" "):
            tf[(r["doc_id"], t)] = tf.get((r["doc_id"], t), 0) + 1
            dfc.setdefault(t, set()).add(r["doc_id"])
    n = float(len(docs))
    idf = {t: math.floor(math.log(n / len(ds)) * 1_000_000) for t, ds in dfc.items()}
    want: dict[int, list] = {}
    for (doc, t), c in tf.items():
        want.setdefault(doc, []).append((-c * idf[t], t))
    got = Q["text_keywords_topk"](spark, sf_dir).collect()
    by_doc: dict[int, list] = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(by_doc) == len(docs)
    for doc, rows in by_doc.items():
        top = sorted(want[doc])[:3]
        rows.sort(key=lambda r: r["rank"])
        assert [r["keyword"] for r in rows] == [t for _, t in top]
        assert [r["score_e6"] for r in rows] == [-s for s, _ in top]


def test_holt_linear_matches_python_fold(spark, sf_dir):
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("user_id") < 30)
        .select("user_id", "ts", "event_id", "value")
        .collect()
    )
    series: dict[int, list] = {}
    for r in sorted(ev, key=lambda r: (r["ts"], r["event_id"])):
        series.setdefault(r["user_id"], []).append(r["value"])
    got = {r["user_id"]: r for r in Q["ts_holt_linear"](spark, sf_dir).collect()}
    assert len(got) == len(series)
    for uid, vals in series.items():
        l, b = vals[0], 0.0
        for v in vals[1:]:
            l_new = 0.5 * v + 0.5 * (l + b)
            b_new = 0.25 * ((0.5 * v + 0.5 * (l + b)) - l) + 0.75 * b
            l, b = l_new, b_new
        r = got[uid]
        assert r["n_obs"] == len(vals)
        assert r["level_e6"] == math.floor(l * 1_000_000)
        assert r["trend_e6"] == math.floor(b * 1_000_000)
        assert r["forecast1_e6"] == math.floor((l + b) * 1_000_000)


def test_pq_recall_vs_exact(spark, sf_dir):
    """PQ + shortlist re-rank must recover ≥70% of the exact top-3
    (round-13 frozen round-0 codebooks + shortlist 96: measured 0.82
    at sf0.001, 0.84 at sf0.01 — above the old Lloyd readings), and
    every emitted cosine must be the TRUE cosine (re-rank is exact)."""
    exact = Q["sim_topk_exact"](spark, sf_dir).collect()
    exact3 = {(r["query_id"], r["neighbor_id"]) for r in exact if r["rank_k"] <= 3}
    exact_cos = {
        (r["query_id"], r["neighbor_id"]): r["cosine_e4"] for r in exact
    }
    pq = Q["sim_ann_pq"](spark, sf_dir).collect()
    hits = {(r["query_id"], r["neighbor_id"]) for r in pq}
    assert len(hits & exact3) / len(exact3) >= 0.70
    for r in pq:
        key = (r["query_id"], r["neighbor_id"])
        if key in exact_cos:  # overlap rows must agree exactly
            assert r["cosine_e4"] == exact_cos[key]


def test_asof_nearest_matches_bruteforce(spark, sf_dir):
    """Every non-signup event must match the closest signup in either
    direction, ties to backward, replayed in Python."""
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("user_id") < 40)
        .select("event_id", "user_id", "ts", "event_type")
        .collect()
    )
    by_user: dict[int, list] = {}
    for r in sorted(ev, key=lambda r: (r["ts"], r["event_id"])):
        by_user.setdefault(r["user_id"], []).append(r)
    want = {}
    for uid, items in by_user.items():
        sigs = [r for r in items if r["event_type"] == "signup"]
        for i, r in enumerate(items):
            if r["event_type"] == "signup":
                continue
            back = [s for s in sigs if (s["ts"], s["event_id"]) <= (r["ts"], r["event_id"])]
            fwd = [s for s in sigs if (s["ts"], s["event_id"]) > (r["ts"], r["event_id"])]
            cand = []
            us = lambda d: (d.days * 86_400 + d.seconds) * 1_000_000 + d.microseconds
            if back:
                s = back[-1]
                cand.append((us(r["ts"] - s["ts"]), 0, s["event_id"], "backward"))
            if fwd:
                s = fwd[0]
                cand.append((us(s["ts"] - r["ts"]), 1, s["event_id"], "forward"))
            if cand:
                gap, _, sid, direction = min(cand)
                want[r["event_id"]] = (sid, direction, gap)
    got = Q["join_asof_nearest"](spark, sf_dir).collect()
    assert len(got) == len(want)
    for r in got:
        sid, direction, gap = want[r["event_id"]]
        assert (r["anchor_id"], r["direction"], r["gap_us"]) == (sid, direction, gap)


def test_kl_divergence_matches_bruteforce(spark, sf_dir):
    rows = (
        load(spark, sf_dir, "events")
        .select((F.dayofweek("ts") - 1).alias("dow"), "value")
        .collect()
    )
    cw: dict[int, int] = {}
    ce: dict[int, int] = {}
    for r in rows:
        b = math.floor(r["value"] / 10)
        if r["dow"] in (0, 6):
            ce[b] = ce.get(b, 0) + 1
        else:
            cw[b] = cw.get(b, 0) + 1
    buckets = set(cw) | set(ce)
    nb = len(buckets)
    nw, ne = sum(cw.values()), sum(ce.values())
    want = {}
    for b in buckets:
        p = (cw.get(b, 0) + 1) / (nw + nb)
        q = (ce.get(b, 0) + 1) / (ne + nb)
        want[b] = math.floor(p * math.log(p / q) * 1_000_000_000)
    got = Q["agg_kl_divergence"](spark, sf_dir).collect()
    assert len(got) == nb
    total = sum(want.values())
    for r in got:
        assert r["term_e9"] == want[r["bucket"]]
        assert r["kl_sum_e9"] == total
    # KL of the UNsmoothed empirical dists is >= 0; smoothing keeps the
    # total near it — just sanity-bound the scale here
    assert total > -(10**9)


def test_embed_drift_matches_bruteforce(spark, sf_dir):
    embs = load(spark, sf_dir, "embeddings").collect()
    sums: dict[tuple, list] = {}
    counts: dict[tuple, int] = {}
    for r in embs:
        key = (r["label"], r["vec_id"] % 2)
        v = [math.floor(float(x) * 10000) for x in r["embedding"]]
        if key not in sums:
            sums[key] = [0] * len(v)
            counts[key] = 0
        for i, x in enumerate(v):
            sums[key][i] += x
        counts[key] += 1
    got = {r["label"]: r for r in Q["embed_drift_labels"](spark, sf_dir).collect()}
    labels = {l for l, h in sums}
    assert set(got) == labels
    for lab in labels:
        s0, s1 = sums[(lab, 0)], sums[(lab, 1)]
        n0, n1 = counts[(lab, 0)], counts[(lab, 1)]
        dot = sum(a * b for a, b in zip(s0, s1))
        nrm0 = sum(a * a for a in s0)
        nrm1 = sum(b * b for b in s1)
        cos = math.floor(dot / math.sqrt(nrm0 * nrm1) * 1_000_000)
        shift = sum(
            math.floor((a / n0 - b / n1) ** 2) for a, b in zip(s0, s1)
        )
        r = got[lab]
        assert (r["n_even"], r["n_odd"]) == (n0, n1)
        assert r["centroid_cos_e6"] == cos
        assert r["shift_sq_e8"] == shift
        # a cosine is bounded; fixture labels are arbitrary over random
        # unit vectors, so shard centroids need not correlate strongly
        assert -1_000_000 <= r["centroid_cos_e6"] <= 1_000_000


def test_url_normalize_properties(spark, sf_dir):
    """Canonical URLs must be lowercase, fragment/port/tracking-free,
    and group counts must equal the actual canonical-key histogram."""
    got = Q["text_url_normalize"](spark, sf_dir).collect()
    from collections import Counter

    hist = Counter(r["canon_url"] for r in got)
    for r in got:
        c = r["canon_url"]
        assert c == c.lower()
        assert "#" not in c and ":443" not in c and "www." not in c
        assert "utm_" not in c and "fbclid" not in c
        assert not c.split("?")[0].endswith("/")
        assert c.startswith("https://example")
        assert r["n_sharing"] == hist[c]
        # meaningful params survive
        if r["doc_id"] % 4 == 0:
            assert "ref=home" in c
        assert f"id={r['doc_id'] % 5}" in c


def test_pattern_match_matches_bruteforce(spark, sf_dir):
    ev = load(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type"
    ).collect()
    by_user: dict[int, list] = {}
    for r in sorted(ev, key=lambda r: (r["ts"], r["event_id"])):
        by_user.setdefault(r["user_id"], []).append(r)
    want = {}
    for uid, items in by_user.items():
        for i in range(2, len(items)):
            a, b, c = items[i - 2], items[i - 1], items[i]
            if (
                a["event_type"] == "view"
                and b["event_type"] == "click"
                and c["event_type"] == "purchase"
            ):
                d = c["ts"] - a["ts"]
                span = (d.days * 86_400 + d.seconds) * 1_000_000 + d.microseconds
                want[c["event_id"]] = (a["event_id"], span)
    got = Q["win_pattern_match"](spark, sf_dir).collect()
    assert len(got) == len(want)
    assert len(got) > 0  # the pattern must actually occur in the fixture
    for r in got:
        sid, span = want[r["match_id"]]
        assert (r["start_id"], r["span_us"]) == (sid, span)


def test_assortativity_matches_bruteforce(spark, sf_dir):
    edges, adj = _python_graph(spark)
    deg = {n: len(v) for n, v in adj.items()}
    xs, ys = [], []
    for s, d in edges:
        xs += [deg[s], deg[d]]
        ys += [deg[d], deg[s]]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx = sum(a * a for a in xs)
    syy = sum(b * b for b in ys)
    num = float(n) * sxy - float(sx) * sy
    den = math.sqrt(
        (float(n) * sxx - float(sx) * sx) * (float(n) * syy - float(sy) * sy)
    )
    got = Q["graph_assortativity"](spark, sf_dir).collect()[0]
    assert got["n_edges"] == len(edges)
    assert got["assortativity_e6"] == math.floor(num / den * 1_000_000)
    assert -1_000_000 <= got["assortativity_e6"] <= 1_000_000


def test_benford_profile_matches_bruteforce(spark, sf_dir):
    rows = load(spark, sf_dir, "orders").select("o_totalprice").collect()
    from decimal import Decimal, ROUND_HALF_UP

    obs: dict[int, int] = {}
    for r in rows:
        cents = int(
            Decimal(repr(r["o_totalprice"] * 100)).quantize(0, ROUND_HALF_UP)
        )
        d = int(str(cents)[0])
        obs[d] = obs.get(d, 0) + 1
    n = sum(obs.values())
    got = Q["agg_benford_profile"](spark, sf_dir).collect()
    assert {r["digit"] for r in got} == set(obs)
    total = 0
    want_dev = {}
    for d, o in obs.items():
        p = math.log(1 + 1 / d) / math.log(10)
        dev = math.floor((o - n * p) ** 2 / (n * p) * 1_000_000)
        want_dev[d] = dev
        total += dev
    for r in got:
        assert r["o"] == obs[r["digit"]]
        p = math.log(1 + 1 / r["digit"]) / math.log(10)
        assert r["benford_e6"] == math.floor(p * 1_000_000)
        assert r["dev_e6"] == want_dev[r["digit"]]
        assert r["chi2_sum_e6"] == total


def test_seasonal_adjust_matches_bruteforce(spark, sf_dir):
    rows = (
        load(spark, sf_dir, "events")
        .select(
            "event_id",
            (F.dayofweek("ts") - 1).alias("dow"),
            F.hour("ts").alias("hod"),
            "value",
        )
        .collect()
    )
    sums: dict[tuple, list] = {}
    for r in rows:
        k = (r["dow"], r["hod"])
        v = math.floor(r["value"] * 10000)
        if k not in sums:
            sums[k] = [0, 0]
        sums[k][0] += v
        sums[k][1] += 1
    got = {r["event_id"]: r for r in Q["ts_seasonal_adjust"](spark, sf_dir).collect()}
    assert len(got) == len(rows)
    # residuals of each cell must sum to ~0 (mean removal)
    cell_res: dict[tuple, int] = {}
    for r in rows:
        k = (r["dow"], r["hod"])
        s, n = sums[k]
        v = math.floor(r["value"] * 10000)
        g = got[r["event_id"]]
        assert (g["dow"], g["hod"], g["v_e4"]) == (r["dow"], r["hod"], v)
        assert g["seasonal_mean_e4"] == math.floor(s / n)
        assert g["residual_e4"] == math.floor(v - s / n)
        cell_res[k] = cell_res.get(k, 0) + g["residual_e4"]
    for k, tot in cell_res.items():
        assert abs(tot) <= sums[k][1]  # floor() loses < 1 per row


def test_phash_dedup_matches_bruteforce(spark, sf_dir):
    """aHash near-dups replayed in Python over the same synthetic
    payload bytes; planted exact text dups must appear at hamming 0."""
    import hashlib

    docs = load(spark, sf_dir, "documents").select("doc_id", "text").collect()
    bits_by_doc = {}
    for r in docs:
        raw = (hashlib.md5(r["text"].encode()).hexdigest()) * 4
        bs = [int(raw[i * 2 : i * 2 + 2], 16) for i in range(64)]
        tot = sum(bs)
        bits_by_doc[r["doc_id"]] = [1 if b * 64 > tot else 0 for b in bs]
    ids = sorted(bits_by_doc)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            ba, bb = bits_by_doc[a], bits_by_doc[b]
            share = any(
                ba[k * 16 : k * 16 + 16] == bb[k * 16 : k * 16 + 16]
                for k in range(4)
            )
            if not share:
                continue
            ham = sum(1 for x, y in zip(ba, bb) if x != y)
            if ham <= 3:
                want[(a, b)] = ham
    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in Q["multimodal_phash_dedup"](spark, sf_dir).collect()
    }
    assert got == want
    # the corpus's planted exact text dups must surface at hamming 0
    texts: dict[str, list] = {}
    for r in docs:
        texts.setdefault(r["text"], []).append(r["doc_id"])
    planted = [sorted(v) for v in texts.values() if len(v) >= 2]
    # exact text dups exist only at the larger SFs (FIXTURES.md: 8 at
    # sf0.1); when present they MUST surface at hamming 0
    for grp in planted:
        assert got.get((grp[0], grp[1])) == 0


def test_phash_dedup_catches_planted_near_dup(spark, tmp_path):
    """A payload differing by a small byte perturbation (hamming ≤ 3
    after hashing) must pair with its original; a random payload must
    not. Drives the SPARK pipeline over planted documents."""
    import shutil

    src = "/root/testdata/sf0.001"
    dst = tmp_path / "sf"
    dst.mkdir()
    for t in ("documents",):
        shutil.copy(f"{src}/{t}.parquet", dst / f"{t}.parquet")
    # two docs with IDENTICAL text → identical payload → hamming 0
    import duckdb

    con = duckdb.connect()
    con.sql(
        f"""
        COPY (
            SELECT * FROM read_parquet('{src}/documents.parquet')
            UNION ALL
            SELECT 900001 AS doc_id, text, lang, source, n_chars
            FROM read_parquet('{src}/documents.parquet') WHERE doc_id = 1
            UNION ALL
            SELECT 900002 AS doc_id, text, lang, source, n_chars
            FROM read_parquet('{src}/documents.parquet') WHERE doc_id = 1
        ) TO '{dst}/documents.parquet' (FORMAT PARQUET)
        """
    )
    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in Q["multimodal_phash_dedup"](spark, str(dst)).collect()
    }
    # planted byte-identical payloads must pair at hamming 0 with each
    # other AND with their source doc
    assert got.get((900001, 900002)) == 0
    assert got.get((1, 900001)) == 0
    assert got.get((1, 900002)) == 0


def test_gaps_islands_matches_bruteforce(spark, sf_dir):
    """Every run must be maximal-consecutive and cover exactly the
    user's active days."""
    days = (
        load(spark, sf_dir, "events")
        .filter(F.col("user_id") < 60)
        .select("user_id", F.col("ts").cast("date").alias("d"))
        .distinct()
        .collect()
    )
    by_user: dict[int, list] = {}
    for r in days:
        by_user.setdefault(r["user_id"], []).append(r["d"])
    want = {}
    import datetime

    one = datetime.timedelta(days=1)
    for uid, ds in by_user.items():
        ds.sort()
        runs = []
        start = prev = ds[0]
        for d in ds[1:]:
            if d - prev != one:
                runs.append((start, prev, (prev - start).days + 1))
                start = d
            prev = d
        runs.append((start, prev, (prev - start).days + 1))
        want[uid] = sorted(runs)
    got: dict[int, list] = {}
    for r in Q["win_gaps_islands"](spark, sf_dir).collect():
        got.setdefault(r["user_id"], []).append(
            (r["run_start"], r["run_end"], r["run_days"])
        )
    assert {u: sorted(v) for u, v in got.items()} == want


def test_nearest_centroid_confusion_is_complete(spark, sf_dir):
    """The confusion matrix must partition all vectors, and each
    vector's argmax must match a Python replay over integer-sum
    centroids."""
    embs = load(spark, sf_dir, "embeddings").collect()
    sums: dict[int, list] = {}
    counts: dict[int, int] = {}
    for r in embs:
        v = [math.floor(float(x) * 10000) for x in r["embedding"]]
        if r["label"] not in sums:
            sums[r["label"]] = [0] * len(v)
            counts[r["label"]] = 0
        for i, x in enumerate(v):
            sums[r["label"]][i] += x
        counts[r["label"]] += 1
    want: dict[tuple, int] = {}
    for r in embs:
        v = [math.floor(float(x) * 10000) for x in r["embedding"]]
        best = None
        for lab in sorted(sums):
            dot = sum(a * b for a, b in zip(v, sums[lab])) / counts[lab]
            if best is None or dot > best[0]:
                best = (dot, lab)
        key = (r["label"], best[1])
        want[key] = want.get(key, 0) + 1
    got = {
        (r["true_label"], r["predicted_label"]): r["n_vectors"]
        for r in Q["embed_nearest_centroid_classify"](spark, sf_dir).collect()
    }
    assert got == want
    assert sum(got.values()) == len(embs)


def test_geo_grid_neighbors_matches_bruteforce(spark, sf_dir):
    """The grid join must return EXACTLY the brute-force all-pairs
    result — the 3×3 replication guarantees no pair within ε is
    missed."""
    import hashlib

    ids = [
        r["c_custkey"]
        for r in load(spark, sf_dir, "customer").select("c_custkey").collect()
    ]
    pts = {}
    for i in ids:
        h = hashlib.md5(str(i).encode()).hexdigest()
        pts[i] = (int(h[0:7], 16) % 10000, int(h[7:14], 16) % 10000)
    want = {}
    items = sorted(pts.items())
    for idx, (a, (xa, ya)) in enumerate(items):
        for b, (xb, yb) in items[idx + 1 :]:
            d2 = (xa - xb) ** 2 + (ya - yb) ** 2
            if d2 <= 40000:
                want[(a, b)] = d2
    got = {
        (r["id_a"], r["id_b"]): r["d2"]
        for r in Q["geo_grid_neighbors"](spark, sf_dir).collect()
    }
    assert got == want
    assert want, "fixture should produce at least one neighbor pair"


def test_markov_transitions_matches_bruteforce(spark, sf_dir):
    ev = load(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type"
    ).collect()
    by_user: dict[int, list] = {}
    for r in sorted(ev, key=lambda r: (r["ts"], r["event_id"])):
        by_user.setdefault(r["user_id"], []).append(r["event_type"])
    counts: dict[tuple, int] = {}
    for seq in by_user.values():
        for a, b in zip(seq, seq[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + 1
    row_tot: dict[str, int] = {}
    for (a, _), n in counts.items():
        row_tot[a] = row_tot.get(a, 0) + n
    got = Q["events_markov_transitions"](spark, sf_dir).collect()
    assert len(got) == len(counts)
    for r in got:
        key = (r["from_type"], r["to_type"])
        assert r["n"] == counts[key]
        assert r["p_e6"] == math.floor(
            counts[key] * 1_000_000 / row_tot[r["from_type"]]
        )
    # each row of the matrix must sum to ~1 (floor loses < |types| µ)
    by_from: dict[str, int] = {}
    for r in got:
        by_from[r["from_type"]] = by_from.get(r["from_type"], 0) + r["p_e6"]
    for tot in by_from.values():
        assert 1_000_000 - 5 <= tot <= 1_000_000


def test_active_users_rolling_matches_bruteforce(spark, sf_dir):
    rows = (
        load(spark, sf_dir, "events")
        .select(F.col("ts").cast("date").alias("d"), "user_id")
        .distinct()
        .collect()
    )
    import datetime

    act: dict = {}
    for r in rows:
        act.setdefault(r["d"], set()).add(r["user_id"])
    days = sorted(act)
    got = {r["d"]: r for r in Q["events_active_users_rolling"](spark, sf_dir).collect()}
    assert set(got) == set(days)
    for d in days:
        dau = len(act[d])
        wau = len(
            set().union(*[act[x] for x in days if d - datetime.timedelta(days=7) < x <= d])
        )
        mau = len(
            set().union(*[act[x] for x in days if d - datetime.timedelta(days=30) < x <= d])
        )
        r = got[d]
        assert (r["dau"], r["wau"], r["mau"]) == (dau, wau, mau)
        assert r["dau"] <= r["wau"] <= r["mau"]  # containment invariant


def test_survival_km_matches_bruteforce(spark, sf_dir):
    ev = load(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("date").alias("d")
    ).collect()
    first: dict = {}
    last: dict = {}
    for r in ev:
        u = r["user_id"]
        first[u] = min(first.get(u, r["d"]), r["d"])
        last[u] = max(last.get(u, r["d"]), r["d"])
    import datetime

    corpus_max = max(last.values())
    users = [
        (
            (last[u] - first[u]).days,
            last[u] < corpus_max - datetime.timedelta(days=3),
        )
        for u in first
    ]
    times = sorted({t for t, _ in users})
    got = {r["t_days"]: r for r in Q["events_survival_km"](spark, sf_dir).collect()}
    cum = 0
    prev_surv = 10**6
    for t in times:
        n_risk = sum(1 for tt, _ in users if tt >= t)
        d = sum(1 for tt, ch in users if tt == t and ch)
        if d == 0:
            assert t not in got
            continue
        r = got[t]
        assert (r["n_risk"], r["d_churned"]) == (n_risk, d)
        if d < n_risk:
            cum += math.floor(math.log(1.0 - d / n_risk) * 1_000_000_000)
            surv = math.floor(math.exp(cum / 1_000_000_000) * 1_000_000)
        else:
            surv = 0
        assert r["surv_e6"] == surv
        assert r["surv_e6"] <= prev_surv  # survival is non-increasing
        prev_surv = r["surv_e6"]


def test_cramers_v_matches_chi_square_and_bounds(spark, sf_dir):
    """V must derive from the SAME floored χ² total agg_chi_square
    emits, and land in [0, 1]."""
    chi_rows = Q["agg_chi_square"](spark, sf_dir).collect()
    chi_total = chi_rows[0]["chi2_sum_e6"]
    n = sum(r["o"] for r in chi_rows)
    r_dim = len({r["event_type"] for r in chi_rows})
    c_dim = len({r["dow"] for r in chi_rows})
    got = Q["agg_cramers_v"](spark, sf_dir).collect()[0]
    assert got["chi2_e6"] == chi_total
    assert (got["n"], got["r"], got["c"]) == (n, r_dim, c_dim)
    want = math.floor(
        math.sqrt((chi_total / 1_000_000) / (n * min(r_dim - 1, c_dim - 1)))
        * 1_000_000
    )
    assert got["cramers_v_e6"] == want
    assert 0 <= got["cramers_v_e6"] <= 1_000_000


def test_winsorized_mean_matches_bruteforce(spark, sf_dir):
    rows = load(spark, sf_dir, "events").select("event_type", "value").collect()
    series: dict[str, list] = {}
    for r in rows:
        series.setdefault(r["event_type"], []).append(
            math.floor(r["value"] * 10000)
        )
    got = {r["event_type"]: r for r in Q["agg_winsorized_mean"](spark, sf_dir).collect()}
    assert set(got) == set(series)
    for et, vals in series.items():
        vals.sort()
        n = len(vals)
        # discrete p5/p95: smallest atom whose cumulative reach ×20 ≥ n / ≥ 19n,
        # replayed via atoms for exactness
        from collections import Counter

        atoms = sorted(Counter(vals).items())
        below = 0
        lo = hi = None
        for v, c in atoms:
            reach = (below + c) * 20
            if lo is None and reach >= n:
                lo = v
            if hi is None and reach >= 19 * n:
                hi = v
            below += c
        clamped = [min(max(v, lo), hi) for v in vals]
        r = got[et]
        assert (r["lo_e4"], r["hi_e4"], r["n"]) == (lo, hi, n)
        assert r["winsor_mean_e4"] == math.floor(sum(clamped) / n)
        # robustness: the winsorized mean sits inside the clamp band
        assert lo <= r["winsor_mean_e4"] <= hi


def test_bootstrap_se_deterministic_and_sane(spark, sf_dir):
    """Re-running must give bit-identical results (hash bootstrap);
    the bootstrap mean must sit near the true mean and the SE near
    σ/√n."""
    a = Q["agg_bootstrap_se"](spark, sf_dir).collect()[0]
    b = Q["agg_bootstrap_se"](spark, sf_dir).collect()[0]
    assert a == b  # hash-deterministic
    assert a["n_boot"] == 50
    vals = [
        math.floor(r["value"] * 10000)
        for r in load(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("value")
        .collect()
    ]
    n = len(vals)
    mean = sum(vals) / n
    var = sum((v - mean) ** 2 for v in vals) / (n - 1)
    se_classic = math.sqrt(var / n)
    # m_e6 units are e4-values × 100
    boot_mean = a["boot_mean_e6"] / 100
    boot_se = a["boot_se_e6"] / 100
    assert abs(boot_mean - mean) < 5 * se_classic
    assert 0.6 * se_classic < boot_se < 1.6 * se_classic


def test_ngram_novelty_matches_bruteforce(spark, sf_dir):
    import hashlib

    docs = sorted(
        load(spark, sf_dir, "documents").select("doc_id", "text").collect(),
        key=lambda r: r["doc_id"],
    )
    seen: set = set()
    want = {}
    for r in docs:
        ws = r["text"].split(" ")
        if len(ws) < 3:
            continue
        grams = {
            hashlib.md5(" ".join(ws[i : i + 3]).encode()).hexdigest()
            for i in range(len(ws) - 2)
        }
        novel = len(grams - seen)
        want[r["doc_id"]] = (
            len(grams),
            novel,
            math.floor(novel / len(grams) * 10000),
        )
        seen |= grams
    got = {r["doc_id"]: r for r in Q["text_ngram_novelty"](spark, sf_dir).collect()}
    assert set(got) == set(want)
    for doc_id, (ns, nv, ne) in want.items():
        r = got[doc_id]
        assert (r["n_shingles"], r["n_novel"], r["novelty_e4"]) == (ns, nv, ne)
    # the first doc is 100% novel by construction
    first = min(want)
    assert got[first]["novelty_e4"] == 10000


def test_topk_with_ties_keeps_whole_tie_classes(spark, sf_dir):
    rows = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    ).collect()
    prices = sorted((math.floor(r["o_totalprice"]) for r in rows), reverse=True)
    got = Q["topk_with_ties"](spark, sf_dir).collect()
    # rank semantics: every row whose rank <= 10 survives
    from collections import Counter

    hist = Counter(math.floor(r["o_totalprice"]) for r in rows)
    kept = []
    rank = 1
    for p in sorted(hist, reverse=True):
        if rank > 10:
            break
        kept.append((p, hist[p], rank))
        rank += hist[p]
    want_n = sum(c for _, c, _ in kept)
    assert len(got) == want_n
    want_ranks = {p: r for p, _, r in kept}
    for r in got:
        assert r["rnk"] == want_ranks[r["price_fl"]]
    # the boundary tie class is intact: all rows of the lowest kept
    # price appear
    lowest = min(p for p, _, _ in kept)
    assert sum(1 for r in got if r["price_fl"] == lowest) == hist[lowest]


def test_burstiness_matches_bruteforce(spark, sf_dir):
    ev = load(spark, sf_dir, "events").select(
        "event_id", "event_type", "ts"
    ).collect()
    series: dict[str, list] = {}
    for r in sorted(ev, key=lambda r: (r["ts"], r["event_id"])):
        series.setdefault(r["event_type"], []).append(r["ts"])
    got = {r["event_type"]: r for r in Q["events_burstiness"](spark, sf_dir).collect()}
    assert set(got) == set(series)
    for et, tss in series.items():
        gaps = []
        for a, b in zip(tss, tss[1:]):
            delta = b - a
            us = (delta.days * 86_400 + delta.seconds) * 1_000_000 + delta.microseconds
            gaps.append(us // 1000)
        n = len(gaps)
        s, ss = sum(gaps), sum(g * g for g in gaps)
        mean = s / n
        sd = math.sqrt((ss - s * s / n) / (n - 1))
        r = got[et]
        assert r["n_gaps"] == n
        assert r["mean_gap_ms"] == math.floor(mean)
        assert r["cv_e6"] == math.floor(sd / mean * 1_000_000)
        assert r["cv_e6"] > 0


def test_zipf_slope_matches_bruteforce_and_is_negative(spark, sf_dir):
    from collections import Counter

    toks = Counter()
    for r in load(spark, sf_dir, "documents").select("text").collect():
        for t in r["text"].split(" "):
            if t:
                toks[t] += 1
    ranked = sorted(toks.items(), key=lambda kv: (-kv[1], kv[0]))
    xs = [math.floor(math.log(i + 1) * 1000) for i in range(len(ranked))]
    ys = [math.floor(math.log(f) * 1000) for _, f in ranked]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx = sum(a * a for a in xs)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy / n - slope * sx / n) / 1000
    got = Q["text_zipf_slope"](spark, sf_dir).collect()[0]
    assert got["vocab_size"] == n
    assert got["slope_e6"] == math.floor(slope * 1_000_000)
    assert got["intercept_e6"] == math.floor(intercept * 1_000_000)
    assert got["slope_e6"] < 0  # frequency falls with rank


def test_itemset_lift_matches_bruteforce(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").collect()
    pt = {
        r["p_partkey"]: r["p_brand"]
        for r in load(spark, sf_dir, "part").select("p_partkey", "p_brand").collect()
    }
    baskets: dict[int, set] = {}
    for r in li:
        baskets.setdefault(r["l_orderkey"], set()).add(pt[r["l_partkey"]])
    n = len(baskets)
    item: dict[str, int] = {}
    support: dict[tuple, int] = {}
    for brands in baskets.values():
        bs = sorted(brands)
        for x in bs:
            item[x] = item.get(x, 0) + 1
        for i in range(len(bs)):
            for j in range(i + 1, len(bs)):
                support[(bs[i], bs[j])] = support.get((bs[i], bs[j]), 0) + 1
    got = {
        (r["brand_a"], r["brand_b"]): r
        for r in Q["agg_itemset_lift"](spark, sf_dir).collect()
    }
    want_keys = {k for k, s in support.items() if s >= 10}
    assert set(got) == want_keys
    for (a, b), r in got.items():
        s = support[(a, b)]
        assert r["support"] == s
        assert r["conf_a_to_b_e4"] == math.floor(s * 10000 / item[a])
        assert r["lift_e4"] == math.floor(s * n / (item[a] * item[b]) * 10000)


def test_two_hop_reach_matches_bruteforce(spark, sf_dir):
    _, adj = _python_graph(spark)
    got = {r["node"]: r for r in Q["graph_2hop_reach"](spark, sf_dir).collect()}
    for node, nbrs in adj.items():
        reach = set()
        for m in nbrs:
            reach |= adj[m]
        reach.discard(node)
        if not reach:
            assert node not in got
            continue
        r = got[node]
        assert r["n_2hop"] == len(reach)
        assert r["n_new_at_2"] == len(reach - nbrs)
    assert set(got) <= set(adj)


def test_anomaly_pipeline_composes_stages(spark, sf_dir):
    """The pipeline must equal z-score-on-residuals where residuals
    come from ts_seasonal_adjust — verified by composing the two
    operators' own outputs."""
    resid = {
        r["event_id"]: r["residual_e4"]
        for r in Q["ts_seasonal_adjust"](spark, sf_dir).collect()
    }
    ev = load(spark, sf_dir, "events").select(
        "event_id", "event_type", "ts"
    ).collect()
    series: dict[str, list] = {}
    for r in sorted(ev, key=lambda r: (r["ts"], r["event_id"])):
        series.setdefault(r["event_type"], []).append(r["event_id"])
    want = {}
    for et, ids in series.items():
        vals = [resid[i] for i in ids]
        for i, eid in enumerate(ids):
            frame = vals[max(0, i - 24) : i]
            n = len(frame)
            if n < 8:
                continue
            s = sum(frame)
            ss = sum(x * x for x in frame)
            dev = vals[i] - s / n
            var = (ss - s * s / n) / n
            if dev * dev > 9.0 * var:
                want[eid] = (et, vals[i], n)
    got = {r["event_id"]: r for r in Q["ts_anomaly_pipeline"](spark, sf_dir).collect()}
    assert set(got) == set(want)
    for eid, (et, r_e4, n) in want.items():
        r = got[eid]
        assert (r["event_type"], r["r_e4"], r["n_window"]) == (et, r_e4, n)
    # the pipeline flags fewer or different events than the raw gate —
    # the seasonal stage must change the verdict set on this fixture
    raw = {
        r["event_id"]
        for r in Q["ts_zscore_anomaly"](spark, sf_dir).collect()
        if r["is_anomaly"]
    }
    assert set(got) != raw


def test_skyline_matches_bruteforce(spark, sf_dir):
    rows = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderdate"
    ).collect()
    pts = [
        (math.floor(r["o_totalprice"]), r["o_orderdate"], r["o_orderkey"])
        for r in rows
    ]
    got = {r["o_orderkey"] for r in Q["skyline_2d"](spark, sf_dir).collect()}
    # dominance: p dominates q iff p.price<=q.price, p.date>=q.date,
    # strictly better in one; among full duplicates the lowest key wins
    want = set()
    for p, d, k in pts:
        dominated = any(
            (p2 <= p and d2 >= d and (p2 < p or d2 > d))
            or (p2 == p and d2 == d and k2 < k)
            for p2, d2, k2 in pts
        )
        if not dominated:
            want.add(k)
    assert got == want
    # frontier is monotone: along ascending price, a costlier survivor
    # must offer a strictly later date (else the cheaper one dominates)
    front = sorted((p, d) for p, d, k in pts if k in got)
    for (p1, d1), (p2, d2) in zip(front, front[1:]):
        assert d2 > d1


def test_parse_header_matches_bruteforce(spark, sf_dir):
    import hashlib
    from functools import reduce

    docs = load(spark, sf_dir, "documents").select("doc_id", "text").collect()
    got = {r["doc_id"]: r for r in Q["multimodal_parse_header"](spark, sf_dir).collect()}
    assert len(got) == len(docs)
    for d in docs:
        raw = hashlib.md5(d["text"].encode()).hexdigest() * 4
        bs = [int(raw[i * 2 : i * 2 + 2], 16) for i in range(16)]
        r = got[d["doc_id"]]
        assert r["magic"] == raw[:4].upper()
        assert r["version"] == bs[2] % 4
        assert r["n_frames"] == bs[3] % 8 + 1
        assert r["duration_ms"] == (
            bs[4] * 16777216 + bs[5] * 65536 + bs[6] * 256 + bs[7]
        )
        assert r["xor_check"] == reduce(lambda a, x: a ^ x, bs[8:16])


def test_hash_features_matches_bruteforce(spark, sf_dir):
    import hashlib

    docs = load(spark, sf_dir, "documents").select("doc_id", "text").collect()
    got = {r["doc_id"]: r for r in Q["text_hash_features"](spark, sf_dir).collect()}
    assert len(got) == len(docs)
    for d in docs:
        buckets: dict[int, int] = {}
        for t in d["text"].split(" "):
            if t:
                b = int(hashlib.md5(t.encode()).hexdigest()[:7], 16) % 1024
                buckets[b] = buckets.get(b, 0) + 1
        want = ",".join(f"{b}:{c}" for b, c in sorted(buckets.items()))
        r = got[d["doc_id"]]
        assert r["n_active"] == len(buckets)
        assert r["features"] == want
        assert r["n_active"] <= 1024  # fixed dimensionality


def test_random_projection_matches_bruteforce_and_jl(spark, sf_dir):
    import hashlib

    embs = load(spark, sf_dir, "embeddings").collect()
    signs = {}
    for m in range(16):
        for pos in range(1, 65):
            h = hashlib.md5(f"{m}_{pos}".encode()).hexdigest()
            signs[(m, pos)] = 1 if int(h[:7], 16) % 2 == 0 else -1
    got = {r["vec_id"]: r for r in Q["embed_random_projection"](spark, sf_dir).collect()}
    assert len(got) == len(embs)
    ratios = []
    for e in embs:
        v = [math.floor(float(x) * 10000) for x in e["embedding"]]
        proj = [
            sum(signs[(m, i + 1)] * v[i] for i in range(len(v)))
            for m in range(16)
        ]
        r = got[e["vec_id"]]
        assert r["proj_e4"] == ",".join(str(p) for p in proj)
        want_ratio = math.floor(
            math.sqrt(sum(p * p for p in proj) / 16) / 10000 * 10000
        )
        assert r["norm_ratio_e4"] == want_ratio
        ratios.append(r["norm_ratio_e4"] / 10000)
    # JL distortion: unit-norm inputs → ratios concentrate near 1
    mean_ratio = sum(ratios) / len(ratios)
    assert 0.8 < mean_ratio < 1.2


def test_velocity_rule_matches_bruteforce(spark, sf_dir):
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts")
        .collect()
    )
    by_user: dict[int, list] = {}
    for r in sorted(ev, key=lambda r: r["ts"]):
        by_user.setdefault(r["user_id"], []).append(r)
    import calendar

    want = {}
    for uid, items in by_user.items():
        secs = [
            calendar.timegm(r["ts"].timetuple()) for r in items
        ]
        for i, r in enumerate(items):
            n = sum(1 for s in secs if secs[i] - 86400 <= s <= secs[i])
            want[r["event_id"]] = n
    got = Q["events_velocity_rule"](spark, sf_dir).collect()
    assert len(got) == len(want)
    for r in got:
        assert r["n_24h"] == want[r["event_id"]]
        assert r["velocity_flag"] == (r["n_24h"] >= 3)


def test_ab_srm_balanced_and_deterministic(spark, sf_dir):
    a = Q["events_ab_srm"](spark, sf_dir).collect()[0]
    b = Q["events_ab_srm"](spark, sf_dir).collect()[0]
    assert a == b  # hash assignment is stable
    n_users = load(spark, sf_dir, "events").select("user_id").distinct().count()
    assert a["n_control"] + a["n_treat"] == n_users
    # a fair hash on this population must not trip the alarm
    assert not a["srm_alarm"]
    dev = a["n_control"] - n_users / 2
    chi2 = dev * dev / (n_users / 2) * 2
    assert a["srm_chi2_e6"] == math.floor(chi2 * 1_000_000)


def test_manifest_incremental_reads_only_the_delta(spark, sf_dir):
    got = Q["scan_manifest_incremental_read"](spark, sf_dir)
    rows = got.collect()
    ev = load(spark, sf_dir, "events")
    want_n = ev.filter(F.col("event_id") % 2 == 1).count()
    assert len(rows) == want_n
    assert all(r["event_id"] % 2 == 1 for r in rows)
    # and the full snapshot read is delta + v1
    full = Q["sink_manifest_commit"](spark, sf_dir).count()
    assert full == ev.count()


def test_theil_decomposition_identity_and_bruteforce(spark, sf_dir):
    rows = load(spark, sf_dir, "customer").select(
        "c_nationkey", "c_acctbal"
    ).collect()
    from decimal import Decimal, ROUND_HALF_UP

    by_nation: dict[int, list] = {}
    for r in rows:
        x = int(
            Decimal(repr(r["c_acctbal"] * 100)).quantize(0, ROUND_HALF_UP)
        ) + 100000
        by_nation.setdefault(r["c_nationkey"], []).append(x)
    allx = [x for xs in by_nation.values() for x in xs]
    n, s = len(allx), sum(allx)
    mu = s / n
    got = {r["nation"]: r for r in Q["agg_theil_decomposition"](spark, sf_dir).collect()}
    assert set(got) == set(by_nation)
    within_sum = between_sum = 0
    for nat, xs in by_nation.items():
        ng, sg = len(xs), sum(xs)
        mug = sg / ng
        tg_sum = sum(
            math.floor((x / mug) * math.log(x / mug) * 1_000_000_000)
            for x in xs
        )
        t_g = math.floor(tg_sum / ng)
        share, ratio = ng / n, mug / mu
        within = math.floor(share * ratio * (tg_sum / ng))
        between = math.floor(share * ratio * math.log(ratio) * 1_000_000_000)
        r = got[nat]
        assert r["ng"] == ng
        assert r["t_g_e9"] == t_g
        assert r["within_e9"] == within
        assert r["between_e9"] == between
        within_sum += within
        between_sum += between
    any_row = next(iter(got.values()))
    assert any_row["within_sum_e9"] == within_sum
    assert any_row["between_sum_e9"] == between_sum
    # decomposition identity holds to flooring error
    assert (
        abs(any_row["t_total_e9"] - (within_sum + between_sum))
        < len(by_nation) * 10 + n
    )
    assert any_row["t_total_e9"] > 0  # there IS inequality


def test_cuped_matches_bruteforce_and_reduces_variance(spark, sf_dir):
    import hashlib
    import datetime

    ev = load(spark, sf_dir, "events").select("user_id", "ts", "value").collect()
    d0 = min(r["ts"].date() for r in ev)
    d1 = max(r["ts"].date() for r in ev)
    mid = d0 + datetime.timedelta(days=(d1 - d0).days // 2)
    per_user: dict[int, list] = {}
    for r in ev:
        u = per_user.setdefault(r["user_id"], [0, 0])
        c = math.floor(r["value"] * 100)
        if r["ts"].date() < mid:
            u[0] += c
        else:
            u[1] += c
    n = len(per_user)
    xs = [x for x, _ in per_user.values()]
    ys = [y for _, y in per_user.values()]
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx = sum(a * a for a in xs)
    syy = sum(b * b for b in ys)
    theta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    rho2 = (n * sxy - sx * sy) ** 2 / ((n * sxx - sx * sx) * (n * syy - sy * sy))
    arms: dict[int, list] = {0: [0, 0, 0], 1: [0, 0, 0]}
    for uid, (x, y) in per_user.items():
        a = int(hashlib.md5(f"exp42_{uid}".encode()).hexdigest()[:7], 16) % 2
        arms[a][0] += 1
        arms[a][1] += y
        arms[a][2] += x
    got = {r["arm"]: r for r in Q["events_ab_cuped"](spark, sf_dir).collect()}
    assert set(got) == {0, 1}
    for a, (n_arm, sy_arm, sx_arm) in arms.items():
        r = got[a]
        assert r["n_arm"] == n_arm
        assert r["raw_mean_e2"] == math.floor(sy_arm / n_arm)
        want_cuped = math.floor(
            sy_arm / n_arm - theta * (sx_arm / n_arm - sx / n)
        )
        assert r["cuped_mean_e2"] == want_cuped
        assert r["var_reduction_e6"] == math.floor(rho2 * 1_000_000)
    # the covariate predicts weakly on this synthetic fixture (user
    # behavior is random), but the reduction must be genuinely
    # positive and bounded like a squared correlation
    assert 0 < got[0]["var_reduction_e6"] < 1_000_000


def test_backtest_snaive_matches_bruteforce(spark, sf_dir):
    import datetime

    ev = load(spark, sf_dir, "events").select("event_type", "ts").collect()
    hourly: dict[tuple, int] = {}
    for r in ev:
        h = r["ts"].replace(minute=0, second=0, microsecond=0)
        hourly[(r["event_type"], h)] = hourly.get((r["event_type"], h), 0) + 1
    week = datetime.timedelta(hours=168)
    stats: dict[str, list] = {}
    for (et, h), y in hourly.items():
        prev = hourly.get((et, h - week))
        if prev is None:
            continue
        s = stats.setdefault(et, [0, 0, 0])
        s[0] += 1
        s[1] += abs(y - prev)
        s[2] += y
    got = {r["event_type"]: r for r in Q["ts_backtest_snaive"](spark, sf_dir).collect()}
    assert set(got) == set(stats)
    for et, (np_, errs, ysum) in stats.items():
        r = got[et]
        assert r["n_points"] == np_
        assert r["abs_err_sum"] == errs
        assert r["mae_e4"] == math.floor(errs / np_ * 10000)
        assert r["wape_e4"] == math.floor(errs * 10000 / ysum)


def test_exists_flags_match_bruteforce(spark, sf_dir):
    custs = {r["c_custkey"] for r in load(spark, sf_dir, "customer").select("c_custkey").collect()}
    orders = load(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice", "o_orderpriority"
    ).collect()
    want = {c: [False, False, False] for c in custs}
    for o in orders:
        c = o["o_custkey"]
        if c not in want:
            continue
        want[c][0] = True
        if o["o_totalprice"] > 200000:
            want[c][1] = True
        if o["o_orderpriority"] == "1-URGENT":
            want[c][2] = True
    got = {r["c_custkey"]: r for r in Q["join_exists_flags"](spark, sf_dir).collect()}
    assert set(got) == custs
    for c, (f1, f2, f3) in want.items():
        r = got[c]
        assert (r["has_order"], r["has_big_order"], r["has_urgent"]) == (f1, f2, f3)
    # flags are monotone: big/urgent imply has_order
    for r in got.values():
        if r["has_big_order"] or r["has_urgent"]:
            assert r["has_order"]


def test_video_near_dup_matches_bruteforce(spark, sf_dir):
    import hashlib

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[-1]

    docs = load(spark, sf_dir, "documents").select("doc_id", "text").collect()
    sigs = {}
    for d in docs:
        raw = hashlib.md5(d["text"].encode()).hexdigest() * 4
        sig = "".join(
            "0123456789abcdef"[int(raw[fr * 8 : fr * 8 + 8], 16) % 16]
            for fr in range(16)
        )
        sigs[d["doc_id"]] = sig
    ids = sorted(sigs)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if sigs[a][:4] != sigs[b][:4]:
                continue
            dd = lev(sigs[a], sigs[b])
            if dd <= 2:
                want[(a, b)] = dd
    got = {
        (r["doc_a"], r["doc_b"]): r["seq_dist"]
        for r in Q["multimodal_video_near_dup"](spark, sf_dir).collect()
    }
    assert got == want


def test_geometric_mean_matches_bruteforce(spark, sf_dir):
    rows = load(spark, sf_dir, "events").filter(F.col("value") > 0).select(
        "event_type", "value"
    ).collect()
    groups: dict[str, dict] = {}
    for r in rows:
        v = math.floor(r["value"] * 10000)
        g = groups.setdefault(r["event_type"], {})
        g[v] = g.get(v, 0) + 1
    got = {r["event_type"]: r for r in Q["agg_geometric_mean"](spark, sf_dir).collect()}
    assert set(got) == set(groups)
    for et, atoms in groups.items():
        n = sum(atoms.values())
        s = sum(c * math.floor(math.log(v / 10000) * 1_000_000_000) for v, c in atoms.items())
        want = math.floor(math.exp(s / n / 1_000_000_000) * 10000)
        r = got[et]
        assert r["n"] == n
        assert r["geo_mean_e4"] == want
        # AM-GM: geometric mean never exceeds the arithmetic mean
        am = sum(v * c for v, c in atoms.items()) / n
        assert r["geo_mean_e4"] <= am + 1


def test_time_decay_mean_matches_bruteforce(spark, sf_dir):
    rows = load(spark, sf_dir, "events").select(
        "event_type", F.col("ts").cast("date").alias("d"), "value"
    ).collect()
    d1 = max(r["d"] for r in rows)
    daily: dict[tuple, list] = {}
    for r in rows:
        k = (r["event_type"], (d1 - r["d"]).days)
        g = daily.setdefault(k, [0, 0])
        g[0] += math.floor(r["value"] * 10000)
        g[1] += 1
    per_type: dict[str, list] = {}
    for (et, age), (s, c) in daily.items():
        w = 2.0 ** (-age / 7.0)
        t = per_type.setdefault(et, [0, 0])
        t[0] += math.floor(w * s)
        t[1] += math.floor(w * c * 1_000_000)
    got = {r["event_type"]: r for r in Q["agg_time_decay_mean"](spark, sf_dir).collect()}
    assert set(got) == set(per_type)
    for et, (ws, wc) in per_type.items():
        r = got[et]
        assert r["decayed_sum_e4"] == ws
        assert r["decayed_count_e6"] == wc
        assert r["decay_mean_e4"] == math.floor(ws / (wc / 1_000_000))


def test_conversion_lag_deciles_match_bruteforce(spark, sf_dir):
    ev = load(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type"
    ).collect()
    firsts: dict[int, dict] = {}
    for r in ev:
        u = firsts.setdefault(r["user_id"], {})
        if r["event_type"] in ("signup", "purchase"):
            k = r["event_type"]
            if k not in u or r["ts"] < u[k]:
                u[k] = r["ts"]
    lags = []
    for u in firsts.values():
        if "signup" in u and "purchase" in u and u["purchase"] > u["signup"]:
            delta = u["purchase"] - u["signup"]
            us = (delta.days * 86_400 + delta.seconds) * 1_000_000 + delta.microseconds
            lags.append(us // 3_600_000_000)
    lags.sort()
    n = len(lags)
    got = {r["decile"]: r for r in Q["events_conversion_lag"](spark, sf_dir).collect()}
    assert set(got) == set(range(1, 11))
    import bisect

    from collections import Counter

    atoms = sorted(Counter(lags).items())
    for dec in range(1, 11):
        cum = 0
        want = None
        for v, c in atoms:
            cum += c
            if cum * 10 >= dec * n:
                want = v
                break
        r = got[dec]
        assert r["lag_h"] == want
        assert r["n_converters"] == n
    # deciles are monotone
    vals = [got[d]["lag_h"] for d in range(1, 11)]
    assert vals == sorted(vals)


def test_format_masks_match_bruteforce(spark, sf_dir):
    import re

    rows = load(spark, sf_dir, "customer").select("c_name").collect()
    from collections import Counter

    want = Counter(
        re.sub(
            "[a-z]", "a", re.sub("[A-Z]", "A", re.sub("[0-9]", "9", r["c_name"]))
        )
        for r in rows
    )
    got = {r["mask"]: r["n_rows"] for r in Q["profile_format_masks"](spark, sf_dir).collect()}
    assert got == dict(want)
    assert sum(got.values()) == len(rows)


def test_max_drawdown_matches_bruteforce(spark, sf_dir):
    ev = load(spark, sf_dir, "events").select(
        "event_id", "event_type", "ts", "value"
    ).collect()
    series: dict[str, list] = {}
    for r in sorted(ev, key=lambda r: (r["ts"], r["event_id"])):
        amt = math.floor(r["value"] * 100)
        if r["event_id"] % 3 == 0:
            amt = -amt
        series.setdefault(r["event_type"], []).append(amt)
    got = {r["event_type"]: r for r in Q["ts_max_drawdown"](spark, sf_dir).collect()}
    assert set(got) == set(series)
    for et, amts in series.items():
        c = peak = 0
        max_peak = max_dd = max_pct = 0
        first = True
        for a in amts:
            c = a if first else c + a
            peak = c if first else max(peak, c)
            first = False
            max_peak = max(max_peak, peak)
            max_dd = max(max_dd, peak - c)
            if peak > 0:
                max_pct = max(max_pct, math.floor((peak - c) * 10000 / peak))
        r = got[et]
        assert r["max_peak_e2"] == max_peak
        assert r["max_drawdown_e2"] == max_dd
        assert r["max_drawdown_pct_e4"] == max_pct
        assert r["max_drawdown_e2"] >= 0


def test_new_vs_returning_matches_bruteforce(spark, sf_dir):
    ev = load(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("date").alias("d")
    ).collect()
    first: dict[int, object] = {}
    for r in ev:
        if r["user_id"] not in first or r["d"] < first[r["user_id"]]:
            first[r["user_id"]] = r["d"]
    days: dict = {}
    for r in ev:
        g = days.setdefault(r["d"], [set(), set(), 0])
        if r["d"] == first[r["user_id"]]:
            g[0].add(r["user_id"])
        else:
            g[1].add(r["user_id"])
        g[2] += 1
    got = {r["d"]: r for r in Q["events_new_vs_returning"](spark, sf_dir).collect()}
    assert set(got) == set(days)
    total_new = 0
    for d, (new_u, ret_u, n_ev) in days.items():
        r = got[d]
        assert (r["new_users"], r["returning_users"], r["n_events"]) == (
            len(new_u),
            len(ret_u),
            n_ev,
        )
        total_new += len(new_u)
    # every user is new exactly once
    assert total_new == len(first)


def test_entity_extract_matches_bruteforce(spark, sf_dir):
    import re

    docs = load(spark, sf_dir, "documents").select("doc_id", "text").collect()
    want = []
    for d in docs:
        body = d["text"]
        if d["doc_id"] % 5 == 0:
            body += f" due 2024-0{d['doc_id'] % 9 + 1}-15"
        if d["doc_id"] % 4 == 0:
            body += f" amount ${d['doc_id'] % 900 + 100}.50"
        if d["doc_id"] % 7 == 0:
            body += f" ref INV-{d['doc_id'] * 13 % 10000}"
        for m in re.findall(r"[0-9]{4}-[0-9]{2}-[0-9]{2}", body):
            want.append((d["doc_id"], "date", m))
        for m in re.findall(r"\$[0-9]+\.[0-9]{2}", body):
            want.append((d["doc_id"], "amount", m))
        for m in re.findall(r"INV-[0-9]+", body):
            want.append((d["doc_id"], "reference", m))
    got = [
        (r["doc_id"], r["entity_type"], r["value"])
        for r in Q["text_entity_extract"](spark, sf_dir).collect()
    ]
    assert sorted(got) == sorted(want)
    assert {"date", "amount", "reference"} <= {t for _, t, _ in got}


def test_weighted_moving_avg_matches_bruteforce(spark, sf_dir):
    ev = load(spark, sf_dir, "events").select(
        "event_id", "event_type", "ts", "value"
    ).collect()
    series: dict[str, list] = {}
    for r in sorted(ev, key=lambda r: (r["ts"], r["event_id"])):
        series.setdefault(r["event_type"], []).append(
            (r["event_id"], math.floor(r["value"] * 10000))
        )
    want = {}
    weights = [5, 4, 3, 2, 1]
    for et, items in series.items():
        vals = [v for _, v in items]
        for i, (eid, _) in enumerate(items):
            num = den = 0
            for k, wgt in enumerate(weights):
                if i - k < 0:
                    break
                num += wgt * vals[i - k]
                den += wgt
            want[eid] = math.floor(num / den)
    got = Q["win_weighted_moving_avg"](spark, sf_dir).collect()
    assert len(got) == len(want)
    for r in got:
        assert r["wma_e4"] == want[r["event_id"]]


def test_runs_test_matches_bruteforce(spark, sf_dir):
    ev = load(spark, sf_dir, "events").select(
        "event_id", "event_type", "ts", "value"
    ).collect()
    series: dict[str, list] = {}
    for r in sorted(ev, key=lambda r: (r["ts"], r["event_id"])):
        series.setdefault(r["event_type"], []).append(
            math.floor(r["value"] * 10000)
        )
    got = {r["event_type"]: r for r in Q["agg_runs_test"](spark, sf_dir).collect()}
    assert set(got) == set(series)
    for et, vals in series.items():
        svals = sorted(vals)
        n = len(svals)
        # discrete median: smallest atom with cum*2 >= n
        cum = 0
        med = None
        from collections import Counter

        for v, c in sorted(Counter(svals).items()):
            cum += c
            if cum * 2 >= n:
                med = v
                break
        seq = [1 if v > med else 0 for v in vals if v != med]
        n1 = sum(seq)
        n2 = len(seq) - n1
        runs = 1 + sum(1 for a, b in zip(seq, seq[1:]) if a != b)
        r = got[et]
        assert (r["n1"], r["n2"], r["r"]) == (n1, n2, runs)
        mu = 1 + 2 * n1 * n2 / (n1 + n2)
        var = (
            2 * n1 * n2 * (2 * n1 * n2 - n1 - n2)
            / ((n1 + n2) ** 2 * (n1 + n2 - 1))
        )
        assert r["z_e4"] == math.floor((runs - mu) / math.sqrt(var) * 10000)
        # a random series must not be wildly non-random
        assert abs(r["z_e4"]) < 50_000


def test_odds_ratio_matches_bruteforce(spark, sf_dir):
    rows = (
        load(spark, sf_dir, "events")
        .select((F.dayofweek("ts") - 1).alias("dow"), "event_type")
        .collect()
    )
    a = b = c = d = 0
    for r in rows:
        wend = r["dow"] in (0, 6)
        purch = r["event_type"] == "purchase"
        if wend and purch:
            a += 1
        elif wend:
            b += 1
        elif purch:
            c += 1
        else:
            d += 1
    got = Q["agg_odds_ratio"](spark, sf_dir).collect()[0]
    assert (got["a"], got["b"], got["c"], got["d"]) == (a, b, c, d)
    orr = a * d / (b * c)
    se = math.sqrt(1 / a + 1 / b + 1 / c + 1 / d)
    assert got["odds_ratio_e4"] == math.floor(orr * 10000)
    assert got["log_se_e4"] == math.floor(se * 10000)
    assert got["ci_lo_ln_e4"] == math.floor((math.log(orr) - 1.96 * se) * 10000)
    assert got["ci_hi_ln_e4"] == math.floor((math.log(orr) + 1.96 * se) * 10000)
    assert got["ci_lo_ln_e4"] < got["ci_hi_ln_e4"]


def test_js_divergence_matches_bruteforce_and_bounds(spark, sf_dir):
    toks_p: dict[str, int] = {}
    toks_q: dict[str, int] = {}
    for r in (
        load(spark, sf_dir, "documents")
        .filter(F.col("source").isin("src7", "src13"))
        .select("source", "text")
        .collect()
    ):
        target = toks_p if r["source"] == "src7" else toks_q
        for t in r["text"].split(" "):
            target[t] = target.get(t, 0) + 1
    vocab = set(toks_p) | set(toks_q)
    v = len(vocab)
    np_, nq = sum(toks_p.values()), sum(toks_q.values())
    want = {}
    for t in vocab:
        p = (toks_p.get(t, 0) + 1) / (np_ + v)
        q = (toks_q.get(t, 0) + 1) / (nq + v)
        m = (p + q) / 2
        want[t] = math.floor(
            (0.5 * p * math.log(p / m) + 0.5 * q * math.log(q / m))
            * 1_000_000_000
        )
    got = Q["text_js_divergence"](spark, sf_dir).collect()
    assert len(got) == v
    total = sum(want.values())
    for r in got:
        assert r["term_e9"] == want[r["token"]]
        assert r["js_sum_e9"] == total
    # JS is bounded by ln 2 (and non-negative up to flooring)
    assert -v <= total <= math.log(2) * 1_000_000_000


def test_hampel_filter_matches_bruteforce(spark, sf_dir):
    ev = (
        load(spark, sf_dir, "events")
        .select("event_id", "event_type", "ts", "value")
        .collect()
    )
    series: dict[str, list] = {}
    for r in sorted(ev, key=lambda r: (r["ts"], r["event_id"])):
        series.setdefault(r["event_type"], []).append(
            (r["event_id"], math.floor(r["value"] * 10000))
        )
    got = {r["event_id"]: r for r in Q["win_hampel_filter"](spark, sf_dir).collect()}
    assert len(got) == len(ev)

    def med2(sorted_vals):
        k = len(sorted_vals)
        return sorted_vals[(k + 1) // 2 - 1] + sorted_vals[k - (k - 1) // 2 - 1]

    for et, items in series.items():
        vals = [v for _, v in items]
        for i, (eid, v) in enumerate(items):
            frame = sorted(vals[max(0, i - 10) : i + 1])
            m2 = med2(frame)
            devs = sorted(abs(2 * x - m2) for x in frame)
            m4 = med2(devs)
            r = got[eid]
            assert r["med2_e4"] == m2
            assert r["mad4_e4"] == m4
            assert r["is_spike"] == (20000 * abs(2 * v - m2) > 44478 * m4)


def test_reconciliation_matches_bruteforce(spark, sf_dir):
    from decimal import Decimal, ROUND_HALF_UP

    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", F.col("o_orderdate").cast("date").alias("d")
    ).collect()
    cents = {
        r["o_orderkey"]: int(
            Decimal(repr(r["o_totalprice"] * 100)).quantize(0, ROUND_HALF_UP)
        )
        for r in orders
    }
    import datetime

    pays = []
    for r in orders:
        k = r["o_orderkey"]
        if k % 3 == 0:
            continue
        pays.append(
            (
                k + 5_000_000,
                cents[k] + (k % 21) - 10,
                r["d"] + datetime.timedelta(days=k % 4),
            )
        )
    want = {}
    for r in orders:
        k, oc, od = r["o_orderkey"], cents[r["o_orderkey"]], r["d"]
        cands = [
            (abs(pc - oc), (pd - od).days, pid)
            for pid, pc, pd in pays
            if oc - 10 <= pc <= oc + 10 and od <= pd <= od + datetime.timedelta(days=3)
        ]
        if cands:
            diff, lag, pid = min(cands)
            want[k] = (pid, diff, lag)
    got = {r["o_orderkey"]: r for r in Q["join_reconciliation"](spark, sf_dir).collect()}
    assert set(got) == set(want)
    for k, (pid, diff, lag) in want.items():
        r = got[k]
        assert (r["pay_id"], r["diff_cents"], r["lag_days"]) == (pid, diff, lag)
    # each order matched at most one payment; its own payment (same
    # key) should usually win when present
    own = sum(1 for k, (pid, _, _) in want.items() if pid == k + 5_000_000)
    assert own / len(want) > 0.9


def test_capture_recapture_matches_bruteforce(spark, sf_dir):
    import datetime

    ev = load(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("date").alias("d")
    ).collect()
    d0 = min(r["d"] for r in ev)
    w1 = {r["user_id"] for r in ev if (r["d"] - d0).days < 7}
    w2 = {r["user_id"] for r in ev if 7 <= (r["d"] - d0).days < 14}
    m = len(w1 & w2)
    got = Q["agg_capture_recapture"](spark, sf_dir).collect()[0]
    assert (got["n1"], got["n2"], got["m"]) == (len(w1), len(w2), m)
    want = math.floor((len(w1) + 1) * (len(w2) + 1) / (m + 1) - 1)
    assert got["n_hat"] == want
    # the estimate covers at least the directly observed population
    assert got["n_hat"] >= len(w1 | w2) - 1


def test_neyman_allocation_matches_bruteforce(spark, sf_dir):
    import hashlib
    from decimal import Decimal, ROUND_HALF_UP

    rows = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    ).collect()
    strata: dict[str, list] = {}
    for r in rows:
        c = int(Decimal(repr(r["c_acctbal"] * 100)).quantize(0, ROUND_HALF_UP))
        strata.setdefault(r["c_mktsegment"], []).append((r["c_custkey"], c))
    ws = {}
    for seg, items in strata.items():
        n = len(items)
        s = sum(c for _, c in items)
        ss = sum(c * c for _, c in items)
        sd = math.sqrt((ss - s * s / n) / (n - 1))
        ws[seg] = n * sd
    wtot = sum(ws.values())
    got = {r["c_mktsegment"]: r for r in Q["sample_neyman_allocation"](spark, sf_dir).collect()}
    assert set(got) == set(strata)
    total_alloc = 0
    for seg, items in strata.items():
        n = len(items)
        alloc = math.floor(ws[seg] * 500 / wtot)
        sampled = sum(
            1
            for k, _ in items
            if int(hashlib.md5(f"neyman_{k}".encode()).hexdigest()[:7], 16)
            % 1_000_000
            < alloc / n * 1_000_000
        )
        r = got[seg]
        assert (r["n_h"], r["n_alloc"], r["n_sampled"]) == (n, alloc, sampled)
        total_alloc += alloc
    assert 500 - len(strata) <= total_alloc <= 500  # floors round down


def test_control_chart_matches_bruteforce(spark, sf_dir):
    ev = load(spark, sf_dir, "events").select(
        "event_id", "event_type", "ts", "value"
    ).collect()
    series: dict[str, list] = {}
    for r in sorted(ev, key=lambda r: (r["ts"], r["event_id"])):
        series.setdefault(r["event_type"], []).append(
            (r["event_id"], math.floor(r["value"] * 10000))
        )
    got = {r["event_id"]: r for r in Q["ts_control_chart_imr"](spark, sf_dir).collect()}
    assert len(got) == len(ev)
    for et, items in series.items():
        vals = [v for _, v in items]
        n = len(vals)
        center = sum(vals) / n
        mrs = [abs(a - b) for a, b in zip(vals[1:], vals)]
        spread = 2.66 * sum(mrs) / len(mrs)
        for eid, v in items:
            r = got[eid]
            assert r["center_e4"] == math.floor(center)
            assert r["ucl_e4"] == math.floor(center + spread)
            assert r["lcl_e4"] == math.floor(center - spread)
            assert r["out_of_control"] == (
                v > center + spread or v < center - spread
            )


def test_behavior_entropy_rate_matches_bruteforce(spark, sf_dir):
    ev = load(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type"
    ).collect()
    by_user: dict[int, list] = {}
    for r in sorted(ev, key=lambda r: (r["ts"], r["event_id"])):
        by_user.setdefault(r["user_id"], []).append(r["event_type"])
    trans: dict[tuple, int] = {}
    for seq in by_user.values():
        for a, b in zip(seq, seq[1:]):
            trans[(a, b)] = trans.get((a, b), 0) + 1
    n = sum(trans.values())
    row: dict[str, int] = {}
    for (a, _), c in trans.items():
        row[a] = row.get(a, 0) + c
    want = {
        (a, b): math.floor(
            -(row[a] / n) * (c / row[a]) * math.log(c / row[a]) * 1_000_000_000
        )
        for (a, b), c in trans.items()
    }
    got = Q["events_behavior_entropy_rate"](spark, sf_dir).collect()
    assert len(got) == len(trans)
    total = sum(want.values())
    n_types = len({a for a, _ in trans} | {b for _, b in trans})
    for r in got:
        key = (r["from_type"], r["to_type"])
        assert r["n_ab"] == trans[key]
        assert r["term_e9"] == want[key]
        assert r["entropy_rate_e9"] == total
    # bounded by ln(number of states)
    assert 0 < total <= math.log(n_types) * 1_000_000_000


def test_totals_reconcile_matches_bruteforce(spark, sf_dir):
    from decimal import Decimal, ROUND_HALF_UP

    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount", "l_tax"
    ).collect()
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    ).collect()
    sums: dict[int, list] = {}
    for r in li:
        g = sums.setdefault(r["l_orderkey"], [0, 0])
        g[0] += math.floor(
            r["l_extendedprice"] * (1 - r["l_discount"]) * (1 + r["l_tax"]) * 100
        )
        g[1] += 1
    classes: dict[str, list] = {}
    for r in orders:
        header = int(
            Decimal(repr(r["o_totalprice"] * 100)).quantize(0, ROUND_HALF_UP)
        )
        comp, n = sums.get(r["o_orderkey"], [0, 0])
        diff = abs(header - comp)
        if n == 0:
            st = "orphan_header"
        elif diff <= n:
            st = "reconciled"
        else:
            st = "mismatch"
        c = classes.setdefault(st, [0, 0, 0])
        c[0] += 1
        c[1] += diff
        c[2] = max(c[2], diff)
    got = {r["status"]: r for r in Q["audit_totals_reconcile"](spark, sf_dir).collect()}
    assert set(got) == set(classes)
    for st, (n, s, w) in classes.items():
        r = got[st]
        assert (r["n_orders"], r["abs_diff_cents"], r["worst_diff_cents"]) == (
            n,
            s,
            w,
        )
    assert sum(r["n_orders"] for r in got.values()) == len(orders)


def test_seasonality_strength_matches_bruteforce(spark, sf_dir):
    rows = (
        load(spark, sf_dir, "events")
        .select(
            (F.dayofweek("ts") - 1).alias("dow"),
            F.hour("ts").alias("hod"),
            "value",
        )
        .collect()
    )
    sums: dict[tuple, list] = {}
    for r in rows:
        k = (r["dow"], r["hod"])
        g = sums.setdefault(k, [0, 0])
        g[0] += math.floor(r["value"] * 10000)
        g[1] += 1
    vs, rs = [], []
    for r in rows:
        v = math.floor(r["value"] * 10000)
        s, n = sums[(r["dow"], r["hod"])]
        vs.append(v)
        rs.append(math.floor(v - s / n))
    n = len(vs)
    var = lambda xs: sum(x * x for x in xs) - sum(xs) ** 2 / n  # noqa: E731
    strength = max(0.0, 1.0 - var(rs) / var(vs))
    got = Q["ts_seasonality_strength"](spark, sf_dir).collect()[0]
    assert got["n"] == n
    assert got["strength_e6"] == math.floor(strength * 1_000_000)
    assert 0 <= got["strength_e6"] <= 1_000_000


def test_heaps_law_matches_bruteforce(spark, sf_dir):
    docs = sorted(
        load(spark, sf_dir, "documents")
        .filter(F.col("text") != "")
        .select("doc_id", "text")
        .collect(),
        key=lambda r: r["doc_id"],
    )
    seen: set = set()
    cum_toks = cum_vocab = 0
    curve = []
    for r in docs:
        toks = r["text"].split(" ")
        cum_toks += len(toks)
        new = {t for t in toks if t not in seen}
        cum_vocab += len(new)
        seen |= new
        curve.append((cum_toks, cum_vocab))
    step = max(len(docs) // 20, 1)
    pts = [
        (
            math.floor(math.log(ct) * 1000),
            math.floor(math.log(cv) * 1000),
        )
        for i, (ct, cv) in enumerate(curve, 1)
        if i % step == 0
    ]
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts)
    beta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    got = Q["text_heaps_law"](spark, sf_dir).collect()[0]
    assert got["n_checkpoints"] == n
    assert got["beta_e6"] == math.floor(beta * 1_000_000)
    # vocabulary grows sublinearly on a repeating corpus; this
    # fixture's tiny vocab (~31 words) saturates almost immediately,
    # so the exponent legitimately sits at ~0 — the 'template flood'
    # reading the operator exists to flag
    assert 0 <= got["beta_e6"] < 1_000_000
    assert curve[-1][1] == len(seen)


def test_funnel_windowed_matches_bruteforce(spark, sf_dir):
    import datetime

    ev = load(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type"
    ).collect()
    signup: dict[int, object] = {}
    for r in ev:
        if r["event_type"] == "signup":
            if r["user_id"] not in signup or r["ts"] < signup[r["user_id"]]:
                signup[r["user_id"]] = r["ts"]
    day = datetime.timedelta(hours=24)
    converted = set()
    for r in ev:
        if (
            r["event_type"] == "purchase"
            and r["user_id"] in signup
            and signup[r["user_id"]] < r["ts"] <= signup[r["user_id"]] + day
        ):
            converted.add(r["user_id"])
    got = Q["events_funnel_windowed"](spark, sf_dir).collect()[0]
    assert got["n_signups"] == len(signup)
    assert got["n_converted_24h"] == len(converted)
    assert got["conv_rate_e4"] == math.floor(
        len(converted) / len(signup) * 10000
    )
    # windowed conversion can never exceed the unbounded funnel's reach
    unbounded = {
        r["user_id"]
        for r in Q["events_funnel"](spark, sf_dir).collect()
        if r["purchases_after"] > 0
    }
    assert converted <= unbounded


def test_rolling_corr_matches_bruteforce(spark, sf_dir):
    ev = load(spark, sf_dir, "events").select("ts", "event_type").collect()
    hourly: dict = {}
    for r in ev:
        h = r["ts"].replace(minute=0, second=0, microsecond=0)
        g = hourly.setdefault(h, [0, 0])
        if r["event_type"] == "click":
            g[0] += 1
        elif r["event_type"] == "purchase":
            g[1] += 1
    hs = sorted(hourly)
    got = {r["h"]: r for r in Q["ts_rolling_corr"](spark, sf_dir).collect()}
    assert set(got) == set(hs)
    for i, h in enumerate(hs):
        frame = [hourly[x] for x in hs[max(0, i - 23) : i + 1]]
        n = len(frame)
        sx = sum(x for x, _ in frame)
        sy = sum(y for _, y in frame)
        sxy = sum(x * y for x, y in frame)
        sxx = sum(x * x for x, _ in frame)
        syy = sum(y * y for _, y in frame)
        varx = n * sxx - sx * sx
        vary = n * syy - sy * sy
        r = got[h]
        assert r["n"] == n
        if n >= 12 and varx > 0 and vary > 0:
            want = math.floor(
                (n * sxy - sx * sy) / math.sqrt(varx * vary) * 1_000_000
            )
            assert r["corr_e6"] == want
            assert -1_000_000 <= r["corr_e6"] <= 1_000_000
        else:
            assert r["corr_e6"] is None


def test_audience_overlap_matches_bruteforce(spark, sf_dir):
    ev = load(spark, sf_dir, "events").select("event_type", "user_id").collect()
    aud: dict[str, set] = {}
    for r in ev:
        aud.setdefault(r["event_type"], set()).add(r["user_id"])
    types = sorted(aud)
    got = {
        (r["type_a"], r["type_b"]): r
        for r in Q["events_audience_overlap"](spark, sf_dir).collect()
    }
    for i, a in enumerate(types):
        for b in types[i + 1 :]:
            common = len(aud[a] & aud[b])
            if common == 0:
                assert (a, b) not in got
                continue
            r = got[(a, b)]
            assert r["n_common"] == common
            assert (r["n_a"], r["n_b"]) == (len(aud[a]), len(aud[b]))
            union = len(aud[a] | aud[b])
            assert r["jaccard_e4"] == math.floor(common * 10000 / union)
            assert r["containment_e4"] == math.floor(
                common * 10000 / min(len(aud[a]), len(aud[b]))
            )
            assert r["jaccard_e4"] <= r["containment_e4"]


def test_simpson_diversity_matches_bruteforce(spark, sf_dir):
    ev = load(spark, sf_dir, "events").select("user_id", "event_type").collect()
    per_user: dict[int, dict] = {}
    for r in ev:
        per_user.setdefault(r["user_id"], {}).setdefault(r["event_type"], 0)
        per_user[r["user_id"]][r["event_type"]] += 1
    got = {r["user_id"]: r for r in Q["agg_simpson_diversity"](spark, sf_dir).collect()}
    assert set(got) == set(per_user)
    for uid, counts in per_user.items():
        n = sum(counts.values())
        ssq = sum(c * c for c in counts.values())
        want = math.floor((1.0 - ssq / (n * n)) * 1_000_000)
        r = got[uid]
        assert (r["n_events"], r["n_types"]) == (n, len(counts))
        assert r["simpson_e6"] == want
        assert 0 <= r["simpson_e6"] < 1_000_000


def test_local_peaks_match_bruteforce(spark, sf_dir):
    ev = load(spark, sf_dir, "events").select(
        "event_id", "event_type", "ts", "value"
    ).collect()
    series: dict[str, list] = {}
    for r in sorted(ev, key=lambda r: (r["ts"], r["event_id"])):
        series.setdefault(r["event_type"], []).append(
            (r["event_id"], math.floor(r["value"] * 10000))
        )
    want = {}
    for et, items in series.items():
        for i in range(1, len(items) - 1):
            eid, v = items[i]
            pv, nv = items[i - 1][1], items[i + 1][1]
            prom = v - max(pv, nv)
            if v > pv and v > nv and prom >= 500_000:
                want[eid] = (v, prom)
    got = {r["event_id"]: r for r in Q["ts_local_peaks"](spark, sf_dir).collect()}
    assert set(got) == set(want)
    for eid, (v, prom) in want.items():
        assert (got[eid]["v_e4"], got[eid]["prominence_e4"]) == (v, prom)
    assert want, "prominence floor should still leave real peaks"
