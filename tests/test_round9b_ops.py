"""Round-9 continuation batch: brute-force Python referees for the
new statistical operators. Each test recomputes the statistic from
the raw fixture with plain Python/numpy (no SQL on either engine) and
asserts the registered query reproduces it at the floored precision —
independent of the DuckDB oracle, which the driver exercises
separately."""

import math

import numpy as np
import pyarrow.parquet as pq

from graphsense_datafeed_spark.registry import QUERIES


def _events(sf_dir):
    return pq.read_table(f"{sf_dir}/events.parquet").to_pandas()


def test_kruskal_wallis_referee(spark, sf_dir):
    ev = _events(sf_dir)
    v = np.floor(ev["value"].to_numpy() * 10000).astype(np.int64)
    g = ev["event_type"].to_numpy()
    order = np.argsort(v, kind="stable")
    sv = v[order]
    # average ranks with ties
    ranks = np.empty(len(sv), dtype=np.float64)
    i = 0
    t3t = 0
    while i < len(sv):
        j = i
        while j < len(sv) and sv[j] == sv[i]:
            j += 1
        ranks[i:j] = (i + 1 + j) / 2.0
        t = j - i
        t3t += t * t * t - t
        i = j
    r = np.empty(len(v), dtype=np.float64)
    r[order] = ranks
    n = len(v)
    srr = sum(
        r[g == grp].sum() ** 2 / (g == grp).sum() for grp in np.unique(g)
    )
    h = 12.0 / (n * (n + 1)) * srr - 3.0 * (n + 1)
    h_corr = h / (1.0 - t3t / (n**3 - n))
    row = QUERIES["agg_kruskal_wallis"](spark, sf_dir).collect()[0]
    assert row["n"] == n
    assert row["h_e6"] == math.floor(h * 1000000)
    assert row["h_corr_e6"] == math.floor(h_corr * 1000000)


def test_levene_brown_forsythe_referee(spark, sf_dir):
    ev = _events(sf_dir)
    v = np.floor(ev["value"].to_numpy() * 10000).astype(np.int64)
    g = ev["event_type"].to_numpy()
    groups = np.unique(g)
    zs = []
    for grp in groups:
        x = np.sort(v[g == grp])
        # percentile_disc(0.5): smallest element whose cumulative
        # share reaches 0.5
        med = x[math.ceil(0.5 * len(x)) - 1]
        zs.append(np.abs(v[g == grp] - med).astype(np.float64))
    n = sum(len(z) for z in zs)
    k = len(zs)
    s = sum(z.sum() for z in zs)
    ss = sum((z * z).sum() for z in zs)
    ssn = sum(z.sum() ** 2 / len(z) for z in zs)
    w = ((ssn - s * s / n) / (k - 1)) / ((ss - ssn) / (n - k))
    row = QUERIES["agg_levene_brown_forsythe"](spark, sf_dir).collect()[0]
    assert row["k"] == k and row["n"] == n
    assert row["w_e6"] == math.floor(w * 1000000)


def test_kendall_tau_referee(spark, sf_dir):
    cust = pq.read_table(f"{sf_dir}/customer.parquet").to_pandas()
    orders = pq.read_table(f"{sf_dir}/orders.parquet").to_pandas()
    cust = cust[cust["c_custkey"] <= 500]
    spend = (
        orders[orders["o_custkey"] <= 500]
        .assign(cents=lambda d: np.round(d["o_totalprice"] * 100).astype(np.int64))
        .groupby("o_custkey")["cents"]
        .sum()
    )
    x = np.round(cust["c_acctbal"].to_numpy() * 100).astype(np.int64)
    y = cust["c_custkey"].map(spend).fillna(0).astype(np.int64).to_numpy()
    n = len(x)
    conc = disc = tx = ty = 0
    for i in range(n):
        dx = x[i] - x[i + 1 :]
        dy = y[i] - y[i + 1 :]
        p = dx * dy
        conc += int((p > 0).sum())
        disc += int((p < 0).sum())
        tx += int(((dx == 0) & (dy != 0)).sum())
        ty += int(((dy == 0) & (dx != 0)).sum())
    n0 = n * (n - 1) // 2
    tau = (conc - disc) / math.sqrt((n0 - tx) * (n0 - ty))
    row = QUERIES["agg_kendall_tau"](spark, sf_dir).collect()[0]
    assert row["n0"] == n0
    assert row["conc"] == conc and row["disc"] == disc
    assert row["tau_b_e6"] == math.floor(tau * 1000000)
    assert -1000000 <= row["tau_b_e6"] <= 1000000


def test_mann_kendall_referee(spark, sf_dir):
    ev = _events(sf_dir)
    ev["d"] = ev["ts"].dt.date
    rows = {
        r["event_type"]: r
        for r in QUERIES["agg_mann_kendall_trend"](spark, sf_dir).collect()
    }
    for grp, sub in ev.groupby("event_type"):
        daily = sub.groupby("d").size().sort_index()
        xs = daily.to_numpy()
        n = len(xs)
        s = 0
        for i in range(n):
            s += int(np.sign(xs[i + 1 :] - xs[i]).sum())
        _, t_counts = np.unique(xs, return_counts=True)
        t3t = int(sum(t * (t - 1) * (2 * t + 5) for t in t_counts))
        sigma = math.sqrt((n * (n - 1) * (2 * n + 5) - t3t) / 18.0)
        num = (s - 1.0) if s > 0 else (s + 1.0) if s < 0 else 0.0
        r = rows[grp]
        assert r["n"] == n and r["s"] == s
        assert r["z_e6"] == math.floor(num / sigma * 1000000)


def test_power_sample_size_referee(spark, sf_dir):
    ev = _events(sf_dir)
    n_events = len(ev)
    p1 = (ev["event_type"] == "purchase").sum() / n_events
    p2 = p1 * 1.1
    za, zb = 1.959963984540054, 0.8416212335729143
    n = math.ceil(
        (za + zb) ** 2 * (p1 * (1 - p1) + p2 * (1 - p2)) / (p2 - p1) ** 2
    )
    row = QUERIES["events_power_sample_size"](spark, sf_dir).collect()[0]
    assert row["n_events"] == n_events
    assert row["p1_e6"] == math.floor(p1 * 1000000)
    assert row["n_per_arm"] == n
    # sanity: detecting a 10% relative lift on a rare baseline needs
    # many users per arm
    assert row["n_per_arm"] > 100


def test_fleiss_kappa_referee(spark, sf_dir):
    docs = pq.read_table(f"{sf_dir}/documents.parquet").to_pandas()
    import hashlib

    def cat(x, lo=200, hi=500):
        return 0 if x < lo else (1 if x < hi else 2)

    counts = []
    for _, row in docs.iterrows():
        ra = cat(row["n_chars"])
        rb = cat(len(row["text"].split(" ")), 40, 100)
        j = int(hashlib.md5(str(row["doc_id"]).encode()).hexdigest()[:2], 16) - 128
        rc = cat(row["n_chars"] + j)
        c = [0, 0, 0]
        for r in (ra, rb, rc):
            c[r] += 1
        counts.append(c)
    counts = np.array(counts)
    n_docs = len(counts)
    spair = int((counts * counts).sum() - 3 * n_docs)
    m = counts.sum(axis=0)
    p_bar = spair / (n_docs * 6.0)
    p_e = float((m.astype(float) ** 2).sum()) / (n_docs * 3.0) ** 2
    kappa = (p_bar - p_e) / (1.0 - p_e)
    row = QUERIES["text_rater_agreement_fleiss"](spark, sf_dir).collect()[0]
    assert row["n_docs"] == n_docs
    assert row["p_bar_e6"] == math.floor(p_bar * 1000000)
    assert row["p_e_e6"] == math.floor(p_e * 1000000)
    assert row["kappa_e6"] == math.floor(kappa * 1000000)
    assert -1000000 <= row["kappa_e6"] <= 1000000


def test_page_hinkley_referee(spark, sf_dir):
    ev = _events(sf_dir)
    ev["d"] = ev["ts"].dt.date
    rows = QUERIES["ts_page_hinkley"](spark, sf_dir).collect()
    got = {(r["event_type"], r["d"]): r for r in rows}
    for grp, sub in ev.groupby("event_type"):
        daily = sub.groupby("d").size().sort_index()
        s = 0
        m = 0
        mmin = 0
        for i, (day, x) in enumerate(daily.items(), start=1):
            s += x
            m += math.floor((x - s / i - 2.0) * 1000000)
            mmin = min(mmin, m) if i > 1 else m
            ph = m - mmin
            r = got[(grp, day)]
            assert r["x"] == x
            assert r["ph_e6"] == ph and ph >= 0
            assert r["alarm"] == (1 if ph > 20000000 else 0)


def test_variance_ratio_referee(spark, sf_dir):
    ev = _events(sf_dir)
    ev["d"] = ev["ts"].dt.date
    daily = ev.groupby("d").size().sort_index().to_numpy()
    dx = np.diff(daily).astype(np.int64)
    n = len(dx)
    s = int(dx.sum())
    y = np.convolve(dx, np.ones(5, dtype=np.int64), mode="valid")
    a = int(((n * y - 5 * s) ** 2).sum())
    b = int(((n * dx - s) ** 2).sum())
    vr = a * (n - 1) * n / (b * 5.0 * (n - 4) * (n - 5))
    row = QUERIES["ts_variance_ratio"](spark, sf_dir).collect()[0]
    assert row["n"] == n and row["q"] == 5
    assert row["vr_e6"] == math.floor(vr * 1000000)
    assert row["vr_e6"] > 0


def test_hodges_lehmann_referee(spark, sf_dir):
    ev = _events(sf_dir)
    ev["d"] = ev["ts"].dt.date
    rows = {
        r["event_type"]: r
        for r in QUERIES["agg_hodges_lehmann"](spark, sf_dir).collect()
    }
    for grp, sub in ev.groupby("event_type"):
        xs = sub.groupby("d").size().sort_index().to_numpy()
        walsh = sorted(
            int(xs[i] + xs[j])
            for i in range(len(xs))
            for j in range(i, len(xs))
        )
        med = walsh[math.ceil(0.5 * len(walsh)) - 1]
        r = rows[grp]
        assert r["n_days"] == len(xs)
        assert r["n_walsh"] == len(walsh)
        assert r["hl_x2"] == med
        # HL lies within the data range (doubled units)
        assert 2 * xs.min() <= med <= 2 * xs.max()


def test_permutation_test_referee(spark, sf_dir):
    import hashlib

    ev = _events(sf_dir)
    ev = ev[ev["event_type"].isin(["click", "purchase"])]
    v = np.floor(ev["value"].to_numpy() * 10000).astype(np.int64)
    ids = ev["event_id"].to_numpy()
    is_click = (ev["event_type"] == "click").to_numpy()
    d_obs = math.floor(
        abs(v[is_click].mean() - v[~is_click].mean()) * 100.0
    )
    n_ge = 0
    for b in range(1, 201):
        arm = np.array(
            [
                int(hashlib.md5(f"{i}:{b}".encode()).hexdigest()[:4], 16) % 2
                for i in ids
            ]
        )
        d_b = math.floor(abs(v[arm == 0].mean() - v[arm == 1].mean()) * 100.0)
        if d_b >= d_obs:
            n_ge += 1
    row = QUERIES["agg_permutation_test"](spark, sf_dir).collect()[0]
    assert row["n_perm"] == 200
    assert row["d_obs_e6"] == d_obs
    assert row["n_ge"] == n_ge
    assert row["p_e6"] == math.floor((1 + n_ge) / 201.0 * 1000000)
    assert 0 < row["p_e6"] <= 1000000


def test_schema_evolution_merge_referee(spark, sf_dir):
    orders = pq.read_table(f"{sf_dir}/orders.parquet").to_pandas()
    rows = QUERIES["scan_schema_evolution_merge"](spark, sf_dir).collect()
    total_n = sum(r["n_orders"] for r in rows)
    total_cents = sum(r["sum_cents"] for r in rows)
    assert total_n == len(orders)
    assert total_cents == int(
        np.round(orders["o_totalprice"].to_numpy() * 100).astype(np.int64).sum()
    )
    pre = {r["priority"]: r for r in rows}["(pre-evolution)"]
    assert pre["n_orders"] == int((orders["o_orderkey"] % 2 == 0).sum())


def test_mahalanobis_outlier_referee(spark, sf_dir):
    emb = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pandas()
    mat = np.floor(
        np.stack(emb["embedding"].to_numpy()).astype(np.float64) * 1000000
    ).astype(np.int64)
    n = mat.shape[0]
    s = mat.sum(axis=0)
    ss = (mat.astype(object) ** 2).sum(axis=0).astype(np.float64)
    mu = s / n
    var = (ss - s.astype(np.float64) ** 2 / n) / n
    dist = {}
    for i, vid in enumerate(emb["vec_id"]):
        t = 0
        for d_i in range(mat.shape[1]):
            if var[d_i] <= 0:
                continue
            t += math.floor(
                (mat[i, d_i] - mu[d_i]) ** 2 / var[d_i] * 1000000
            )
        dist[int(vid)] = t
    top = sorted(dist.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    rows = QUERIES["embed_outlier_mahalanobis"](spark, sf_dir).collect()
    assert [(r["vec_id"], r["dist2_e6"]) for r in rows] == top
    # a diagonal-Mahalanobis score is >= 0 and the list is sorted
    assert all(r["dist2_e6"] >= 0 for r in rows)


def test_grouped_holdout_leakage_free(spark, sf_dir):
    import hashlib

    ev = _events(sf_dir)
    rows = QUERIES["split_grouped_holdout"](spark, sf_dir).collect()
    per_user = ev.groupby("user_id").size()
    folds = {
        u: int(hashlib.md5(str(u).encode()).hexdigest()[:4], 16) % 5
        for u in per_user.index
    }
    # each user contributes to exactly one fold (leakage-free by
    # construction) and the fold censuses reconcile exactly
    import collections

    want_users = collections.Counter(folds.values())
    want_events = collections.Counter()
    for u, c in per_user.items():
        want_events[folds[u]] += int(c)
    got = {r["fold"]: r for r in rows}
    for f, r in got.items():
        assert r["n_users"] == want_users[f]
        assert r["n_events"] == want_events[f]
    assert sum(r["n_events"] for r in rows) == len(ev)


def test_context_window_fit_referee(spark, sf_dir):
    docs = pq.read_table(f"{sf_dir}/documents.parquet").to_pandas()
    toks = docs["text"].str.split(" ").str.len().to_numpy()
    rows = QUERIES["text_context_window_fit"](spark, sf_dir).collect()
    assert [r["window_tokens"] for r in rows] == [64, 128, 256]
    for r in rows:
        w = r["window_tokens"]
        fit = toks <= w
        assert r["n_fit"] == int(fit.sum())
        assert r["tokens_kept"] == int(np.minimum(toks, w).sum())
        assert r["tokens_truncated"] == int(np.maximum(toks - w, 0).sum())
        # kept + truncated = total tokens, always
        assert r["tokens_kept"] + r["tokens_truncated"] == int(toks.sum())
    # fit share is monotone in the window size
    shares = [r["fit_share_e6"] for r in rows]
    assert shares == sorted(shares)


def test_shrunk_rates_referee(spark, sf_dir):
    ev = _events(sf_dir)
    per = ev.groupby("user_id").agg(
        n_u=("event_type", "size"),
        x_u=("event_type", lambda s: (s == "purchase").sum()),
    )
    N = int(per["n_u"].sum())
    X = int(per["x_u"].sum())
    rows = QUERIES["agg_shrunk_rates_eb"](spark, sf_dir).collect()
    got = {r["user_id"]: r for r in rows}
    glob_e6 = X * 1000000 // N
    for u, r in got.items():
        n_u, x_u = int(per.loc[u, "n_u"]), int(per.loc[u, "x_u"])
        assert r["n_u"] == n_u and r["x_u"] == x_u
        assert r["raw_e6"] == x_u * 1000000 // n_u
        want = (x_u * N + 20 * X) * 1000000 // ((n_u + 20) * N)
        assert r["shrunk_e6"] == want
        # shrinkage always lands between the raw rate and the global
        lo, hi = sorted((r["raw_e6"], glob_e6))
        assert lo - 1 <= r["shrunk_e6"] <= hi + 1
    # leaderboard is sorted by shrunk rate
    sr = [r["shrunk_e6"] for r in rows]
    assert sr == sorted(sr, reverse=True)


def test_hill_tail_index_referee(spark, sf_dir):
    orders = pq.read_table(f"{sf_dir}/orders.parquet").to_pandas()
    cents = np.round(orders["o_totalprice"].to_numpy() * 100).astype(np.int64)
    order = np.lexsort((orders["o_orderkey"].to_numpy(), -cents))
    top = cents[order][:101]
    x_ref = int(top[100])
    s = sum(math.floor(math.log(int(x) / x_ref) * 1e9) for x in top[:100])
    row = QUERIES["agg_hill_tail_index"](spark, sf_dir).collect()[0]
    assert row["k"] == 100
    assert row["x_ref_cents"] == x_ref
    assert row["sum_log_e9"] == s
    assert row["alpha_e6"] == 100 * 10**15 // s
    assert row["alpha_e6"] > 0


def test_quantile_normalize_referee(spark, sf_dir):
    docs = pq.read_table(f"{sf_dir}/documents.parquet").to_pandas()
    rows = QUERIES["text_score_quantile_normalize"](spark, sf_dir).collect()
    assert len(rows) == len(docs)
    pooled = np.sort(docs["n_chars"].to_numpy())
    N = len(pooled)
    got = {r["doc_id"]: r for r in rows}
    for src, sub in docs.groupby("source"):
        sub = sub.sort_values(["n_chars", "doc_id"]).reset_index(drop=True)
        n_s = len(sub)
        for rn0, (_, d) in enumerate(sub.iterrows()):
            p = (int(rn0 + 1) * N + n_s - 1) // n_s
            want = int(pooled[p - 1])
            r = got[d["doc_id"]]
            assert r["norm_chars"] == want
    # post-normalization, every source's distribution is (near-)pooled:
    # per-source max must equal the pooled max
    import collections

    by_src = collections.defaultdict(list)
    for r in rows:
        by_src[r["source"]].append(r["norm_chars"])
    for vals in by_src.values():
        assert max(vals) == int(pooled[-1])


def test_hits_referee(spark, sf_dir):
    li = pq.read_table(f"{sf_dir}/lineitem.parquet").to_pandas()[
        ["l_orderkey", "l_partkey"]
    ]
    orders = pq.read_table(f"{sf_dir}/orders.parquet").to_pandas()[
        ["o_orderkey", "o_custkey"]
    ]
    bip = (
        li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")[
            ["o_custkey", "l_partkey"]
        ]
        .drop_duplicates()
        .to_numpy()
    )
    S = 10**12
    parts = sorted(set(int(p) for _, p in bip))
    a = {p: S // len(parts) for p in parts}
    for _ in range(4):
        hraw = {}
        for c, p in bip:
            hraw[int(c)] = hraw.get(int(c), 0) + a[int(p)]
        t = sum(hraw.values())
        h = {c: math.floor(v * float(S) / t) for c, v in hraw.items()}
        araw = {}
        for c, p in bip:
            araw[int(p)] = araw.get(int(p), 0) + h[int(c)]
        t2 = sum(araw.values())
        a = {p: math.floor(v * float(S) / t2) for p, v in araw.items()}
    top = sorted(a.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    rows = QUERIES["graph_hits_bounded"](spark, sf_dir).collect()
    assert [(r["l_partkey"], r["authority_e12"]) for r in rows] == top


def test_best_window_referee(spark, sf_dir):
    ev = _events(sf_dir)
    ev["d"] = ev["ts"].dt.date
    rows = {
        r["event_type"]: r
        for r in QUERIES["ts_best_window_sum"](spark, sf_dir).collect()
    }
    for grp, sub in ev.groupby("event_type"):
        daily = sub.groupby("d").size().sort_index()
        xs = daily.to_numpy()
        days = list(daily.index)
        best = None
        for i in range(6, len(xs)):
            tot = int(xs[i - 6 : i + 1].sum())
            if best is None or tot > best[0]:
                best = (tot, days[i])
        r = rows[grp]
        assert r["total_7d"] == best[0]
        assert r["window_end"] == best[1]


def test_arrow_udf_referee(spark, sf_dir):
    ev = _events(sf_dir)
    ev = ev[ev["event_id"] < 3000]
    want = {
        int(r["event_id"]): math.floor(r["value"] * r["value"] * 1000)
        for _, r in ev.iterrows()
    }
    rows = QUERIES["udf_arrow_scalar"](spark, sf_dir).collect()
    assert len(rows) == len(want)
    for r in rows:
        assert r["sq_e3"] == want[r["event_id"]]


def test_seq_two_pass_is_exact_global_sequence(spark, sf_dir):
    rows = QUERIES["seq_global_two_pass"](spark, sf_dir).collect()
    ordered = sorted(rows, key=lambda r: (r["l_orderkey"], r["l_linenumber"]))
    # the two-pass assignment equals the dense 0..n-1 sequence in key
    # order — boundary placement of the range partitioner cancels out
    assert [r["seq"] for r in ordered] == list(range(len(rows)))


def test_dp_laplace_counts_referee(spark, sf_dir):
    import hashlib

    ev = _events(sf_dir)
    true = ev.groupby("event_type").size()
    rows = QUERIES["anon_dp_laplace_counts"](spark, sf_dir).collect()
    for r in rows:
        t = int(true[r["event_type"]])
        assert r["true_n"] == t
        u = (
            int(
                hashlib.md5(f"dp:{r['event_type']}".encode()).hexdigest()[:13],
                16,
            )
            + 1.0
        ) / 4503599627370497.0
        c = u - 0.5
        sgn = -1.0 if c < 0 else (1.0 if c > 0 else 0.0)
        noise = -2.0 * sgn * math.log(1.0 - 2.0 * abs(c))
        assert r["released_n"] == math.floor(t + noise)
        # Laplace(2) noise: |released - true| beyond 20 would be a
        # ~1e-4 tail event per cell — a bug, not noise
        assert abs(r["released_n"] - t) <= 20


def test_fuzzy_levenshtein_referee(spark, sf_dir):
    rows = QUERIES["join_fuzzy_levenshtein"](spark, sf_dir).collect()
    assert len(rows) == 100
    # every dirty record resolves back to its origin (one-digit
    # corruption cannot beat the true match) at distance <= 1
    for r in rows:
        assert r["matched_key"] == r["orig_key"]
        assert 0 <= r["lev"] <= 1
    # and the corruption is real: a good share of names actually moved
    assert sum(1 for r in rows if r["lev"] == 1) >= 50


def test_csv_roundtrip_identity(spark, sf_dir):
    rows = QUERIES["sink_csv_roundtrip"](spark, sf_dir).collect()
    nation = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    want = {
        int(r["n_nationkey"]): f'{r["n_name"]}, "{r["n_name"]}"\nline2:{r["n_name"]}'
        for _, r in nation.iterrows()
    }
    assert len(rows) == len(want)
    for r in rows:
        assert r["tricky"] == want[r["n_nationkey"]]
        assert "\n" in r["tricky"] and '"' in r["tricky"]


def test_ipf_raking_margins_converge(spark, sf_dir):
    rows = QUERIES["agg_ipf_raking"](spark, sf_dir).collect()
    import collections

    total = sum(r["n"] for r in rows)
    row_m = collections.Counter()
    col_m = collections.Counter()
    col_target = collections.Counter()
    for r in rows:
        row_m[r["d"]] += r["w_e9"]
        col_m[r["t"]] += r["w_e9"]
        col_target[r["t"]] += r["n"] * 10**9
    # after the final COLUMN scaling, column margins are (near-)exact;
    # row margins have converged geometrically onto total/4
    for t, got in col_m.items():
        assert abs(got - col_target[t]) <= len(rows) * 2
    target_row = total * 10**9 / 4.0
    for d_, got in row_m.items():
        assert abs(got - target_row) / target_row < 0.02
    # weights stay positive and finite
    assert all(r["w_e9"] > 0 for r in rows)


def test_switchback_referee(spark, sf_dir):
    import hashlib

    ev = _events(sf_dir)
    ev["h"] = ev["ts"].dt.floor("h")
    ev["y"] = np.floor(ev["value"].to_numpy() * 10000).astype(np.int64)
    per = ev.groupby("h")["y"].sum()
    arms = {0: [], 1: []}
    for h, y in per.items():
        key = f"sb:{h.strftime('%Y-%m-%d %H:%M:%S')}"
        a = int(hashlib.md5(key.encode()).hexdigest()[:4], 16) % 2
        arms[a].append(int(y))
    row = QUERIES["events_switchback_analysis"](spark, sf_dir).collect()[0]
    assert row["n_buckets_0"] == len(arms[0])
    assert row["n_buckets_1"] == len(arms[1])
    m0 = sum(arms[0]) / len(arms[0])
    m1 = sum(arms[1]) / len(arms[1])
    assert row["mean_diff_e6"] == math.floor((m1 - m0) * 100.0)
    # an A/A-like split on homogeneous data should not be wildly
    # significant
    assert abs(row["t_e4"]) < 50000


def test_tokenizer_fertility_referee(spark, sf_dir):
    docs = pq.read_table(f"{sf_dir}/documents.parquet").to_pandas()
    docs["n_tok"] = docs["text"].str.split(" ").str.len()
    docs = docs[docs["n_tok"] > 0]
    rows = {
        r["lang"]: r
        for r in QUERIES["text_tokenizer_fertility"](spark, sf_dir).collect()
    }
    for lang, sub in docs.groupby("lang"):
        r = rows[lang]
        assert r["n_docs"] == len(sub)
        tc, tt = int(sub["n_chars"].sum()), int(sub["n_tok"].sum())
        assert r["total_chars"] == tc and r["total_tokens"] == tt
        assert r["fertility_e6"] == tc * 1000000 // tt
        per = sorted(
            int(c) * 1000000 // int(t)
            for c, t in zip(sub["n_chars"], sub["n_tok"])
        )
        assert r["fertility_p50_e6"] == per[math.ceil(0.5 * len(per)) - 1]


def test_robust_summary_referee(spark, sf_dir):
    ev = _events(sf_dir)
    ev["x"] = np.floor(ev["value"].to_numpy() * 10000).astype(np.int64)
    rows = {
        r["event_type"]: r
        for r in QUERIES["agg_robust_summary"](spark, sf_dir).collect()
    }
    for grp, sub in ev.groupby("event_type"):
        xs = np.sort(sub["x"].to_numpy())
        n = len(xs)
        disc = lambda q: int(xs[math.ceil(q * n) - 1])  # noqa: E731
        q1, med, q3 = disc(0.25), disc(0.5), disc(0.75)
        devs = np.sort(np.abs(sub["x"].to_numpy() - med))
        mad = int(devs[math.ceil(0.5 * n) - 1])
        lo = q1 - 3 * (q3 - q1) // 2
        hi = q3 + 3 * (q3 - q1) // 2
        n_out = int(((sub["x"] < lo) | (sub["x"] > hi)).sum())
        r = rows[grp]
        assert (r["q1"], r["med"], r["q3"]) == (q1, med, q3)
        assert r["mad"] == mad
        assert r["n_outliers"] == n_out
        if q3 > q1:
            assert r["bowley_skew_e6"] == (q3 + q1 - 2 * med) * 1000000 // (
                q3 - q1
            )
            assert -1000000 <= r["bowley_skew_e6"] <= 1000000


def test_markov_stationary_referee(spark, sf_dir):
    rows = QUERIES["events_markov_stationary"](spark, sf_dir).collect()
    total = sum(r["pi_e12"] for r in rows)
    # mass leak bounded by k*iters quanta at e12
    assert abs(total - 10**12) <= len(rows) * 8 * 10**3 + len(rows)
    # compare against a float power-iteration on the same matrix
    ev = _events(sf_dir).sort_values(["user_id", "ts", "event_id"])
    import collections

    counts = collections.Counter()
    for _, sub in ev.groupby("user_id"):
        types = sub["event_type"].tolist()
        for a, b in zip(types, types[1:]):
            counts[(a, b)] += 1
    states = sorted(set(t for t, _ in counts) | set(t for _, t in counts))
    idx = {s: i for i, s in enumerate(states)}
    P = np.zeros((len(states), len(states)))
    for (a, b), n in counts.items():
        P[idx[a], idx[b]] = n
    P = P / P.sum(axis=1, keepdims=True)
    pi = np.full(len(states), 1.0 / len(states))
    for _ in range(100):
        pi = pi @ P
    got = {r["event_type"]: r["pi_e12"] / 1e12 for r in rows}
    for s_, i in idx.items():
        assert abs(got[s_] - pi[i]) < 1e-3


def test_periodogram_referee(spark, sf_dir):
    from graphsense_datafeed_spark.operators.timeseries import (
        _PGRAM_COS,
        _PGRAM_SIN,
    )

    ev = _events(sf_dir)
    ev["d"] = ev["ts"].dt.date
    xs = ev.groupby("d").size().sort_index().to_numpy()
    rows = {
        r["period"]: r
        for r in QUERIES["ts_periodogram_peaks"](spark, sf_dir).collect()
    }
    for p in (7, 14, 30):
        c = sum(int(x) * _PGRAM_COS[p][t % p] for t, x in enumerate(xs))
        s = sum(int(x) * _PGRAM_SIN[p][t % p] for t, x in enumerate(xs))
        power = ((c / 1e9) ** 2 + (s / 1e9) ** 2) * 1000
        assert rows[p]["power_e3"] == math.floor(power)
        assert rows[p]["power_e3"] >= 0


def test_stream_topk_per_window_referee(spark, sf_dir):
    ev = _events(sf_dir)
    ev["h"] = ev["ts"].dt.floor("h")
    rows = QUERIES["stream_topk_per_window"](spark, sf_dir).collect()
    got = {}
    for r in rows:
        got.setdefault(r["win_start"], []).append(
            (r["rk"], r["event_type"], r["n_events"])
        )
    for h, sub in ev.groupby("h"):
        counts = sub.groupby("event_type").size()
        want = sorted(
            ((int(n), t) for t, n in counts.items()),
            key=lambda x: (-x[0], x[1]),
        )[:3]
        gl = sorted(got[h.to_pydatetime()])
        assert [(n, t) for _, t, n in gl] == [(n, t) for n, t in want]
        assert [rk for rk, _, _ in gl] == list(range(1, len(gl) + 1))


def test_partition_evolution_referee(spark, sf_dir):
    orders = pq.read_table(f"{sf_dir}/orders.parquet").to_pandas()
    rows = QUERIES["scan_partition_evolution_union"](spark, sf_dir).collect()
    orders["mth"] = orders["o_orderdate"].dt.strftime("%Y-%m")
    orders["cents"] = np.round(
        orders["o_totalprice"].to_numpy() * 100
    ).astype(np.int64)
    got = {r["mth"]: r for r in rows}
    for mth, sub in orders.groupby("mth"):
        r = got[mth]
        assert r["n_orders"] == len(sub)
        assert r["n_coarse"] == int((sub["o_orderkey"] % 2 == 0).sum())
        assert r["sum_cents"] == int(sub["cents"].sum())


def test_sequential_obf_referee(spark, sf_dir):
    rows = QUERIES["events_sequential_probe_obf"](spark, sf_dir).collect()
    assert [r["look"] for r in rows] == [1, 2, 3, 4]
    # OBF boundaries decrease monotonically toward the final 2.024
    bounds = [r["boundary_e4"] for r in rows]
    assert bounds == sorted(bounds, reverse=True)
    assert bounds[-1] == math.floor(2.024 * 10000)
    assert bounds[0] == math.floor(2.024 * 2 * 10000)
    # cumulative looks only grow
    ns = [r["n_total"] for r in rows]
    assert ns == sorted(ns)
    for r in rows:
        assert r["crossed"] == (1 if abs(r["z_e4"]) >= r["boundary_e4"] else 0)


def test_conformal_interval_coverage_guarantee(spark, sf_dir):
    rows = QUERIES["agg_conformal_interval"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        # finite-sample marginal coverage: E[cov] >= 90%; at small n
        # the realized value fluctuates — bound the fluctuation by a
        # 4-sigma binomial band around 0.9
        n = r["n_test"]
        slack = 4 * math.sqrt(0.9 * 0.1 / n)
        assert r["coverage_e6"] / 1e6 >= 0.9 - slack
        assert r["q_e4"] > 0
        assert r["n_cal"] > 0


def test_conformal_quantile_is_order_statistic(spark, sf_dir):
    import hashlib

    ev = _events(sf_dir)
    ev["v_e4"] = np.floor(ev["value"].to_numpy() * 10000).astype(np.int64)
    ev["split"] = [
        int(hashlib.md5(f"cf:{i}".encode()).hexdigest()[:4], 16) % 4
        for i in ev["event_id"]
    ]
    rows = {
        r["event_type"]: r
        for r in QUERIES["agg_conformal_interval"](spark, sf_dir).collect()
    }
    for grp, sub in ev.groupby("event_type"):
        train = sub[sub["split"] <= 1]
        yhat = int(train["v_e4"].sum()) // len(train)
        calres = np.sort(
            np.abs(sub.loc[sub["split"] == 2, "v_e4"].to_numpy() - yhat)
        )
        n = len(calres)
        k = min(n, math.ceil(0.9 * (n + 1)))
        r = rows[grp]
        assert r["n_cal"] == n
        assert r["q_e4"] == int(calres[k - 1])


def test_watermark_greenlist_clean_corpus(spark, sf_dir):
    rows = QUERIES["text_watermark_greenlist"](spark, sf_dir).collect()
    assert rows
    # clean (non-watermarked) corpus: green fraction ~ Binomial(n, 1/2)
    # per doc, so no doc should cross the 4-sigma flag and the mean
    # z should sit near zero
    assert all(r["flagged"] == 0 for r in rows)
    zs = [r["z_e4"] / 1e4 for r in rows]
    assert abs(sum(zs) / len(zs)) < 0.5
    for r in rows:
        assert 0 <= r["n_green"] <= r["n_pairs"]
        assert r["n_pairs"] >= 20


def test_watermark_detects_planted_greenlist(spark, sf_dir):
    """Plant a watermark: build a doc whose every adjacent pair is
    green under the same md5 coin, run the SAME detector logic, and
    assert it flags — the power side of the clean-corpus test."""
    import hashlib

    words = ["w0"]
    vocab = [f"tok{i}" for i in range(50)]
    for _ in range(120):
        prev = words[-1]
        for cand in vocab:
            if int(
                hashlib.md5(f"{prev}|{cand}".encode()).hexdigest()[:4], 16
            ) % 2 == 0:
                words.append(cand)
                break
        else:
            words.append(vocab[0])
    text = " ".join(words)
    n_pairs = len(words) - 1
    n_green = sum(
        1
        for a, b in zip(words, words[1:])
        if int(hashlib.md5(f"{a}|{b}".encode()).hexdigest()[:4], 16) % 2 == 0
    )
    z = (n_green - n_pairs / 2.0) / math.sqrt(n_pairs / 4.0)
    assert z > 4.0  # the planted doc must be flaggable by construction


def test_did_estimator_referee(spark, sf_dir):
    import hashlib

    ev = _events(sf_dir)
    v = np.floor(ev["value"].to_numpy() * 10000).astype(np.int64)
    treat = np.array(
        [
            int(hashlib.md5(f"did:{u}".encode()).hexdigest()[:4], 16) % 2
            for u in ev["user_id"]
        ]
    )
    post = (ev["ts"].dt.day >= 16).to_numpy().astype(np.int64)
    cells = {}
    for t in (0, 1):
        for p in (0, 1):
            sub = v[(treat == t) & (post == p)].astype(np.float64)
            cells[(t, p)] = (
                len(sub),
                sub.sum(),
                ((sub - sub.mean()) ** 2).sum() / (len(sub) - 1),
            )
    did = (
        cells[(1, 1)][1] / cells[(1, 1)][0]
        - cells[(1, 0)][1] / cells[(1, 0)][0]
    ) - (
        cells[(0, 1)][1] / cells[(0, 1)][0]
        - cells[(0, 0)][1] / cells[(0, 0)][0]
    )
    se = math.sqrt(
        sum(cells[k][2] / cells[k][0] for k in sorted(cells))
    )
    (r,) = QUERIES["events_did_estimator"](spark, sf_dir).collect()
    assert (r["n00"], r["n01"], r["n10"], r["n11"]) == (
        cells[(0, 0)][0],
        cells[(0, 1)][0],
        cells[(1, 0)][0],
        cells[(1, 1)][0],
    )
    # referee tolerates ±1 on the floored units (numpy accumulates in
    # a different order than the engines' single chain)
    assert abs(r["did_e4"] - math.floor(did)) <= 1
    assert abs(r["se_e4"] - math.floor(se)) <= 1
    assert abs(r["t_e4"] - math.floor(did / se * 10000)) <= 1
    # hash-randomized arms on untreated synthetic data: no real effect
    assert abs(r["t_e4"]) < 40000


def test_benjamini_hochberg_stepup_semantics(spark, sf_dir):
    rows = QUERIES["agg_benjamini_hochberg"](spark, sf_dir).collect()
    assert len(rows) == 35  # 5 event types x 7 weekdays
    assert sorted(r["rnk"] for r in rows) == list(range(1, 36))
    # p sorted by rank; thresholds are alpha*i/m floored at e6
    by_rank = sorted(rows, key=lambda r: r["rnk"])
    ps = [r["p_e6"] for r in by_rank]
    assert ps == sorted(ps)
    for r in by_rank:
        assert r["thr_e6"] == math.floor(0.05 * r["rnk"] / 35 * 1e6)
        assert 0 <= r["dow"] <= 6
        assert 0 <= r["p_e6"] <= 1000000
    # step-up: rejected prefix ends exactly at the LAST rank whose
    # p <= threshold (ranks after kmax are all unrejected, before all
    # rejected) -- recompute kmax independently
    kmax = max(
        (r["rnk"] for r in by_rank if r["p_e6"] <= r["thr_e6"]), default=0
    )
    for r in by_rank:
        assert r["rejected"] == (1 if r["rnk"] <= kmax else 0)


def test_benjamini_hochberg_pvalue_chain(spark, sf_dir):
    # the A&S 7.1.26 chain from the floored z must match a python
    # recomputation on the same floored input bit-for-bit at e6
    rows = QUERIES["agg_benjamini_hochberg"](spark, sf_dir).collect()
    for r in rows:
        x = abs(r["z_e4"]) / 10000.0 / 1.4142135623730951
        t = 1.0 / (1.0 + 0.3275911 * x)
        poly = t * (
            0.254829592
            + t
            * (
                -0.284496736
                + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429))
            )
        )
        p = poly * math.exp(-x * x)
        assert abs(r["p_e6"] - math.floor(p * 1e6)) <= 1
        # sanity: the approximation is a real two-sided p
        from math import erfc

        exact = erfc(abs(r["z_e4"]) / 10000.0 / math.sqrt(2.0))
        assert abs(r["p_e6"] / 1e6 - exact) < 2e-6


def test_spectral_entropy_referee(spark, sf_dir):
    ev = _events(sf_dir)
    days = ev["ts"].dt.date
    daily = days.value_counts().sort_index().to_numpy().astype(np.float64)
    n, kk = 30, 14
    t = np.arange(len(daily))
    p_e3 = []
    for k in range(1, kk + 1):
        cos_t = np.array(
            [math.floor(math.cos(2 * math.pi * k * u / n) * 1e9) for u in range(n)]
        )
        sin_t = np.array(
            [math.floor(math.sin(2 * math.pi * k * u / n) * 1e9) for u in range(n)]
        )
        c = int((daily * cos_t[t % n]).sum()) / 1e9
        s = int((daily * sin_t[t % n]).sum()) / 1e9
        p_e3.append(math.floor((c * c + s * s) * 1000))
    total = sum(p_e3)
    ent = sum(
        math.floor(-(p / total) * math.log(p / total) * 1e9)
        for p in p_e3
        if p > 0
    )
    (r,) = QUERIES["ts_spectral_entropy"](spark, sf_dir).collect()
    assert r["n_freq"] == kk
    assert r["total_power_e3"] == total
    assert r["entropy_e9"] == ent
    assert 0 <= r["entropy_norm_e6"] <= 1000100
    if min(p_e3) > 0:
        flat = math.exp(
            sum(math.floor(math.log(p / 1000.0) * 1e9) for p in p_e3)
            / 1e9
            / kk
        ) / (total / 1000.0 / kk)
        assert abs(r["flatness_e6"] - math.floor(flat * 1e6)) <= 1
        assert 0 <= r["flatness_e6"] <= 1000000


def test_hurst_rs_referee(spark, sf_dir):
    ev = _events(sf_dir).sort_values("ts")
    hours = ev["ts"].dt.floor("h")
    v = hours.value_counts().sort_index().to_numpy().astype(np.int64)
    (r,) = QUERIES["ts_hurst_rs"](spark, sf_dir).collect()
    lx, ly = [], []
    for size in (16, 36, 80, 180):
        nb = len(v) // size
        assert r[f"nb{size}"] == nb
        rs_sum = 0
        for b in range(nb):
            blk = v[b * size : (b + 1) * size].astype(np.float64)
            zc = np.cumsum(blk - blk.mean())
            rng = zc.max() - zc.min()
            std = blk.std()  # population
            rs_sum += (
                0 if rng == 0 else math.floor(rng / std * 1e6)
            )
        got = r[f"rs_mean{size}_e6"]
        want = math.floor(rs_sum / nb)
        # numpy float accumulation differs from the integer chain by
        # at most one e6 quantum per block
        assert abs(got - want) <= nb
        lx.append(math.log(size))
        ly.append(math.log(rs_sum / nb / 1e6))
    xb, yb = sum(lx) / 4, sum(ly) / 4
    slope = sum(
        (x - xb) * (y - yb) for x, y in zip(lx, ly)
    ) / sum((x - xb) ** 2 for x in lx)
    assert abs(r["hurst_e6"] / 1e6 - slope) < 0.01
    # hourly event counts: H must land in the physical (0, 1) band
    assert 0 < r["hurst_e6"] < 1000000


def test_functional_dependency_referee(spark, sf_dir):
    orders = pq.read_table(f"{sf_dir}/orders.parquet").to_pandas()
    rows = {
        (r["lhs"], r["rhs"]): r
        for r in QUERIES["profile_functional_dependency"](
            spark, sf_dir
        ).collect()
    }
    assert len(rows) == 5
    for (lhs, rhs), r in rows.items():
        cnt = orders.groupby([lhs, rhs]).size()
        per_lhs = cnt.groupby(level=0)
        sum_max = int(per_lhs.max().sum())
        assert r["n_rows"] == len(orders)
        assert r["n_lhs"] == orders[lhs].nunique()
        assert r["sum_max"] == sum_max
        assert r["viol"] == len(orders) - sum_max
        assert r["g3_e6"] == math.floor(
            (len(orders) - sum_max) / len(orders) * 1e6
        )
    # the primary key determines every column: exact FD, zero g3
    assert rows[("o_orderkey", "o_custkey")]["viol"] == 0
    # a 5-value status can't determine a 5-value priority exactly
    assert rows[("o_orderstatus", "o_orderpriority")]["g3_e6"] > 0


def test_grubbs_outlier_referee(spark, sf_dir):
    ev = _events(sf_dir)
    ev["v_e4"] = np.floor(ev["value"].to_numpy() * 10000).astype(np.int64)
    rows = {
        r["event_type"]: r
        for r in QUERIES["agg_grubbs_outlier"](spark, sf_dir).collect()
    }
    for grp, sub in ev.groupby("event_type"):
        v = sub["v_e4"].to_numpy()
        n, s = len(v), int(v.sum())
        d = np.abs(n * v - s)
        maxdev = int(d.max())
        outlier = int(v[d == maxdev].min())
        sd = math.sqrt(
            (float((v.astype(np.float64) ** 2).sum()) - s * s / n) / (n - 1)
        )
        g = (maxdev / n) / sd
        r = rows[grp]
        assert r["n"] == n
        assert r["outlier_e4"] == outlier
        assert abs(r["g_e4"] - math.floor(g * 1e4)) <= 1
        assert r["g_e4"] > 10000  # worst point is always > 1 sd out


def test_cronbach_alpha_referee(spark, sf_dir):
    ev = _events(sf_dir)
    ev["v_e2"] = np.floor(ev["value"].to_numpy() * 100).astype(np.int64)
    pivot = ev.pivot_table(
        index="user_id",
        columns="event_type",
        values="v_e2",
        aggfunc="sum",
        fill_value=0,
    )
    u, k = len(pivot), pivot.shape[1]
    # exact python ints (arbitrary precision) mirror the engines'
    # 128-bit accumulators
    item_num = sum(
        u * int((pivot[c].to_numpy().astype(object) ** 2).sum())
        - int(pivot[c].sum()) ** 2
        for c in pivot.columns
    )
    t = pivot.sum(axis=1).to_numpy().astype(object)
    tot_num = u * int((t**2).sum()) - int(t.sum()) ** 2
    alpha = k / (k - 1) * (1 - item_num / tot_num)
    (r,) = QUERIES["agg_cronbach_alpha"](spark, sf_dir).collect()
    assert r["k"] == k and r["n_users"] == u
    assert r["alpha_e6"] == math.floor(alpha * 1e6)
    assert r["alpha_e6"] < 1000000  # alpha <= 1 always


def test_deming_regression_referee(spark, sf_dir):
    import json as _json

    ev = _events(sf_dir)
    ev["x"] = np.floor(ev["value"].to_numpy() * 10000).astype(np.int64)
    ev["y"] = [
        int(_json.loads(p)["k"]) for p in ev["props"]
    ]
    rows = {
        r["event_type"]: r
        for r in QUERIES["agg_deming_regression"](spark, sf_dir).collect()
    }
    for grp, sub in ev.groupby("event_type"):
        x = sub["x"].to_numpy().astype(np.float64)
        y = sub["y"].to_numpy().astype(np.float64)
        n = len(x)
        syy = n * (y * y).sum() - y.sum() ** 2
        sxx = n * (x * x).sum() - x.sum() ** 2
        sxy = n * (x * y).sum() - x.sum() * y.sum()
        if sxy == 0:
            assert grp not in rows
            continue
        slope = (syy - sxx + math.sqrt((syy - sxx) ** 2 + 4 * sxy * sxy)) / (
            2 * sxy
        )
        intercept = y.mean() - slope * x.mean()
        r = rows[grp]
        assert r["n"] == n
        assert abs(r["slope_e6"] - math.floor(slope * 1e6)) <= 1
        assert abs(r["intercept_e4"] - math.floor(intercept * 1e4)) <= 1
        # x and props.k are independent by construction: slope tiny
        assert abs(r["slope_e6"]) < 10_000_000


def test_rich_club_referee(spark, sf_dir):
    import itertools

    li = pq.read_table(f"{sf_dir}/lineitem.parquet").to_pandas()
    orders = pq.read_table(f"{sf_dir}/orders.parquet").to_pandas()
    m = li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
    bip = set(zip(m["o_custkey"], m["l_partkey"]))
    by_part = {}
    for cust, part in bip:
        by_part.setdefault(part, []).append(cust)
    support = {}
    for custs in by_part.values():
        for ca, cb in itertools.combinations(sorted(custs), 2):
            support[(ca, cb)] = support.get((ca, cb), 0) + 1
    edges = [e for e, sup in support.items() if sup >= 3]
    deg = {}
    for ca, cb in edges:
        deg[ca] = deg.get(ca, 0) + 1
        deg[cb] = deg.get(cb, 0) + 1
    rows = {r["k"]: r for r in QUERIES["graph_rich_club_coefficient"](
        spark, sf_dir
    ).collect()}
    assert sorted(rows) == [2, 4, 8, 16]
    for k, r in rows.items():
        nk = sum(1 for d in deg.values() if d > k)
        ek = sum(
            1 for ca, cb in edges if deg[ca] > k and deg[cb] > k
        )
        assert r["n_nodes"] == nk
        assert r["n_edges"] == ek
        want = 0 if nk < 2 else math.floor(2.0 * ek / (nk * (nk - 1)) * 1e6)
        assert r["phi_e6"] == want
    # monotone containment: the k-club node/edge sets shrink with k
    ns = [rows[k]["n_nodes"] for k in (2, 4, 8, 16)]
    es = [rows[k]["n_edges"] for k in (2, 4, 8, 16)]
    assert ns == sorted(ns, reverse=True)
    assert es == sorted(es, reverse=True)


def test_bm25_topk_referee(spark, sf_dir):
    docs = pq.read_table(f"{sf_dir}/documents.parquet").to_pandas()
    toks = {r.doc_id: r.text.split(" ") for r in docs.itertuples()}
    n_docs = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n_docs
    queries = {1: ("table", "scan"), 2: ("hash", "value"), 3: ("slow", "fast")}
    all_terms = {t for ts in queries.values() for t in ts}
    df = {
        t: sum(1 for ts in toks.values() if t in ts) for t in all_terms
    }
    got = QUERIES["text_bm25_topk"](spark, sf_dir).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    assert sorted(by_q) == [1, 2, 3]
    for qid, terms in queries.items():
        scores = {}
        for doc_id, ts in toks.items():
            total = 0
            for t in terms:
                tf = ts.count(t)
                if tf == 0:
                    continue
                idf = math.log((n_docs - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
                w = (
                    idf
                    * (tf * (1.2 + 1.0))
                    / (tf + 1.2 * (1.0 - 0.75 + 0.75 * len(ts) / avgdl))
                )
                total += math.floor(w * 1e6)
            if total:
                scores[doc_id] = total
        want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
        rows = sorted(by_q[qid], key=lambda r: r["rnk"])
        assert [(r["doc_id"], r["score_e6"]) for r in rows] == want
        assert [r["rnk"] for r in rows] == list(range(1, len(rows) + 1))


def test_icc_design_effect_referee(spark, sf_dir):
    ev = _events(sf_dir)
    ev["v_e2"] = np.floor(ev["value"].to_numpy() * 100).astype(np.int64)
    g = ev.groupby("user_id")["v_e2"]
    m = g.size().to_numpy().astype(np.int64)
    s = g.sum().to_numpy().astype(np.int64)
    k, n = len(m), int(m.sum())
    a = sum(
        math.floor(float(si) * si / mi * 1e6) for si, mi in zip(s, m)
    ) / 1e6
    stot = int(s.sum())
    sy2 = int((ev["v_e2"].to_numpy().astype(object) ** 2).sum())
    ssb = a - stot * stot / n
    ssw = sy2 - a
    msb, msw = ssb / (k - 1), ssw / (n - k)
    sm2 = int((m.astype(object) ** 2).sum())
    m0 = (n - sm2 / n) / (k - 1)
    icc = (msb - msw) / (msb + (m0 - 1) * msw)
    deff = 1 + (n / k - 1) * icc
    (r,) = QUERIES["agg_icc_design_effect"](spark, sf_dir).collect()
    assert r["k"] == k and r["n"] == n
    assert abs(r["m0_e4"] - math.floor(m0 * 1e4)) <= 1
    assert abs(r["icc_e6"] - math.floor(icc * 1e6)) <= 1
    assert abs(r["deff_e6"] - math.floor(deff * 1e6)) <= 1
    # iid-by-construction synthetic values: ICC must hug zero and
    # DEFF must hug one
    assert abs(r["icc_e6"]) < 100000
    assert 0 < r["deff_e6"] < 3000000


def test_contamination_matrix_referee(spark, sf_dir):
    import hashlib

    docs = pq.read_table(f"{sf_dir}/documents.parquet").to_pandas()

    def split_of(doc_id):
        b = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:7], 16) % 1000
        return "train" if b < 800 else ("val" if b < 900 else "test")

    sets = {"train": set(), "val": set(), "test": set()}
    for r in docs.itertuples():
        ws = r.text.split(" ")
        sp = split_of(r.doc_id)
        for i in range(len(ws) - 4):
            sets[sp].add(" ".join(ws[i : i + 5]))
    rows = {
        (r["split_a"], r["split_b"]): r
        for r in QUERIES["corpus_contamination_matrix"](
            spark, sf_dir
        ).collect()
    }
    assert set(rows) <= {
        ("test", "train"),
        ("test", "val"),
        ("train", "val"),
    }
    for (sa, sb), r in rows.items():
        shared = len(sets[sa] & sets[sb])
        assert r["n_a"] == len(sets[sa])
        assert r["n_b"] == len(sets[sb])
        assert r["n_shared"] == shared
        assert r["rate_a_e6"] == math.floor(shared / len(sets[sa]) * 1e6)
        assert r["rate_b_e6"] == math.floor(shared / len(sets[sb]) * 1e6)


def test_price_index_fisher_referee(spark, sf_dir):
    li = pq.read_table(f"{sf_dir}/lineitem.parquet").to_pandas()
    li["period"] = (
        li["l_shipdate"] >= np.datetime64("1998-01-01")
    ).astype(int)
    li["ep_c"] = np.floor(li["l_extendedprice"].to_numpy() * 100).astype(
        np.int64
    )
    li["qty"] = li["l_quantity"].astype(np.int64)
    g = li.groupby(["l_partkey", "period"]).agg(
        sep=("ep_c", "sum"), sq=("qty", "sum")
    )
    s1, s2, s3, s4, n = 0, 0, 0, 0, 0
    for part in g.index.get_level_values(0).unique():
        try:
            r0, r1 = g.loc[(part, 0)], g.loc[(part, 1)]
        except KeyError:
            continue
        n += 1
        s1 += math.floor(float(r1.sep) / r1.sq * r0.sq * 100)
        s2 += int(r0.sep) * 100
        s3 += int(r1.sep) * 100
        s4 += math.floor(float(r0.sep) / r0.sq * r1.sq * 100)
    (r,) = QUERIES["agg_price_index_fisher"](spark, sf_dir).collect()
    assert r["n_parts"] == n
    lasp, paas = s1 / s2, s3 / s4
    assert abs(r["laspeyres_e6"] - math.floor(lasp * 1e6)) <= 1
    assert abs(r["paasche_e6"] - math.floor(paas * 1e6)) <= 1
    assert abs(r["fisher_e6"] - math.floor(math.sqrt(lasp * paas) * 1e6)) <= 1
    # uniform synthetic prices: index near 1, and Fisher must sit
    # between its two bounding indices
    assert 800000 < r["fisher_e6"] < 1250000
    lo, hi = sorted((r["laspeyres_e6"], r["paasche_e6"]))
    assert lo - 1 <= r["fisher_e6"] <= hi + 1


def test_uplift_qini_referee(spark, sf_dir):
    import hashlib

    ev = _events(sf_dir)
    ev["v_e4"] = np.floor(ev["value"].to_numpy() * 10000).astype(np.int64)
    day = ev["ts"].dt.day
    pre = ev[day <= 21].groupby("user_id")["v_e4"].sum()
    post = ev[day >= 22].groupby("user_id")["v_e4"].sum()
    users = sorted(ev["user_id"].unique())
    rows_u = []
    for u in users:
        rows_u.append(
            (
                u,
                int(hashlib.md5(f"qini:{u}".encode()).hexdigest()[:4], 16)
                % 2,
                int(pre.get(u, 0)),
                int(post.get(u, 0)),
            )
        )
    rows_u.sort(key=lambda t: (-t[2], t[0]))
    n = len(rows_u)
    qsz, rem = divmod(n, 10)
    deciles = []
    for i in range(10):
        deciles += [i + 1] * (qsz + (1 if i < rem else 0))
    got = sorted(
        QUERIES["events_uplift_qini"](spark, sf_dir).collect(),
        key=lambda r: r["decile"],
    )
    cnt = cnc = cyt = cyc = 0
    idx = 0
    for d in range(1, 11):
        while idx < n and deciles[idx] == d:
            _, w, _, y = rows_u[idx]
            if w == 1:
                cnt, cyt = cnt + 1, cyt + y
            else:
                cnc, cyc = cnc + 1, cyc + y
            idx += 1
        r = got[d - 1]
        assert (r["cnt"], r["cnc"], r["cyt"], r["cyc"]) == (
            cnt,
            cnc,
            cyt,
            cyc,
        )
        want_q = 0 if cnc == 0 else math.floor(cyt - cyc * cnt / cnc)
        assert abs(r["qini_e4"] - want_q) <= 1
    # null experiment: final-decile uplift per user stays small
    # relative to the mean outcome
    mean_y = (cyt + cyc) / (cnt + cnc)
    assert abs(got[-1]["uplift_e4"]) < 0.5 * mean_y


def test_gumbel_block_maxima_referee(spark, sf_dir):
    ev = _events(sf_dir)
    ev["v_e4"] = np.floor(ev["value"].to_numpy() * 10000).astype(np.int64)
    m = ev.groupby(ev["ts"].dt.date)["v_e4"].max().to_numpy().astype(float)
    n = len(m)
    mean = m.sum() / n
    sd = math.sqrt((np.sum(m * m) - m.sum() ** 2 / n) / (n - 1))
    sigma = sd * (math.sqrt(6.0) / math.pi)
    mu = mean - 0.5772156649015329 * sigma
    rl30 = mu + sigma * (-math.log(-math.log(29.0 / 30.0)))
    rl365 = mu + sigma * (-math.log(-math.log(364.0 / 365.0)))
    (r,) = QUERIES["agg_gumbel_block_maxima"](spark, sf_dir).collect()
    assert r["n"] == n
    assert r["observed_max_e4"] == int(m.max())
    assert abs(r["mean_e4"] - math.floor(mean)) <= 1
    assert abs(r["sigma_e4"] - math.floor(sigma)) <= 1
    assert abs(r["mu_e4"] - math.floor(mu)) <= 1
    assert abs(r["rl30_e4"] - math.floor(rl30)) <= 1
    assert abs(r["rl365_e4"] - math.floor(rl365)) <= 1
    # ordering sanity: mode < 1-month level < 1-year level, and the
    # 30-day return level should sit near the observed 30-block max
    assert r["mu_e4"] < r["rl30_e4"] < r["rl365_e4"]
    assert abs(r["rl30_e4"] - r["observed_max_e4"]) < 3 * r["sigma_e4"]


def test_gram_spectral_norm_referee(spark, sf_dir):
    emb = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pandas()
    x = np.stack(
        [np.asarray(v, dtype=np.float64) for v in emb["embedding"]]
    )
    qm = np.floor(x * 1e6).astype(np.int64)
    (r,) = QUERIES["embed_gram_spectral_norm"](spark, sf_dir).collect()
    assert r["d"] == x.shape[1]
    assert r["n_vecs"] == len(x)
    # bit-exact replay of the quantized recursion (integer gram,
    # double renormalization chain identical to both engines)
    gram = qm.T.astype(object) @ qm.astype(object)
    g = np.array(
        [[math.floor(float(c) / 1e6) for c in row] for row in gram],
        dtype=object,
    )
    S = 10**8
    d = g.shape[0]
    v = np.full(d, S // d, dtype=object)
    for _ in range(8):
        w = g @ v
        nrm = int(np.abs(w).sum())
        v = np.array(
            [math.floor(float(c) * float(S) / float(nrm)) for c in w],
            dtype=object,
        )
    wf = g @ v
    num, den = int((v * wf).sum()), int((v * v).sum())
    lam_replay = float(num) / float(den)
    assert r["lambda_e3"] == math.floor(lam_replay * 1000)
    assert r["spectral_e3"] == math.floor(lam_replay / 1000.0)
    # bound sanity vs the true top eigenvalue: a Rayleigh quotient
    # can never exceed lambda_1, and 8 rounds must capture most of it
    lam_true = float(
        np.linalg.eigvalsh(g.astype(np.float64)).max()
    )
    lam_got = r["lambda_e3"] / 1e3
    assert lam_got <= lam_true * 1.001
    assert lam_got >= 0.8 * lam_true


def test_pot_gpd_referee(spark, sf_dir):
    ev = _events(sf_dir)
    v = np.sort(np.floor(ev["value"].to_numpy() * 10000).astype(np.int64))
    n = len(v)
    # percentile_disc(0.9): smallest element with cum share >= 0.9
    u = int(v[math.ceil(0.9 * n) - 1])
    y = (v[v > u] - u).astype(np.float64)
    m = y.mean()
    s2 = ((y - m) ** 2).sum() / (len(y) - 1)
    xi = 0.5 * (1 - m * m / s2)
    beta = 0.5 * m * (1 + m * m / s2)
    (r,) = QUERIES["ts_pot_gpd_moments"](spark, sf_dir).collect()
    assert r["u_e4"] == u
    assert r["n_total"] == n
    assert r["n_exceed"] == len(y)
    assert abs(r["xi_e6"] - math.floor(xi * 1e6)) <= 1
    assert abs(r["beta_e4"] - math.floor(beta)) <= 1
    # the synthetic value tail is near-exponential: xi must hug 0,
    # far from the heavy-tail (xi > 0.5) and hard-bound (xi < -0.5)
    # regimes
    assert abs(r["xi_e6"]) < 500000
    assert r["beta_e4"] > 0


def test_tail_dependence_referee(spark, sf_dir):
    import json as _json

    ev = _events(sf_dir)
    x = np.floor(ev["value"].to_numpy() * 10000).astype(np.int64)
    y = np.array([int(_json.loads(p)["k"]) for p in ev["props"]])
    n = len(x)

    def qdisc(a, p):
        sa = np.sort(a)
        return int(sa[math.ceil(p * n) - 1])

    qxu, qyu = qdisc(x, 0.95), qdisc(y, 0.95)
    qxl, qyl = qdisc(x, 0.05), qdisc(y, 0.05)
    (r,) = QUERIES["agg_tail_dependence"](spark, sf_dir).collect()
    assert (r["qx_hi_e4"], r["qy_hi"], r["qx_lo_e4"], r["qy_lo"]) == (
        qxu,
        qyu,
        qxl,
        qyl,
    )
    n_y_hi = int((y > qyu).sum())
    n_both_hi = int(((x > qxu) & (y > qyu)).sum())
    n_y_lo = int((y < qyl).sum())
    n_both_lo = int(((x < qxl) & (y < qyl)).sum())
    assert (r["n_y_hi"], r["n_both_hi"], r["n_y_lo"], r["n_both_lo"]) == (
        n_y_hi,
        n_both_hi,
        n_y_lo,
        n_both_lo,
    )
    assert r["lambda_u_e6"] == (
        0 if n_y_hi == 0 else math.floor(n_both_hi / n_y_hi * 1e6)
    )
    # value and props.k are independent by construction: both lambdas
    # must hug the tail mass (~5%), far from dependence (~100%)
    assert r["lambda_u_e6"] < 250000
    assert r["lambda_l_e6"] < 250000


def test_ndv_gee_referee(spark, sf_dir):
    import hashlib

    li = pq.read_table(f"{sf_dir}/lineitem.parquet").to_pandas()
    keys = [
        f"ndv:{o}:{l}"
        for o, l in zip(li["l_orderkey"], li["l_linenumber"])
    ]
    bucket = np.array(
        [int(hashlib.md5(k.encode()).hexdigest()[:6], 16) % 100 for k in keys]
    )
    parts = li["l_partkey"].to_numpy()
    (r,) = QUERIES["profile_ndv_sample_gee"](spark, sf_dir).collect()
    assert r["n_total"] == len(li)
    assert r["d_exact"] == len(np.unique(parts))
    sample = parts[bucket < 10]
    vals, counts = np.unique(sample, return_counts=True)
    assert r["n_sample"] == len(sample)
    assert r["d_sample"] == len(vals)
    assert r["f1"] == int((counts == 1).sum())
    gee = math.floor(
        math.sqrt(len(li) / len(sample)) * r["f1"]
        + (len(vals) - r["f1"])
    )
    assert r["gee"] == gee
    assert r["err_e6"] == math.floor(abs(gee - r["d_exact"]) / r["d_exact"] * 1e6)
    # GEE at 10% on this key distribution: within 40% of truth
    assert r["err_e6"] < 400000


def test_changepoint_binseg2_referee(spark, sf_dir):
    ev = _events(sf_dir)
    x = ev.groupby(ev["ts"].dt.date).size().sort_index().to_numpy()

    def best_split(xs):
        T, S = len(xs), int(xs.sum())
        pref = np.cumsum(xs)
        best = None
        for t in range(3, T - 2):
            d = T * int(pref[t - 1]) - t * S
            gain = math.floor(float(d) * d / (t * (T - t)) / T * 1000)
            key = (-gain, t)
            if best is None or key < best[0]:
                best = (key, t, gain)
        return best

    rows = {
        (r["level"], r["segment"]): r
        for r in QUERIES["ts_changepoint_binseg2"](spark, sf_dir).collect()
    }
    _, cp1, g1 = best_split(x)
    r1 = rows[(1, "all")]
    assert r1["cp_t"] == cp1
    assert r1["gain_e3"] == g1
    assert r1["n_left"] == cp1 and r1["n_right"] == len(x) - cp1
    for segname, xs, offset in (
        ("left", x[:cp1], 0),
        ("right", x[cp1:], cp1),
    ):
        if len(xs) < 6:
            assert (2, segname) not in rows
            continue
        _, cp, g = best_split(xs)
        r = rows[(2, segname)]
        assert r["cp_t"] == cp + offset
        assert r["gain_e3"] == g
        assert r["n_left"] == cp and r["n_right"] == len(xs) - cp


def test_kmeans_1d_referee(spark, sf_dir):
    ev = _events(sf_dir)
    v = np.floor(ev["value"].to_numpy() * 10000).astype(np.int64)
    sv = np.sort(v)
    n = len(v)
    c1 = int(sv[math.ceil(0.25 * n) - 1])
    c2 = int(sv[math.ceil(0.75 * n) - 1])
    for _ in range(3):
        near1 = np.abs(v - c1) <= np.abs(v - c2)
        c1 = math.floor(float(v[near1].sum()) / near1.sum())
        c2 = math.floor(float(v[~near1].sum()) / (~near1).sum())
    near1 = np.abs(v - c1) <= np.abs(v - c2)
    inertia = int(
        ((v[near1] - c1) ** 2).sum() + ((v[~near1] - c2) ** 2).sum()
    )
    (r,) = QUERIES["agg_kmeans_1d_bounded"](spark, sf_dir).collect()
    assert r["iters"] == 3
    assert (r["c1_e4"], r["c2_e4"]) == (c1, c2)
    assert (r["n1"], r["n2"]) == (int(near1.sum()), int((~near1).sum()))
    assert r["inertia_e8"] == inertia
    assert r["c1_e4"] < r["c2_e4"]


def test_char_ngram_entropy_referee(spark, sf_dir):
    from collections import Counter

    docs = pq.read_table(f"{sf_dir}/documents.parquet").to_pandas()
    rows = {
        r["lang"]: r
        for r in QUERIES["text_char_ngram_entropy"](spark, sf_dir).collect()
    }
    for lang, sub in docs.groupby("lang"):
        uni, bi = Counter(), Counter()
        for t in sub["text"]:
            for ch in t:
                uni[ch] += 1
            for i in range(len(t) - 1):
                bi[t[i : i + 2]] += 1

        def h_e9(cnt):
            n = sum(cnt.values())
            return sum(
                math.floor(-(c / n) * math.log(c / n) * 1e9)
                for c in cnt.values()
            )

        r = rows[lang]
        assert r["n_unigrams"] == sum(uni.values())
        assert r["ndv_unigram"] == len(uni)
        assert r["n_bigrams"] == sum(bi.values())
        assert r["ndv_bigram"] == len(bi)
        assert abs(r["h_uni_e9"] - h_e9(uni)) <= len(uni)
        assert abs(r["h_bi_e9"] - h_e9(bi)) <= len(bi)
        assert r["h_cond_e9"] == r["h_bi_e9"] - r["h_uni_e9"]
        # conditioning reduces entropy: 0 <= H(c2|c1) <= H(c1)
        assert 0 <= r["h_cond_e9"] <= r["h_uni_e9"] + len(uni)


def test_youden_j_referee(spark, sf_dir):
    docs = pq.read_table(f"{sf_dir}/documents.parquet").to_pandas()

    def score(row):
        t = row.text
        n_spaces = len(t) - len(t.replace(" ", ""))
        n_the = (len(t) - len(t.replace("the", ""))) / 3.0
        z = (
            -0.25
            + 1.5 * (row.n_chars / 1000)
            - 0.75 * (n_spaces / 100)
            + 2.0 * (n_the / max(row.n_chars, 1.0) * 10)
        )
        return math.floor(1e6 / (1.0 + math.exp(-z)))

    pts = [
        (score(r), 1 if r.n_chars >= 200 else 0)
        for r in docs.itertuples()
    ]
    p = sum(l for _, l in pts)
    nn = len(pts) - p
    from collections import defaultdict

    by_s = defaultdict(lambda: [0, 0])
    for s, l in pts:
        by_s[s][l] += 1
    best = None
    tp = fp = 0
    for s in sorted(by_s, reverse=True):
        n0, n1 = by_s[s]
        tp += n1
        fp += n0
        j = math.floor((tp / p - fp / nn) * 1e6)
        key = (-j, s)
        if best is None or key < best[0]:
            best = (key, s, tp, fp, j)
    (r,) = QUERIES["agg_youden_j_threshold"](spark, sf_dir).collect()
    _, s_star, tp_star, fp_star, j_star = best
    assert r["threshold_e6"] == s_star
    assert (r["tp"], r["fp"]) == (tp_star, fp_star)
    assert r["fn"] == p - tp_star and r["tn"] == nn - fp_star
    assert r["j_e6"] == j_star
    # the label shares a feature with the score, so the sweep must
    # find a clearly-better-than-chance cut (J = 0 is chance)
    assert r["j_e6"] > 200000


def test_alignment_uniformity_referee(spark, sf_dir):
    import hashlib
    import itertools

    emb = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pandas()
    keep = [
        int(hashlib.md5(f"au:{v}".encode()).hexdigest()[:6], 16) % 100 < 20
        for v in emb["vec_id"]
    ]
    sub = emb[np.array(keep)]
    qs = {
        int(r.vec_id): (
            np.floor(np.asarray(r.embedding, dtype=np.float64) * 1e6).astype(
                np.int64
            ),
            int(r.label),
        )
        for r in sub.itertuples()
    }
    ids = sorted(qs)
    d2s, same, usum = [], [], 0
    for va, vb in itertools.combinations(ids, 2):
        d2 = int(((qs[va][0] - qs[vb][0]) ** 2).sum())
        d2s.append((d2, qs[va][1] == qs[vb][1]))
        usum += math.floor(math.exp(-2.0 * (d2 / 1e12)) * 1e9)
    n_pairs = len(d2s)
    pos = [d for d, s in d2s if s]
    align = sum(pos) / len(pos) / 1e12
    unif = math.log(usum / n_pairs / 1e9)
    (r,) = QUERIES["embed_alignment_uniformity"](spark, sf_dir).collect()
    assert r["n_sampled"] == len(sub)
    assert r["n_pairs"] == n_pairs
    assert r["n_pos_pairs"] == len(pos)
    assert abs(r["align_e6"] - math.floor(align * 1e6)) <= 1
    assert abs(r["uniformity_e6"] - math.floor(unif * 1e6)) <= 1
    # geometry sanity: uniformity is never positive
    assert r["uniformity_e6"] <= 0
