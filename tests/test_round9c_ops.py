"""Round-9 continuation batch C: brute-force Python referees for the
new graph operators.  Each test recomputes the statistic from the raw
blocks fixture with plain Python (no SQL on either engine) and asserts
the registered query reproduces it exactly — independent of the DuckDB
oracle, which the driver exercises separately."""

import json
import math

from graphsense_datafeed_spark.registry import QUERIES
from graphsense_datafeed_spark.sources.scans import BLOCKS_JSONL


def _txs():
    with open(BLOCKS_JSONL) as f:
        for line in f:
            block = json.loads(line)
            for tx in block["txs"]:
                if not tx["coinbase"]:
                    yield tx


def test_graph_reciprocity_referee(spark, sf_dir):
    dedges = set()
    for tx in _txs():
        srcs = {io["address"][0] for io in tx["inputs"]}
        dsts = {io["address"][0] for io in tx["outputs"]}
        for s in srcs:
            for d in dsts:
                if s != d:
                    dedges.add((s, d))
    n_mut = sum((d, s) in dedges for s, d in dedges)
    row = QUERIES["graph_reciprocity"](spark, sf_dir).collect()[0]
    assert row["n_directed"] == len(dedges)
    assert row["n_mutual"] == n_mut
    assert row["n_mutual_dyads"] == n_mut // 2
    assert row["reciprocity_e6"] == math.floor(
        n_mut * 1000000 / len(dedges)
    )
    # sanity: every mutual edge belongs to a dyad counted twice
    assert row["n_mutual"] == 2 * row["n_mutual_dyads"]


def test_graph_edge_overlap_bridges_referee(spark, sf_dir):
    adj: dict[str, set[str]] = {}
    edges = set()
    for tx in _txs():
        addrs = sorted(
            {io["address"][0] for io in tx["inputs"] + tx["outputs"]}
        )
        for i, a in enumerate(addrs):
            for b in addrs[i + 1 :]:
                edges.add((a, b))
                adj.setdefault(a, set()).add(b)
                adj.setdefault(b, set()).add(a)
    want = {}
    for a, b in edges:
        cn = len(adj[a] & adj[b])
        da, db = len(adj[a]), len(adj[b])
        denom = da + db - 2 - cn
        overlap = math.floor(cn * 1000000 / denom) if denom > 0 else None
        want[(a, b)] = (da, db, cn, overlap, 1 if cn == 0 else 0)

    got = QUERIES["graph_edge_overlap_bridges"](spark, sf_dir).collect()
    assert len(got) == len(want)
    for r in got:
        da, db, cn, overlap, bridge = want[(r["src"], r["dst"])]
        assert r["deg_src"] == da and r["deg_dst"] == db
        assert r["common_neighbors"] == cn
        assert r["overlap_e6"] == overlap
        assert r["is_local_bridge"] == bridge
    # the fixture graph must exercise both classes
    assert any(r["is_local_bridge"] == 1 for r in got)
    assert any(r["is_local_bridge"] == 0 for r in got)


def test_gamma_fit_moments_referee(spark, sf_dir):
    import pyarrow.parquet as pq

    o = pq.read_table(f"{sf_dir}/orders.parquet").to_pandas()
    cents = (o["o_totalprice"] * 100).apply(math.floor).astype(object)
    got = {
        r["priority"]: r
        for r in QUERIES["agg_gamma_fit_moments"](spark, sf_dir).collect()
    }
    for pri, grp in cents.groupby(o["o_orderpriority"]):
        n = len(grp)
        s = int(grp.sum())
        q = int(sum(int(c) * int(c) for c in grp))  # unbounded python int
        var_num = n * q - s * s
        r = got[pri]
        assert r["n"] == n
        assert r["mean_cents"] == math.floor(s / n)
        assert r["shape_e6"] == math.floor(
            float(s * s * (n - 1)) / float(n * var_num) * 1000000
        )
        assert r["theta_cents"] == math.floor(
            float(var_num) / float((n - 1) * s)
        )
        # gamma moments sanity: shape*theta ~= mean
        assert (
            abs(r["shape_e6"] / 1e6 * r["theta_cents"] - s / n)
            / (s / n)
            < 0.01
        )


def test_average_precision_referee(spark, sf_dir):
    """Recompute AP from the registered scorer's own (s_e6, label)
    output with sklearn's step convention + the documented per-term
    e12 floors; assert the bucketed plan reproduces the sum exactly,
    and that AP behaves (between prevalence and 1)."""
    from graphsense_datafeed_spark.operators.llm_text import _auc_scored

    rows = _auc_scored(spark, sf_dir).collect()
    from collections import defaultdict

    buckets = defaultdict(lambda: [0, 0])
    for r in rows:
        buckets[r["s_e6"]][0] += 1
        buckets[r["s_e6"]][1] += r["label"]
    n1 = sum(v[1] for v in buckets.values())
    n0 = sum(v[0] - v[1] for v in buckets.values())
    n_cum = tp = ap = 0
    for s in sorted(buckets, reverse=True):
        n_b, n1_b = buckets[s]
        n_cum += n_b
        tp += n1_b
        if n1_b > 0:
            ap += math.floor(
                float(n1_b) * tp / n_cum / n1 * 1000000000000
            )
    row = QUERIES["text_model_average_precision"](spark, sf_dir).collect()[
        0
    ]
    assert row["n1"] == n1 and row["n0"] == n0
    assert row["ap_e12"] == ap
    # AP of any scorer is bounded below by prevalence (random ranking)
    # up to quantization, above by 1
    prevalence_e12 = n1 / (n1 + n0) * 1e12
    assert row["ap_e12"] <= 1000000000000
    assert row["ap_e12"] > prevalence_e12 * 0.5


def test_pair_distance_hist_referee(spark, sf_dir):
    import numpy as np
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pandas()
    t = t[t["vec_id"] < 128].sort_values("vec_id")
    q = np.stack(
        [
            np.floor(np.asarray(v, dtype=np.float64) * 1000000).astype(
                np.int64
            )
            for v in t["embedding"]
        ]
    )
    n2 = (q * q).sum(axis=1)
    from collections import Counter

    want = Counter()
    for i in range(len(q)):
        for j in range(i + 1, len(q)):
            dot = int((q[i] * q[j]).sum())
            sim = float(dot) / math.sqrt(float(n2[i])) / math.sqrt(
                float(n2[j])
            )
            want[math.floor(sim * 20)] += 1
    got = {
        r["bucket"]: r["n_pairs"]
        for r in QUERIES["embed_pair_distance_hist"](spark, sf_dir).collect()
    }
    assert got == dict(want)
    n = len(q)
    assert sum(got.values()) == n * (n - 1) // 2


def test_robust_decompose_referee(spark, sf_dir):
    import pyarrow.parquet as pq

    ev = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type"]
    ).to_pandas()
    ev["d"] = ev["ts"].dt.date
    daily = (
        ev.groupby(["event_type", "d"]).size().rename("v").reset_index()
    )
    got = QUERIES["ts_robust_decompose"](spark, sf_dir).collect()
    want = {}
    for typ, grp in daily.groupby("event_type"):
        grp = grp.sort_values("d").reset_index(drop=True)
        vs = grp["v"].tolist()
        detr = {}
        for i in range(3, len(vs) - 3):
            window = sorted(vs[i - 3 : i + 4])
            trend = window[3]
            detr[grp["d"][i]] = (vs[i], trend, vs[i] - trend)
        by_wd = {}
        for d, (_v, _t, dt_) in detr.items():
            by_wd.setdefault(d.isoweekday() % 7, []).append(dt_)
        seas = {}
        for wd, xs in by_wd.items():
            xs = sorted(xs)
            # percentile_disc(0.5): first element with cum share >= .5
            seas[wd] = xs[(len(xs) - 1) // 2]
        for d, (v, trend, dt_) in detr.items():
            s = seas[d.isoweekday() % 7]
            want[(typ, d)] = (v, trend, s, dt_ - s)
    assert len(got) == len(want)
    for r in got:
        v, trend, s, rem = want[(r["event_type"], r["d"])]
        assert r["v"] == v
        assert r["trend"] == trend
        assert r["seasonal"] == s
        assert r["remainder"] == rem
    # the decomposition must explain something: remainder variance
    # strictly below raw variance
    import numpy as np

    vs = np.array([r["v"] for r in got], dtype=np.float64)
    rems = np.array([r["remainder"] for r in got], dtype=np.float64)
    assert rems.var() < vs.var()


def test_mutual_information_referee(spark, sf_dir):
    import pyarrow.parquet as pq
    from collections import Counter

    ev = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type"]
    ).to_pandas()
    cells = Counter(
        zip(ev["event_type"], ev["ts"].dt.hour // 6)
    )
    n = sum(cells.values())
    r = Counter()
    c = Counter()
    for (t, dp), v in cells.items():
        r[t] += v
        c[dp] += v
    terms = {
        k: math.floor(
            float(v) / n * math.log(float(v) * n / (float(r[k[0]]) * c[k[1]]))
            * 1000000000
        )
        for k, v in cells.items()
    }
    mi_sum = sum(terms.values())
    got = QUERIES["agg_mutual_information"](spark, sf_dir).collect()
    assert len(got) == len(cells)
    for row in got:
        k = (row["event_type"], row["daypart"])
        assert row["c"] == cells[k]
        assert row["term_e9"] == terms[k]
        assert row["mi_sum_e9"] == mi_sum
    # MI is non-negative (up to per-term floor quantization)
    assert mi_sum >= -len(cells)


def test_negative_binomial_fit_referee(spark, sf_dir):
    import pyarrow.parquet as pq

    ev = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type"]
    ).to_pandas()
    ev["d"] = ev["ts"].dt.floor("D")
    daily = ev.groupby(["event_type", "d"]).size()
    got = {
        r["event_type"]: r
        for r in QUERIES["agg_negative_binomial_fit"](
            spark, sf_dir
        ).collect()
    }
    for typ, grp in daily.groupby(level=0):
        vs = [int(x) for x in grp.values]
        n, s, q = len(vs), sum(vs), sum(v * v for v in vs)
        var_num = n * q - s * s
        disp_num = var_num - (n - 1) * s
        row = got[typ]
        assert row["n"] == n
        assert row["mean_e6"] == math.floor(s / n * 1000000)
        assert row["var_e6"] == math.floor(
            float(var_num) / float(n * (n - 1)) * 1000000
        )
        assert row["p_e6"] == math.floor(
            float(s * (n - 1)) / float(var_num) * 1000000
        )
        if disp_num > 0:
            assert row["overdispersed"] == 1
            assert row["r_e6"] == math.floor(
                float(s * s * (n - 1)) / float(n * disp_num) * 1000000
            )
        else:
            assert row["overdispersed"] == 0
            assert row["r_e6"] is None


def test_harmonic_bounded_referee(spark, sf_dir):
    adj: dict[str, set[str]] = {}
    for tx in _txs():
        addrs = sorted(
            {io["address"][0] for io in tx["inputs"] + tx["outputs"]}
        )
        for i, a in enumerate(addrs):
            for b in addrs[i + 1 :]:
                adj.setdefault(a, set()).add(b)
                adj.setdefault(b, set()).add(a)
    got = {
        r["addr"]: r
        for r in QUERIES["graph_harmonic_bounded"](spark, sf_dir).collect()
    }
    assert set(got) == set(adj)
    for v in adj:
        n1 = adj[v]
        n2 = set().union(*(adj[u] for u in n1)) - n1 - {v}
        n3 = (
            set().union(*(adj[u] for u in n2)) - n2 - n1 - {v}
            if n2
            else set()
        )
        r = got[v]
        assert r["n1"] == len(n1)
        assert r["n2"] == len(n2)
        assert r["n3"] == len(n3)
        assert r["harmonic_x6"] == 6 * len(n1) + 3 * len(n2) + 2 * len(n3)


def test_interval_union_coverage_referee(spark, sf_dir):
    import pyarrow.parquet as pq

    li = pq.read_table(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_shipdate", "l_quantity"],
    ).to_pandas()
    li["s"] = li["l_shipdate"]
    import datetime

    li["e"] = [
        s + datetime.timedelta(days=int(q) % 14)
        for s, q in zip(li["l_shipdate"], li["l_quantity"])
    ]
    got = {
        r["suppkey"]: r
        for r in QUERIES["interval_union_coverage"](spark, sf_dir).collect()
    }
    for key, grp in li.groupby("l_suppkey"):
        ivs = sorted(zip(grp["s"], grp["e"]))
        islands = []
        cur_s, cur_e = ivs[0]
        for s, e in ivs[1:]:
            if s > cur_e:
                islands.append((cur_s, cur_e))
                cur_s, cur_e = s, e
            else:
                cur_e = max(cur_e, e)
        islands.append((cur_s, cur_e))
        covered = sum((e - s).days + 1 for s, e in islands)
        span = (islands[-1][1] - islands[0][0]).days + 1
        # NB: max end is always in the last island by construction
        span = (
            max(e for _s, e in islands) - min(s for s, _e in islands)
        ).days + 1
        r = got[key]
        assert r["n_islands"] == len(islands)
        assert r["covered_days"] == covered
        assert r["span_days"] == span
        assert r["gap_days"] == span - covered
        # union never exceeds the naive per-interval sum
        naive = sum((e - s).days + 1 for s, e in zip(grp["s"], grp["e"]))
        assert covered <= naive


def test_model_brier_referee(spark, sf_dir):
    from graphsense_datafeed_spark.operators.llm_text import _auc_scored

    rows = _auc_scored(spark, sf_dir).collect()
    n = len(rows)
    n1 = sum(r["label"] for r in rows)
    ss = sum((r["s_e6"] - r["label"] * 1000000) ** 2 for r in rows)
    ss1 = sum(
        (r["s_e6"] - 1000000) ** 2 for r in rows if r["label"] == 1
    )
    ss0 = sum(r["s_e6"] ** 2 for r in rows if r["label"] == 0)
    got = QUERIES["text_model_brier"](spark, sf_dir).collect()[0]
    assert got["n"] == n and got["n1"] == n1
    assert got["brier_e12"] == math.floor(float(ss) / n)
    assert got["brier_pos_e12"] == math.floor(float(ss1) / n1)
    assert got["brier_neg_e12"] == math.floor(float(ss0) / (n - n1))
    # decomposition consistency: the class-conditional pieces must
    # reassemble the total (up to the three independent floors)
    reassembled = (got["brier_pos_e12"] * n1 + got["brier_neg_e12"] * (n - n1)) / n
    assert abs(reassembled - got["brier_e12"]) <= 2
    assert 0 <= got["brier_e12"] <= 1000000000000


def test_survival_cindex_referee(spark, sf_dir):
    import pyarrow.parquet as pq

    ev = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["ts", "user_id"]
    ).to_pandas()
    ev = ev[ev["user_id"] < 500]
    peru = {}
    for uid, grp in ev.groupby("user_id"):
        lo, hi = grp["ts"].min(), grp["ts"].max()
        t = math.floor((hi - lo).total_seconds() / 3600)
        evf = 1 if hi.day <= 27 else 0
        peru[uid] = (t, evf, len(grp))
    users = list(peru.values())
    conc2 = n_comp = 0
    for ta, eva, sa in users:
        if eva != 1:
            continue
        for tb, _evb, sb in users:
            if ta < tb:
                n_comp += 1
                conc2 += 2 if sa < sb else (1 if sa == sb else 0)
    got = QUERIES["events_survival_cindex"](spark, sf_dir).collect()[0]
    assert got["n_users"] == len(users)
    assert got["n_comparable"] == n_comp
    if n_comp == 0:
        assert got["c_index_e6"] is None
        return
    assert got["c_index_e6"] == math.floor(
        conc2 * 1000000 / (2 * n_comp)
    )


def test_sample_entropy_referee(spark, sf_dir):
    import pyarrow.parquet as pq

    ev = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type"]
    ).to_pandas()
    ev["d"] = ev["ts"].dt.date
    daily = ev.groupby(["event_type", "d"]).size()
    got = {
        r["event_type"]: r
        for r in QUERIES["ts_sample_entropy"](spark, sf_dir).collect()
    }
    for typ, grp in daily.groupby(level=0):
        vs = [int(x) for x in grp.sort_index().values]
        med = sorted(vs)[(len(vs) - 1) // 2]
        r_tol = med // 10
        # length-2 and length-3 template pairs over the lead tape
        t2 = [(vs[i], vs[i + 1]) for i in range(len(vs) - 1)]
        t3 = [
            (vs[i], vs[i + 1], vs[i + 2]) for i in range(len(vs) - 2)
        ]
        b_count = a_count = 0
        for i in range(len(t2)):
            for j in range(i + 1, len(t2)):
                if (
                    abs(t2[i][0] - t2[j][0]) <= r_tol
                    and abs(t2[i][1] - t2[j][1]) <= r_tol
                ):
                    b_count += 1
                    if (
                        i < len(t3)
                        and j < len(t3)
                        and abs(t3[i][2] - t3[j][2]) <= r_tol
                    ):
                        a_count += 1
        row = got[typ]
        assert row["r_tol"] == r_tol
        assert row["b_count"] == b_count
        assert row["a_count"] == a_count
        if a_count > 0 and b_count > 0:
            assert row["sampen_e6"] == math.floor(
                -math.log(a_count / b_count) * 1000000
            )
            assert row["sampen_e6"] >= 0  # A <= B structurally
        else:
            assert row["sampen_e6"] is None


def test_randomized_response_referee(spark, sf_dir):
    import hashlib

    import pyarrow.parquet as pq

    ev = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["event_id", "event_type"]
    ).to_pandas()
    types = sorted(ev["event_type"].unique())
    k = len(types)
    n = len(ev)

    def coin(eid, salt):
        return int(
            hashlib.md5(f"{eid}{salt}".encode()).hexdigest()[:4], 16
        )

    from collections import Counter

    rep = Counter()
    tru = Counter(ev["event_type"])
    for eid, typ in zip(ev["event_id"], ev["event_type"]):
        if coin(eid, ":rr") % 4 < 3:
            rep[typ] += 1
        else:
            rep[types[coin(eid, ":alt") % k]] += 1
    got = {
        r["event_type"]: r
        for r in QUERIES["anon_randomized_response_freq"](
            spark, sf_dir
        ).collect()
    }
    assert set(got) == set(rep)
    for typ, r in got.items():
        assert r["reported_count"] == rep[typ]
        assert r["true_count"] == tru[typ]
        est = math.floor(
            (4 * k * rep[typ] - n) * 1000000 / (3 * k * n)
        )
        assert r["est_share_e6"] == est
        assert r["true_share_e6"] == math.floor(tru[typ] * 1000000 / n)
        # debiased estimate recovers the true share within RR noise:
        # SE ~ sqrt(k/n)/3; allow 5 SE in e6 units
        se_e6 = math.sqrt(k / n) / 3 * 1e6 * 5
        assert abs(r["est_share_e6"] - r["true_share_e6"]) < se_e6 + 20000


def test_lin_ccc_referee(spark, sf_dir):
    import pyarrow.parquet as pq

    ev = pq.read_table(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "value", "props"],
    ).to_pandas()
    ev["x"] = ev["value"].apply(lambda v: math.floor(v * 10000))
    ev["y"] = ev["props"].apply(lambda p: int(json.loads(p)["k"]))
    got = {
        r["event_type"]: r
        for r in QUERIES["agg_lin_ccc"](spark, sf_dir).collect()
    }
    for typ, grp in ev.groupby("event_type"):
        xs = [int(v) for v in grp["x"]]
        ys = [int(v) for v in grp["y"]]
        n = len(xs)
        sx, sy = sum(xs), sum(ys)
        sxx = sum(v * v for v in xs)
        syy = sum(v * v for v in ys)
        sxy = sum(a * b for a, b in zip(xs, ys))
        num = 2 * (n * sxy - sx * sy)
        den = (n * sxx - sx * sx) + (n * syy - sy * sy) + (sx - sy) ** 2
        r = got[typ]
        assert r["n"] == n
        assert r["ccc_e6"] == math.floor(float(num) / float(den) * 1000000)
        # |CCC| <= |Pearson r| <= 1 always
        assert -1000000 <= r["ccc_e6"] <= 1000000


def test_pinball_loss_referee(spark, sf_dir):
    import pyarrow.parquet as pq

    ev = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type"]
    ).to_pandas()
    ev["d"] = ev["ts"].dt.date
    daily = ev.groupby(["event_type", "d"]).size()
    got = {
        r["event_type"]: r
        for r in QUERIES["ts_pinball_loss"](spark, sf_dir).collect()
    }
    for typ, grp in daily.groupby(level=0):
        train = sorted(
            int(v) for (t, d), v in grp.items() if d.day <= 21
        )
        test = [int(v) for (t, d), v in grp.items() if d.day > 21]
        # quantile_disc(0.9): smallest element whose cumulative
        # share >= 0.9 -> the ceil(0.9*n)-th order statistic
        q90 = train[int(math.ceil(0.9 * len(train))) - 1]
        losses = [
            9 * (v - q90) if v >= q90 else q90 - v for v in test
        ]
        r = got[typ]
        assert r["q90"] == q90
        assert r["n_test"] == len(test)
        assert r["pinball_x10"] == sum(losses)
        assert r["mean_pinball_e6"] == math.floor(
            sum(losses) * 100000 / len(test)
        )


def test_markov_absorption_referee(spark, sf_dir):
    """Driver-side pure-python integer simulation of the truncated
    absorption walk with the identical e12 floors — bit-for-bit."""
    import pyarrow.parquet as pq

    from graphsense_datafeed_spark.operators.timeseries import (
        _ABS_ITERS,
        _ABS_STATE,
        _MKV_SCALE,
    )

    ev = (
        pq.read_table(
            f"{sf_dir}/events.parquet",
            columns=["user_id", "ts", "event_id", "event_type"],
        )
        .to_pandas()
        .sort_values(["user_id", "ts", "event_id"])
    )
    from collections import Counter, defaultdict

    counts = Counter()
    for _uid, grp in ev.groupby("user_id"):
        types = grp["event_type"].tolist()
        for a, b in zip(types, types[1:]):
            counts[(a, b)] += 1
    row_tot = Counter()
    for (f, t), n in counts.items():
        row_tot[f] += n
    s = _MKV_SCALE
    q = defaultdict(dict)
    starts = set()
    for (f, t), n in counts.items():
        if f == _ABS_STATE:
            continue
        starts.add(f)
        if t != _ABS_STATE:
            q[f][t] = math.floor(float(n) * float(s) / float(row_tot[f]))
    want = {}
    for st0 in starts:
        m = {st0: s}
        e_steps = 0
        for _k in range(_ABS_ITERS):
            e_steps += sum(m.values())
            nxt = defaultdict(int)
            for f, r in m.items():
                for t, p in q.get(f, {}).items():
                    nxt[t] += math.floor(float(r) * float(p) / float(s))
            m = dict(nxt)
        want[st0] = (e_steps, s - sum(m.values()))
    got = {
        r["start_type"]: r
        for r in QUERIES["events_markov_absorption"](
            spark, sf_dir
        ).collect()
    }
    assert set(got) == set(want)
    for st0, (e_steps, absorbed) in want.items():
        assert got[st0]["expected_steps_e12"] == e_steps
        assert got[st0]["absorbed_e12"] == absorbed
        # bounded by the truncation horizon and the probability axioms
        assert 0 < got[st0]["expected_steps_e12"] <= _ABS_ITERS * s
        assert 0 <= got[st0]["absorbed_e12"] <= s


def test_jarque_bera_referee(spark, sf_dir):
    import pyarrow.parquet as pq

    ev = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    ).to_pandas()
    ev["x"] = ev["value"].apply(lambda v: math.floor(v * 10000))
    got = {
        r["event_type"]: r
        for r in QUERIES["agg_jarque_bera"](spark, sf_dir).collect()
    }
    for typ, grp in ev.groupby("event_type"):
        xs = [int(v) for v in grp["x"]]
        n = len(xs)
        s1 = sum(xs)
        s2 = sum(v * v for v in xs)
        s3 = sum(v**3 for v in xs)
        s4 = sum(v**4 for v in xs)
        a2 = float(n) * float(s2) - float(s1) * float(s1)
        a3 = (
            float(n) * float(n) * float(s3)
            - 3.0 * float(n) * float(s1) * float(s2)
            + 2.0 * float(s1) * float(s1) * float(s1)
        )
        a4 = (
            float(n) * float(n) * float(n) * float(s4)
            - 4.0 * float(n) * float(n) * float(s1) * float(s3)
            + 6.0 * float(n) * float(s1) * float(s1) * float(s2)
            - 3.0 * float(s1) * float(s1) * float(s1) * float(s1)
        )
        skew = a3 / a2**1.5
        kurt = a4 / (a2 * a2)
        jb = n * (skew * skew / 6.0 + (kurt - 3.0) * (kurt - 3.0) / 24.0)
        r = got[typ]
        assert r["n"] == n
        assert r["skew_e6"] == math.floor(skew * 1000000)
        assert r["kurt_e6"] == math.floor(kurt * 1000000)
        assert r["jb_e6"] == math.floor(jb * 1000000)
        # cross-check against numpy's independent moment path
        import numpy as np

        arr = np.array(xs, dtype=np.float64)
        assert abs(skew - ((arr - arr.mean()) ** 3).mean()
                   / arr.var() ** 1.5) < 1e-6


def test_benford_second_digit_referee(spark, sf_dir):
    import pyarrow.parquet as pq
    from collections import Counter

    from graphsense_datafeed_spark.operators.aggregates import _BENFORD2_E9

    o = pq.read_table(
        f"{sf_dir}/orders.parquet", columns=["o_totalprice"]
    ).to_pandas()
    # mirror the ROUND lane (banker's rounding irrelevant: cents are
    # .5-free after *100 of 2-decimal prices, but round() matches anyway)
    digits = Counter()
    for v in o["o_totalprice"]:
        s = str(round(v * 100))
        if len(s) >= 2:
            digits[int(s[1])] += 1
    n = sum(digits.values())
    # the literal table matches a fresh Python recompute
    for k, e in enumerate(_BENFORD2_E9):
        want = math.floor(
            sum(math.log10(1 + 1 / (10 * j + k)) for j in range(1, 10))
            * 10**9
        )
        assert e == want
    got = {
        r["digit2"]: r
        for r in QUERIES["agg_benford_second_digit"](
            spark, sf_dir
        ).collect()
    }
    assert set(got) == set(digits)
    chi2 = 0
    for k, cnt in digits.items():
        p = _BENFORD2_E9[k] / 1000000000.0
        dev = math.floor(
            (cnt - n * p) * (cnt - n * p) / (n * p) * 1000000
        )
        assert got[k]["o"] == cnt
        assert got[k]["exp_e9"] == _BENFORD2_E9[k]
        assert got[k]["dev_e6"] == dev
        chi2 += dev
    for r in got.values():
        assert r["chi2_sum_e6"] == chi2


def test_mutual_best_match_referee(spark, sf_dir):
    import pyarrow.parquet as pq

    li = pq.read_table(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice"],
    ).to_pandas()
    o = pq.read_table(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    ).to_pandas()
    li["cents"] = li["l_extendedprice"].apply(lambda v: round(v * 100))
    merged = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    spend = (
        merged.groupby(["o_custkey", "l_suppkey"])["cents"]
        .sum()
        .reset_index()
    )
    best_supp = {}
    best_cust = {}
    for _i, row in spend.iterrows():
        c, s, v = (
            int(row["o_custkey"]),
            int(row["l_suppkey"]),
            int(row["cents"]),
        )
        if c not in best_supp or (v, -s) > (
            best_supp[c][1],
            -best_supp[c][0],
        ):
            best_supp[c] = (s, v)
        if s not in best_cust or (v, -c) > (
            best_cust[s][1],
            -best_cust[s][0],
        ):
            best_cust[s] = (c, v)
    want = {
        (c, s_v[0]): s_v[1]
        for c, s_v in best_supp.items()
        if best_cust.get(s_v[0], (None,))[0] == c
    }
    got = QUERIES["join_mutual_best_match"](spark, sf_dir).collect()
    assert {(r["custkey"], r["suppkey"]) for r in got} == set(want)
    for r in got:
        assert r["pair_cents"] == want[(r["custkey"], r["suppkey"])]
    # mutuality: each side appears at most once in the match set
    assert len({r["custkey"] for r in got}) == len(got)
    assert len({r["suppkey"] for r in got}) == len(got)


def test_tukey_hsd_referee(spark, sf_dir):
    import pyarrow.parquet as pq

    ev = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    ).to_pandas()
    ev["x"] = ev["value"].apply(lambda v: math.floor(v * 10000))
    groups = {
        t: [int(v) for v in g["x"]] for t, g in ev.groupby("event_type")
    }
    n_tot = sum(len(v) for v in groups.values())
    k = len(groups)
    ssw = sum(
        float(len(xs) * sum(v * v for v in xs) - sum(xs) ** 2)
        / float(len(xs))
        for xs in groups.values()
    )
    msw = ssw / (n_tot - k)
    got = {
        (r["type_a"], r["type_b"]): r
        for r in QUERIES["agg_tukey_hsd"](spark, sf_dir).collect()
    }
    types = sorted(groups)
    assert len(got) == k * (k - 1) // 2
    for i, ta in enumerate(types):
        for tb in types[i + 1 :]:
            xa, xb = groups[ta], groups[tb]
            gap = abs(sum(xa) / len(xa) - sum(xb) / len(xb))
            se = math.sqrt(msw / 2.0 * (1.0 / len(xa) + 1.0 / len(xb)))
            r = got[(ta, tb)]
            assert r["q_e6"] == math.floor(gap / se * 1000000)
            assert r["significant"] == (1 if gap / se > 3.858 else 0)


def test_correlation_matrix_referee(spark, sf_dir):
    import numpy as np
    import pyarrow.parquet as pq

    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    li = pq.read_table(
        f"{sf_dir}/lineitem.parquet", columns=cols
    ).to_pandas()
    x = {
        c: [math.floor(v * 10000) for v in li[c]] for c in cols
    }
    n = len(li)
    got = {
        (r["col_a"], r["col_b"]): r
        for r in QUERIES["profile_numeric_correlation_matrix"](
            spark, sf_dir
        ).collect()
    }
    assert len(got) == 6
    for i, ca in enumerate(cols):
        for cb in cols[i + 1 :]:
            xa, xb = x[ca], x[cb]
            num = float(
                n * sum(a * b for a, b in zip(xa, xb))
                - sum(xa) * sum(xb)
            )
            da = math.sqrt(
                float(n * sum(a * a for a in xa) - sum(xa) ** 2)
            )
            db = math.sqrt(
                float(n * sum(b * b for b in xb) - sum(xb) ** 2)
            )
            r = got[(ca, cb)]
            assert r["n"] == n
            assert r["pearson_e6"] == math.floor(num / da / db * 1000000)
            # cross-check against numpy's own corrcoef
            np_r = np.corrcoef(np.array(xa, float), np.array(xb, float))[
                0, 1
            ]
            assert abs(r["pearson_e6"] / 1e6 - np_r) < 1e-4


def test_exposure_fatigue_referee(spark, sf_dir):
    import pyarrow.parquet as pq
    from collections import defaultdict

    ev = (
        pq.read_table(
            f"{sf_dir}/events.parquet",
            columns=["user_id", "ts", "event_id", "event_type"],
        )
        .to_pandas()
        .sort_values(["user_id", "ts", "event_id"])
    )
    agg = defaultdict(lambda: [0, 0])
    for _uid, grp in ev.groupby("user_id"):
        rows = list(zip(grp["ts"], grp["event_type"]))
        exposure = 0
        for i, (ts, typ) in enumerate(rows):
            if typ != "view":
                continue
            exposure += 1
            if exposure == 1:
                b = "01"
            elif exposure == 2:
                b = "02"
            elif exposure <= 5:
                b = "03-05"
            elif exposure <= 10:
                b = "06-10"
            else:
                b = "11+"
            clicked = any(
                t2 == "click"
                and (ts2 - ts).total_seconds() * 1000000 <= 3600000000
                for ts2, t2 in rows[i + 1 :]
            )
            agg[b][0] += 1
            agg[b][1] += 1 if clicked else 0
    got = {
        r["exposure_bucket"]: r
        for r in QUERIES["events_exposure_fatigue"](spark, sf_dir).collect()
    }
    assert set(got) == set(agg)
    for b, (n, c) in agg.items():
        assert got[b]["n_views"] == n
        assert got[b]["n_clicked"] == c
        assert got[b]["ctr_e6"] == math.floor(c * 1000000 / n)


def test_knn_margin_referee(spark, sf_dir):
    import numpy as np
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pandas()
    t = t.sort_values("vec_id").reset_index(drop=True)
    q = np.stack(
        [
            np.floor(np.asarray(v, dtype=np.float64) * 1000000).astype(
                np.int64
            )
            for v in t["embedding"]
        ]
    )
    ids = t["vec_id"].to_numpy()
    n2 = (q * q).sum(axis=1).astype(np.float64)
    got = {
        r["vec_id"]: r
        for r in QUERIES["embed_knn_margin_audit"](spark, sf_dir).collect()
    }
    anchors = [i for i, vid in enumerate(ids) if vid < 64]
    assert set(got) == {int(ids[i]) for i in anchors}
    for i in anchors:
        sims = []
        for j in range(len(ids)):
            if ids[j] == ids[i]:
                continue
            dot = float((q[i] * q[j]).sum())
            s = math.floor(
                dot / math.sqrt(n2[i]) / math.sqrt(n2[j]) * 1000000
            )
            sims.append((s, int(ids[j])))
        sims.sort(key=lambda p: (-p[0], p[1]))
        r = got[int(ids[i])]
        assert r["best_id"] == sims[0][1]
        assert r["sim1_e6"] == sims[0][0]
        assert r["margin_e6"] == sims[0][0] - sims[1][0]
        assert r["margin_e6"] >= 0


def test_retention_halflife_referee(spark, sf_dir):
    import pyarrow.parquet as pq

    ev = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    ).to_pandas()
    ev["d"] = ev["ts"].dt.date
    d0 = ev.groupby("user_id")["d"].min()
    offsets = {
        (uid, (d - d0[uid]).days)
        for uid, d in zip(ev["user_id"], ev["d"])
    }
    from collections import Counter

    ret = Counter(k for _uid, k in offsets if k >= 1)
    pts = [(k, math.floor(math.log(r) * 1000000000)) for k, r in ret.items()]
    n = len(pts)
    sk = sum(k for k, _l in pts)
    sl = sum(l for _k, l in pts)
    skl = sum(k * l for k, l in pts)
    skk = sum(k * k for k, _l in pts)
    num, den = n * skl - sk * sl, n * skk - sk * sk
    slope = float(num) / float(den)
    got = QUERIES["events_retention_halflife"](spark, sf_dir).collect()[0]
    assert got["n"] == n
    assert got["slope_e9"] == math.floor(slope)
    if num < 0:
        want = math.floor(
            math.log(2.0) * 1000000 / (-slope / 1000000000.0)
        )
        assert got["halflife_days_e6"] == want
        # decaying retention: half-life positive and finite
        assert got["halflife_days_e6"] > 0
    else:
        assert got["halflife_days_e6"] is None


def test_stratified_effect_referee(spark, sf_dir):
    import pyarrow.parquet as pq

    ev = pq.read_table(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts", "value"],
    ).to_pandas()
    ev["t"] = ev["ts"].apply(
        lambda ts: 1 if ts.isoweekday() % 7 in (0, 6) else 0
    )
    ev["y"] = ev["value"].apply(lambda v: math.floor(v * 10000))
    got = {
        r["event_type"]: r
        for r in QUERIES["events_stratified_effect"](
            spark, sf_dir
        ).collect()
    }
    n = len(ev)
    s1t = int(ev.loc[ev["t"] == 1, "y"].sum())
    s0t = int(ev.loc[ev["t"] == 0, "y"].sum())
    n1t = int((ev["t"] == 1).sum())
    n0t = int((ev["t"] == 0).sum())
    crude = math.floor((s1t / n1t - s0t / n0t) * 100000)
    ate = 0
    for typ, grp in ev.groupby("event_type"):
        n_s = len(grp)
        n1 = int((grp["t"] == 1).sum())
        n0 = n_s - n1
        s1 = int(grp.loc[grp["t"] == 1, "y"].sum())
        s0 = int(grp.loc[grp["t"] == 0, "y"].sum())
        gap = s1 / n1 - s0 / n0
        term = math.floor(float(n_s) * gap / n * 100000)
        r = got[typ]
        assert r["n_s"] == n_s and r["n1"] == n1 and r["n0"] == n0
        assert r["gap_e9"] == math.floor(gap * 100000)
        assert r["term_e9"] == term
        assert r["crude_gap_e9"] == crude
        ate += term
    for r in got.values():
        assert r["ate_e9"] == ate


def test_woe_iv_referee(spark, sf_dir):
    import pyarrow.parquet as pq
    from collections import defaultdict

    ev = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    ).to_pandas()
    bins = defaultdict(lambda: [0, 0])
    for typ, v in zip(ev["event_type"], ev["value"]):
        b = math.floor(v / 10)
        bins[b][0 if typ == "purchase" else 1] += 1
    pos_tot = sum(v[0] for v in bins.values())
    neg_tot = sum(v[1] for v in bins.values())
    nb = len(bins)
    got = {
        r["bucket"]: r
        for r in QUERIES["agg_woe_information_value"](
            spark, sf_dir
        ).collect()
    }
    assert set(got) == set(bins)
    iv = 0
    terms = {}
    for b, (np_, nn) in bins.items():
        pp = (np_ + 0.5) / (pos_tot + 0.5 * nb)
        pn = (nn + 0.5) / (neg_tot + 0.5 * nb)
        woe = math.log(pp / pn)
        terms[b] = (
            math.floor(woe * 1000000000),
            math.floor((pp - pn) * woe * 1000000000),
        )
        iv += terms[b][1]
    for b, r in got.items():
        assert r["n_pos"] == bins[b][0] and r["n_neg"] == bins[b][1]
        assert r["woe_e9"] == terms[b][0]
        assert r["iv_term_e9"] == terms[b][1]
        assert r["iv_sum_e9"] == iv
    # each IV term is non-negative up to floor quantization
    assert all(r["iv_term_e9"] >= -1 for r in got.values())


def test_hill_numbers_referee(spark, sf_dir):
    import pyarrow.parquet as pq
    from collections import Counter

    ev = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["event_type"]
    ).to_pandas()
    counts = Counter(ev["event_type"])
    n = sum(counts.values())
    k = len(counts)
    h_e9 = sum(
        math.floor(-(c / n) * math.log(c / n) * 1000000000)
        for c in counts.values()
    )
    c2 = sum(c * c for c in counts.values())
    got = QUERIES["agg_hill_numbers_diversity"](spark, sf_dir).collect()[0]
    assert got["hill0"] == k
    assert got["shannon_h_e9"] == h_e9
    assert got["hill1_e6"] == math.floor(
        math.exp(h_e9 / 1000000000.0) * 1000000
    )
    assert got["hill2_e6"] == math.floor(float(n * n) / float(c2) * 1000000)
    # Hill ordering: 0D >= 1D >= 2D (diversity declines with order q)
    assert got["hill0"] * 1000000 >= got["hill1_e6"] >= got["hill2_e6"]


def test_friedman_page_referee(spark, sf_dir):
    import pyarrow.parquet as pq
    from collections import Counter, defaultdict

    ev = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["ts"]
    ).to_pandas()
    cells = Counter(
        (ts.date(), ts.hour // 6) for ts in ev["ts"]
    )
    by_block = defaultdict(dict)
    for (blk, trt), c in cells.items():
        by_block[blk][trt] = c
    r2_sum = Counter()
    n_blocks = Counter()
    for blk, row in by_block.items():
        vals = sorted(row.values())
        for trt, c in row.items():
            lo = sum(1 for v in vals if v < c)
            ties = sum(1 for v in vals if v == c)
            r2 = 2 * (lo + 1) + ties - 1
            r2_sum[trt] += r2
            n_blocks[trt] += 1
    n = max(n_blocks.values())
    k = len(r2_sum)
    sr2 = sum(v * v for v in r2_sum.values())
    l2 = sum(t * v for t, v in r2_sum.items())
    chi2 = 3.0 * sr2 / (n * k * (k + 1)) - 3.0 * n * (k + 1)
    z = (
        l2 / 2 + n * k * (k + 1) / 2 - n * k * (k + 1) * (k + 1) / 4
    ) / math.sqrt(n * k * k * (k + 1) * (k * k - 1) / 144.0)
    got = {
        r["daypart"]: r
        for r in QUERIES["agg_friedman_page_trend"](spark, sf_dir).collect()
    }
    assert set(got) == set(r2_sum)
    for trt, r in got.items():
        assert r["r2_sum"] == r2_sum[trt]
        assert r["chi2_f_e6"] == math.floor(chi2 * 1000000)
        assert r["page_l2"] == l2
        assert r["page_z_e6"] == math.floor(z * 1000000)
    # rank sums over all treatments total n_blocks * k(k+1) (doubled)
    assert sum(r2_sum.values()) == n * k * (k + 1)


def test_bartlett_referee(spark, sf_dir):
    import pyarrow.parquet as pq

    ev = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    ).to_pandas()
    ev["x"] = ev["value"].apply(lambda v: math.floor(v * 10000))
    lnvs = []
    ssw = 0.0
    invsum = 0.0
    n_tot = 0
    for _typ, grp in sorted(ev.groupby("event_type"), key=lambda p: p[0]):
        xs = [int(v) for v in grp["x"]]
        n = len(xs)
        a = n * sum(v * v for v in xs) - sum(xs) ** 2
        lnv = math.floor(math.log(float(a) / n / (n - 1)) * 1000000000)
        lnvs.append((n, lnv))
        ssw += float(a) / n
        invsum += 1.0 / (n - 1)
        n_tot += n
    k = len(lnvs)
    w_ln = sum((n - 1) * lnv for n, lnv in lnvs)
    t = (
        (n_tot - k) * math.log(ssw / (n_tot - k)) - w_ln / 1000000000.0
    ) / (1.0 + (invsum - 1.0 / (n_tot - k)) / (3.0 * (k - 1.0)))
    got = QUERIES["agg_bartlett_test"](spark, sf_dir).collect()[0]
    assert got["k"] == k and got["n_tot"] == n_tot
    assert got["t_e6"] == math.floor(t * 1000000)
    # Bartlett T is non-negative (Jensen gap) up to quantization
    assert got["t_e6"] >= -1


def test_markov_order_test_referee(spark, sf_dir):
    import pyarrow.parquet as pq
    from collections import Counter

    ev = (
        pq.read_table(
            f"{sf_dir}/events.parquet",
            columns=["user_id", "ts", "event_id", "event_type"],
        )
        .to_pandas()
        .sort_values(["user_id", "ts", "event_id"])
    )
    triples = Counter()
    for _uid, grp in ev.groupby("user_id"):
        t = grp["event_type"].tolist()
        for a, b, c in zip(t, t[1:], t[2:]):
            triples[(a, b, c)] += 1
    n_ab = Counter()
    n_bc = Counter()
    n_b = Counter()
    for (a, b, c), n in triples.items():
        n_ab[(a, b)] += n
        n_bc[(b, c)] += n
        n_b[b] += n
    g2 = sum(
        math.floor(
            2.0
            * n
            * math.log(
                float(n) * n_b[b] / (float(n_ab[(a, b)]) * n_bc[(b, c)])
            )
            * 1000000000
        )
        for (a, b, c), n in triples.items()
    )
    m = len({b for (_a, b, _c) in triples})
    got = QUERIES["events_markov_order_test"](spark, sf_dir).collect()[0]
    assert got["n_states"] == m
    assert got["n_triples"] == sum(triples.values())
    assert got["g2_e9"] == g2
    assert got["df"] == m * (m - 1) * (m - 1)
    # G2 is non-negative up to per-cell floor quantization
    assert got["g2_e9"] >= -len(triples)


def test_shingle_sensitivity_referee(spark, sf_dir):
    import pyarrow.parquet as pq

    d = pq.read_table(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "source", "text"],
    ).to_pandas()
    d = d[d["doc_id"] < 80]
    got = {
        r["k"]: r
        for r in QUERIES["dedup_shingle_sensitivity"](
            spark, sf_dir
        ).collect()
    }
    assert set(got) == {3, 5, 7}
    means = {}
    for k in (3, 5, 7):
        sets = {}
        for _i, row in d.iterrows():
            ws = row["text"].split(" ")
            sets[row["doc_id"]] = (
                row["source"],
                {
                    " ".join(ws[i : i + k])
                    for i in range(len(ws) - k + 1)
                },
            )
        ids = sorted(sets)
        js = []
        for i, da in enumerate(ids):
            for db in ids[i + 1 :]:
                if sets[da][0] != sets[db][0]:
                    continue
                c = len(sets[da][1] & sets[db][1])
                if c == 0:
                    continue
                u = len(sets[da][1]) + len(sets[db][1]) - c
                js.append(math.floor(c / u * 1000000))
        r = got[k]
        assert r["n_pairs"] == len(js)
        if js:
            assert r["mean_j_e6"] == math.floor(sum(js) / len(js))
        else:
            assert r["mean_j_e6"] is None
        assert r["n_ge_half"] == sum(j >= 500000 for j in js)
        means[k] = r["mean_j_e6"] if js else 0
    # similarity decays with shingle size on any real corpus
    assert means[3] >= means[5] >= means[7]


def test_knn_loo_accuracy_referee(spark, sf_dir):
    import numpy as np
    import pyarrow.parquet as pq
    from collections import Counter

    t = (
        pq.read_table(f"{sf_dir}/embeddings.parquet")
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    q = np.stack(
        [
            np.floor(np.asarray(v, dtype=np.float64) * 1000000).astype(
                np.int64
            )
            for v in t["embedding"]
        ]
    )
    ids = t["vec_id"].to_numpy()
    labels = t["label"].to_numpy()
    n2 = (q * q).sum(axis=1).astype(np.float64)
    n_correct = n_queries = 0
    for i in range(len(ids)):
        if ids[i] >= 128:
            continue
        sims = []
        for j in range(len(ids)):
            if ids[j] == ids[i]:
                continue
            s = math.floor(
                float((q[i] * q[j]).sum())
                / math.sqrt(n2[i])
                / math.sqrt(n2[j])
                * 1000000
            )
            sims.append((-s, int(ids[j]), int(labels[j])))
        sims.sort()
        votes = Counter(lab for _s, _vid, lab in sims[:5])
        pred = min(votes.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        n_queries += 1
        n_correct += 1 if pred == int(labels[i]) else 0
    got = QUERIES["embed_knn_loo_accuracy"](spark, sf_dir).collect()[0]
    assert got["n_queries"] == n_queries
    assert got["n_correct"] == n_correct
    assert got["accuracy_e6"] == math.floor(
        n_correct * 1000000 / n_queries
    )


def test_vocab_coverage_curve_referee(spark, sf_dir):
    import pyarrow.parquet as pq
    from collections import Counter

    d = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["text"]
    ).to_pandas()
    vocab = Counter()
    for txt in d["text"]:
        for tok in txt.lower().split(" "):
            if tok:
                vocab[tok] += 1
    total = sum(vocab.values())
    ordered = sorted(vocab.items(), key=lambda kv: (-kv[1], kv[0]))
    got = {
        r["top_n"]: r
        for r in QUERIES["text_vocab_coverage_curve"](
            spark, sf_dir
        ).collect()
    }
    assert set(got) == {10, 100, 1000}
    prev = 0
    for n in (10, 100, 1000):
        cov = sum(c for _t, c in ordered[:n])
        r = got[n]
        assert r["vocab_size"] == len(vocab)
        assert r["total_tokens"] == total
        assert r["covered_tokens"] == cov
        assert r["coverage_e6"] == math.floor(cov * 1000000 / total)
        assert r["coverage_e6"] >= prev  # curve is monotone
        prev = r["coverage_e6"]


def test_degree_centralization_referee(spark, sf_dir):
    adj: dict[str, set[str]] = {}
    for tx in _txs():
        addrs = sorted(
            {io["address"][0] for io in tx["inputs"] + tx["outputs"]}
        )
        for i, a in enumerate(addrs):
            for b in addrs[i + 1 :]:
                adj.setdefault(a, set()).add(b)
                adj.setdefault(b, set()).add(a)
    degs = [len(v) for v in adj.values()]
    n, dmax, dsum = len(degs), max(degs), sum(degs)
    got = QUERIES["graph_degree_centralization"](spark, sf_dir).collect()[
        0
    ]
    assert got["n"] == n and got["dmax"] == dmax
    assert got["gap_sum"] == n * dmax - dsum
    assert got["centralization_e6"] == math.floor(
        (n * dmax - dsum) / (n - 1) / (n - 2) * 1000000
    )
    assert 0 <= got["centralization_e6"] <= 1000000


def test_model_mcc_referee(spark, sf_dir):
    from graphsense_datafeed_spark.operators.llm_text import _auc_scored

    rows = _auc_scored(spark, sf_dir).collect()
    tp = sum(1 for r in rows if r["s_e6"] >= 500000 and r["label"] == 1)
    fp = sum(1 for r in rows if r["s_e6"] >= 500000 and r["label"] == 0)
    tn = sum(1 for r in rows if r["s_e6"] < 500000 and r["label"] == 0)
    fn = sum(1 for r in rows if r["s_e6"] < 500000 and r["label"] == 1)
    got = QUERIES["text_model_mcc"](spark, sf_dir).collect()[0]
    assert (got["tp"], got["fp"], got["tn"], got["fn"]) == (
        tp,
        fp,
        tn,
        fn,
    )
    if (tp + fp) * (tp + fn) > 0 and (tn + fp) * (tn + fn) > 0:
        mcc = (
            float(tp * tn - fp * fn)
            / math.sqrt(tp + fp)
            / math.sqrt(tp + fn)
            / math.sqrt(tn + fp)
            / math.sqrt(tn + fn)
        )
        assert got["mcc_e6"] == math.floor(mcc * 1000000)
        assert -1000000 <= got["mcc_e6"] <= 1000000
    else:
        assert got["mcc_e6"] is None


def test_haar_energy_referee(spark, sf_dir):
    import pyarrow.parquet as pq

    ev = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type"]
    ).to_pandas()
    ev["d"] = ev["ts"].dt.date
    daily = ev.groupby(["event_type", "d"]).size()
    got = {
        r["event_type"]: r
        for r in QUERIES["ts_haar_energy"](spark, sf_dir).collect()
    }
    for typ, grp in daily.groupby(level=0):
        vs = [int(x) for x in grp.sort_index().values]
        d1 = [
            vs[2 * i] - vs[2 * i + 1] for i in range(len(vs) // 2)
        ]
        s2 = [
            vs[2 * i] + vs[2 * i + 1] for i in range(len(vs) // 2)
        ]
        d2 = [
            s2[2 * i] - s2[2 * i + 1] for i in range(len(s2) // 2)
        ]
        r = got[typ]
        assert r["n1"] == len(d1)
        assert r["energy1_x4"] == sum(x * x for x in d1)
        assert r["n2"] == len(d2)
        assert r["energy2_x16"] == sum(x * x for x in d2)
        assert r["ratio21_e6"] == math.floor(
            sum(x * x for x in d2) / 4 / sum(x * x for x in d1) * 1000000
        )


def test_regime_run_lengths_referee(spark, sf_dir):
    import pyarrow.parquet as pq

    ev = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type"]
    ).to_pandas()
    ev["d"] = ev["ts"].dt.date
    daily = ev.groupby(["event_type", "d"]).size()
    got = {
        (r["event_type"], r["state"]): r
        for r in QUERIES["ts_regime_run_lengths"](spark, sf_dir).collect()
    }
    n_keys = 0
    for typ, grp in daily.groupby(level=0):
        vs = [int(x) for x in grp.sort_index().values]
        med = sorted(vs)[(len(vs) - 1) // 2]
        states = [1 if v >= med else 0 for v in vs]
        runs = {0: [], 1: []}
        cur_s, cur_len = states[0], 1
        for s in states[1:]:
            if s == cur_s:
                cur_len += 1
            else:
                runs[cur_s].append(cur_len)
                cur_s, cur_len = s, 1
        runs[cur_s].append(cur_len)
        for st in (0, 1):
            if not runs[st]:
                continue
            n_keys += 1
            r = got[(typ, st)]
            assert r["n_runs"] == len(runs[st])
            assert r["n_days"] == sum(runs[st])
            assert r["max_len"] == max(runs[st])
            assert r["mean_len_e6"] == math.floor(
                sum(runs[st]) * 1000000 / len(runs[st])
            )
    assert len(got) == n_keys


def test_circadian_entropy_referee(spark, sf_dir):
    import pyarrow.parquet as pq
    from collections import Counter

    ev = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    ).to_pandas()
    cells = Counter(zip(ev["user_id"], ev["ts"].dt.hour))
    peruser_n = Counter()
    for (uid, _h), c in cells.items():
        peruser_n[uid] += c
    h_e9 = Counter()
    for (uid, _h), c in cells.items():
        p = c / peruser_n[uid]
        h_e9[uid] += math.floor(-p * math.log(p) * 1000000000)
    buckets = Counter()
    bucket_events = Counter()
    for uid, h in h_e9.items():
        b = h * 10 // 3178053830
        buckets[b] += 1
        bucket_events[b] += peruser_n[uid]
    got = {
        r["decile"]: r
        for r in QUERIES["events_circadian_entropy"](
            spark, sf_dir
        ).collect()
    }
    assert set(got) == set(buckets)
    for b, n in buckets.items():
        assert got[b]["n_users"] == n
        assert got[b]["n_events"] == bucket_events[b]
    # entropy lives in [0, ln 24): all deciles in range
    assert all(0 <= b <= 9 for b in got)


def test_mix_drift_weekly_referee(spark, sf_dir):
    import pyarrow.parquet as pq
    from collections import Counter

    ev = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type"]
    ).to_pandas()
    cells = Counter(
        (ts.isocalendar()[1], t)
        for ts, t in zip(ev["ts"], ev["event_type"])
    )
    n = sum(cells.values())
    n_w = Counter()
    n_t = Counter()
    for (wk, t), c in cells.items():
        n_w[wk] += c
        n_t[t] += c
    chi2 = Counter()
    for (wk, t), c in cells.items():
        e = n_w[wk] * n_t[t] / n
        chi2[wk] += math.floor((c - e) * (c - e) / e * 1000000)
    got = {
        r["wk"]: r
        for r in QUERIES["events_mix_drift_weekly"](spark, sf_dir).collect()
    }
    assert set(got) == set(n_w)
    for wk in n_w:
        assert got[wk]["n_events"] == n_w[wk]
        assert got[wk]["chi2_e6"] == chi2[wk]


def test_hub_removal_resilience_referee(spark, sf_dir):
    adj: dict[str, set[str]] = {}
    for tx in _txs():
        addrs = sorted(
            {io["address"][0] for io in tx["inputs"] + tx["outputs"]}
        )
        for i, a in enumerate(addrs):
            for b in addrs[i + 1 :]:
                adj.setdefault(a, set()).add(b)
                adj.setdefault(b, set()).add(a)
    got = {
        r["k_removed"]: r
        for r in QUERIES["graph_hub_removal_resilience"](
            spark, sf_dir
        ).collect()
    }
    assert set(got) == {0, 2, 4}
    prev_gcc = None
    for k in (0, 2, 4):
        hubs = sorted(adj, key=lambda a: (-len(adj[a]), a))[:k]
        removed = set(hubs)
        survivors = set(adj) - removed
        seen = set()
        sizes = []
        for start in survivors:
            if start in seen:
                continue
            stack, comp = [start], set()
            while stack:
                x = stack.pop()
                if x in comp:
                    continue
                comp.add(x)
                for y in adj[x]:
                    if y in survivors and y not in comp:
                        stack.append(y)
            seen |= comp
            sizes.append(len(comp))
        r = got[k]
        assert r["n_survivors"] == len(survivors)
        assert r["n_components"] == len(sizes)
        assert r["gcc_size"] == max(sizes)
        assert r["gcc_share_e6"] == math.floor(
            max(sizes) * 1000000 / len(survivors)
        )
        if prev_gcc is not None:
            assert r["gcc_size"] <= prev_gcc  # removal can't grow gcc
        prev_gcc = r["gcc_size"]


def test_adstock_referee(spark, sf_dir):
    import pyarrow.parquet as pq

    ev = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type"]
    ).to_pandas()
    ev["d"] = ev["ts"].dt.date
    daily = ev.groupby(["event_type", "d"]).size()
    got = {
        (r["event_type"], r["d"]): r
        for r in QUERIES["ts_adstock_halfdecay"](spark, sf_dir).collect()
    }
    n_rows = 0
    for typ, grp in daily.groupby(level=0):
        srt = grp.sort_index()
        vs = [int(x) for x in srt.values]
        days = [d for (_t, d) in srt.index]
        for i, d in enumerate(days):
            window = [
                vs[i - j] if i - j >= 0 else 0 for j in range(7)
            ]
            adstock = sum(w * (1 << (6 - j)) for j, w in enumerate(window))
            r = got[(typ, d)]
            assert r["v"] == vs[i]
            assert r["adstock_x64"] == adstock
            assert r["fresh_share_e6"] == math.floor(
                64 * vs[i] * 1000000 / adstock
            )
            n_rows += 1
    assert len(got) == n_rows


def test_lsh_bucket_stats_referee(spark, sf_dir):
    import pyarrow.parquet as pq
    from collections import Counter

    from graphsense_datafeed_spark.operators.llm_dedup import (
        _SEM_BANDS,
        _SEM_BW,
    )

    t = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pandas()
    buckets = Counter()
    for v in t["embedding"]:
        for band in range(_SEM_BANDS):
            key = sum(
                (1 << i)
                for i in range(_SEM_BW)
                if v[band * _SEM_BW + i] > 0
            )
            buckets[(band, key)] += 1
    got = {
        r["band_id"]: r
        for r in QUERIES["embed_lsh_bucket_stats"](spark, sf_dir).collect()
    }
    assert set(got) == set(range(_SEM_BANDS))
    n = len(t)
    for band in range(_SEM_BANDS):
        sizes = [c for (b, _k), c in buckets.items() if b == band]
        pairs = sum(s * (s - 1) for s in sizes) // 2
        r = got[band]
        assert r["n_buckets"] == len(sizes)
        assert r["n_vectors"] == n
        assert r["max_bucket"] == max(sizes)
        assert r["candidate_pairs"] == pairs
        assert r["cand_rate_e9"] == math.floor(
            pairs * 1000000000 / (n * (n - 1) / 2)
        )
        # candidate rate is a proper reduction vs all-pairs
        assert r["cand_rate_e9"] < 1000000000


def test_activation_time_referee(spark, sf_dir):
    import pyarrow.parquet as pq

    ev = (
        pq.read_table(
            f"{sf_dir}/events.parquet",
            columns=["user_id", "ts", "event_id"],
        )
        .to_pandas()
        .sort_values(["user_id", "ts", "event_id"])
    )
    spans = []
    n_users = 0
    for _uid, grp in ev.groupby("user_id"):
        n_users += 1
        ts = grp["ts"].tolist()
        if len(ts) >= 5:
            spans.append(
                math.floor((ts[4] - ts[0]).total_seconds() / 3600)
            )
        else:
            spans.append(None)
    act = sorted(s for s in spans if s is not None)

    def disc(q):
        return act[int(math.ceil(q * len(act))) - 1]

    within = sum(1 for s in spans if s is not None and s <= 168)
    got = QUERIES["events_activation_time_to_n"](spark, sf_dir).collect()[
        0
    ]
    assert got["n_users"] == n_users
    assert got["n_activated"] == len(act)
    assert got["q1_hours"] == disc(0.25)
    assert got["med_hours"] == disc(0.5)
    assert got["q3_hours"] == disc(0.75)
    assert got["n_within_week"] == within
    assert got["week_activation_e6"] == math.floor(
        within * 1000000 / n_users
    )


def test_kupiec_referee(spark, sf_dir):
    import pyarrow.parquet as pq

    ev = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type"]
    ).to_pandas()
    ev["d"] = ev["ts"].dt.date
    daily = ev.groupby(["event_type", "d"]).size()
    got = {
        r["event_type"]: r
        for r in QUERIES["ts_kupiec_coverage_test"](spark, sf_dir).collect()
    }
    for typ, grp in daily.groupby(level=0):
        train = sorted(
            int(v) for (t, d), v in grp.items() if d.day <= 21
        )
        test = [int(v) for (t, d), v in grp.items() if d.day > 21]
        q90 = train[int(math.ceil(0.9 * len(train))) - 1]
        n, x = len(test), sum(1 for v in test if v > q90)
        lr = -2.0 * (
            (n - x) * math.log(0.9)
            + x * math.log(0.1)
            - ((n - x) * math.log(1.0 - x / n) if n - x > 0 else 0.0)
            - (x * math.log(x / n) if x > 0 else 0.0)
        )
        r = got[typ]
        assert r["n"] == n and r["x"] == x
        assert r["viol_rate_e6"] == math.floor(x * 1000000 / n)
        assert r["lr_uc_e6"] == math.floor(lr * 1000000)
        # an LR is non-negative up to quantization
        assert r["lr_uc_e6"] >= -1


def test_weighted_kappa_referee(spark, sf_dir):
    import pyarrow.parquet as pq
    from collections import Counter

    d = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["n_chars", "text"]
    ).to_pandas()

    def grade_a(nc):
        return 0 if nc < 150 else (1 if nc < 250 else 2)

    def grade_b(txt):
        sp = len(txt) - len(txt.replace(" ", ""))
        return 0 if sp < 25 else (1 if sp < 40 else 2)

    cells = Counter(
        (grade_a(nc), grade_b(t))
        for nc, t in zip(d["n_chars"], d["text"])
    )
    n = sum(cells.values())
    r = Counter()
    c = Counter()
    for (a, b), o in cells.items():
        r[a] += o
        c[b] += o
    num = sum((a - b) ** 2 * o * n for (a, b), o in cells.items())
    den = sum(
        (a - b) ** 2 * r[a] * c[b] for a in r for b in c
    )
    got = QUERIES["agg_weighted_kappa"](spark, sf_dir).collect()[0]
    assert got["n"] == n
    if den > 0:
        want = math.floor((1.0 - num / den) * 1000000)
        assert got["kappa_w_e6"] == want
        assert -1000000 <= got["kappa_w_e6"] <= 1000000
    else:
        assert got["kappa_w_e6"] is None


def test_cmh_referee(spark, sf_dir):
    import pyarrow.parquet as pq

    ev = pq.read_table(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts", "value"],
    ).to_pandas()
    ev["t"] = ev["ts"].apply(
        lambda ts: 1 if ts.isoweekday() % 7 in (0, 6) else 0
    )
    ev["y"] = (ev["value"] >= 50).astype(int)
    dev_sum = var_sum = k = 0
    for _typ, g in ev.groupby("event_type"):
        a = int(((g["t"] == 1) & (g["y"] == 1)).sum())
        r1 = int((g["t"] == 1).sum())
        r0 = int((g["t"] == 0).sum())
        c1 = int((g["y"] == 1).sum())
        c0 = int((g["y"] == 0).sum())
        n = len(g)
        dev_sum += math.floor((a - r1 * c1 / n) * 1000000000)
        var_sum += math.floor(
            r1 * r0 * c1 * c0 / (n * n * (n - 1)) * 1000000000
        )
        k += 1
    dabs = abs(dev_sum / 1000000000.0)
    cmh = (dabs - 0.5) * (dabs - 0.5) / (var_sum / 1000000000.0)
    got = QUERIES["agg_cmh_test"](spark, sf_dir).collect()[0]
    assert got["k"] == k
    assert got["dev_sum_e9"] == dev_sum
    assert got["var_sum_e9"] == var_sum
    assert got["cmh_e6"] == math.floor(cmh * 1000000)


def test_source_divergence_matrix_referee(spark, sf_dir):
    import pyarrow.parquet as pq
    from collections import Counter

    d = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["source", "text"]
    ).to_pandas()
    cnt = {}
    for src, grp in d.groupby("source"):
        c = Counter()
        for t in grp["text"]:
            for tok in t.split(" "):
                if tok:
                    c[tok] += 1
        cnt[src] = c
    srcs = sorted(cnt)
    got = {
        (r["sa"], r["sb"]): r
        for r in QUERIES["text_source_divergence_matrix"](
            spark, sf_dir
        ).collect()
    }
    assert len(got) == len(srcs) * (len(srcs) - 1) // 2
    import random

    rng = random.Random(9)
    sample = rng.sample(
        [(a, b) for i, a in enumerate(srcs) for b in srcs[i + 1 :]], 12
    )
    for sa, sb in sample:
        union = set(cnt[sa]) | set(cnt[sb])
        v = len(union)
        np_, nq = sum(cnt[sa].values()), sum(cnt[sb].values())
        js = 0
        for tok in union:
            p = (cnt[sa][tok] + 1) / (np_ + v)
            q = (cnt[sb][tok] + 1) / (nq + v)
            m = (p + q) / 2
            js += math.floor(
                (0.5 * p * math.log(p / m) + 0.5 * q * math.log(q / m))
                * 1000000000
            )
        r = got[(sa, sb)]
        assert r["union_vocab"] == v
        assert r["js_e9"] == js
        # JS is bounded by ln2 and non-negative up to quantization
        assert -v <= r["js_e9"] <= 693147181 * 1000


def test_pacf_referee(spark, sf_dir):
    import pyarrow.parquet as pq

    ev = (
        pq.read_table(
            f"{sf_dir}/events.parquet",
            columns=["event_type", "ts", "event_id", "value"],
        )
        .to_pandas()
        .sort_values(["event_type", "ts", "event_id"])
    )
    ev["v"] = ev["value"].apply(lambda x: math.floor(x * 100))
    got = {
        r["event_type"]: r
        for r in QUERIES["ts_pacf_bounded"](spark, sf_dir).collect()
    }
    for typ, grp in ev.groupby("event_type"):
        vs = [int(x) for x in grp["v"]]
        rho = {}
        for k in (1, 2, 3):
            xs = vs[k:]
            ys = vs[:-k]
            n = len(xs)
            sx, sy = sum(xs), sum(ys)
            sxy = sum(a * b for a, b in zip(xs, ys))
            sxx = sum(a * a for a in xs)
            syy = sum(b * b for b in ys)
            rho[k] = (
                math.floor(
                    (n * sxy - sx * sy)
                    / math.sqrt(
                        (n * sxx - sx * sx) * (n * syy - sy * sy)
                    )
                    * 1000000
                )
                / 1000000.0
            )
        r1, r2, r3 = rho[1], rho[2], rho[3]
        phi22 = (r2 - r1 * r1) / (1.0 - r1 * r1)
        phi21 = r1 - phi22 * r1
        phi33 = (r3 - phi21 * r2 - phi22 * r1) / (
            1.0 - phi21 * r1 - phi22 * r2
        )
        r = got[typ]
        assert r["pacf1_e6"] == math.floor(r1 * 1000000)
        assert r["pacf2_e6"] == math.floor(phi22 * 1000000)
        assert r["pacf3_e6"] == math.floor(phi33 * 1000000)


def test_arch_lm_referee(spark, sf_dir):
    import pyarrow.parquet as pq

    ev = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type"]
    ).to_pandas()
    ev["d"] = ev["ts"].dt.date
    daily = ev.groupby(["event_type", "d"]).size()
    got = {
        r["event_type"]: r
        for r in QUERIES["ts_arch_effect_lm1"](spark, sf_dir).collect()
    }
    for typ, grp in daily.groupby(level=0):
        vs = [int(x) for x in grp.sort_index().values]
        dv = [b - a for a, b in zip(vs, vs[1:])]
        s = [x * x for x in dv]
        xs, ys = s[:-1], s[1:]
        n = len(xs)
        sx, sy = sum(xs), sum(ys)
        sxy = sum(a * b for a, b in zip(xs, ys))
        sxx = sum(a * a for a in xs)
        syy = sum(b * b for b in ys)
        num = n * sxy - sx * sy
        lm = (
            float(num)
            * float(num)
            / float(n * sxx - sx * sx)
            / float(n * syy - sy * sy)
            * n
            * 1000000
        )
        r = got[typ]
        assert r["n"] == n
        assert r["lm_e6"] == math.floor(lm)
        # LM = n*R^2 lives in [0, n]
        assert 0 <= r["lm_e6"] <= n * 1000000
