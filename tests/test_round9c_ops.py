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
