"""Deterministic synthetic block-JSON + exchange-rates fixtures.

The reference ingests (a) block JSON from a bitcoind/blockchain.info
HTTP API and (b) daily fiat exchange rates from a public rates API
(SURVEY.md §3.1). No network exists here, so the ingest facade (§7 M6)
is exercised against these seeded, committed files instead. The JSON
shape mirrors the reconstructed raw model (SURVEY.md §1.2): blocks with
nested tx arrays whose inputs/outputs are list<struct> — the shape that
makes ``arr_explode`` the signature datafeed operator.

Run ``python -m graphsense_datafeed_spark.ingest.genfixtures`` to
(re)generate; output is byte-stable (seed 42, sorted keys, fixed float
formatting) so the files can live in git.
"""

from __future__ import annotations

import hashlib
import json
import os
import random

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "fixtures")
N_BLOCKS = 120
GENESIS_TS = 1_231_006_505  # 2009-01-03, the reference chain's genesis


def _hash(seed: str) -> str:
    return hashlib.sha256(seed.encode()).hexdigest()


def gen_blocks(n_blocks: int = N_BLOCKS) -> list[dict]:
    rng = random.Random(42)
    blocks = []
    for h in range(n_blocks):
        n_tx = rng.randint(1, 6)
        txs = []
        for i in range(n_tx):
            coinbase = i == 0
            n_in = 0 if coinbase else rng.randint(1, 3)
            n_out = rng.randint(1, 4)
            outputs = [
                {
                    "address": [f"addr{rng.randint(0, 499):04d}"],
                    "value": rng.randint(10_000, 5_000_000_000),
                }
                for _ in range(n_out)
            ]
            inputs = [
                {
                    "address": [f"addr{rng.randint(0, 499):04d}"],
                    "value": rng.randint(10_000, 5_000_000_000),
                }
                for _ in range(n_in)
            ]
            txs.append(
                {
                    "tx_hash": _hash(f"tx-{h}-{i}"),
                    "coinbase": coinbase,
                    "total_input": sum(x["value"] for x in inputs),
                    "total_output": sum(x["value"] for x in outputs),
                    "inputs": inputs,
                    "outputs": outputs,
                }
            )
        blocks.append(
            {
                "height": h,
                "block_hash": _hash(f"block-{h}"),
                "timestamp": GENESIS_TS + h * 600 + rng.randint(-60, 60),
                "no_transactions": n_tx,
                "txs": txs,
            }
        )
    return blocks


def gen_rates(n_days: int = 400) -> list[tuple[str, float, float]]:
    import datetime

    rng = random.Random(42)
    rows = []
    day = datetime.date(2009, 1, 3)
    usd = 100.0
    for _ in range(n_days):
        usd = max(1.0, usd * (1 + rng.uniform(-0.03, 0.03)))
        rows.append((day.isoformat(), round(usd, 2), round(usd * 0.92, 2)))
        day += datetime.timedelta(days=1)
    return rows


def write_fixtures(out_dir: str = FIXTURE_DIR) -> tuple[str, str]:
    os.makedirs(out_dir, exist_ok=True)
    blocks_path = os.path.join(out_dir, "blocks.jsonl")
    with open(blocks_path, "w") as f:
        for b in gen_blocks():
            f.write(json.dumps(b, sort_keys=True) + "\n")
    rates_path = os.path.join(out_dir, "rates.csv")
    with open(rates_path, "w") as f:
        f.write("date,usd,eur\n")
        for d, usd, eur in gen_rates():
            f.write(f"{d},{usd},{eur}\n")
    return blocks_path, rates_path


if __name__ == "__main__":
    print(write_fixtures())
