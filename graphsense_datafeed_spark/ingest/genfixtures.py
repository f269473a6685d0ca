"""Deterministic synthetic block-JSON + exchange-rates fixtures.

The reference ingests (a) block JSON from a bitcoind/blockchain.info
HTTP API and (b) daily fiat exchange rates from a public rates API
(SURVEY.md §3.1). No network exists here, so the ingest facade (§7 M6)
is exercised against these seeded, committed files instead. The JSON
shape mirrors the reconstructed raw model (SURVEY.md §1.2): blocks with
nested tx arrays whose inputs/outputs are list<struct> — the shape that
makes ``arr_explode`` the signature datafeed operator.

PER-CURRENCY KEYSPACES (round 9): the reference deploys one raw
keyspace per currency (btc_raw, ltc_raw, ... — SURVEY §1.1), each fed
by its own chain daemon with its own block cadence and address format.
``CURRENCIES`` carries one ``CurrencySpec`` per supported chain; the
default ``btc`` spec reproduces the original fixture BYTE-FOR-BYTE
(tripwired in tests/test_fixture_drift.py), and the synthetic alt
chain ``ltc`` differs in every spec dimension (seed, address prefix,
block interval, value range) so cross-keyspace isolation is testable.

Run ``python -m graphsense_datafeed_spark.ingest.genfixtures`` to
(re)generate; output is byte-stable (fixed seeds, sorted keys, fixed
float formatting) so the files can live in git.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import os
import random

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "fixtures")
N_BLOCKS = 120
GENESIS_TS = 1_231_006_505  # 2009-01-03, the reference chain's genesis


@dataclasses.dataclass(frozen=True)
class CurrencySpec:
    """Everything chain-specific about a raw keyspace's feed."""

    name: str
    seed: int
    addr_prefix: str
    n_addrs: int
    genesis_ts: int
    block_interval: int  # seconds between blocks
    max_value: int  # satoshi-unit cap per output
    keyspace: str = ""

    def __post_init__(self):
        if not self.keyspace:
            object.__setattr__(self, "keyspace", f"{self.name}_raw")

    @property
    def subdir(self) -> str:
        """btc (the original fixture) lives at the fixtures root for
        backward compatibility; every other chain gets a subdir."""
        return "" if self.name == "btc" else self.name


CURRENCIES: dict[str, CurrencySpec] = {
    "btc": CurrencySpec(
        name="btc",
        seed=42,
        addr_prefix="addr",
        n_addrs=500,
        genesis_ts=GENESIS_TS,
        block_interval=600,
        max_value=5_000_000_000,
    ),
    # synthetic alt chain: 2.5-min blocks, its own address space,
    # litoshi-scale values, later genesis (2011-10-07)
    "ltc": CurrencySpec(
        name="ltc",
        seed=43,
        addr_prefix="laddr",
        n_addrs=300,
        genesis_ts=1_317_972_665,
        block_interval=150,
        max_value=84_000_000_000,
    ),
}


def _hash(seed: str) -> str:
    return hashlib.sha256(seed.encode()).hexdigest()


def gen_blocks(
    n_blocks: int = N_BLOCKS, spec: CurrencySpec = CURRENCIES["btc"]
) -> list[dict]:
    rng = random.Random(spec.seed)
    salt = "" if spec.name == "btc" else f"{spec.name}-"
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
                    "address": [
                        f"{spec.addr_prefix}{rng.randint(0, spec.n_addrs - 1):04d}"
                    ],
                    "value": rng.randint(10_000, spec.max_value),
                }
                for _ in range(n_out)
            ]
            inputs = [
                {
                    "address": [
                        f"{spec.addr_prefix}{rng.randint(0, spec.n_addrs - 1):04d}"
                    ],
                    "value": rng.randint(10_000, spec.max_value),
                }
                for _ in range(n_in)
            ]
            txs.append(
                {
                    "tx_hash": _hash(f"{salt}tx-{h}-{i}"),
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
                "block_hash": _hash(f"{salt}block-{h}"),
                "timestamp": spec.genesis_ts
                + h * spec.block_interval
                + rng.randint(-60, 60),
                "no_transactions": n_tx,
                "txs": txs,
            }
        )
    return blocks


def gen_rates(
    n_days: int = 400, spec: CurrencySpec = CURRENCIES["btc"]
) -> list[tuple[str, float, float]]:
    import datetime

    rng = random.Random(spec.seed)
    rows = []
    day = datetime.date.fromtimestamp(spec.genesis_ts).replace()
    # btc keeps its original fixed start date (byte-stability)
    if spec.name == "btc":
        day = datetime.date(2009, 1, 3)
    usd = 100.0
    for _ in range(n_days):
        usd = max(1.0, usd * (1 + rng.uniform(-0.03, 0.03)))
        rows.append((day.isoformat(), round(usd, 2), round(usd * 0.92, 2)))
        day += datetime.timedelta(days=1)
    return rows


def write_fixtures(
    out_dir: str = FIXTURE_DIR, currency: str = "btc"
) -> tuple[str, str]:
    spec = CURRENCIES[currency]
    target = os.path.join(out_dir, spec.subdir) if spec.subdir else out_dir
    os.makedirs(target, exist_ok=True)
    blocks_path = os.path.join(target, "blocks.jsonl")
    with open(blocks_path, "w") as f:
        for b in gen_blocks(spec=spec):
            f.write(json.dumps(b, sort_keys=True) + "\n")
    rates_path = os.path.join(target, "rates.csv")
    with open(rates_path, "w") as f:
        f.write("date,usd,eur\n")
        for d, usd, eur in gen_rates(spec=spec):
            f.write(f"{d},{usd},{eur}\n")
    return blocks_path, rates_path


def write_all_fixtures(out_dir: str = FIXTURE_DIR) -> dict[str, tuple[str, str]]:
    return {cur: write_fixtures(out_dir, cur) for cur in CURRENCIES}


if __name__ == "__main__":
    print(write_all_fixtures())
