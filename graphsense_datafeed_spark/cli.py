"""CLI — the reference's three entry points, Spark-native.

The datafeed ships as a service with a bulk/full-sync mode, an
incremental daemon and a rates ingest (SURVEY §3.1). This CLI mirrors
those run modes so an operator of the reference has a 1:1 switch path,
plus a query runner over the full registered inventory:

    python -m graphsense_datafeed_spark.cli sync   --json fixtures/blocks.jsonl --out /tmp/raw
    python -m graphsense_datafeed_spark.cli daemon --out /tmp/raw      # availableNow tail
    python -m graphsense_datafeed_spark.cli rates  --csv fixtures/rates.csv --out /tmp/raw
    python -m graphsense_datafeed_spark.cli query  golden_q1_pricing --sf /root/testdata/sf0.001
    python -m graphsense_datafeed_spark.cli list
    python -m graphsense_datafeed_spark.cli audit             # plan gate
    python -m graphsense_datafeed_spark.cli verify [qid ...]  # oracle gate
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="graphsense-datafeed-spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p_sync = sub.add_parser("sync", help="bulk ingest: block JSON → normalized tables")
    p_sync.add_argument("--json", default=None, help="block JSONL path")
    p_sync.add_argument("--out", required=True, help="sink base directory")

    p_daemon = sub.add_parser("daemon", help="incremental ingest (micro-batch tail)")
    p_daemon.add_argument("--out", required=True)

    p_rates = sub.add_parser("rates", help="exchange-rates ingest")
    p_rates.add_argument("--csv", default=None)
    p_rates.add_argument("--out", required=True)

    p_query = sub.add_parser("query", help="run a registered query")
    p_query.add_argument("qid")
    p_query.add_argument("--sf", default="/root/testdata/sf0.001")
    p_query.add_argument("--limit", type=int, default=20)

    sub.add_parser("list", help="list registered query ids")

    p_audit = sub.add_parser(
        "audit", help="physical-plan audit over the registry"
    )
    p_audit.add_argument("qids", nargs="*", help="restrict to these ids")

    p_verify = sub.add_parser(
        "verify", help="driver-style oracle verification sweep"
    )
    p_verify.add_argument("qids", nargs="*", help="restrict to these ids")

    args = ap.parse_args(argv)

    from graphsense_datafeed_spark import registry
    from graphsense_datafeed_spark.session import build_session

    registry.load_all_operators()

    if args.cmd == "list":
        for qid in sorted(registry.QUERIES):
            mark = "oracle" if qid in registry.ORACLES else "rows-only"
            print(f"{qid}\t{mark}")
        return 0

    if args.cmd in ("audit", "verify"):
        # delegate to the repo gate scripts (same behavior, one entry)
        import os
        import subprocess

        script = (
            "plan_audit.py" if args.cmd == "audit" else "verify_driver_style.py"
        )
        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "scripts",
            script,
        )
        return subprocess.call([sys.executable, path, *args.qids])

    spark = build_session("gds-cli")
    try:
        if args.cmd == "sync":
            from graphsense_datafeed_spark.ingest.facade import ingest
            from graphsense_datafeed_spark.sources.scans import BLOCKS_JSONL
            from graphsense_datafeed_spark.sources.sinks import ParquetSink

            tables = ingest(
                spark,
                ParquetSink(args.out, partition_col="block_date"),
                json_path=args.json or BLOCKS_JSONL,
            )
            print(f"synced tables: {sorted(tables)} → {args.out}")
        elif args.cmd == "daemon":
            from graphsense_datafeed_spark.registry import QUERIES

            df = QUERIES["ingest_stream"](spark, "")
            print(f"daemon pass complete: {df.count()} blocks landed")
        elif args.cmd == "rates":
            from graphsense_datafeed_spark.sources.scans import read_rates_csv

            rates = read_rates_csv(spark, args.csv) if args.csv else read_rates_csv(spark)
            rates.write.mode("overwrite").parquet(f"{args.out}/exchange_rates")
            print(f"rates → {args.out}/exchange_rates ({rates.count()} days)")
        elif args.cmd == "query":
            if args.qid not in registry.QUERIES:
                print(f"unknown query {args.qid!r}; see `list`", file=sys.stderr)
                return 2
            registry.QUERIES[args.qid](spark, args.sf).show(args.limit, truncate=False)
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
