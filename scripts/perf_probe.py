"""Round-15 perf probe: plans + isolated noop timings for the headline set.

Usage:
    python scripts/perf_probe.py plans  [outdir] [suffix] [qid,...]
        Write .explain("formatted") for each (batch) headline query to
        plans/r15/<qid>_<suffix>.txt   (suffix: before/after).
    python scripts/perf_probe.py time [qid,...] [--reps N]
        Time each query isolated with the noop sink (guide §1.4) after
        the same warm-up bench.py performs; prints per-query seconds.

The noop sink computes EVERY column of every row (count() lets the
optimizer prune), so these numbers are the honest per-plan cost; the
driver-comparable number stays bench.py's count()-based reading.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STREAMING = {"stream_tumbling"}  # executes a real micro-batch when built


def build(warm: bool = True):
    from graphsense_datafeed_spark import registry
    from graphsense_datafeed_spark.session import build_session
    from graphsense_datafeed_spark.sources.tables import load

    registry.load_all_operators()
    spark = build_session("gds-perf-probe")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if warm:
        load(spark, sf_dir, "lineitem").count()
        load(spark, sf_dir, "events").count()
        import pyspark.sql.functions as F

        _warm = F.pandas_udf(lambda s: s, "long")
        spark.range(64).repartition(32).select(_warm("id")).count()

        def _warm_arrow(batches):
            yield from batches

        spark.range(64).repartition(32).mapInArrow(_warm_arrow, "id long").count()
    return spark, sf_dir, registry


def headline():
    import bench

    return list(bench.HEADLINE)


def cmd_plans(outdir: str, suffix: str, only: list[str] | None) -> None:
    spark, sf_dir, registry = build(warm=False)
    os.makedirs(outdir, exist_ok=True)
    for qid in only or headline():
        if qid in STREAMING:
            continue
        import contextlib
        import io

        df = registry.QUERIES[qid](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        txt = buf.getvalue()
        path = os.path.join(outdir, f"{qid}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path} ({len(txt)} bytes)", file=sys.stderr)
    spark.stop()


def cmd_time(only: list[str] | None, reps: int) -> None:
    spark, sf_dir, registry = build(warm=True)
    sc = spark.sparkContext
    out: dict[str, list[float]] = {}
    for qid in only or headline():
        for r in range(reps):
            sc.setJobDescription(f"probe:{qid}#{r}")
            t0 = time.perf_counter()
            df = registry.QUERIES[qid](spark, sf_dir)
            if qid in STREAMING:
                df.count()  # building it already ran the micro-batch
            else:
                df.write.format("noop").mode("overwrite").save()
            out.setdefault(qid, []).append(time.perf_counter() - t0)
        sc.setJobDescription(None)
        print(f"{qid}: " + " ".join(f"{t:.3f}" for t in out[qid]))
    spark.stop()


def main() -> None:
    args = list(sys.argv[1:])
    reps = 1
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        del args[i : i + 2]
    mode = args[0] if args else "time"
    if mode == "plans":
        outdir = args[1] if len(args) > 1 else "plans/r15"
        suffix = args[2] if len(args) > 2 else "before"
        only = args[3].split(",") if len(args) > 3 else None
        cmd_plans(outdir, suffix, only)
    else:
        only = args[1].split(",") if len(args) > 1 else None
        cmd_time(only, reps)


if __name__ == "__main__":
    main()
