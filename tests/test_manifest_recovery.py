"""Manifest-sink failure-injection recovery referee (VERDICT r13 item 5).

The manifest-commit family (sources/scans.py: sink_manifest_commit /
scan_manifest_incremental_read / scan_manifest_time_travel /
sink_manifest_vacuum) proves the HAPPY path: immutable data files, a
manifest per snapshot, commit = atomic CURRENT-pointer swap. The one
exactly-once claim a 100 TB operator actually cares about was untested:
what a reader sees when a writer dies BETWEEN writing its data files
and committing the manifest row, and whether the streaming retry of
that same batch is idempotent.

This suite stages the full crash: a foreachBatch manifest-committing
sink writes batch-0's parquet data files, then raises before the
manifest/pointer writes (the torn-write window). It asserts the
BEFORE state (pointer still on the empty genesis snapshot, orphan
files on disk but invisible to the manifest reader), restarts the
stream on the SAME checkpoint, and asserts the AFTER state (Structured
Streaming re-delivers batch 0, the retry commits, the reader sees the
input exactly once — while the crashed attempt's orphans are still on
disk and still unreferenced, which is precisely what a
directory-listing reader would get wrong).
"""

import glob
import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

INPUT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("event_type", StringType()),
        StructField("cents", LongType()),
    ]
)

N_ROWS = 64


def _genesis(table_dir: str) -> None:
    """Seed the table with an EMPTY snapshot so the pre-crash pointer
    state is well-defined: CURRENT -> manifest-0.json -> no files."""
    os.makedirs(os.path.join(table_dir, "data"), exist_ok=True)
    m0 = os.path.join(table_dir, "manifest-0.json")
    with open(m0 + ".tmp", "w") as fh:
        json.dump({"snapshot": 0, "files": []}, fh)
    os.rename(m0 + ".tmp", m0)
    cur = os.path.join(table_dir, "CURRENT")
    with open(cur + ".tmp", "w") as fh:
        fh.write("manifest-0.json")
    os.rename(cur + ".tmp", cur)


def _read_current(spark, table_dir: str):
    """The manifest reader: resolve CURRENT -> manifest -> explicit
    file list; never list directories. Returns (snapshot, files, df)."""
    with open(os.path.join(table_dir, "CURRENT")) as fh:
        mname = fh.read().strip()
    with open(os.path.join(table_dir, mname)) as fh:
        manifest = json.load(fh)
    files = manifest["files"]
    if not files:
        return manifest["snapshot"], files, None
    return manifest["snapshot"], files, spark.read.parquet(*files)


def _land_fn(table_dir: str, crash_marker: str):
    """foreachBatch body: write immutable per-attempt data files, then
    commit manifest + pointer. If crash_marker exists, delete it and
    raise AFTER the data write and BEFORE the manifest write — the
    torn-write window this suite exists to exercise."""

    def land(batch_df, batch_id: int) -> None:
        # attempt-unique immutable dir: object-store discipline — a
        # retry never overwrites, it writes NEW files and the manifest
        # decides which attempt is real.
        attempt = len(
            glob.glob(os.path.join(table_dir, "data", f"batch{batch_id}-attempt*"))
        )
        ddir = os.path.join(table_dir, "data", f"batch{batch_id}-attempt{attempt}")
        batch_df.write.mode("error").parquet(ddir)
        if os.path.exists(crash_marker):
            os.unlink(crash_marker)
            raise RuntimeError("injected crash: data written, manifest not")
        new_files = sorted(glob.glob(os.path.join(ddir, "*.parquet")))
        with open(os.path.join(table_dir, "CURRENT")) as fh:
            mname = fh.read().strip()
        with open(os.path.join(table_dir, mname)) as fh:
            prev = json.load(fh)
        snap = prev["snapshot"] + 1
        mpath = os.path.join(table_dir, f"manifest-{snap}.json")
        with open(mpath + ".tmp", "w") as fh:
            json.dump({"snapshot": snap, "files": prev["files"] + new_files}, fh)
        os.rename(mpath + ".tmp", mpath)
        cur = os.path.join(table_dir, "CURRENT")
        with open(cur + ".stage", "w") as fh:
            fh.write(f"manifest-{snap}.json")
        os.rename(cur + ".stage", cur)  # commit: the ONLY reader-visible mutation

    return land


def _run_stream(spark, in_dir: str, ckpt: str, land) -> None:
    q = (
        spark.readStream.schema(INPUT_SCHEMA)
        .json(in_dir)
        .writeStream.foreachBatch(land)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_manifest_sink_crash_recovery(spark, tmp_path):
    table_dir = str(tmp_path / "table")
    in_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    crash_marker = str(tmp_path / "CRASH_ONCE")
    _genesis(table_dir)
    os.makedirs(in_dir)
    with open(os.path.join(in_dir, "feed.jsonl"), "w") as fh:
        for i in range(N_ROWS):
            fh.write(
                json.dumps(
                    {"event_id": i, "event_type": f"t{i % 3}", "cents": 100 * i}
                )
                + "\n"
            )
    open(crash_marker, "w").close()
    land = _land_fn(table_dir, crash_marker)

    # --- attempt 1: dies in the torn-write window -------------------
    with pytest.raises(Exception) as exc:
        _run_stream(spark, in_dir, ckpt, land)
    assert "injected crash" in str(exc.value)

    # BEFORE state: pointer untouched, orphans on disk, reader blind
    snap, files, df = _read_current(spark, table_dir)
    assert snap == 0 and files == [] and df is None
    orphans = sorted(
        glob.glob(os.path.join(table_dir, "data", "batch0-attempt0", "*.parquet"))
    )
    assert orphans, "crash was injected AFTER the data write — files must exist"

    # --- restart on the SAME checkpoint: batch 0 re-delivered -------
    assert not os.path.exists(crash_marker)
    _run_stream(spark, in_dir, ckpt, land)

    # AFTER state: exactly-once content, orphans still unreferenced
    snap, files, df = _read_current(spark, table_dir)
    assert snap == 1
    assert files and all(os.path.exists(f) for f in files)
    assert not set(files) & set(orphans), "manifest must never adopt the orphans"
    got = {r["event_id"]: r["cents"] for r in df.collect()}
    assert got == {i: 100 * i for i in range(N_ROWS)}, "exactly once, no dupes"
    # the orphans survive on disk (immutable files are never deleted by
    # a commit) — the proof a directory-listing reader double-counts
    # where the manifest reader stays exact
    listed = glob.glob(os.path.join(table_dir, "data", "batch0-attempt*", "*.parquet"))
    assert len(listed) == len(files) + len(orphans)

    # --- idempotent beyond recovery: a THIRD run on the drained
    # checkpoint must commit nothing (availableNow with no new files)
    _run_stream(spark, in_dir, ckpt, land)
    snap2, files2, df2 = _read_current(spark, table_dir)
    assert (snap2, files2) == (snap, files), "drained stream must not re-commit"


def test_manifest_vacuum_never_deletes_current_snapshot(spark, tmp_path):
    """Companion invariant: vacuuming with the recovery debris present
    removes ONLY unreferenced files — the live snapshot survives
    byte-identically (the sink_manifest_vacuum ordering contract,
    re-proven on the crash-recovery layout rather than the staged
    two-snapshot fixture)."""
    table_dir = str(tmp_path / "table")
    in_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    crash_marker = str(tmp_path / "CRASH_ONCE")
    _genesis(table_dir)
    os.makedirs(in_dir)
    with open(os.path.join(in_dir, "feed.jsonl"), "w") as fh:
        for i in range(N_ROWS):
            fh.write(json.dumps({"event_id": i, "event_type": "t", "cents": i}) + "\n")
    open(crash_marker, "w").close()
    land = _land_fn(table_dir, crash_marker)
    with pytest.raises(Exception):
        _run_stream(spark, in_dir, ckpt, land)
    _run_stream(spark, in_dir, ckpt, land)

    _, live, _ = _read_current(spark, table_dir)
    # vacuum: retire non-live manifests FIRST, then delete every data
    # file outside the union of live manifests (scans.py ordering)
    with open(os.path.join(table_dir, "CURRENT")) as fh:
        live_manifest = fh.read().strip()
    for m in glob.glob(os.path.join(table_dir, "manifest-*.json")):
        if os.path.basename(m) != live_manifest:
            os.unlink(m)
    keep = set(live)
    removed = 0
    for f in glob.glob(os.path.join(table_dir, "data", "*", "*.parquet")):
        if f not in keep:
            os.unlink(f)
            removed += 1
    assert removed > 0, "the crashed attempt's orphans were there to vacuum"
    snap, files, df = _read_current(spark, table_dir)
    assert files == live and df.count() == N_ROWS
    got = sorted(r["cents"] for r in df.collect())
    assert got == list(range(N_ROWS))
