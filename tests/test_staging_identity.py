"""Regression tests for the staging/fingerprint identity fixes
(ADVICE r4, closed in VERDICT r5 #6): two fixture roots with the SAME
basename must not evict each other's stagings, and an mtime-preserving
same-size rewrite must still change the source fingerprint (st_ino)."""

import os
import shutil

from graphsense_datafeed_spark.sources.tables import (
    source_fingerprint,
    staged_source_dir,
)


def _mk_root(tmp_path, parent, data=b"x" * 64):
    root = tmp_path / parent / "sf_same"
    root.mkdir(parents=True)
    (root / "events.parquet").write_bytes(data)
    return str(root)


def test_same_basename_roots_do_not_evict_each_other(tmp_path):
    root_a = _mk_root(tmp_path, "a")
    root_b = _mk_root(tmp_path, "b", data=b"y" * 64)

    dir_a = staged_source_dir(root_a, "gds_test_stage", "events")
    os.makedirs(dir_a, exist_ok=True)
    marker = os.path.join(dir_a, "staged.ok")
    open(marker, "w").write("a")

    # staging root B (same basename 'sf_same') must NOT sweep A's dir
    dir_b = staged_source_dir(root_b, "gds_test_stage", "events")
    os.makedirs(dir_b, exist_ok=True)
    assert dir_a != dir_b
    assert os.path.exists(marker), "sibling fixture root evicted A's staging"

    # but a REGENERATED root A (new fingerprint) does sweep A's old dir
    os.remove(os.path.join(root_a, "events.parquet"))
    with open(os.path.join(root_a, "events.parquet"), "wb") as f:
        f.write(b"z" * 128)
    dir_a2 = staged_source_dir(root_a, "gds_test_stage", "events")
    assert dir_a2 != dir_a
    assert not os.path.exists(marker), "superseded staging not evicted"
    shutil.rmtree(os.path.dirname(dir_a2), ignore_errors=True)


def test_fingerprint_changes_on_mtime_preserving_rewrite(tmp_path):
    f = tmp_path / "t.parquet"
    f.write_bytes(b"q" * 32)
    st = os.stat(f)
    fp1 = source_fingerprint(str(f))

    # rewrite with identical size, then restore mtime exactly (the
    # cp -p / rsync -t shape): only the inode differs
    g = tmp_path / "t.parquet.new"
    g.write_bytes(b"r" * 32)
    os.replace(g, f)
    os.utime(f, ns=(st.st_atime_ns, st.st_mtime_ns))
    st2 = os.stat(f)
    assert (st2.st_size, st2.st_mtime_ns) == (st.st_size, st.st_mtime_ns)

    fp2 = source_fingerprint(str(f))
    assert fp1 != fp2, "same-size mtime-preserved rewrite served stale identity"
