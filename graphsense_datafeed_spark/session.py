"""SparkSession construction and runtime-conf hygiene.

The reference system is a JVM service with a hand-rolled thread pool
(SURVEY.md §3.1); here the entire execution substrate is Spark. Two
entry paths matter:

1. ``build_session()`` — our own tests / bench build the session and
   can set everything at builder time.
2. The driver's correctness gate hands us an *already-built* session
   (``queries()[name](spark, sf_dir)``). Builder-time config is
   unavailable there, so every conf we depend on must also be settable
   at runtime — ``ensure_runtime_confs(spark)`` does that and is called
   by every table loader (sources/tables.py).

Scale note: on a real 1000-executor cluster the only knobs below that
change are master/shuffle-partitions (AQE coalesces the rest); nothing
in the engine assumes local mode.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Confs we require AND that are runtime-settable (verified by setting
# them on a live session in this environment):
#   - nanosAsLong: events.parquet is timestamp[ns]; without this Spark
#     4.1.2 refuses to read the file at all (PARQUET_TYPE_ILLEGAL).
#   - session.timeZone=UTC: fixture timestamps are tz-naive wall times;
#     pinning UTC makes TIMESTAMP(_LTZ) ↔ TIMESTAMP_NTZ conversions the
#     identity, which keeps DuckDB (naive) parity exact.
#   - Arrow: vectorized JVM↔Python transfer for pandas UDFs / toPandas.
RUNTIME_CONFS: dict[str, str] = {
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}

# Applied only when the session still carries the stock default —
# right-sizes sessions we DIDN'T build (a bare session's 200 shuffle
# partitions cost 200 tasks per exchange at fixture scale, and AQE
# coalesces batch plans but NOT streaming micro-batches) without
# stomping anyone's explicit choice. At deployment scale this knob is
# instead sized to ~128-256MB per shuffle partition.
RUNTIME_DEFAULT_FIXES: dict[str, tuple[str, str]] = {
    "spark.sql.shuffle.partitions": ("200", "32"),
}

def _auto_broadcast_threshold(driver_mem: str) -> str:
    """Heap-proportional broadcast threshold: heap/256 clamped to
    [4 MB, 32 MB].

    A FIXED threshold is a latent scale bug: the round-10 census soak
    (scripts/soak_census.py, 55 sf1 queries on a deliberately-small
    1 GiB driver) OOM'd two AQE broadcast builds (golden_q21/q4) that
    pass cleanly under the default 8 GiB heap — the 32 MB constant
    assumed the 8 GiB sizing (heap/256) and silently became heap/32
    when SPARK_GRAFT_DRIVER_MEM shrank. Tying the threshold to the
    heap keeps the broadcast budget a constant FRACTION of memory at
    any sizing, which is how a real cluster sizes it (per-executor
    memory × a fixed fraction). 8g → 32 MB (bench posture unchanged),
    1g → 4 MB (census soak passes end-to-end).
    """
    m = driver_mem.strip().lower()
    units = {"k": 1024, "m": 1024**2, "g": 1024**3, "t": 1024**4}
    try:
        heap = (
            int(m[:-1]) * units[m[-1]] if m[-1] in units else int(m)
        )
    except (ValueError, IndexError):
        heap = 8 * 1024**3
    return str(max(4 * 1024**2, min(32 * 1024**2, heap // 256)))


# Builder-time defaults for sessions we own (tests, bench, CLI).
BUILDER_CONFS: dict[str, str] = {
    **RUNTIME_CONFS,
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Fits the fixture scale; at cluster scale this is sized to
    # ~128-256MB of shuffle data per partition and AQE coalesces down.
    "spark.sql.shuffle.partitions": "32",
    "spark.sql.autoBroadcastJoinThreshold": _auto_broadcast_threshold(
        os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")
    ),
    "spark.ui.enabled": "false",
    # Local-mode heap = the WHOLE "cluster": 32 executor threads share
    # it, so 8g = 256 MB per concurrent task. That floor is fine up to
    # sf10 (~1.6 GB input) and OOMs at sf100 (16 GB input, measured:
    # golden_q1's 600M-row scan dies in 128 MB column-batch
    # allocations). SPARK_GRAFT_DRIVER_MEM overrides for big local
    # fixtures — the knob a real cluster expresses as executor-memory
    # × executor-count (production sizing is 1-2 GB per core; 8g/32 is
    # deliberately lean so undersized-heap bugs surface in testing).
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
    # Static conf (submit-time; not runtime-healable). The round-9 sf1
    # census measured a long-lived BARE 1 GiB driver failing one
    # broadcast build (golden_q8) after ~55 back-to-back queries from
    # cumulative heap pressure: the ContextCleaner only reclaims
    # broadcast/shuffle blocks when a JVM GC actually runs, and a
    # mostly-idle driver heap can go 30 min (the stock interval)
    # without one. 5 min keeps block reclamation ahead of long query
    # streams at negligible cost; scripts/soak_census.py re-runs the
    # failing census shape to pin this (SCALE.md §sf1 census).
    "spark.cleaner.periodicGC.interval": "5min",
    # Static conf — must be set at build time; saveAsTable (bucketed
    # tables) lands here. Harmless for sessions we don't own (the
    # driver's session never calls saveAsTable).
    "spark.sql.warehouse.dir": os.path.join(
        __import__("tempfile").gettempdir(), "gds_warehouse"
    ),
}


def _ensure_package_on_workers(spark: SparkSession) -> None:
    """Ship this package to executor Python workers via addPyFile.

    The grading driver builds its OWN bare session from an arbitrary
    cwd; in that session the executor Python workers inherit neither
    the driver's ``sys.path`` hack nor a repo cwd, so any batch
    function that imports ``graphsense_datafeed_spark`` inside the
    worker (the multimodal codec ops import ``imagecodec`` there —
    module-level functions pickle BY REFERENCE) dies with
    ModuleNotFoundError.  Round-7 lesson: the failure only reproduces
    when verify runs from OUTSIDE the repo, which is exactly the
    driver contract (the verify skill's ``cd /tmp`` exists for this).

    Fix: zip the package once per interpreter and ``addPyFile`` it —
    runtime-callable on a live session, idempotent via the
    SparkContext's own _python_includes ledger, and the same mechanism
    a real cluster submit would use (``--py-files``)."""
    sc = spark.sparkContext
    try:
        includes = getattr(sc, "_python_includes", None) or []
        if any("gds_pkg" in str(p) for p in includes):
            return
    except Exception:
        pass
    zip_path = _package_zip()
    try:
        sc.addPyFile(zip_path)
    except Exception:
        # best-effort: a session that already has the repo importable
        # on its workers doesn't need the zip
        pass


def _package_sources() -> tuple[list[tuple[str, str]], str]:
    """(abs path, archive name) for every package .py + content digest.

    The zip name is keyed on a CONTENT hash: a PID-keyed name is
    reusable by an unrelated process after PID reuse (or another user
    on a shared /tmp) and would silently ship stale worker code."""
    import hashlib

    pkg_root = os.path.dirname(os.path.abspath(__file__))
    sources: list[tuple[str, str]] = []
    for dirpath, _dirnames, filenames in os.walk(pkg_root):
        if "__pycache__" in dirpath:
            continue
        for fn in sorted(filenames):
            if not fn.endswith(".py"):
                continue
            full = os.path.join(dirpath, fn)
            rel = os.path.join(
                "graphsense_datafeed_spark",
                os.path.relpath(full, pkg_root),
            )
            sources.append((full, rel))
    sources.sort(key=lambda fr: fr[1])
    digest = hashlib.sha256()
    for full, rel in sources:
        digest.update(rel.encode())
        with open(full, "rb") as fh:
            digest.update(fh.read())
    return sources, digest.hexdigest()


def _zip_matches(path: str, sources, hexdigest: str) -> bool:
    """True iff the zip at ``path`` holds exactly ``sources`` with the
    given content digest.  /tmp is world-shared: a name collision
    (stale, corrupt, or planted file) must not ship to workers, so the
    members are re-hashed before an existing zip is trusted."""
    import hashlib
    import zipfile

    try:
        with zipfile.ZipFile(path) as zf:
            names = sorted(zf.namelist())
            if names != sorted(rel for _full, rel in sources):
                return False
            check = hashlib.sha256()
            for _full, rel in sources:
                check.update(rel.encode())
                check.update(zf.read(rel))
            return check.hexdigest() == hexdigest
    except Exception:
        return False


def _package_zip() -> str:
    """Build (or verify-and-reuse) the content-addressed package zip."""
    import tempfile
    import zipfile

    sources, hexdigest = _package_sources()
    zip_path = os.path.join(
        tempfile.gettempdir(), f"gds_pkg_{hexdigest[:16]}.zip"
    )
    if not (os.path.exists(zip_path) and _zip_matches(zip_path, sources, hexdigest)):
        # Write to a unique temp file and os.replace() into place —
        # never a partial zip at the final path, even if a concurrent
        # session races us or this process crashes mid-write.
        fd, tmp_path = tempfile.mkstemp(
            suffix=".zip", prefix="gds_pkg_tmp_",
            dir=tempfile.gettempdir(),
        )
        try:
            with os.fdopen(fd, "wb") as raw, zipfile.ZipFile(raw, "w") as zf:
                for full, rel in sources:
                    zf.write(full, rel)
            os.replace(tmp_path, zip_path)
        except BaseException:
            try:
                os.unlink(tmp_path)
            except OSError:
                pass
            raise
    return zip_path


def ensure_runtime_confs(spark: SparkSession) -> SparkSession:
    """Idempotently apply the runtime-settable confs to a live session.

    Safe to call per-query: ``spark.conf.set`` on an unchanged value is
    a no-op, and none of these confs are static (verified by running
    against a started session in this environment).
    """
    _ensure_package_on_workers(spark)
    for k, v in RUNTIME_CONFS.items():
        try:
            if spark.conf.get(k, None) != v:
                spark.conf.set(k, v)
        except Exception:
            # A conf may be unreadable on some builds; set best-effort.
            spark.conf.set(k, v)
    for k, (stock_default, better) in RUNTIME_DEFAULT_FIXES.items():
        try:
            # no-default get: returns the EFFECTIVE value ("200" when
            # unset); get(k, None) would return None for unset confs
            if spark.conf.get(k) == stock_default:
                spark.conf.set(k, better)
        except Exception:
            pass
    return spark


def build_session(app_name: str = "graphsense-datafeed-spark",
                  master: str | None = None) -> SparkSession:
    """Build the engine's SparkSession (tests/bench/CLI path).

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env var, else
    ``local[*]``) so the same code path serves CI and the bench driver.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    builder = SparkSession.builder.appName(app_name).master(master)
    for k, v in BUILDER_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    return ensure_runtime_confs(spark)
