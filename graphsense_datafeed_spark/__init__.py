"""graphsense_datafeed_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the query and data-processing capabilities of
``behas/graphsense-datafeed`` (a blockchain→Cassandra ingestion
pipeline; see SURVEY.md §1) as an idiomatic Spark DataFrame engine,
plus the large-scale training-data-pipeline operators (dedup,
similarity search, multimodal columns, text analysis) mandated by the
driver contract (SURVEY.md §0.1, §2.10).

Design stance (SURVEY.md §7):

- Pure public PySpark 4.1.2 DataFrame/SQL API. No RDDs in the public
  surface, no custom Catalyst rules — every operator is expressed
  declaratively so Catalyst/Tungsten/AQE pick the physical strategy.
- Explicit ``StructType`` schemas for every source (schemas.py);
  schema inference only in dev helpers.
- Every implemented operator is registered in the central registry
  (registry.py) with its DuckDB oracle SQL, which is exactly what the
  driver's correctness gate consumes via ``__spark_entry__.py``.
- Designed for 100 TB / multi-executor scale even though tests run on
  ``local[*]``: broadcast hints for dimension joins, partial
  aggregation everywhere, no driver-side collect loops, documented
  partition strategy per operator (see operator docstrings and
  SCALE.md).

NOTE ON PROVENANCE: ``/root/reference`` is empty in this environment
(verified — SURVEY.md §0), so reference citations in docstrings point
at SURVEY.md sections (the reconstructed spec) instead of
file:line of the reference repo.
"""

from graphsense_datafeed_spark.registry import (  # noqa: F401
    QUERIES,
    ORACLES,
    query,
    load_all_operators,
)
from graphsense_datafeed_spark.session import build_session, ensure_runtime_confs  # noqa: F401

__version__ = "0.1.0"
