"""SURVEY §2.9 `stream_stateful` — arbitrary stateful streaming.

The reference daemon's only state is "last ingested height"; the
general form is a per-key state machine evolved by
``applyInPandasWithState`` — here, each user's running event count and
value total, emitted per micro-batch.

Scale notes: state is hash-partitioned by key across executors and
persisted in the checkpointed state store; a GroupStateTimeout evicts
idle keys in production (not set here — the fixture key space is
bounded). Per-key state must stay O(1); accumulating raw events into
state is never acceptable.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from graphsense_datafeed_spark.registry import query
from graphsense_datafeed_spark.streaming.windows import (
    read_events_stream,
    run_stream_to_memory,
)

_STATE_SCHEMA = "n_events bigint, total_cents bigint"
_OUT_SCHEMA = "user_id bigint, n_events bigint, total_cents bigint"


@query("stream_stateful")
def stream_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user running (count, cents-total) state machine. Rows-only
    in the driver (statefulness isn't batch-SQL-expressible);
    tests/test_streaming.py asserts the final state equals the batch
    aggregate and that state carries across micro-batches.

    The state fn is a closure so cloudpickle ships it by value —
    executor workers don't have this package on sys.path when the
    driver session was launched elsewhere."""

    def update_user_state(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        n, cents = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            cents += int(pdf["value"].mul(100).round().astype("int64").sum())
        state.update((n, cents))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_cents": [cents]}
        )

    s = read_events_stream(spark, sf_dir).select("user_id", "value")
    updated = s.groupBy("user_id").applyInPandasWithState(
        update_user_state,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    out = run_stream_to_memory(spark, updated, "update")
    # Multiple micro-batches emit one row per (user, batch); the final
    # state per user is the last emission == max n_events.
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (
        out.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "n_events", "total_cents")
    )
