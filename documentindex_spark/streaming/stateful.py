"""Custom stateful streaming operator — applyInPandasWithState.

The target-side pattern for stateful logic Structured Streaming's
built-ins can't express (task brief: "applyInPandasWithState for
custom stateful operators"). Here: per-user RUNNING totals that
survive across micro-batches — each update emits the user's
cumulative (n_events, total_value) so far, state carried in the
streaming state store (RocksDB/HDFS-backed on a cluster; the same
code runs unchanged).

Batch twin: a plain groupBy aggregate — the stream's LAST update per
user must equal it exactly (asserted in tests/test_stateful_stream.py
with maxFilesPerTrigger=1, so state genuinely crosses micro-batch
boundaries).
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .events import EVENTS_SCHEMA

_OUT_SCHEMA = "user_id long, n_events long, total_value double"
_STATE_SCHEMA = "n long, total double"


def _update_user(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: Any
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [round(total, 6)],
        }
    )


def running_user_totals_stream(
    spark: SparkSession,
    events_path: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming DataFrame of per-user running totals (update mode).
    ``max_files_per_trigger=1`` forces one micro-batch per input file
    so tests exercise real cross-batch state."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    reader = (
        spark.readStream.format("parquet")
        .schema(EVENTS_SCHEMA)
        .option("path", events_path)
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.load()
    return stream.groupBy("user_id").applyInPandasWithState(
        _update_user,
        _OUT_SCHEMA,
        _STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


def running_user_totals_batch(events: DataFrame) -> DataFrame:
    """Batch twin: the final state every user converges to."""
    return events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 6).alias("total_value"),
    )
