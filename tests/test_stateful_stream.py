"""applyInPandasWithState: per-user running totals must cross
micro-batch boundaries (state store) and converge to the batch twin."""

from __future__ import annotations

import os

import pytest

from documentindex_spark.streaming.stateful import (
    running_user_totals_batch,
    running_user_totals_stream,
)


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """Events split across 3 parquet files so maxFilesPerTrigger=1
    yields 3 micro-batches with overlapping users."""
    out = str(tmp_path_factory.mktemp("ev_stream"))
    rows = [
        (i, f"2024-01-01 00:{i % 60:02d}:00", i % 5, "click", float(i))
        for i in range(90)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts_s string, user_id long, event_type string, value double"
    ).selectExpr(
        "event_id", "cast(ts_s as timestamp) as ts", "user_id",
        "event_type", "value", "cast(null as string) as props",
    )
    for part in range(3):
        df.filter(f"event_id % 3 = {part}").coalesce(1).write.mode(
            "append"
        ).parquet(out)
    return out


def test_running_totals_cross_batch_state(spark, events_dir, tmp_path):
    stream = running_user_totals_stream(
        spark, events_dir, max_files_per_trigger=1
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("running_totals")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    updates = spark.sql("select * from running_totals").collect()
    # >1 update per user proves multiple micro-batches hit the state
    per_user = {}
    for r in updates:
        per_user.setdefault(r["user_id"], []).append(
            (r["n_events"], r["total_value"])
        )
    assert all(len(v) >= 2 for v in per_user.values()), {
        u: len(v) for u, v in per_user.items()
    }
    # updates are distinct running snapshots (memory-sink row order is
    # not guaranteed, so compare as sets and take the max-n snapshot)
    for u, v in per_user.items():
        assert len({n for n, _ in v}) == len(v), (u, v)
    last = {u: max(v) for u, v in per_user.items()}
    events = spark.read.parquet(events_dir)
    want = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in running_user_totals_batch(events).collect()
    }
    assert last == want
