"""Structured Streaming over the events table + batch-equivalent
plans for oracle checking.

The reference's 'streaming' is async result delivery
(/root/reference/src/documentindex/streaming.py:119-195 — progress
callbacks and per-batch match generators), not event-time processing;
those map to accumulators/metrics (SURVEY.md §2.9). THIS module is
the target-side Structured Streaming surface a large-scale pipeline
needs: watermarked tumbling-window aggregation and sessionization,
each with a batch twin that the streaming output is asserted equal to
(tests) and that DuckDB can oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def windowed_counts_batch(events: DataFrame, minutes: int = 5) -> DataFrame:
    """Tumbling-window counts+sums per event_type — batch twin.
    (win_start, event_type, n, total)."""
    return (
        events.groupBy(
            F.window("ts", f"{minutes} minutes").alias("win"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 6).alias("total"),
        )
        .select(
            F.col("win.start").alias("win_start"), "event_type", "n", "total"
        )
    )


def windowed_counts_stream(
    spark: SparkSession, events_path: str, minutes: int = 5,
    watermark: str = "10 minutes",
) -> DataFrame:
    """The same plan as a watermarked stream (parquet source —
    file-by-file micro-batches locally; swap the source for Kafka in
    production, the plan is identical)."""
    stream = (
        spark.readStream.format("parquet")
        .schema(EVENTS_SCHEMA)
        .option("path", events_path)
        .load()
    )
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", f"{minutes} minutes").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 6).alias("total"),
        )
        .select(
            F.col("win.start").alias("win_start"), "event_type", "n", "total"
        )
    )


def run_stream_to_memory(
    agg: DataFrame, name: str = "stream_out"
) -> None:
    """Drive a bounded source to completion synchronously (local
    smoke-test harness: memory sink + processAllAvailable)."""
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Sessionization: lag(ts) per user → new-session flag on
    gap > threshold → cumulative sum = session index.
    (user_id, session_idx, session_start, session_end, n_events).
    The streaming twin is session_window(ts, gap); batch version is
    fully SQL-expressible for the oracle."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # cast via timestamp: parquet TIMESTAMP_NTZ has no direct long cast
    epoch = F.col("ts").cast("timestamp").cast("long")
    flagged = events.withColumn(
        "new_session",
        F.when(
            epoch - F.lag(epoch).over(w) > gap_minutes * 60,
            1,
        )
        .otherwise(0)
        .cast("int"),
    ).withColumn(
        "session_idx",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return flagged.groupBy("user_id", "session_idx").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    )
