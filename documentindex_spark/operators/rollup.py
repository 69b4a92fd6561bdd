"""Hypertable-style multi-granularity rollups — GROUPING SETS.

A time-series pipeline materializes the same measure at several
granularities (continuous aggregates). Doing it as one GROUPING SETS
aggregate reads the input ONCE and lets Spark share the scan +
partial aggregation across grains, instead of G separate
groupBy jobs (the naive union re-scans G×).

Task-brief scope (large-scale pipeline ops, "hypertable rollup"
example); no reference analog — the reference has no time-series
surface. DuckDB supports the same GROUPING SETS/GROUPING()
semantics, so the driver entry is fully oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def multi_grain_rollup(events: DataFrame) -> DataFrame:
    """(grain ∈ {5m,1h,1d}, win_start, event_type, n, total) — all
    three granularities from one pass over the events table."""
    ev = events.select(
        F.window("ts", "5 minutes").getField("start").alias("g5"),
        F.date_trunc("hour", F.col("ts")).alias("gh"),
        F.date_trunc("day", F.col("ts")).alias("gd"),
        "event_type",
        "value",
    )
    return ev.sparkSession.sql(
        """
        SELECT CASE WHEN grouping(g5) = 0 THEN '5m'
                    WHEN grouping(gh) = 0 THEN '1h'
                    ELSE '1d' END AS grain,
               coalesce(g5, gh, gd) AS win_start,
               event_type,
               count(*) AS n,
               round(sum(value), 6) AS total
        FROM {ev}
        GROUP BY GROUPING SETS ((g5, event_type), (gh, event_type),
                                (gd, event_type))
        """,
        ev=ev,
    )
