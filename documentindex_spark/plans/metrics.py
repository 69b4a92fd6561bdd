"""Per-stage shuffle-byte accounting for build manifests.

The north rule's scaling criterion can't be demonstrated on this
sandbox (BENCH/BASELINE.md §13/§15: 32-thread runs hit the host's
memory-bandwidth ceiling at 17-23 effective cores burning 3.5-4x the
cpu-seconds), so the transferable evidence is the thing that predicts
4N-executor scaling on a REAL cluster regardless of host noise:
**bytes shuffled per input byte, per build stage**. A stage whose
shuffle volume is a small constant fraction of its input parallelizes
to 4N executors; one that shuffles multiples of its input serializes
on the exchange. These numbers land in every build's
``_manifest.json`` (``shuffle`` key per stage) and are reported in
BENCH/BASELINE.md.

Source: the JVM ``AppStatusStore`` (always populated — works with
``spark.ui.enabled=false``), read via py4j. Totals are cumulative
across completed stages of the session, so callers snapshot
before/after a stage's actions and record the delta; builds run
their jobs sequentially on one driver thread, so a delta is exactly
the enclosed work.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import SparkSession

FIELDS = (
    "input_bytes",
    "output_bytes",
    "shuffle_write_bytes",
    "shuffle_read_bytes",
)


def executor_totals(spark: SparkSession) -> dict[str, int]:
    """Cumulative bytes over all completed/active stages this session.

    Returns zeros when the status store is unreachable (foreign
    session managers) — accounting is best-effort telemetry, never a
    build failure.
    """
    tot = {f: 0 for f in FIELDS}
    tot["n_stages"] = 0
    try:
        sc = spark.sparkContext
        store = sc._jsc.sc().statusStore()
        gw = sc._gateway
        empty = gw.jvm.java.util.ArrayList()
        quantiles = gw.new_array(gw.jvm.double, 0)
        stages = store.stageList(empty, False, False, quantiles, empty)
        for i in range(stages.size()):
            s = stages.apply(i)
            tot["input_bytes"] += s.inputBytes()
            tot["output_bytes"] += s.outputBytes()
            tot["shuffle_write_bytes"] += s.shuffleWriteBytes()
            tot["shuffle_read_bytes"] += s.shuffleReadBytes()
            tot["n_stages"] += 1
    except Exception:
        pass
    return tot


def delta(before: dict[str, int], after: dict[str, int]) -> dict[str, Any]:
    """Stage-window byte deltas + the headline shuffle-per-input ratio."""
    d: dict[str, Any] = {
        f: int(after.get(f, 0) - before.get(f, 0)) for f in FIELDS
    }
    d["n_stages"] = int(after.get("n_stages", 0) - before.get("n_stages", 0))
    inp = d["input_bytes"]
    d["shuffle_write_per_input_byte"] = (
        round(d["shuffle_write_bytes"] / inp, 4) if inp > 0 else None
    )
    return d
