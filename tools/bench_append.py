"""Append-cost scaling evidence (round-4 verdict #2 'Done' criterion).

Measures ``append_documents`` wall time for a FIXED batch against
indexes of increasing corpus size, in both modes:

  exact        — re-derives stats/impacts/segments over combined TF:
                 cost grows with CORPUS size (the round-4 gap);
  stale_stats  — encodes the batch as a new segment group under
                 frozen stats: cost should be ~flat in corpus size
                 (a function of the BATCH only).

Usage: python tools/bench_append.py [corpus_sizes_csv] [batch]
Defaults: corpora 2000,8000,32000 files; batch 500 files.
Writes BENCH/append_cost.json and prints one JSON line per cell.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from documentindex_spark.corpus import generate_repo_files  # noqa: E402
from documentindex_spark.plans.build_index import build_index  # noqa: E402
from documentindex_spark.plans.incremental import append_documents  # noqa: E402
from documentindex_spark.session import get_spark  # noqa: E402
from documentindex_spark.sources.registry import with_doc_ids  # noqa: E402


def main() -> None:
    corpora = (
        [int(s) for s in sys.argv[1].split(",")]
        if len(sys.argv) > 1
        else [2000, 8000, 32000]
    )
    batch_n = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    spark = get_spark(
        "dix-append-cost",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")
    workdir = tempfile.mkdtemp(
        prefix="dix-append-",
        dir="/dev/shm" if os.path.isdir("/dev/shm") else None,
    )
    cells = []
    try:
        # batch = files [10^7, 10^7+batch_n): disjoint from every corpus
        batch = with_doc_ids(
            generate_repo_files(spark, batch_n).withColumn(
                "path", F.concat_ws("-", F.lit("new"), "path")
            )
        ).drop("doc_id")
        batch = batch.cache()
        batch.count()
        # Untimed warmup: JIT + codegen + pandas-UDF worker spin-up
        # dominate the first appends of a session (measured: a cold
        # 2k-corpus exact append reads 2x its warm cost), which buries
        # the corpus-size signal the tool exists to measure.
        warm_corpus = with_doc_ids(generate_repo_files(spark, 1000))
        for mode in ("exact", "stale"):
            wout = os.path.join(workdir, f"warm_{mode}")
            wbuilt = build_index(
                spark, warm_corpus, wout,
                input_id=f"warm@{mode}", bucket_groups=1,
            )
            append_documents(
                spark, wbuilt, batch,
                input_id=f"warm@{mode}+batch",
                stale_stats=(mode == "stale"),
                bucket_groups=1,
            )
            shutil.rmtree(wout, ignore_errors=True)
        for n in corpora:
            corpus = with_doc_ids(generate_repo_files(spark, n))
            for mode in ("exact", "stale"):
                out = os.path.join(workdir, f"idx_{n}_{mode}")
                built = build_index(
                    spark, corpus, out,
                    input_id=f"base@{n}", bucket_groups=1,
                )
                t0 = time.time()
                append_documents(
                    spark, built, batch,
                    input_id=f"base@{n}+batch@{batch_n}-{mode}",
                    stale_stats=(mode == "stale"),
                    bucket_groups=1,
                )
                wall = time.time() - t0
                cell = {
                    "corpus_files": n,
                    "batch_files": batch_n,
                    "mode": mode,
                    "append_sec": round(wall, 3),
                }
                cells.append(cell)
                print(json.dumps(cell), flush=True)
                shutil.rmtree(out, ignore_errors=True)

        def series(mode):
            return {
                c["corpus_files"]: c["append_sec"]
                for c in cells
                if c["mode"] == mode
            }

        ex, st = series("exact"), series("stale")
        lo, hi = min(corpora), max(corpora)
        summary = {
            "batch_files": batch_n,
            "cores": int(cpus),
            "exact_sec_by_corpus": ex,
            "stale_sec_by_corpus": st,
            # cost growth for a corpus-size multiple of hi/lo: exact
            # should grow toward that multiple, stale should stay ~1×
            "corpus_growth": round(hi / lo, 1),
            "exact_cost_growth": round(ex[hi] / ex[lo], 2),
            "stale_cost_growth": round(st[hi] / st[lo], 2),
        }
        print(json.dumps(summary), flush=True)
        os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
        with open(os.path.join(REPO, "BENCH", "append_cost.json"), "w") as f:
            json.dump(summary, f, indent=1)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
