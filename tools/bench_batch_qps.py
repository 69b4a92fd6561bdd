"""Concurrent-query saturation curve (round-4 verdict #5).

Single-query p50 on this box is scheduler-bound (~0.75s regardless of
partition tuning, BENCH/BASELINE.md §14), so the metric that scales to
a 100× cluster is CONCURRENT throughput: queries/sec when thousands of
queries run as ONE batched ``bmw_topk`` job (broadcast (query_id,term)
join → one applyInPandas group per query — embarrassingly parallel
across executors).

Usage: python tools/bench_batch_qps.py [n_files] [sizes_csv]
Defaults: 20000 files (sf0.1-equivalent), sizes 500,5000,20000,50000.
Writes BENCH/batch_qps.json and prints one JSON line per size.

Query synthesis is deterministic (md5 order over the index vocabulary,
cycling 1/2/3-term shapes). NOTE the synthetic-vocab caveat
(CLAUDE.md): generate_repo_files yields ~2.2k distinct terms at 20k
files, so a 50k-query batch re-hits every term many times — hotter
(i.e. harsher on the seg-row fan-out join) than a production query
log with a long rare tail.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from documentindex_spark.corpus import generate_repo_files  # noqa: E402
from documentindex_spark.operators.bmw import bmw_topk  # noqa: E402
from documentindex_spark.plans.build_index import build_index  # noqa: E402
from documentindex_spark.session import get_spark  # noqa: E402
from documentindex_spark.sources.registry import with_doc_ids  # noqa: E402


def synth_queries(vocab: list[str], n: int) -> dict[int, str]:
    """Deterministic n-query workload: md5-shuffled vocabulary,
    cycling 1-, 2-, 3-term queries (the reference set's shape mix)."""
    ordered = sorted(
        vocab, key=lambda t: hashlib.md5(t.encode()).hexdigest()
    )
    nv = len(ordered)
    out: dict[int, str] = {}
    for i in range(n):
        n_terms = (i % 3) + 1
        terms = [ordered[(i * 7 + j * 131) % nv] for j in range(n_terms)]
        out[i] = " ".join(terms)
    return out


def main() -> None:
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    sizes = (
        [int(s) for s in sys.argv[2].split(",")]
        if len(sys.argv) > 2
        else [500, 5000, 20000, 50000]
    )
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    spark = get_spark(
        "dix-batch-qps",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")
    workdir = tempfile.mkdtemp(
        prefix="dix-qps-", dir="/dev/shm" if os.path.isdir("/dev/shm") else None
    )
    t_cpu0 = time.process_time()
    try:
        docs = with_doc_ids(generate_repo_files(spark, n_files))
        built = build_index(
            spark, docs, os.path.join(workdir, "idx"),
            input_id=f"qps@{n_files}", bucket_groups=1,
        )
        postings = spark.read.parquet(built.postings_path).persist()
        postings.count()
        vocab = [r["term"] for r in postings.select("term").distinct().collect()]
        # warmup: JIT + pandas-UDF worker spinup out of the timings
        bmw_topk(spark, postings, synth_queries(vocab, 32), k=10).count()

        results = []
        for size in sizes:
            qs = synth_queries(vocab, size)
            t0 = time.time()
            rows = bmw_topk(spark, postings, qs, k=10).count()
            wall = time.time() - t0
            rec = {
                "batch_size": size,
                "wall_sec": round(wall, 3),
                "qps": round(size / wall, 1),
                "ms_per_query": round(1000 * wall / size, 3),
                "result_rows": rows,
            }
            results.append(rec)
            print(json.dumps(rec), flush=True)

        summary = {
            "n_files": n_files,
            "cores": int(cpus),
            "vocab": len(vocab),
            "curve": results,
            "saturation_qps": max(r["qps"] for r in results),
            "cpu_sec_driver": round(time.process_time() - t_cpu0, 1),
        }
        print(json.dumps(summary), flush=True)
        os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
        with open(os.path.join(REPO, "BENCH", "batch_qps.json"), "w") as f:
            json.dump(summary, f, indent=1)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
