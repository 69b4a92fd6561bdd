"""Per-stage shuffle-byte table (round-4 verdict #1, second half).

The transferable 4N-cluster scaling evidence this sandbox CAN produce:
bytes shuffled per input byte, per build stage, read from the
``shuffle`` records plans/metrics.py writes into every build's
``_manifest.json``. A stage whose shuffle volume is a small constant
fraction of its input parallelizes to 4N executors over a real
network; one that shuffles multiples of its input serializes on the
exchange regardless of executor count.

Usage: python tools/bench_shuffle_bytes.py [n_files]
Default 20000 files (sf0.1-equivalent). Builds a fresh index in a
tmpfs workdir, then prints the manifest's per-stage byte accounting
and writes BENCH/shuffle_bytes.json.
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

from documentindex_spark.corpus import generate_repo_files  # noqa: E402
from documentindex_spark.plans.build_index import build_index  # noqa: E402
from documentindex_spark.plans.checkpoint import Manifest  # noqa: E402
from documentindex_spark.session import get_spark  # noqa: E402
from documentindex_spark.sources.registry import with_doc_ids  # noqa: E402


def main() -> None:
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    spark = get_spark(
        "dix-shuffle-bytes",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")
    workdir = tempfile.mkdtemp(
        prefix="dix-shufb-",
        dir="/dev/shm" if os.path.isdir("/dev/shm") else None,
    )
    try:
        docs = with_doc_ids(generate_repo_files(spark, n_files))
        t0 = time.time()
        built = build_index(
            spark, docs, os.path.join(workdir, "idx"),
            input_id=f"shufb@{n_files}",
        )
        wall = time.time() - t0
        man = Manifest.load(built.out_dir)
        stages = {}
        totals = {"input_bytes": 0, "shuffle_write_bytes": 0,
                  "shuffle_read_bytes": 0, "output_bytes": 0}
        for name, rec in man.stages.items():
            sh = rec.get("shuffle")
            if not sh:
                continue
            stages[name] = sh
            for k in totals:
                totals[k] += int(sh.get(k, 0))
        summary = {
            "n_files": n_files,
            "cores": int(cpus),
            "build_sec": round(wall, 2),
            "stages": stages,
            "totals": {
                **totals,
                "shuffle_write_per_input_byte": (
                    round(totals["shuffle_write_bytes"]
                          / totals["input_bytes"], 4)
                    if totals["input_bytes"] else None
                ),
            },
        }
        print(json.dumps(summary, indent=1), flush=True)
        os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
        with open(os.path.join(REPO, "BENCH", "shuffle_bytes.json"), "w") as f:
            json.dump(summary, f, indent=1)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
