"""Weak scaling in DATA at fixed cores: the scaling axis this box can
measure cleanly.

The north rule's two-cluster-size criterion is blocked by the host's
memory-bandwidth ceiling above ~8 threads (BENCH/BASELINE.md §13/§15/
§16: 32-thread runs deliver 17-23 effective cores at 3-4x the
cpu-seconds). But the OTHER half of the scaling claim — cost LINEAR in
corpus size — is host-measurable: build the same engine over 1x/4x/16x
corpora on FIXED cores and check files/s stays flat. Combined with
§17's per-stage shuffle-bytes-linear-in-input table, this is the
complete transferable story: linear total work + linear exchange
volume -> a 4N cluster splits a fixed per-byte cost.

Usage: python tools/bench_datascale.py [sizes_csv] [cores] [repeats]
Defaults: 20000,80000,320000 files, 8 cores (the host's honest
parallelism plateau), 1 repeat. Fresh spark-submit JVM per run (same
protocol as tools/bench_scaling.py). Writes BENCH/datascale.json.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.bench_scaling import gen_corpus, make_engine_zip, run_once  # noqa: E402


def main() -> None:
    sizes = (
        [int(s) for s in sys.argv[1].split(",")]
        if len(sys.argv) > 1
        else [20000, 80000, 320000]
    )
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    tmp = tempfile.mkdtemp(prefix="dix-datascale-", dir=base)
    import shutil

    results: list[dict] = []
    try:
        zip_path = make_engine_zip(tmp)
        for n in sizes:
            corpus = gen_corpus(tmp, n)
            runs = []
            for _ in range(repeats):
                r = run_once(zip_path, corpus, cores, tmp)
                r["n_files"] = n
                runs.append(r)
                print(json.dumps(r), flush=True)
            results.append(
                {
                    "n_files": n,
                    "cores": cores,
                    "files_per_sec_median": round(
                        statistics.median(x["files_per_sec"] for x in runs), 1
                    ),
                    "build_sec_median": round(
                        statistics.median(x["build_sec"] for x in runs), 1
                    ),
                    "cpu_sec_median": round(
                        statistics.median(x["cpu_sec"] for x in runs), 1
                    ),
                    # the noise-robust signal on this box (CLAUDE.md):
                    # wall-clock swings ±50% with co-tenant load, but
                    # cpu-seconds per file measures the WORK, which is
                    # what must stay flat for weak scaling
                    "cpu_ms_per_file_median": round(
                        1000
                        * statistics.median(x["cpu_sec"] for x in runs)
                        / n,
                        2,
                    ),
                    "runs": runs,
                }
            )
            shutil.rmtree(corpus, ignore_errors=True)
        tp = [r["files_per_sec_median"] for r in results]
        summary = {
            "sizes": sizes,
            "cores": cores,
            "results": results,
            # flatness: smallest-size throughput is the reference;
            # 1.0 = perfectly linear cost in corpus size
            "throughput_ratio_vs_smallest": [
                round(t / tp[0], 3) for t in tp
            ],
        }
        print(json.dumps(summary), flush=True)
        os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
        with open(os.path.join(REPO, "BENCH", "datascale.json"), "w") as f:
            json.dump(summary, f, indent=1)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
