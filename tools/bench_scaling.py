"""Two-cluster-size scaling benchmark (north rule: N vs 4N executors,
efficiency = tput(4N) / (4 × tput(N)) ≥ 0.8).

No real cluster exists in this sandbox, so the two 'cluster sizes'
are local[8] and local[32] on the same input — same job, same
engine.zip, launched via spark-submit --py-files exactly as a cluster
run would be. Results land in BENCH/BASELINE.md.

Usage: python tools/bench_scaling.py [n_files] [repeats] [n_cores] [n4_cores]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


def make_engine_zip(tmp: str) -> str:
    base = os.path.join(tmp, "engine")
    return shutil.make_archive(
        base, "zip", root_dir=REPO, base_dir="documentindex_spark"
    )


def gen_corpus(tmp: str, n_files: int) -> str:
    from documentindex_spark.corpus import generate_repo_files
    from documentindex_spark.session import get_spark
    from documentindex_spark.sources.registry import with_doc_ids

    path = os.path.join(tmp, "corpus")
    spark = get_spark("gen", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    with_doc_ids(generate_repo_files(spark, n_files)).write.mode(
        "overwrite"
    ).parquet(path)
    spark.stop()
    return path


def run_once(zip_path: str, corpus: str, cores: int, tmp: str) -> dict:
    out = os.path.join(tmp, f"idx_{cores}_{time.time_ns()}")
    cmd = [
        SPARK_SUBMIT,
        "--master", f"local[{cores}]",
        "--driver-memory", "12g",
        "--py-files", zip_path,
        os.path.join(REPO, "tools", "bench_build.py"),
        "--corpus", corpus,
        "--out", out,
    ]
    # Popen + os.wait4: capture the process tree's ACCUMULATED CPU
    # time (ru_utime+ru_stime of the child incl. reaped descendants).
    # cpu_sec / build_sec = effective cores actually delivered — the
    # noise-robust scaling signal on this variance-prone VM.
    with open(os.path.join(tmp, "run.out"), "w+") as fo:
        proc = subprocess.Popen(cmd, stdout=fo, stderr=subprocess.DEVNULL)
        _, status, ru = os.wait4(proc.pid, 0)
        fo.seek(0)
        stdout = fo.read()
    shutil.rmtree(out, ignore_errors=True)
    if status != 0:
        raise RuntimeError(f"spark-submit failed:\n{stdout[-3000:]}")
    for line in stdout.splitlines():
        if line.startswith("{"):
            r = json.loads(line)
            r["cpu_sec"] = round(ru.ru_utime + ru.ru_stime, 1)
            r["effective_cores"] = round(r["cpu_sec"] / r["build_sec"], 2)
            return r
    raise RuntimeError(f"no JSON from spark-submit:\n{stdout[-2000:]}")


# Healthy-window reference for the early-abort gate (BASELINE.md §15):
# an 8-core 80k-file build burns 432-713 cpu_sec on an uncontended box.
# Co-tenant windows inflate cpu_sec 2-6x; gating on the FIRST run's
# cpu_sec (scaled linearly by n_files) aborts a doomed session in one
# run instead of wasting the whole window.
HEALTHY_CPU_SEC_80K_8C = (432.0, 713.0)
ABORT_FACTOR = 1.35  # abort when first-run cpu_sec > hi * this


def main() -> None:
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    n_lo = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    n_hi = int(sys.argv[4]) if len(sys.argv) > 4 else 32
    tag = sys.argv[5] if len(sys.argv) > 5 else ""
    # tmpfs workspace: with corpus+index on spinning /tmp the build is
    # IO-wait bound (loadavg ~2 during a 4-core run) and wall-clock
    # stops responding to cores at all.
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    tmp = tempfile.mkdtemp(prefix="dix-scaling-", dir=base)
    try:
        zip_path = make_engine_zip(tmp)
        corpus = gen_corpus(tmp, n_files)
        results: dict[int, list[dict]] = {n_lo: [], n_hi: []}
        # Early-abort gate: probe with ONE lo-core run and compare its
        # cpu_sec against the healthy reference scaled by corpus size
        # (only calibrated for the 8-core level; other lo levels skip).
        first = run_once(zip_path, corpus, n_lo, tmp)
        print(json.dumps(first), flush=True)
        if n_lo == 8:
            scale = n_files / 80000.0
            hi_ok = HEALTHY_CPU_SEC_80K_8C[1] * scale * ABORT_FACTOR
            if first["cpu_sec"] > hi_ok:
                probe = {
                    "aborted": True,
                    "reason": "first-run cpu_sec gate",
                    "n_files": n_files,
                    "first_run": first,
                    "healthy_cpu_sec_hi_scaled": round(hi_ok, 1),
                }
                print(json.dumps(probe), flush=True)
                os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
                with open(
                    os.path.join(
                        REPO, "BENCH", f"scaling_probe{tag}_aborted.json"
                    ),
                    "w",
                ) as f:
                    json.dump(probe, f, indent=1)
                return
        results[n_lo].append(first)
        # interleave runs so background-noise drift hits both levels
        r = run_once(zip_path, corpus, n_hi, tmp)
        results[n_hi].append(r)
        print(json.dumps(r), flush=True)
        for _ in range(repeats - 1):
            for cores in (n_lo, n_hi):
                r = run_once(zip_path, corpus, cores, tmp)
                results[cores].append(r)
                print(json.dumps(r), flush=True)
        import statistics

        med_lo = statistics.median(r["files_per_sec"] for r in results[n_lo])
        med_hi = statistics.median(r["files_per_sec"] for r in results[n_hi])
        best_lo = max(r["files_per_sec"] for r in results[n_lo])
        best_hi = max(r["files_per_sec"] for r in results[n_hi])
        eff = med_hi / ((n_hi / n_lo) * med_lo)
        summary = {
            "n_files": n_files,
            "cores": [n_lo, n_hi],
            f"tput_{n_lo}_median": round(med_lo, 1),
            f"tput_{n_hi}_median": round(med_hi, 1),
            f"tput_{n_lo}_best": best_lo,
            f"tput_{n_hi}_best": best_hi,
            "scaling_efficiency": round(eff, 3),
            "scaling_efficiency_best": round(
                best_hi / ((n_hi / n_lo) * best_lo), 3
            ),
            "pass": eff >= 0.8,
            "runs": results,
        }
        print(json.dumps(summary), flush=True)
        os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
        with open(
            os.path.join(REPO, "BENCH", f"scaling_{n_lo}_{n_hi}{tag}.json"),
            "w",
        ) as f:
            json.dump(summary, f, indent=1)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
