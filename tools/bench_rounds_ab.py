"""Interleaved round-over-round engine A/B (the §12 attribution
protocol, now a committed tool instead of an ad-hoc session script).

Why: one-shot BENCH_r{N}.json records on this host swing ±50% with
co-tenant load (BENCH/BASELINE.md §12/§15), so round-over-round
comparisons are only meaningful when the engines run INTERLEAVED in
the same window. Rounds 3 and 4 each produced a false "regression"
one-shot that this protocol attributed to the box.

Usage:
    python tools/bench_rounds_ab.py LABEL=DIR [LABEL=DIR ...] \
        [--cycles N] [--sf-dir PATH] [--out PATH]

Each cycle runs `python bench.py` once per engine dir in the given
order (interleaving is the point — every engine sees the same host
window each cycle). Medians per engine land in --out
(default BENCH/rounds_ab_latest.json).

Engine dirs are typically git worktrees of older round commits:
    git worktree add -f /tmp/wt_r4 <round-4-final-sha>
    python tools/bench_rounds_ab.py r4=/tmp/wt_r4 r5=. --cycles 3
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys


def run_bench(engine_dir: str, sf_dir: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
    out = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=engine_dir,
        env=env,
        capture_output=True,
        text=True,
        check=True,
    )
    # bench.py contract: ONE JSON line on stdout (last non-empty line)
    line = [ln for ln in out.stdout.splitlines() if ln.strip()][-1]
    return json.loads(line)


def main() -> None:
    engines: list[tuple[str, str]] = []
    cycles, sf_dir = 3, "/root/testdata/sf0.1"
    out_path = "BENCH/rounds_ab_latest.json"
    args = iter(sys.argv[1:])
    for a in args:
        if a == "--cycles":
            cycles = int(next(args))
        elif a == "--sf-dir":
            sf_dir = next(args)
        elif a == "--out":
            out_path = next(args)
        else:
            label, d = a.split("=", 1)
            engines.append((label, os.path.abspath(d)))
    if len(engines) < 2:
        sys.exit("need at least two LABEL=DIR engines")

    raw: dict[str, list[dict]] = {label: [] for label, _ in engines}
    for c in range(cycles):
        for label, d in engines:
            r = run_bench(d, sf_dir)
            raw[label].append(r)
            print(
                json.dumps(
                    {
                        "cycle": c,
                        "engine": label,
                        "wall_s": r.get("value"),
                        "build_docs_per_sec": r.get("build_docs_per_sec"),
                        "q_p50": r.get("query_p50_sec"),
                        "q_p95": r.get("query_p95_sec"),
                        "batch_qps": r.get("batch_qps"),
                    }
                ),
                flush=True,
            )

    def med(label: str, key: str):
        vals = [r[key] for r in raw[label] if r.get(key) is not None]
        return round(statistics.median(vals), 4) if vals else None

    summary = {
        label: {
            "wall_median_s": med(label, "value"),
            "walls": [r.get("value") for r in raw[label]],
            "build_docs_per_sec": [
                r.get("build_docs_per_sec") for r in raw[label]
            ],
            "build_median": med(label, "build_docs_per_sec"),
            "q_p50": [r.get("query_p50_sec") for r in raw[label]],
            "q_p50_median": med(label, "query_p50_sec"),
            "q_p95_median": med(label, "query_p95_sec"),
            "batch_qps_median": med(label, "batch_qps"),
            "serve_p50_ms": (
                round(med(label, "serve_p50_sec") * 1000, 1)
                if med(label, "serve_p50_sec") is not None
                else None
            ),
        }
        for label, _ in engines
    }
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
