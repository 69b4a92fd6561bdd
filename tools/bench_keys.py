"""Interleaved A/B: string-keyed vs int64-keyed (xxhash64) index
build — round-3 verdict #5, the next per-byte shuffle lever after the
§9 TF relocation.

Both arms build the SAME corpus into fresh directories, alternating
string/hashed per rep (CLAUDE.md noisy-box protocol), reporting
per-arm medians. The TF stage is checkpoint-shared per arm directory
— to measure the ENCODE path (where the keys matter) each build gets
a fresh out_dir so every stage runs. Writes BENCH/keys_ab.json.

Usage: python tools/bench_keys.py [N_FILES] [REPS]
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

from documentindex_spark.corpus import generate_repo_files
from documentindex_spark.plans.build_index import build_index
from documentindex_spark.session import get_spark
from documentindex_spark.sources.registry import (
    release_id_caches,
    with_doc_ids,
)


def main() -> None:
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    # 'wide' appends 12 doc-unique hex identifiers per document
    # (sha-derived, deterministic): the synthetic corpus has only
    # ~2.2k distinct terms — a dictionary-encoded string column that
    # small can't lose to an int64 — while real code corpora carry
    # millions of unique symbols. wide ≈ n_files × 12 vocab.
    mode = sys.argv[3] if len(sys.argv) > 3 else "corpus"
    spark = get_spark("bench-keys")
    from pyspark.sql import functions as F

    files = with_doc_ids(generate_repo_files(spark, n_files))
    if mode == "wide":
        idents = F.concat_ws(
            " ",
            *[
                F.substring(
                    F.md5(F.concat_ws("-", "doc_id", F.lit(str(i)))), 1, 12
                )
                for i in range(12)
            ],
        )
        files = files.withColumn(
            "content", F.concat_ws(" ", "content", idents)
        )
    files = files.cache()
    files.count()

    base = "/tmp/dix_keys_ab"
    shutil.rmtree(base, ignore_errors=True)
    times: dict[str, list[float]] = {"string": [], "hashed": []}
    for rep in range(reps):
        for arm, flag in (("string", False), ("hashed", True)):
            out = os.path.join(base, f"{arm}_{rep}")
            t0 = time.time()
            build_index(
                spark,
                files,
                out,
                input_id=f"keys-ab@{n_files}",
                bucket_groups=1,
                hashed_term_keys=flag,
            )
            times[arm].append(time.time() - t0)
            shutil.rmtree(out, ignore_errors=True)

    med = {a: statistics.median(t) for a, t in times.items()}
    res = {
        "n_files": n_files,
        "mode": mode,
        "reps": reps,
        "string_median_s": round(med["string"], 2),
        "hashed_median_s": round(med["hashed"], 2),
        "speedup": round(med["string"] / med["hashed"], 3),
        "string_all": [round(t, 2) for t in times["string"]],
        "hashed_all": [round(t, 2) for t in times["hashed"]],
        "files_per_s_hashed": round(n_files / med["hashed"], 1),
        "files_per_s_string": round(n_files / med["string"], 1),
    }
    os.makedirs("BENCH", exist_ok=True)
    out_name = ("BENCH/keys_ab.json" if mode == "corpus"
                else f"BENCH/keys_ab_{mode}.json")
    with open(out_name, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))
    release_id_caches()
    files.unpersist()


if __name__ == "__main__":
    main()
