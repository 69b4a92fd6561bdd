"""Interleaved A/B: per-query vocabulary Generate (round-3
correct_query) vs the stored deletion-variant sidecar (round-4).

Both paths start from the SAME cached vocabulary frame so the measured
delta is exactly the lever: re-running the SymSpell explode + full
variant join per query, versus a v1-partition-pruned scan of the
persisted table + broadcast join. Interleaved reps, medians (CLAUDE.md
box-noise protocol). Writes BENCH/fuzzy_ab.json.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

from documentindex_spark.operators.fuzzy import fuzzy_term_matches
from documentindex_spark.plans.fuzzy_table import (
    build_fuzzy_table,
    fuzzy_matches_stored,
)
from documentindex_spark.session import get_spark

# OOV-shaped tokens in the hex alphabet of the synthetic vocabulary
QUERIES = [
    ["c4ca42", "a87ff6"],
    ["eccbc8", "e4da3b1"],
    ["167909", "8f14e4", "c9f0f8"],
    ["45c48c"],
    ["d3d944", "6512bd"],
]


def main() -> None:
    # The testdata corpora have ~31 distinct terms (synthetic word
    # bank) — at that size both paths are pure job overhead. The
    # correction operator's cost is vocabulary-driven, so the A/B runs
    # on a deterministic 200k-term vocabulary (sha-derived, like a
    # real 100 TB corpus's term dictionary).
    n_vocab = int(os.environ.get("FUZZY_AB_VOCAB", "200000"))
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark("bench-fuzzy")
    from pyspark.sql import functions as F

    vocab = (
        spark.range(n_vocab)
        .select(
            F.substring(
                F.md5(F.col("id").cast("string")),
                1,
                (F.col("id") % 8 + 5).cast("int"),
            ).alias("term"),
            (F.col("id") % 997 + 1).alias("df"),
        )
        .groupBy("term")
        .agg(F.max("df").alias("df"))
        .persist()
    )
    n_terms = vocab.count()

    out = "/tmp/dix_fuzzy_ab"
    t0 = time.time()
    build_fuzzy_table(vocab, out)
    build_s = time.time() - t0

    old_times, new_times = [], []
    for rep in range(reps):
        for qts in QUERIES:
            t0 = time.time()
            fuzzy_term_matches(vocab, qts).collect()
            old_times.append(time.time() - t0)
            t0 = time.time()
            fuzzy_matches_stored(spark, out, qts).collect()
            new_times.append(time.time() - t0)

    res = {
        "vocab": "synthetic sha-derived",
        "n_terms": n_terms,
        "reps": reps,
        "n_queries": len(QUERIES),
        "sidecar_build_s": round(build_s, 3),
        "per_query_generate_median_s": round(
            statistics.median(old_times), 4
        ),
        "stored_sidecar_median_s": round(statistics.median(new_times), 4),
        "speedup": round(
            statistics.median(old_times) / statistics.median(new_times), 2
        ),
        "old_all": [round(t, 4) for t in old_times],
        "new_all": [round(t, 4) for t in new_times],
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/fuzzy_ab.json", "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
