"""Round-6 follow-up: batch (50-query / ~115-pair) attachment A/B.

The litmap attachment clearly wins for 1-3-pair interactive queries
(no BroadcastExchange job, no createDataFrame ship). For the
50-query batch the map literal has ~100 keys and every scanned
segment row pays a 100-key literal-map lookup + explode, where the
broadcast hash join pays a cheap hash probe — so the crossover may
sit far below _LITMAP_MAX_PAIRS=4096. Interleaved A/B at N docs.

Usage: python tools/profile_batch_r6.py [N_FILES] [REPS]
"""

from __future__ import annotations

import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from documentindex_spark.corpus import generate_repo_files
from documentindex_spark.operators import bmw as bmw_mod
from documentindex_spark.operators.bmw import bmw_topk
from documentindex_spark.plans.build_index import build_index
from documentindex_spark.queryset import reference_query_set
from documentindex_spark.session import get_spark
from documentindex_spark.sources.registry import with_doc_ids


def main():
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    spark = get_spark(
        "profile-batch-r6",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = tempfile.mkdtemp(prefix="dix-batch-ab-")
    docs = with_doc_ids(generate_repo_files(spark, n_files))
    built = build_index(
        spark, docs, out, input_id=f"batchab@{n_files}", bucket_groups=1
    )
    postings = spark.read.parquet(built.postings_path).persist()
    postings.count()
    queries = {
        i: q["query_text"] for i, q in enumerate(reference_query_set())
    }
    n_pairs = sum(
        len(bmw_mod.query_terms(q)) for q in queries.values()
    )
    bmw_topk(spark, postings, {0: "warmup"}, k=10).collect()

    def run_litmap():
        bmw_mod._LITMAP_MAX_PAIRS = 1 << 30
        return bmw_topk(spark, postings, queries, k=10).count()

    def run_join():
        bmw_mod._LITMAP_MAX_PAIRS = 0
        return bmw_topk(spark, postings, queries, k=10).count()

    saved = bmw_mod._LITMAP_MAX_PAIRS
    # warm both
    a0, b0 = run_litmap(), run_join()
    assert a0 == b0, (a0, b0)
    t_lit, t_join = [], []
    for _ in range(reps):
        t0 = time.time()
        run_litmap()
        t_lit.append(time.time() - t0)
        t0 = time.time()
        run_join()
        t_join.append(time.time() - t0)
    bmw_mod._LITMAP_MAX_PAIRS = saved
    print(
        {
            "n_files": n_files,
            "n_pairs": n_pairs,
            "reps": reps,
            "litmap_med_s": round(statistics.median(t_lit), 3),
            "join_med_s": round(statistics.median(t_join), 3),
            "litmap_all": [round(t, 3) for t in t_lit],
            "join_all": [round(t, 3) for t in t_join],
        }
    )
    import shutil

    shutil.rmtree(out, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
