"""Row-group-size A/B for the postings layout, co-tenant-proof:
build ONE index, rewrite its postings with 2m vs 16m row groups, and
time the serving paths interleaved in the same host window.

Usage: python tools/bench_rowgroup_ab_r6.py [N_FILES] [REPS]
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow.dataset as ds
from pyspark.sql import functions as F

from documentindex_spark.corpus import generate_repo_files
from documentindex_spark.operators.bmw import bmw_serve_arrow, bmw_topk
from documentindex_spark.plans.build_index import build_index
from documentindex_spark.queryset import reference_query_set
from documentindex_spark.session import get_spark
from documentindex_spark.sources.registry import with_doc_ids

N = int(sys.argv[1]) if len(sys.argv) > 1 else 200000
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 5
spark = get_spark("rowgroup-ab-r6", master="local[32]", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
out = tempfile.mkdtemp(prefix="rgab-")

docs = with_doc_ids(generate_repo_files(spark, N))
built = build_index(spark, docs, out, input_id=f"rgab@{N}", bucket_groups=1)
base = spark.read.parquet(built.postings_path)

paths = {}
for label, size in (("rg2m", 2 * 1024 * 1024), ("rg16m", 16 * 1024 * 1024)):
    p = f"{out}/p_{label}"
    (
        base.repartition("bucket")
        .sortWithinPartitions("bucket", "term", "seg_idx")
        .write.mode("overwrite")
        .option("parquet.block.size", str(size))
        .partitionBy("bucket")
        .parquet(p)
    )
    paths[label] = p

QS = [(q["query_text"], q["k"]) for q in reference_query_set()]
datasets = {
    k: ds.dataset(p, format="parquet", partitioning="hive")
    for k, p in paths.items()
}
persisted = {}
for k, p in paths.items():
    d = spark.read.parquet(p).persist()
    d.count()
    persisted[k] = d

res = {k: {"arrow": [], "spark": []} for k in paths}
for rep in range(REPS):
    for k in paths:
        # warm
        bmw_serve_arrow(paths[k], "warmup", k=10, dataset=datasets[k])
        t0 = time.time()
        for q, kk in QS:
            bmw_serve_arrow(
                paths[k], q, k=kk, max_collect_postings=50_000_000,
                dataset=datasets[k],
            )
        res[k]["arrow"].append(time.time() - t0)
        t0 = time.time()
        for q, kk in QS[:10]:
            bmw_topk(spark, persisted[k], {0: q}, k=kk).collect()
        res[k]["spark"].append(time.time() - t0)
        print(
            f"rep{rep} {k:6s} arrow50={res[k]['arrow'][-1]:6.2f}s "
            f"spark10={res[k]['spark'][-1]:6.2f}s",
            flush=True,
        )

for k in paths:
    a = sorted(res[k]["arrow"])
    s = sorted(res[k]["spark"])
    print(
        f"{k}: arrow50 med {a[len(a)//2]:.2f}s  spark10 med {s[len(s)//2]:.2f}s",
        flush=True,
    )

import shutil

shutil.rmtree(out, ignore_errors=True)
spark.stop()
