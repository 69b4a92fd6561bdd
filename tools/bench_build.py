"""spark-submit entry: build the inverted index over a pre-generated
corpus and print one JSON line with throughput.

Usage:
    spark-submit --master local[N] --py-files engine.zip \
        tools/bench_build.py --corpus /path/docs.parquet --out /path/idx

The corpus is READ from parquet (generation is input prep, not
indexing — it is excluded from the timed window). The timed window is
the full build: tokenize → TF → stats → impacts → salted encode →
shuffle-merge → bucket-partitioned index + manifests.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    args = ap.parse_args()

    spark = (
        SparkSession.builder.appName("dix-bench-build")
        .config("spark.local.dir", "/dev/shm/spark-local")
        .config("spark.hadoop.parquet.block.size", str(16 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(16 * 1024 * 1024))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    cores = spark.sparkContext.defaultParallelism
    shuffle = args.shuffle_partitions or max(cores, 4)
    spark.conf.set("spark.sql.shuffle.partitions", str(shuffle))
    spark.sparkContext.setLogLevel("ERROR")

    from documentindex_spark.plans.build_index import build_index

    docs = spark.read.parquet(args.corpus)
    n = docs.count()

    shutil.rmtree(args.out, ignore_errors=True)
    t0 = time.time()
    build_index(
        spark,
        docs,
        args.out,
        input_id=f"{args.corpus}@{n}",
        bucket_groups=1,
        source_path=args.corpus,
    )
    dt = time.time() - t0
    with open(os.path.join(args.out, "_manifest.json")) as f:
        man = json.load(f)
    stage_walls = {
        s: round(v.get("wall_ms", 0) / 1000, 2)
        for s, v in man.items()
        if isinstance(v, dict)
    }
    print(
        json.dumps(
            {
                "cores": cores,
                "shuffle_partitions": shuffle,
                "n_files": n,
                "build_sec": round(dt, 3),
                "files_per_sec": round(n / dt, 2),
                "stage_walls": stage_walls,
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
