"""One-off diagnostic for the 320k-file TF-stage nonlinearity seen in
BENCH/datascale.json (tf stage 400s at 320k vs 14.7s at 80k on 8
cores). Times term_frequencies_colocated → parquet at 320k files
under the exact bench_build session config, at several explicit
partition counts, fresh JVM per run via spark-submit.

Usage: python tools/bench_tf320.py [n_files] [parts_csv]
Defaults: 320000 files; parts auto(0),64,256 (0 = the production
default sizing).
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

from tools.bench_scaling import SPARK_SUBMIT, gen_corpus, make_engine_zip  # noqa: E402

WORKER = r"""
import json, os, sys, time
sys.path.insert(0, os.environ["DIX_REPO"])
from pyspark.sql import SparkSession
corpus = os.environ["DIX_CORPUS"]
parts = int(os.environ["DIX_PARTS"])
out = os.environ["DIX_OUT"]
spark = (
    SparkSession.builder.appName("tf320")
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
spark.conf.set("spark.sql.shuffle.partitions", "8")
spark.sparkContext.setLogLevel("ERROR")
from documentindex_spark.functions.tokenize import term_frequencies_colocated
docs = spark.read.parquet(corpus)
t0 = time.time()
tf = term_frequencies_colocated(docs, "content",
                                num_partitions=(parts or None))
tf.write.mode("overwrite").parquet(out)
wall = time.time() - t0
n = spark.read.parquet(out).count()
print(json.dumps({"parts_arg": parts, "wall_sec": round(wall, 2),
                  "tf_rows": n,
                  "scan_parts": docs.rdd.getNumPartitions()}), flush=True)
spark.stop()
"""


def main() -> None:
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 320000
    parts_list = (
        [int(s) for s in sys.argv[2].split(",")]
        if len(sys.argv) > 2
        else [0, 64, 256]
    )
    tmp = tempfile.mkdtemp(prefix="dix-tf320-", dir="/dev/shm")
    try:
        zip_path = make_engine_zip(tmp)
        corpus = gen_corpus(tmp, n_files)
        wpath = os.path.join(tmp, "worker.py")
        with open(wpath, "w") as f:
            f.write(WORKER)
        results = []
        for parts in parts_list:
            out = os.path.join(tmp, f"tf_{parts}")
            env = dict(
                os.environ,
                DIX_REPO=REPO,
                DIX_CORPUS=corpus,
                DIX_PARTS=str(parts),
                DIX_OUT=out,
            )
            t0 = time.time()
            cp = subprocess.run(
                [SPARK_SUBMIT, "--master", "local[8]",
                 "--driver-memory", "12g", "--py-files", zip_path, wpath],
                env=env, capture_output=True, text=True,
            )
            shutil.rmtree(out, ignore_errors=True)
            line = next(
                (ln for ln in cp.stdout.splitlines() if ln.startswith("{")),
                None,
            )
            if cp.returncode != 0 or line is None:
                print("FAILED", cp.stdout[-1500:], cp.stderr[-1500:])
                continue
            rec = json.loads(line)
            rec["submit_sec"] = round(time.time() - t0, 1)
            results.append(rec)
            print(json.dumps(rec), flush=True)
        print(json.dumps({"n_files": n_files, "results": results}))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
