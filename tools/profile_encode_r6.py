"""Round-6: postings encode-stage breakdown.

Builds docs/tf/dl once, then times:
  - impacts + build_segments -> noop   (exchange + Python encode, no write)
  - impacts + build_segments -> parquet partitionBy(bucket)  (the real stage)
  - file count / sizes of the postings dir
  - shuffle bytes delta per variant

Usage: python tools/profile_encode_r6.py [N_FILES]
"""

import glob
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from documentindex_spark.corpus import generate_repo_files
from documentindex_spark.functions.tokenize import term_frequencies_colocated
from documentindex_spark.operators.bm25 import impacts
from documentindex_spark.operators.postings import build_segments
from documentindex_spark.operators.stats import corpus_stats, document_frequencies
from documentindex_spark.plans.metrics import executor_totals, delta
from documentindex_spark.session import get_spark
from documentindex_spark.sources.registry import with_doc_ids

N = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
spark = get_spark("profile-encode-r6", master="local[32]", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
out = tempfile.mkdtemp(prefix="profe-")

g = generate_repo_files(spark, N).persist()
files = with_doc_ids(g)
files.write.mode("overwrite").parquet(f"{out}/docs")
docs = spark.read.parquet(f"{out}/docs")
term_frequencies_colocated(docs).write.mode("overwrite").parquet(f"{out}/tf")
tf = spark.read.parquet(f"{out}/tf")
docs.select("doc_id").join(
    tf.groupBy("doc_id").agg(F.sum("tf").alias("dl")), "doc_id", "left"
).select("doc_id", F.coalesce(F.col("dl"), F.lit(0)).cast("long").alias("dl")
).write.mode("overwrite").parquet(f"{out}/dl")
dl = spark.read.parquet(f"{out}/dl")
stats = corpus_stats(dl)
dfreq = document_frequencies(tf)
print(f"setup done: n_docs={stats.n_docs} avgdl={stats.avgdl:.1f}", flush=True)

NUM = {}


def run(label, fn):
    snap = executor_totals(spark)
    t0 = time.time()
    fn()
    dt = time.time() - t0
    d = delta(snap, executor_totals(spark))
    print(
        f"{label:40s} {dt:7.2f}s  shufW={d.get('shuffle_write_bytes', 0)/1e6:8.1f}MB "
        f"shufR={d.get('shuffle_read_bytes', 0)/1e6:8.1f}MB",
        flush=True,
    )
    NUM[label] = dt


imp = impacts(tf, dl, dfreq, stats)

run("impacts only (noop)", lambda: imp.write.format("noop").mode("overwrite").save())
run(
    "build_segments (noop)",
    lambda: build_segments(imp, stats.n_docs).write.format("noop").mode("overwrite").save(),
)
run(
    "build_segments write partBy(bucket)",
    lambda: build_segments(imp, stats.n_docs)
    .write.mode("overwrite")
    .partitionBy("bucket")
    .parquet(f"{out}/postings"),
)
run(
    "build_segments repart(bucket)+write",
    lambda: build_segments(imp, stats.n_docs)
    .repartition("bucket")
    .write.mode("overwrite")
    .partitionBy("bucket")
    .parquet(f"{out}/postings2"),
)

for p in (f"{out}/postings", f"{out}/postings2"):
    fl = glob.glob(f"{p}/**/*.parquet", recursive=True)
    tot = sum(os.path.getsize(f) for f in fl)
    print(f"{os.path.basename(p)}: {len(fl)} files, {tot/1e6:.1f}MB total", flush=True)

# how does the pruned read look against each layout?
for p in (f"{out}/postings", f"{out}/postings2"):
    d = spark.read.parquet(p)
    print(f"{os.path.basename(p)}: scan partitions = {d.rdd.getNumPartitions()}", flush=True)

import shutil

shutil.rmtree(out, ignore_errors=True)
spark.stop()
