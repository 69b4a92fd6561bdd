"""Stage-by-stage build profiler (dev tool)."""

import os
import shutil
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
from documentindex_spark.session import get_spark
from documentindex_spark.sources.registry import with_doc_ids

N = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
spark = get_spark("profile", master="local[32]", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
out = tempfile.mkdtemp(prefix="prof-")

t = time.time()


def tick(label):
    global t
    now = time.time()
    print(f"{label:28s} {now - t:7.2f}s", flush=True)
    t = now


files = with_doc_ids(generate_repo_files(spark, N))
files.write.mode("overwrite").parquet(f"{out}/docs")
tick("gen+ids+write docs")

docs = spark.read.parquet(f"{out}/docs")
term_frequencies_colocated(docs).write.mode("overwrite").parquet(f"{out}/tf")
tick("tokenize+tf write")

tf = spark.read.parquet(f"{out}/tf")
docs.select("doc_id").join(
    tf.groupBy("doc_id").agg(F.sum("tf").alias("dl")), "doc_id", "left"
).select("doc_id", F.coalesce(F.col("dl"), F.lit(0)).cast("long").alias("dl")
).write.mode("overwrite").parquet(f"{out}/dl")
tick("dl write")

dl = spark.read.parquet(f"{out}/dl")
stats = corpus_stats(dl)
tick("stats")

imp = impacts(tf, dl, document_frequencies(tf), stats)
segs = build_segments(imp, stats.n_docs)
segs.write.mode("overwrite").partitionBy("bucket").parquet(f"{out}/postings")
tick("impacts+encode+write")

print("tf rows:", tf.count(), "segments:", spark.read.parquet(f"{out}/postings").count())
tick("counts")
shutil.rmtree(out, ignore_errors=True)
