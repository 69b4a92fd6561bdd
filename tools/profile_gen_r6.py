"""Round-6: how many times does the corpus generator run, and what
does each docs-stage component cost?

Usage: python tools/profile_gen_r6.py [N_FILES]
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from documentindex_spark.corpus import generate_repo_files
from documentindex_spark.session import get_spark
from documentindex_spark.sources.registry import with_doc_ids

N = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
spark = get_spark("profile-gen-r6", master="local[32]", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
out = tempfile.mkdtemp(prefix="profg-")


def tick(label, t0):
    print(f"{label:34s} {time.time() - t0:7.2f}s", flush=True)


# 1. generation alone (noop sink: computes every column, discards)
t0 = time.time()
generate_repo_files(spark, N).write.format("noop").mode("overwrite").save()
tick("gen only (noop)", t0)

t0 = time.time()
generate_repo_files(spark, N).write.format("noop").mode("overwrite").save()
tick("gen only again (noop)", t0)

# 2. gen + with_doc_ids (noop)
t0 = time.time()
with_doc_ids(generate_repo_files(spark, N)).write.format("noop").mode(
    "overwrite"
).save()
tick("gen + with_doc_ids (noop)", t0)

# 3. gen + ids + parquet write (the real docs stage)
t0 = time.time()
with_doc_ids(generate_repo_files(spark, N)).write.mode("overwrite").parquet(
    f"{out}/docs"
)
tick("gen + ids + parquet write", t0)

# 4. persisted-gen variant: materialize the corpus once, then ids
t0 = time.time()
g = generate_repo_files(spark, N).persist()
g.count()
tick("gen + persist + count", t0)
t0 = time.time()
with_doc_ids(g).write.mode("overwrite").parquet(f"{out}/docs2")
tick("ids + write (from persisted)", t0)
g.unpersist()

import shutil

shutil.rmtree(out, ignore_errors=True)
spark.stop()
