"""A/B the TF stage: explode+hashAgg (current) vs map-side-complete
mapInPandas (term_frequencies_mapside) vs repartition-satisfied agg.

Interleaved reps, medians, same JVM (CLAUDE.md protocol); also emits
an order-independent identity hash per variant so a win can't ship a
semantics change.

Usage: python tools/bench_tf.py [N_FILES] [MASTER] [REPS]
"""

import json
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from documentindex_spark.corpus import generate_repo_files
from documentindex_spark.functions.tokenize import (
    term_frequencies,
    term_frequencies_mapside,
)
from documentindex_spark.session import get_spark
from documentindex_spark.sources.registry import with_doc_ids

N = int(sys.argv[1]) if len(sys.argv) > 1 else 80000
MASTER = sys.argv[2] if len(sys.argv) > 2 else "local[8]"
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 3
cores = int(MASTER.split("[")[1].rstrip("]"))

spark = get_spark("bench-tf", master=MASTER, shuffle_partitions=cores)
spark.sparkContext.setLogLevel("ERROR")
out = tempfile.mkdtemp(prefix="benchtf-")

files = with_doc_ids(generate_repo_files(spark, N))
files.write.mode("overwrite").parquet(f"{out}/docs")
docs = spark.read.parquet(f"{out}/docs")
print(f"docs ready: {docs.count()} files, master={MASTER}", flush=True)


def tf_repart(df):
    """One exchange of the CONTENT (not the tf rows): after
    repartition(doc_id), HashPartitioning(doc_id) satisfies the
    ClusteredDistribution(doc_id, term) so the agg plans no second
    exchange."""
    return (
        df.repartition(cores * 4, "doc_id")
        .select(
            "doc_id",
            F.explode(F.split(F.lower(F.col("content")), "[^a-z0-9]+")).alias(
                "term"
            ),
        )
        .where(F.col("term") != "")
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


VARIANTS = {
    "explode_hashagg": lambda: term_frequencies(docs),
    "mapside_pandas": lambda: term_frequencies_mapside(docs),
    "repart_content": lambda: tf_repart(docs),
}

# identity check first (cheap aggregate, order-independent)
hashes = {}
for name, fn in VARIANTS.items():
    h = (
        fn()
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(xxhash64(doc_id, term, tf))").alias("h"),
        )
        .collect()[0]
    )
    hashes[name] = (h["n"], h["h"])
    print(f"identity {name}: rows={h['n']} hash={h['h']}", flush=True)
assert len(set(hashes.values())) == 1, f"VARIANTS DISAGREE: {hashes}"

walls = {k: [] for k in VARIANTS}
for rep in range(REPS):
    for name, fn in VARIANTS.items():
        t0 = time.time()
        fn().write.mode("overwrite").parquet(f"{out}/tf_{name}")
        w = time.time() - t0
        walls[name].append(round(w, 2))
        print(f"rep{rep} {name}: {w:.2f}s", flush=True)

result = {
    "n_files": N,
    "master": MASTER,
    "walls": walls,
    "medians": {k: statistics.median(v) for k, v in walls.items()},
    "identity_ok": True,
}
print(json.dumps(result), flush=True)
with open("BENCH/tf_ab.json", "w") as f:
    json.dump(result, f, indent=1)

import shutil

shutil.rmtree(out, ignore_errors=True)
