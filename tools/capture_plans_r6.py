"""Capture explain("formatted") for the round-6-touched query paths.

Runs against whichever tree's documentindex_spark is first on
sys.path (pass the tree root as argv[1]) and writes
<out_dir>/<name>_<tag>.txt.

Usage: python tools/capture_plans_r6.py TREE_ROOT OUT_DIR TAG [N_FILES]
"""

import os
import sys
import tempfile

TREE = os.path.abspath(sys.argv[1])
OUT = os.path.abspath(sys.argv[2])
TAG = sys.argv[3]
N = int(sys.argv[4]) if len(sys.argv) > 4 else 5000

sys.path.insert(0, TREE)

from documentindex_spark.corpus import generate_repo_files  # noqa: E402
from documentindex_spark.operators.bmw import (  # noqa: E402
    bmw_topk,
    bmw_topk_boolean,
    score_threshold_all,
)
from documentindex_spark.operators.postings import build_segments  # noqa: E402
from documentindex_spark.operators.bm25 import impacts  # noqa: E402
from documentindex_spark.operators.stats import (  # noqa: E402
    corpus_stats,
    document_frequencies,
)
from documentindex_spark.plans.build_index import build_index  # noqa: E402
from documentindex_spark.session import get_spark  # noqa: E402
from documentindex_spark.sources.registry import with_doc_ids  # noqa: E402

os.makedirs(OUT, exist_ok=True)
spark = get_spark("capture-plans-r6", master="local[8]", shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")
out = tempfile.mkdtemp(prefix="plans-")

docs = with_doc_ids(generate_repo_files(spark, N))
built = build_index(spark, docs, out, input_id=f"plans@{N}", bucket_groups=1)
postings = spark.read.parquet(built.postings_path).persist()
postings.count()


def dump(name, df):
    p = os.path.join(OUT, f"{name}_{TAG}.txt")
    with open(p, "w") as f:
        f.write(df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        ) if False else df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        ))
    print("wrote", p, flush=True)


dump("bmw_topk_single_term", bmw_topk(spark, postings, {0: "merge29"}, k=10))
dump(
    "bmw_topk_three_term",
    bmw_topk(spark, postings, {0: "merge29 split24 value9"}, k=10),
)
dump(
    "bmw_topk_batch50",
    bmw_topk(spark, postings, {i: f"merge{i}" for i in range(50)}, k=10),
)
dump(
    "bmw_topk_cold_path",
    bmw_topk(spark, built.postings_path, {0: "merge29"}, k=10),
)
dump(
    "score_threshold_all",
    score_threshold_all(spark, postings, {0: "merge29 split24"}, threshold=1.0),
)
dump(
    "bmw_topk_boolean",
    bmw_topk_boolean(
        spark,
        postings,
        {0: {"should": {"merge29": 1.0, "block3": 2.0}, "must": ["merge29"], "must_not": ["split24"]}},
        k=10,
    ),
)

# build-side plans: the postings encode DF (pre-write) and the TF stage
from documentindex_spark.functions.tokenize import (  # noqa: E402
    term_frequencies_colocated,
)
from pyspark.sql import functions as F  # noqa: E402

ddf = spark.read.parquet(os.path.join(out, "docs"))
dump("build_tf_stage", term_frequencies_colocated(ddf))
tf = spark.read.parquet(os.path.join(out, "tf"))
dl = spark.read.parquet(os.path.join(out, "dl"))
stats = corpus_stats(dl)
imp = impacts(tf, dl, document_frequencies(tf), stats)
try:
    from documentindex_spark.operators.postings import build_segments_mapside

    dump("build_postings_encode", build_segments_mapside(imp, stats.n_docs))
except ImportError:
    dump("build_postings_encode", build_segments(imp, stats.n_docs))

import shutil

shutil.rmtree(out, ignore_errors=True)
spark.stop()
