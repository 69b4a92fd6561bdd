"""Capture the bmw_serve pruned-scan plan for a given engine tree.

Usage: python tools/capture_serve_plan_r6.py ENGINE_DIR OUT_FILE [N_FILES]

Builds a small index with ENGINE_DIR's pipeline, then explains the
exact DataFrame bmw_serve collects for a 2-term reference query —
"before" is the round-start worktree (term filter only), "after" is
this tree (bucket predicate alongside term → PartitionFilters on the
cold path, per-batch stats pruning on a persisted frame).
"""

import os
import sys
import tempfile

engine_dir, out_file = os.path.abspath(sys.argv[1]), sys.argv[2]
n_files = int(sys.argv[3]) if len(sys.argv) > 3 else 2000
sys.path.insert(0, engine_dir)

from pyspark.sql import functions as F  # noqa: E402

from documentindex_spark.corpus import generate_repo_files  # noqa: E402
from documentindex_spark.functions.tokenize import query_terms  # noqa: E402
from documentindex_spark.operators.postings import term_bucket  # noqa: E402
from documentindex_spark.plans.build_index import build_index  # noqa: E402
from documentindex_spark.session import get_spark  # noqa: E402
from documentindex_spark.sources.registry import with_doc_ids  # noqa: E402

spark = get_spark("serve-plan", master="local[8]", shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")
out = tempfile.mkdtemp(prefix="serveplan-")
docs = with_doc_ids(generate_repo_files(spark, n_files))
built = build_index(spark, docs, out, input_id=f"plan@{n_files}", bucket_groups=1)

postings = spark.read.parquet(built.postings_path)  # cold path: parquet-backed
terms = query_terms("merge split")

# Reproduce the filter bmw_serve collects, matching the engine version:
# round-start filtered on term only; this round adds the bucket predicate.
src = open(
    os.path.join(engine_dir, "documentindex_spark/operators/bmw.py")
).read()
if ".toArrow()" in src:  # the round-6 serve collect path
    buckets = sorted({term_bucket(t) for t in terms})
    df = postings.filter(
        F.col("bucket").isin(buckets) & F.col("term").isin(terms)
    )
    label = "bucket+term (this round)"
else:
    df = postings.filter(F.col("term").isin(terms))
    label = "term only (round start)"

with open(out_file, "w") as f:
    f.write(f"# bmw_serve pruned scan — filter: {label}\n")
    f.write(f"# engine tree: {engine_dir}; {n_files} files\n\n")
    f.write(
        df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
    )
print("wrote", out_file, "|", label)
