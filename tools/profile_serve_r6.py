"""Round-6 A/B: bmw_serve's driver collect — Row path vs Arrow path.

bmw_serve pulls the query's pruned segment rows to the driver with
DataFrame.collect(), which deserializes every blob through the
pickled-Row path. Spark 4's DataFrame.toArrow() collects the same
rows as one Arrow table (columnar, zero-copy binary buffers), so the
hypothesis is the blob deserialization cost drops. Interleaved per
query, medians reported; results asserted identical each rep.

Usage: python tools/profile_serve_r6.py [N_FILES] [REPS]
"""

from __future__ import annotations

import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from documentindex_spark.corpus import generate_repo_files  # noqa: E402
from documentindex_spark.operators.bmw import (  # noqa: E402
    bmw_topk_local,
    query_terms,
)
from documentindex_spark.operators.postings import (  # noqa: E402
    row_to_segment,
    term_bucket,
)
from documentindex_spark.plans.build_index import build_index  # noqa: E402
from documentindex_spark.queryset import reference_query_set  # noqa: E402
from documentindex_spark.session import get_spark  # noqa: E402
from documentindex_spark.sources.registry import with_doc_ids  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402


def serve_rows(postings, query, k):
    terms = query_terms(query)
    if not terms:
        return []
    buckets = sorted({term_bucket(t) for t in terms})
    rows = postings.filter(
        F.col("bucket").isin(buckets) & F.col("term").isin(terms)
    ).collect()
    by_term = {}
    for r in rows:
        by_term.setdefault(r["term"], []).append(row_to_segment(r))
    return bmw_topk_local(by_term, k)


def serve_arrow_collect(postings, query, k):
    terms = query_terms(query)
    if not terms:
        return []
    buckets = sorted({term_bucket(t) for t in terms})
    tbl = postings.filter(
        F.col("bucket").isin(buckets) & F.col("term").isin(terms)
    ).toArrow()
    by_term = {}
    for r in tbl.to_pylist():
        by_term.setdefault(r["term"], []).append(row_to_segment(r))
    return bmw_topk_local(by_term, k)


def main():
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    spark = get_spark(
        "profile-serve-r6",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = tempfile.mkdtemp(prefix="dix-serve-ab-")
    docs = with_doc_ids(generate_repo_files(spark, n_files))
    built = build_index(
        spark, docs, out, input_id=f"serveab@{n_files}", bucket_groups=1
    )
    postings = spark.read.parquet(built.postings_path).persist()
    postings.count()
    queries = [(q["query_text"], q["k"]) for q in reference_query_set()]
    # warm both lanes
    serve_rows(postings, "warmup merge", 10)
    serve_arrow_collect(postings, "warmup merge", 10)

    t_rows, t_arrow = [], []
    for rep in range(reps):
        for q, k in queries:
            t0 = time.time()
            a = serve_rows(postings, q, k)
            t_rows.append(time.time() - t0)
            t0 = time.time()
            b = serve_arrow_collect(postings, q, k)
            t_arrow.append(time.time() - t0)
            assert a == b, f"mismatch on {q!r}"
    print(
        {
            "n_files": n_files,
            "reps": reps,
            "rows_p50_ms": round(statistics.median(t_rows) * 1000, 1),
            "arrow_p50_ms": round(statistics.median(t_arrow) * 1000, 1),
            "rows_mean_ms": round(
                statistics.fmean(t_rows) * 1000, 1
            ),
            "arrow_mean_ms": round(
                statistics.fmean(t_arrow) * 1000, 1
            ),
        }
    )
    import shutil

    shutil.rmtree(out, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
