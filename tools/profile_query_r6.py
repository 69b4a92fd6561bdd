"""Round-6 query-path profiler: where does the ~0.7s/query go?

Builds the bench index at N files (default 20k = sf0.1), persists
postings exactly like bench.py, then times:
  - spark.createDataFrame of the 1-3 row query table
  - the broadcast-join + groupBy(query_id).applyInPandas job (current
    bmw_topk), repeated
  - variant A: literal term->query_id map projection (no qdf, no
    broadcast exchange)
  - variant B: A + single stage (no AQE re-plan), via collect-side
  - bmw_serve / bmw_serve_arrow for reference

Usage: python tools/profile_query_r6.py [N_FILES]
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from documentindex_spark.corpus import generate_repo_files
from documentindex_spark.operators.bmw import (
    BMW_RESULT_SCHEMA,
    bmw_serve,
    bmw_serve_arrow,
    bmw_topk,
    bmw_topk_local,
)
from documentindex_spark.operators.postings import row_to_segment, term_bucket
from documentindex_spark.functions.tokenize import query_terms
from documentindex_spark.plans.build_index import build_index
from documentindex_spark.queryset import reference_query_set
from documentindex_spark.session import get_spark
from documentindex_spark.sources.registry import with_doc_ids

N = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
spark = get_spark("profile-query-r6", master="local[32]", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
out = tempfile.mkdtemp(prefix="profq-")

docs = with_doc_ids(generate_repo_files(spark, N))
t0 = time.time()
built = build_index(spark, docs, out, input_id=f"profq@{N}", bucket_groups=1)
print(f"build: {time.time()-t0:.1f}s", flush=True)

postings = spark.read.parquet(built.postings_path).persist()
postings.count()
bmw_topk(spark, postings, {0: "warmup"}, k=10).collect()

QS = [(q["query_text"], q["k"]) for q in reference_query_set()][:12]


def timeit(label, fn, reps=3):
    ts = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    print(f"{label:42s} med={sorted(ts)[len(ts)//2]*1000:7.1f}ms  all={[round(t*1000) for t in ts]}", flush=True)


# --- component: createDataFrame of the tiny query table
pairs = [(0, t) for t in query_terms(QS[5][0])]
timeit("createDataFrame(pairs)", lambda: spark.createDataFrame(pairs, "query_id long, term string"))

# --- component: filter scan only (no join/groupBy), count
q, k = QS[5]
terms = query_terms(q)
buckets = sorted({term_bucket(t) for t in terms})
flt = postings.filter(F.col("bucket").isin(buckets) & F.col("term").isin(terms))
timeit("pruned filter scan .count()", lambda: flt.count())

# --- current bmw_topk end-to-end
for qi in (0, 5, 11):
    q, k = QS[qi]
    timeit(f"bmw_topk current  q={q[:18]!r}", lambda: bmw_topk(spark, postings, {0: q}, k=k).collect())


# --- variant A: literal map projection instead of broadcast join
def bmw_topk_litmap(index_df, queries, k):
    terms_by_query = {qid: query_terms(qq) for qid, qq in queries.items()}
    term_to_qids = {}
    for qid, ts in terms_by_query.items():
        for t in ts:
            term_to_qids.setdefault(t, []).append(qid)
    all_terms = sorted(term_to_qids)
    buckets = sorted({term_bucket(t) for t in all_terms})
    mapping = F.create_map(
        *[x for t in all_terms for x in (F.lit(t), F.array(*[F.lit(q) for q in term_to_qids[t]]))]
    )
    seg_rows = index_df.filter(
        F.col("bucket").isin(buckets) & F.col("term").isin(all_terms)
    ).withColumn("query_id", F.explode(mapping[F.col("term")]))

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        qid = int(pdf["query_id"].iloc[0])
        by_term = {}
        for _, row in pdf.iterrows():
            by_term.setdefault(row["term"], []).append(row_to_segment(row))
        top = bmw_topk_local(by_term, k)
        return pd.DataFrame(
            {
                "query_id": qid,
                "doc_id": [d for d, _ in top],
                "score": [s for _, s in top],
                "rank": np.arange(1, len(top) + 1, dtype=np.int32),
            }
        )

    return seg_rows.groupBy("query_id").applyInPandas(run, BMW_RESULT_SCHEMA)


for qi in (0, 5, 11):
    q, k = QS[qi]
    timeit(f"bmw_topk litmap   q={q[:18]!r}", lambda: bmw_topk_litmap(postings, {0: q}, k).collect())


# --- variant C: driver-local adaptive (collect pruned rows + local BMW)
def bmw_topk_locald(index_df, queries, k):
    terms_by_query = {qid: query_terms(qq) for qid, qq in queries.items()}
    all_terms = sorted({t for ts in terms_by_query.values() for t in ts})
    buckets = sorted({term_bucket(t) for t in all_terms})
    rows = index_df.filter(
        F.col("bucket").isin(buckets) & F.col("term").isin(all_terms)
    ).collect()
    out_rows = []
    for qid, ts in terms_by_query.items():
        by_term = {}
        for r in rows:
            if r["term"] in ts:
                by_term.setdefault(r["term"], []).append(row_to_segment(r))
        top = bmw_topk_local(by_term, k)
        for rank, (d, s) in enumerate(top, 1):
            out_rows.append((qid, d, s, rank))
    return out_rows


for qi in (0, 5, 11):
    q, k = QS[qi]
    timeit(f"bmw_topk localcollect q={q[:14]!r}", lambda: bmw_topk_locald(postings, {0: q}, k))

# --- serve paths for reference
q, k = QS[5]
timeit("bmw_serve", lambda: bmw_serve(postings, q, k=k, max_collect_postings=50_000_000))
import pyarrow.dataset as _ds

arrow_ds = _ds.dataset(built.postings_path, format="parquet", partitioning="hive")
timeit("bmw_serve_arrow", lambda: bmw_serve_arrow(built.postings_path, q, k=k, max_collect_postings=50_000_000, dataset=arrow_ds))

# batch: all 50 queries in one job (current)
full_qs = {i: qq for i, (qq, _) in enumerate([(x["query_text"], x["k"]) for x in reference_query_set()])}
timeit("batch 50q current", lambda: bmw_topk(spark, postings, full_qs, k=10).count(), reps=3)
timeit("batch 50q litmap", lambda: bmw_topk_litmap(postings, full_qs, 10).count(), reps=3)

import shutil

shutil.rmtree(out, ignore_errors=True)
spark.stop()
