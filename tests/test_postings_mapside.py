"""Round-6 optimization pins.

1. build_segments_mapside (encode moved below the exchange; blobs-only
   shuffle) produces byte-identical stored segments to the default
   grouped build_segments.
2. _attach_query_ids literal-map projection emits exactly the rows the
   broadcast-join route emitted (same (segment, query_id) pairs).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from documentindex_spark.functions.tokenize import term_frequencies_colocated
from documentindex_spark.operators.bm25 import impacts
from documentindex_spark.operators.postings import (
    build_segments,
    build_segments_mapside,
)
from documentindex_spark.operators.bmw import _attach_query_ids
from documentindex_spark.operators.stats import (
    corpus_stats,
    document_frequencies,
)


def _content(df):
    return sorted(
        (
            r["term"], r["seg_idx"], r["df"], r["n_postings"],
            r["min_doc_id"], r["max_doc_id"],
            bytes(r["doc_blob"]), bytes(r["tf_blob"]),
            bytes(r["impact_blob"]),
            list(r["block_n"]), list(r["block_max_doc"]),
            list(r["block_max_impact"]), r["bucket"],
        )
        for r in df.collect()
    )


def _impact_frame(spark, repo_files_small):
    docs = repo_files_small  # fixture already carries dense doc_ids
    tf = term_frequencies_colocated(docs)
    dl = docs.select("doc_id").join(
        tf.groupBy("doc_id").agg(F.sum("tf").alias("dl")), "doc_id", "left"
    ).select(
        "doc_id", F.coalesce(F.col("dl"), F.lit(0)).cast("long").alias("dl")
    )
    dl = dl.persist()
    stats = corpus_stats(dl)
    return impacts(tf, dl, document_frequencies(tf), stats), stats


def test_mapside_segments_byte_identical(spark, repo_files_small):
    imp, stats = _impact_frame(spark, repo_files_small)
    # low shard cap so BOTH the pass-through and the re-sort merge
    # branches execute in the mapside merge
    a = _content(build_segments(imp, stats.n_docs, postings_per_shard=50))
    b = _content(
        build_segments_mapside(imp, stats.n_docs, postings_per_shard=50)
    )
    assert a == b
    assert len(a) > 0


def test_litmap_attachment_matches_broadcast_join(spark, repo_files_small):
    imp, stats = _impact_frame(spark, repo_files_small)
    seg = build_segments(imp, stats.n_docs).select(
        "term", "seg_idx", "n_postings"
    )
    terms = [r["term"] for r in seg.select("term").distinct().limit(4).collect()]
    tbq = {7: sorted(terms[:3]), 9: sorted(terms[1:])}
    lit = _attach_query_ids(seg, tbq, spark)
    qdf = spark.createDataFrame(
        [(q, t) for q, ts in tbq.items() for t in ts],
        "query_id long, term string",
    )
    join = seg.join(F.broadcast(qdf), "term")
    key = lambda r: (r["query_id"], r["term"], r["seg_idx"], r["n_postings"])
    assert sorted(map(key, lit.collect())) == sorted(map(key, join.collect()))
