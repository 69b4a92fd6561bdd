"""Document deletion: tombstones at query time, compaction to reclaim.

The reference deletes a document's index entry outright
(/root/reference/src/documentindex/cache.py:361 ``delete_index`` —
per-doc indexes, so removal is a key delete and no other document is
affected). A corpus-global inverted index can't do that cheaply: BM25
idf/avgdl are corpus-wide, and the deleted doc's postings are
delta-encoded inside shared compressed blocks. The scalable shape is
Lucene's two-phase delete:

1. ``delete_documents`` appends the doc_ids to a tiny tombstone table
   inside the index dir. Queries keep reading the untouched postings
   and skip tombstoned docs during scoring (``liveDocs``): top-k
   never admits a deleted doc, and the remaining docs keep their
   EXACT pre-delete scores — stats stay stale until compaction,
   exactly Lucene's semantics (deleted docs still count in df/avgdl
   until segments merge). O(|deletes|) work per delete, zero index
   rewrite.
2. ``compact_index`` rewrites: filter the checkpointed docs/tf tables
   (the expensive tokenize output — NOT re-tokenized, same reuse
   contract as plans/merge.py), mark the stages complete in a fresh
   index dir, and let the standard resume path rebuild the
   corpus-global stats/impacts/postings. Post-compaction scores are
   the true retained-corpus scores; surviving doc_ids are PRESERVED
   (holes allowed — every stage downstream of id assignment is
   delta/band-based, and stable ids keep external citations valid).

Scale contract: the query-time exclusion set must stay
broadcast-sized. Tombstones are a bounded fraction of the corpus by
design (compaction amortizes them away, ``max_tombstone_frac``
guards the drift); at 10^10 docs the frozenset hand-off below would
become a ~n_docs/8-byte broadcast bitset — same plan shape, denser
membership structure.
"""

from __future__ import annotations

import json
import os
import time
from typing import Iterable

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .build_index import BuiltIndex, build_index
from .checkpoint import Manifest, stage_fingerprint

TOMBSTONE_DIR = "tombstones"


def _tombstone_path(out_dir: str) -> str:
    return os.path.join(out_dir, TOMBSTONE_DIR)


def delete_documents(
    spark: SparkSession,
    out_dir: str,
    doc_ids: Iterable[int],
    max_tombstone_frac: float = 0.5,
) -> int:
    """Tombstone ``doc_ids`` in the index at ``out_dir``; returns the
    total number of distinct tombstoned docs after the append.

    Idempotent: re-deleting an already-deleted id is a no-op at read
    time (readers take ``distinct``). Unknown ids are tolerated (a
    tombstone for a doc that was never indexed excludes nothing).
    Raises when the tombstone set would exceed ``max_tombstone_frac``
    of the corpus — at that point the owner should compact, not keep
    scoring against a mostly-dead index.
    """
    ids = sorted({int(d) for d in doc_ids})
    if not ids:
        return len(load_tombstones(spark, out_dir))
    built = BuiltIndex.open(out_dir)
    # Guard BEFORE persisting: compute the projected distinct total
    # (existing ∪ new) and raise without writing — an append-then-raise
    # would leave the over-cap tombstone set durably applied for any
    # later Engine.open / concurrent reader (round-4 advice).
    projected = frozenset(load_tombstones(spark, out_dir) | set(ids))
    # denominator matches Engine.maintenance_stats: n_docs_total when
    # stale appends exist (round-5 advice — the cap previously used
    # the frozen n_docs while maintain() used the appended total, so
    # the two policies could disagree after stale appends).
    with open(os.path.join(out_dir, "stats.json")) as f:
        _meta = json.load(f)
    n_total = int(_meta.get("n_docs_total", built.n_docs))
    if len(projected) > max_tombstone_frac * n_total:
        raise RuntimeError(
            f"{len(projected)} tombstones would exceed "
            f"{max_tombstone_frac:.0%} of {n_total} docs — "
            "compact_index() before deleting more"
        )
    df = spark.createDataFrame([(d,) for d in ids], "doc_id long")
    df.coalesce(1).write.mode("append").parquet(_tombstone_path(out_dir))
    return len(projected)


def load_tombstones(spark: SparkSession, out_dir: str) -> frozenset:
    """The live tombstone set (empty when nothing was deleted)."""
    p = _tombstone_path(out_dir)
    if not os.path.exists(p):
        return frozenset()
    return frozenset(
        r["doc_id"]
        for r in spark.read.parquet(p).select("doc_id").distinct().collect()
    )


def compact_index(
    spark: SparkSession,
    out_dir: str,
    dest_dir: str,
    input_id: str,
    **build_kwargs,
) -> BuiltIndex:
    """Rewrite the index at ``out_dir`` into ``dest_dir`` without its
    tombstoned documents — and WITHOUT re-tokenizing anything: the
    stored docs/tf tables are anti-joined against the tombstones,
    marked complete in the destination manifest with the fingerprints
    ``build_index`` itself would compute (the plans/merge.py pattern),
    and the standard resume path rebuilds stats → impacts → postings
    for the retained corpus. Surviving doc_ids are preserved.

    Requires materialized docs/tf stages (the default build path);
    in-place ``source_path`` builds keep their docs outside the index
    dir — compact those by rebuilding from a filtered source instead.
    """
    for stage in ("docs", "tf"):
        if not os.path.exists(os.path.join(out_dir, stage, "_SUCCESS")):
            raise ValueError(
                f"index {out_dir} has no materialized '{stage}' stage — "
                "in-place (source_path) builds cannot be compacted blind"
            )
    os.makedirs(dest_dir, exist_ok=True)
    tomb_p = _tombstone_path(out_dir)
    docs = spark.read.parquet(os.path.join(out_dir, "docs"))
    tf = spark.read.parquet(os.path.join(out_dir, "tf"))
    if os.path.exists(tomb_p):
        tomb = spark.read.parquet(tomb_p).select("doc_id").distinct()
        docs = docs.join(tomb, "doc_id", "left_anti")
        tf = tf.join(tomb, "doc_id", "left_anti")

    man = Manifest.load(dest_dir)
    fp_docs = stage_fingerprint("docs", "", input_id)
    fp_tf = stage_fingerprint("tf", fp_docs, input_id)

    docs_path = os.path.join(dest_dir, "docs")
    t0 = time.time()
    man.begin("docs", fp_docs)
    docs.write.mode("overwrite").parquet(docs_path)
    n_docs = spark.read.parquet(docs_path).count()
    man.complete("docs", n_docs, docs_path, (time.time() - t0) * 1000)

    tf_path = os.path.join(dest_dir, "tf")
    t0 = time.time()
    man.begin("tf", fp_tf)
    tf.write.mode("overwrite").parquet(tf_path)
    n_tf = spark.read.parquet(tf_path).count()
    man.complete("tf", n_tf, tf_path, (time.time() - t0) * 1000)
    man.stages["tf"]["compacted_from"] = out_dir
    man.save()

    built = build_index(
        spark,
        spark.read.parquet(docs_path),
        dest_dir,
        input_id,
        **build_kwargs,
    )
    # record provenance beside the stats the build just wrote
    meta_p = os.path.join(dest_dir, "stats.json")
    with open(meta_p) as f:
        meta = json.load(f)
    meta["compacted_from"] = out_dir
    with open(meta_p, "w") as f:
        json.dump(meta, f)
    return built
