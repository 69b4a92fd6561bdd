"""Shard-merge: combine independently built indexes into ONE index —
the 100 TB build topology. Partition the corpus, build each
partition's index wherever convenient (separate jobs, even separate
clusters), then merge WITHOUT re-tokenizing: only the cheap
downstream stages (stats → df → impacts → encode) rerun, over the
shards' stored TF tables.

Why per-shard postings can NOT simply be concatenated: BM25 idf and
avgdl are corpus-GLOBAL, so every stored impact changes when the
corpus does. What IS reusable is exactly what the checkpointed build
already separates out: the ``docs`` identity table and the ``tf``
table (the expensive tokenize stage, SURVEY.md §3.1). The merge
re-ids each shard's dense doc_ids by a running offset (shard order =
argument order; within-shard order preserved), unions docs+tf into
the target directory, records both stages complete in the target's
manifest with the fingerprints ``build_index`` itself would compute,
and delegates — the standard resume path then skips tokenize and
rebuilds the global stats/impacts/postings.

The merged index is content-identical to a single-shot build of the
union corpus (tests/test_merge_indexes.py) because everything
downstream of TF is deterministic given (docs, tf).

Reference analog: the reference persists one monolithic pickle per
corpus (/root/reference/src/documentindex/indexer.py — no shard or
merge concept); sharded build+merge is what the same capability has
to look like on a cluster.
"""

from __future__ import annotations

import os
import time
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .build_index import BuiltIndex, build_index
from .checkpoint import Manifest, stage_fingerprint


def merge_indexes(
    spark: SparkSession,
    shard_dirs: list[str],
    out_dir: str,
    input_id: str,
    text_col: str = "content",
    **build_kwargs,
) -> BuiltIndex:
    """Merge the indexes in ``shard_dirs`` (argument order = doc_id
    order of the merged corpus) into a fresh index at ``out_dir``.

    Every shard must have MATERIALIZED docs/tf stages (the default
    build path; in-place ``source_path`` builds keep their docs
    outside the index dir and cannot be merged blind — pass their
    source through a normal build instead).
    """
    if not shard_dirs:
        raise ValueError("merge_indexes needs at least one shard")
    for d in shard_dirs:
        for stage in ("docs", "tf"):
            if not os.path.exists(os.path.join(d, stage, "_SUCCESS")):
                raise ValueError(
                    f"shard {d} has no materialized '{stage}' stage — "
                    "in-place (source_path) builds cannot be merged"
                )
    os.makedirs(out_dir, exist_ok=True)

    [BuiltIndex.open(d) for d in shard_dirs]  # validates each shard dir
    docs_parts: list[DataFrame] = []
    tf_parts: list[DataFrame] = []
    off = 0
    for d in shard_dirs:
        sdocs = spark.read.parquet(os.path.join(d, "docs"))
        stf = spark.read.parquet(os.path.join(d, "tf"))
        docs_parts.append(
            sdocs.withColumn(
                "doc_id", (F.col("doc_id") + F.lit(off)).cast("long")
            )
        )
        tf_parts.append(
            stf.withColumn(
                "doc_id", (F.col("doc_id") + F.lit(off)).cast("long")
            )
        )
        # Offset by max(doc_id)+1, NOT row count: compacted shards keep
        # surviving doc_ids with holes (plans/delete.py), so count-based
        # offsets would collide re-ids across shards silently.
        smax = sdocs.agg(F.max("doc_id")).first()[0]
        off += (int(smax) + 1) if smax is not None else 0

    docs = reduce(lambda a, b: a.unionByName(b), docs_parts)
    tf = reduce(lambda a, b: a.unionByName(b), tf_parts)

    # Materialize union docs/tf under the target and mark the stages
    # complete with the SAME fingerprints build_index derives — the
    # resume machinery then treats them as checkpoint hits and goes
    # straight to stats/impacts/postings.
    man = Manifest.load(out_dir)
    fp_docs = stage_fingerprint("docs", "", input_id)
    fp_tf = stage_fingerprint("tf", fp_docs, input_id)

    docs_path = os.path.join(out_dir, "docs")
    t0 = time.time()
    man.begin("docs", fp_docs)
    docs.write.mode("overwrite").parquet(docs_path)
    n_docs = spark.read.parquet(docs_path).count()
    man.complete("docs", n_docs, docs_path, (time.time() - t0) * 1000)

    tf_path = os.path.join(out_dir, "tf")
    t0 = time.time()
    man.begin("tf", fp_tf)
    tf.write.mode("overwrite").parquet(tf_path)
    n_tf = spark.read.parquet(tf_path).count()
    man.complete("tf", n_tf, tf_path, (time.time() - t0) * 1000)
    man.stages["tf"]["merged_from"] = list(shard_dirs)
    man.save()

    return build_index(
        spark,
        spark.read.parquet(docs_path),
        out_dir,
        input_id,
        text_col=text_col,
        **build_kwargs,
    )
