"""Incremental index append — new documents without re-tokenizing
the existing corpus.

BM25 impacts depend on GLOBAL stats (N, avgdl, df): adding documents
changes every stored impact, so any "append" that keeps old impact
blobs returns stale scores. This implementation stays EXACT: it
tokenizes ONLY the new documents (appending to the checkpointed TF
table — the expensive stage), then re-derives stats/impacts/segments
from the combined TF. The encode stages re-run (they're the cheap
part: ~25% of build cost at sf0.1), tokenization of existing docs
never does — the same guarantee the north rule's resume clause
protects.

The result is byte-identical to a from-scratch build over the union
corpus (asserted in tests/test_incremental.py), because the whole
pipeline is deterministic in (doc_id, term) — the appended docs take
doc_ids following the existing max.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.tokenize import term_frequencies_colocated
from .build_index import BuiltIndex, build_index
from .checkpoint import Manifest, stage_fingerprint


def append_documents(
    spark: SparkSession,
    built: BuiltIndex,
    new_files: DataFrame,
    input_id: str,
    text_col: str = "content",
    **build_kwargs,
) -> BuiltIndex:
    """Append ``new_files`` (no doc_id column — ids are assigned after
    the existing corpus) to an existing index directory.

    Steps: assign doc_ids starting at n_files; tokenize ONLY the new
    docs and append to the tf checkpoint; mark downstream stages
    stale; re-run the build driver, which skips 'docs' and 'tf'
    (fingerprint updated to the new input_id) and rebuilds
    dl/stats/impacts/segments from the combined TF.
    """
    out_dir = built.out_dir
    man = Manifest.load(out_dir)
    docs_path = os.path.join(out_dir, "docs")
    tf_path = os.path.join(out_dir, "tf")

    # ---- replay idempotence (round-3 advice, medium) ---------------
    # foreachBatch redelivers a batch if the process dies after the
    # append but before the streaming checkpoint commits. Three crash
    # windows, all covered:
    #   (a) after docs append, before tf append
    #   (b) after both appends, before the manifest stamp
    #   (c) after the stamp, before build_index finishes downstream
    # (c): the docs/tf stages already carry THIS input_id's
    # fingerprints → skip the appends entirely and just resume the
    # build (downstream fingerprints chain from fp_tf, so incomplete
    # stages recompute). (a)/(b): the write-ahead `_pending_append`
    # record below lists the part files that existed BEFORE the
    # appends; on retry, files not in that list are orphans from the
    # crashed attempt and are removed before re-appending.
    fp_docs = stage_fingerprint("docs", "", input_id)
    fp_tf = stage_fingerprint("tf", fp_docs, input_id)
    if man.is_complete("docs", fp_docs) and man.is_complete("tf", fp_tf):
        return build_index(
            spark,
            spark.read.parquet(docs_path),
            out_dir,
            input_id=input_id,
            text_col=text_col,
            **build_kwargs,
        )

    import shutil

    pend = man.stages.get("_pending_append")
    if pend is not None:
        for sub, keep in (("docs", pend["docs_files"]),
                          ("tf", pend["tf_files"])):
            p = os.path.join(out_dir, sub)
            if not os.path.exists(p):
                continue
            keep_set = set(keep)
            for fn in os.listdir(p):
                if fn not in keep_set:
                    orphan = os.path.join(p, fn)
                    if os.path.isdir(orphan):
                        shutil.rmtree(orphan)
                    else:
                        os.remove(orphan)
    man.stages["_pending_append"] = {
        "input_id": input_id,
        "docs_files": sorted(os.listdir(docs_path)),
        "tf_files": (
            sorted(os.listdir(tf_path)) if os.path.exists(tf_path) else []
        ),
    }
    man.save()
    # ----------------------------------------------------------------

    old_docs = spark.read.parquet(docs_path)
    base_n = old_docs.count()

    from ..sources.registry import dense_ids

    if "content_sha" not in new_files.columns:
        new_files = new_files.withColumn(
            "content_sha", F.sha2(F.col(text_col), 256)
        )
    # Identity columns when present; otherwise order by content_sha
    # PLUS a full-row digest tiebreaker — a fixed-width key, never the
    # raw text (ordering by full bodies pushed documents through one
    # sort task). Rows can share text while differing elsewhere (lang,
    # source), so sha ties are NOT guaranteed byte-identical rows;
    # without the tiebreaker which row got which doc_id was
    # nondeterministic across runs (round-2 advice). The digest hashes
    # a canonical concat of every column, making the order key total.
    order_cols = [c for c in ("repo", "path", "commit") if c in new_files.columns]
    if not order_cols:
        new_files = new_files.withColumn(
            "_row_sha",
            F.sha2(
                F.concat_ws(
                    "\x1f",
                    *[
                        F.coalesce(F.col(c).cast("string"), F.lit("\x00"))
                        for c in sorted(new_files.columns)
                    ],
                ),
                256,
            ),
        )
        order_cols = ["content_sha", "_row_sha"]
    new_with_ids = dense_ids(new_files, order_cols, "doc_id", offset=base_n,
                             scope=out_dir)
    # align schemas (union corpus)
    for c in old_docs.columns:
        if c not in new_with_ids.columns:
            new_with_ids = new_with_ids.withColumn(c, F.lit(None))
    new_aligned = new_with_ids.select(*old_docs.columns)

    # 1. append the new docs + their TF rows (tokenizes ONLY new docs)
    t0 = time.time()
    new_aligned.write.mode("append").parquet(docs_path)
    term_frequencies_colocated(new_aligned, text_col).write.mode(
        "append"
    ).parquet(tf_path)
    tokenize_ms = (time.time() - t0) * 1000

    # 2. stamp docs+tf stages as complete under the NEW fingerprints
    # (fp_docs/fp_tf computed above) and clear the write-ahead record
    # in the same atomic manifest save
    n_total = spark.read.parquet(docs_path).count()
    man.stages["docs"] = {"fingerprint": fp_docs, "status": "complete",
                          "rows": n_total, "appended": True}
    man.stages["tf"] = {
        "fingerprint": fp_tf,
        "status": "complete",
        "rows": spark.read.parquet(tf_path).count(),
        "wall_ms": round(tokenize_ms, 1),
        "appended": True,
    }
    # dl + downstream must rebuild (global stats changed)
    man.stages.pop("postings", None)
    man.stages.pop("_pending_append", None)
    man.save()
    for stale in ("dl", "doc_map", "postings"):
        p = os.path.join(out_dir, stale)
        if os.path.exists(p):
            import shutil

            shutil.rmtree(p)

    # 3. re-run the driver: docs+tf hit their checkpoints, the rest
    # rebuilds from the combined TF (no re-tokenization anywhere).
    return build_index(
        spark,
        spark.read.parquet(docs_path),
        out_dir,
        input_id=input_id,
        text_col=text_col,
        **build_kwargs,
    )
