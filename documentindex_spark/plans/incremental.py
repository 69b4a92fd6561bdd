"""Incremental index append — new documents without re-tokenizing
the existing corpus. Two modes:

**Exact (default).** BM25 impacts depend on GLOBAL stats (N, avgdl,
df): adding documents changes every stored impact, so any "append"
that keeps old impact blobs returns stale scores. The exact mode
tokenizes ONLY the new documents (appending to the checkpointed TF
table — the expensive stage), then re-derives stats/impacts/segments
from the combined TF. The encode stages re-run (they're the cheap
part: ~25% of build cost at sf0.1), tokenization of existing docs
never does. Byte-identical to a from-scratch union build
(tests/test_incremental.py) — but every append rewrites ~all posting
blobs, so at 100 TB ingestion cost grows with CORPUS size, not batch
size.

**Stale-stats (``stale_stats=True``, round-4 verdict #2).** The
Lucene-shaped scalable path, the mirror of plans/delete.py's
tombstone contract: new documents are encoded as NEW segment groups
under the FROZEN corpus stats (N, avgdl, per-term df as of the last
full stats refresh, read back from the stored segment metadata — a
column-pruned scan, no blob reads). Existing posting blobs are NOT
touched — append cost is a function of the BATCH, independent of
corpus size (measured in BENCH/BASELINE.md §18). Query semantics
during the stale window are exact-under-frozen-stats: every score —
old doc or new — equals BM25 evaluated with the frozen stats (terms
unseen at freeze time carry df=0, the max-idf end of the Lucene
formula; deterministic and pinned by tests). The query cursor sorts
segments by min_doc_id, and appended doc_ids start past the old max,
so new segments concatenate into each term's run with no scorer
change. ``refresh_index`` (or ``delete.compact_index``) re-derives
stats/impacts/segments from the combined TF — after refresh the
index is byte-identical to a fresh union build.

Reference analog: one-doc-at-a-time ``indexer.index``
(/root/reference/src/documentindex/indexer.py:102-130) adds documents
to a live container without touching the others — stale-stats append
is that capability's corpus-global-index shape.
"""

from __future__ import annotations

import json
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
    stale_stats: bool = False,
    **build_kwargs,
) -> BuiltIndex:
    """Append ``new_files`` (no doc_id column — ids are assigned after
    the existing corpus) to an existing index directory.

    Exact mode: assign doc_ids starting past the existing max;
    tokenize ONLY the new docs and append to the tf checkpoint; mark
    downstream stages stale; re-run the build driver, which skips
    'docs' and 'tf' (fingerprint updated to the new input_id) and
    rebuilds dl/stats/impacts/segments from the combined TF.

    ``stale_stats=True``: encode the new docs as new segment groups
    under the frozen corpus stats instead — no existing blob is
    rewritten (module docstring; the 100× ingestion path).
    """
    if stale_stats:
        return append_documents_stale(
            spark, built, new_files, input_id, text_col, **build_kwargs
        )
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
    # New ids start at max(doc_id)+1, NOT count: a compacted index
    # preserves surviving doc_ids with holes (plans/delete.py), so a
    # count-based base would re-issue live ids and corrupt tf/postings.
    old_max = old_docs.agg(F.max("doc_id")).first()[0]
    base_n = (int(old_max) + 1) if old_max is not None else 0

    new_aligned = _align_new_batch(
        new_files, old_docs, text_col, base_n, out_dir
    )

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


def _align_new_batch(
    new_files: DataFrame,
    old_docs: DataFrame,
    text_col: str,
    base_n: int,
    out_dir: str,
) -> DataFrame:
    """Assign deterministic doc_ids (base_n, base_n+1, …) to the new
    batch and align its schema to the existing docs table."""
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
    return new_with_ids.select(*old_docs.columns)


def _next_group_id(postings_path: str) -> int:
    """Smallest unused integer ``group=`` partition value."""
    gids = [
        int(d.split("=", 1)[1])
        for d in os.listdir(postings_path)
        if d.startswith("group=") and d.split("=", 1)[1].isdigit()
    ]
    return (max(gids) + 1) if gids else 0


def append_documents_stale(
    spark: SparkSession,
    built: BuiltIndex,
    new_files: DataFrame,
    input_id: str,
    text_col: str = "content",
    **build_kwargs,
) -> BuiltIndex:
    """Stale-stats segment append (module docstring; round-4 verdict
    #2): tokenize + encode ONLY the new batch under the frozen corpus
    stats and write it as a new ``group=<gid>`` segment set beside the
    untouched existing blobs. Work done is a function of the batch —
    never the corpus: the only corpus-wide read is the column-pruned
    (term, df) scan of the segment METADATA (parquet prunes the blob
    columns), and nothing corpus-sized is rewritten.

    Frozen semantics: every impact — old doc or new — is BM25 under
    the stats stored in stats.json at the last full refresh; terms the
    frozen corpus never saw carry df=0 (the max-idf end of the Lucene
    idf). New segments store that frozen df in their metadata so the
    index remains self-consistent. ``refresh_index`` folds the stale
    window away (content-identical to a fresh union build,
    tests/test_incremental.py).
    """
    import shutil

    out_dir = built.out_dir
    man = Manifest.load(out_dir)
    docs_path = os.path.join(out_dir, "docs")
    tf_path = os.path.join(out_dir, "tf")
    dl_path = os.path.join(out_dir, "dl")
    doc_map_path = os.path.join(out_dir, "doc_map")
    postings_path = os.path.join(out_dir, "postings")
    for p in (docs_path, tf_path, postings_path):
        if not os.path.exists(p):
            raise ValueError(
                f"index {out_dir} has no materialized '{os.path.basename(p)}'"
                " stage — stale append needs the standard build layout"
            )

    stage_key = f"stale_append:{input_id}"
    if man.stages.get(stage_key, {}).get("status") == "complete":
        return BuiltIndex.open(out_dir)  # replay (foreachBatch redelivery)

    # ---- write-ahead record: crash between any append and the stamp
    # leaves orphans; the next append — ANY input_id — removes
    # files/dirs not in the pre-append listing, INCLUDING the pinned
    # postings group dir (re-listing on retry would skip past a
    # half-written group and leave it live in the read path). The
    # cleanup must not be gated on input_id: `_pending_stale` is a
    # single slot, so append B starting after append A's crash would
    # otherwise overwrite A's record and permanently leak A's partial
    # docs/tf/dl rows into the live tables (round-5 advice, medium).
    # Only the GROUP ID is reused input_id-conditionally.
    pend = man.stages.get("_pending_stale")
    if pend is not None:
        gdir = os.path.join(postings_path, f"group={pend['group']}")
        if os.path.exists(gdir):
            shutil.rmtree(gdir)
        for sub, keep in pend["files"].items():
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
    if pend is not None and pend.get("input_id") == input_id:
        gid = pend["group"]
    else:
        gid = _next_group_id(postings_path)
    man.stages["_pending_stale"] = {
        "input_id": input_id,
        "group": gid,
        "files": {
            sub: sorted(os.listdir(os.path.join(out_dir, sub)))
            for sub in ("docs", "tf", "dl", "doc_map")
            if os.path.exists(os.path.join(out_dir, sub))
        },
    }
    man.save()

    from ..constants import POSTINGS_PER_SHARD
    from ..operators.bm25 import idf_col, tf_norm_col
    from ..operators.postings import build_segments, write_bucketed
    from .metrics import delta as _metrics_delta
    from .metrics import executor_totals as _executor_totals

    t0 = time.time()
    snap = _executor_totals(spark)

    old_docs = spark.read.parquet(docs_path)
    old_max = old_docs.agg(F.max("doc_id")).first()[0]
    base_n = (int(old_max) + 1) if old_max is not None else 0
    new_aligned = _align_new_batch(
        new_files, old_docs, text_col, base_n, out_dir
    )

    # 1. durable appends: docs, then tf/dl/doc_map DERIVED FROM THE
    # WRITTEN DOCS (doc_id >= base_n filters exactly the new batch) so
    # every table agrees even if dense_ids' range sampling varied.
    new_aligned.write.mode("append").parquet(docs_path)
    new_docs = spark.read.parquet(docs_path).filter(
        F.col("doc_id") >= base_n
    )
    n_new = new_docs.count()
    term_frequencies_colocated(new_docs, text_col).write.mode(
        "append"
    ).parquet(tf_path)
    tf_new = spark.read.parquet(tf_path).filter(F.col("doc_id") >= base_n)
    dl_new = (
        new_docs.select("doc_id")
        .join(
            tf_new.groupBy("doc_id").agg(F.sum("tf").alias("dl")),
            "doc_id",
            "left",
        )
        .select(
            "doc_id",
            F.coalesce(F.col("dl"), F.lit(0)).cast("long").alias("dl"),
        )
    )
    if os.path.exists(dl_path):
        dl_new.write.mode("append").parquet(dl_path)
    if os.path.exists(doc_map_path):
        id_cols = [c for c in new_docs.columns if c != text_col]
        new_docs.select(*id_cols).join(dl_new, "doc_id").write.mode(
            "append"
        ).parquet(doc_map_path)

    # 2. frozen stats: N/avgdl from stats.json (stats.json is NOT
    # advanced by stale appends — it always describes the last full
    # refresh), per-term df from the segment metadata scan.
    frozen_df = (
        spark.read.parquet(postings_path)
        .groupBy("term")
        .agg(F.max("df").alias("df"))
    )
    impact_new = (
        tf_new.join(dl_new, "doc_id")
        .join(frozen_df, "term", "left")
        .select(
            "doc_id",
            "term",
            "tf",
            F.coalesce(F.col("df"), F.lit(0)).cast("long").alias("df"),
            # impact under FROZEN stats — unseen terms df=0 (max idf)
            (
                idf_col(
                    F.coalesce(F.col("df"), F.lit(0)).cast("double"),
                    built.n_docs,
                )
                * tf_norm_col(
                    F.col("tf").cast("double"),
                    F.col("dl").cast("double"),
                    built.avgdl,
                )
            ).alias("impact"),
        )
    )

    # 3. encode the batch as its own segment group. n_docs here only
    # sizes shard widths — pass the full doc_id span so range shards
    # cover the appended ids.
    seg = build_segments(
        impact_new,
        base_n + n_new,
        build_kwargs.get("postings_per_shard", POSTINGS_PER_SHARD),
        built.band_size,
    )
    gpath = os.path.join(postings_path, f"group={gid}")
    write_bucketed(seg, gpath)
    n_segs = spark.read.parquet(gpath).count()

    # 4. stamp: manifest stage record + stats.json provenance (frozen
    # n_docs/avgdl untouched), clearing the write-ahead record in the
    # same atomic save.
    # stats.json provenance goes FIRST: a crash between the two writes
    # then leaves a pending (retryable) append, not a stamped-complete
    # append whose replay path would return early with stale_frac
    # under-reported forever (round-5 advice, low). The entry list is
    # keyed by input_id so a retry never double-counts, and
    # n_docs_total is re-derived from the entries rather than
    # incremented.
    stats_p = os.path.join(out_dir, "stats.json")
    with open(stats_p) as f:
        meta = json.load(f)
    entries = [
        e for e in meta.get("stale_appends", []) if e["input_id"] != input_id
    ]
    entries.append({"input_id": input_id, "n_docs": n_new, "group": gid})
    meta["stale_appends"] = entries
    meta["n_docs_total"] = int(meta["n_docs"]) + sum(
        int(e["n_docs"]) for e in entries
    )
    with open(stats_p, "w") as f:
        json.dump(meta, f)
    man.stages[stage_key] = {
        "status": "complete",
        "group": gid,
        "n_new_docs": n_new,
        "rows": n_segs,
        "wall_ms": round((time.time() - t0) * 1000, 1),
        "shuffle": _metrics_delta(snap, _executor_totals(spark)),
    }
    man.stages.pop("_pending_stale", None)
    man.save()
    return BuiltIndex.open(out_dir)


def refresh_index(
    spark: SparkSession,
    built: BuiltIndex,
    input_id: str,
    text_col: str = "content",
    **build_kwargs,
) -> BuiltIndex:
    """Fold stale appends back into exact global stats: the combined
    docs/tf checkpoints (appends landed there durably) are stamped
    complete under the new ``input_id``'s fingerprints, derived stages
    dropped, and the standard build driver re-derives
    dl → stats → impacts → segments. No re-tokenization; afterwards the
    index is content-identical to a fresh build over the union corpus
    and stats.json carries no stale markers (build_index rewrites it).
    """
    import shutil

    out_dir = built.out_dir
    man = Manifest.load(out_dir)
    docs_path = os.path.join(out_dir, "docs")
    tf_path = os.path.join(out_dir, "tf")
    fp_docs = stage_fingerprint("docs", "", input_id)
    fp_tf = stage_fingerprint("tf", fp_docs, input_id)
    man.stages["docs"] = {
        "fingerprint": fp_docs,
        "status": "complete",
        "rows": spark.read.parquet(docs_path).count(),
        "refreshed": True,
    }
    man.stages["tf"] = {
        "fingerprint": fp_tf,
        "status": "complete",
        "rows": spark.read.parquet(tf_path).count(),
        "refreshed": True,
    }
    man.stages.pop("postings", None)
    for k in [k for k in man.stages if k.startswith("stale_append")]:
        man.stages.pop(k)
    man.save()
    for stale in ("dl", "doc_map", "postings"):
        p = os.path.join(out_dir, stale)
        if os.path.exists(p):
            shutil.rmtree(p)
    return build_index(
        spark,
        spark.read.parquet(docs_path),
        out_dir,
        input_id=input_id,
        text_col=text_col,
        **build_kwargs,
    )
