"""Streaming index ingestion: files dropped in an inbox flow through
readStream → foreachBatch → append_documents; the stored index ends
content-identical to a from-scratch batch build over everything
ingested, and each micro-batch tokenized only its own docs."""

from __future__ import annotations

import json
import os

from documentindex_spark.corpus import generate_repo_files
from documentindex_spark.plans.build_index import build_index
from documentindex_spark.sources.registry import with_doc_ids
from documentindex_spark.streaming.ingest import ingest_stream
from tests.test_incremental import _index_content


def test_stream_ingest_equals_batch_build(spark, tmp_path):
    all120 = with_doc_ids(generate_repo_files(spark, 120)).cache()
    base = all120.filter("doc_id < 80")
    rest = all120.filter("doc_id >= 80").drop("doc_id")

    idx_dir = str(tmp_path / "idx")
    built = build_index(spark, base, idx_dir, input_id="base@80",
                        bucket_groups=1)

    # two JSONL drops → two micro-batches (maxFilesPerTrigger=1),
    # split on the same natural-key order dense_ids uses so streamed
    # arrival order matches the batch corpus order
    inbox = str(tmp_path / "inbox")
    os.makedirs(inbox)
    rows = sorted(
        (r.asDict() for r in rest.collect()),
        key=lambda d: (d["repo"], d["path"], d["commit"]),
    )
    cols = ["repo", "path", "commit", "lang", "content"]
    import time

    now = time.time()
    for age, (name, part) in enumerate(
        (("a.jsonl", rows[:20]), ("b.jsonl", rows[20:]))
    ):
        p = os.path.join(inbox, name)
        with open(p, "w") as f:
            for d in part:
                f.write(json.dumps({c: d[c] for c in cols}) + "\n")
        # distinct mtimes: the file source orders new files by
        # timestamp, and arrival order decides doc_ids — the equality
        # below needs arrival order == the batch corpus order
        os.utime(p, (now - 20 + age * 10, now - 20 + age * 10))

    q = ingest_stream(
        spark, built, inbox, str(tmp_path / "ckpt"), bucket_groups=1
    )
    # availableNow self-terminates once both micro-batches are done —
    # block without a timeout (a fixed budget raced the append once)
    q.awaitTermination()

    # stats reflect both batches; base tf never re-tokenized is not
    # assertable via mtime here (append rewrites derived stages), but
    # the manifest shows the tf stage in appended mode
    stats = json.load(open(os.path.join(idx_dir, "stats.json")))
    assert stats["n_docs"] == 120
    man = json.load(open(os.path.join(idx_dir, "_manifest.json")))
    assert man["tf"].get("appended") is True

    full_dir = str(tmp_path / "full")
    build_index(spark, all120, full_dir, input_id="full@120",
                bucket_groups=1)
    assert _index_content(spark, idx_dir) == _index_content(spark, full_dir)


def _split_corpus(spark, n=60, base=40):
    from documentindex_spark.corpus import generate_repo_files
    from documentindex_spark.sources.registry import with_doc_ids

    alln = with_doc_ids(generate_repo_files(spark, n)).cache()
    return (
        alln,
        alln.filter(f"doc_id < {base}"),
        alln.filter(f"doc_id >= {base}").drop("doc_id"),
    )


def test_replayed_batch_is_idempotent(spark, tmp_path):
    """foreachBatch replay (crash after append, before the streaming
    checkpoint commit) re-runs append_documents with the SAME
    input_id: the second call must not double-append."""
    import os

    from documentindex_spark.plans.build_index import BuiltIndex
    from documentindex_spark.plans.incremental import append_documents

    alln, base, rest = _split_corpus(spark)
    idx_dir = str(tmp_path / "idx")
    built = build_index(spark, base, idx_dir, input_id="base",
                        bucket_groups=1)

    append_documents(spark, built, rest, input_id="stream-batch-0",
                     bucket_groups=1)
    first = _index_content(spark, idx_dir)
    n_docs = spark.read.parquet(os.path.join(idx_dir, "docs")).count()

    # the replay: same batch, same input_id
    append_documents(spark, BuiltIndex.open(idx_dir), rest,
                     input_id="stream-batch-0", bucket_groups=1)
    assert spark.read.parquet(os.path.join(idx_dir, "docs")).count() == n_docs
    assert _index_content(spark, idx_dir) == first


def test_replay_after_crash_mid_append(spark, tmp_path, monkeypatch):
    """Crash window (a): process dies after the docs append but before
    the tf append. The retry must remove the orphan docs part files
    (write-ahead `_pending_append` record) and converge to the same
    index a from-scratch batch build produces."""
    from documentindex_spark.plans import incremental as inc
    from documentindex_spark.plans.build_index import BuiltIndex

    alln, base, rest = _split_corpus(spark)
    idx_dir = str(tmp_path / "idx")
    built = build_index(spark, base, idx_dir, input_id="base",
                        bucket_groups=1)

    real_tf = inc.term_frequencies_colocated

    def _boom(*a, **k):
        raise RuntimeError("injected crash after docs append")

    monkeypatch.setattr(inc, "term_frequencies_colocated", _boom)
    try:
        inc.append_documents(spark, built, rest, input_id="stream-batch-0",
                             bucket_groups=1)
        raise AssertionError("injected crash did not fire")
    except RuntimeError:
        pass
    monkeypatch.setattr(inc, "term_frequencies_colocated", real_tf)

    # retry with the same input_id (what foreachBatch replay does)
    inc.append_documents(spark, BuiltIndex.open(idx_dir), rest,
                         input_id="stream-batch-0", bucket_groups=1)

    full_dir = str(tmp_path / "full")
    build_index(spark, alln, full_dir, input_id="full", bucket_groups=1)
    assert _index_content(spark, idx_dir) == _index_content(spark, full_dir)
