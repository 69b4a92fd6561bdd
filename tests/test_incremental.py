"""Incremental append: tokenize only the new docs, final index
content-identical to a from-scratch build over the union corpus."""

from __future__ import annotations

import json
import os

from documentindex_spark.corpus import generate_repo_files
from documentindex_spark.plans.build_index import build_index
from documentindex_spark.plans.incremental import append_documents
from documentindex_spark.sources.registry import with_doc_ids


def _index_content(spark, out_dir):
    rows = spark.read.parquet(os.path.join(out_dir, "postings")).collect()
    return sorted(
        (r["term"], r["seg_idx"], r["df"], bytes(r["doc_blob"]),
         bytes(r["impact_blob"]))
        for r in rows
    )


def test_append_equals_full_rebuild(spark, tmp_path):
    # union corpus: first 150 files, then append the remaining 50.
    all200 = with_doc_ids(generate_repo_files(spark, 200)).cache()
    first = all200.filter("doc_id < 150")
    # the appended batch arrives WITHOUT ids (they're assigned inside)
    rest = (
        all200.filter("doc_id >= 150")
        .drop("doc_id")
        .orderBy("repo", "path", "commit")
    )

    inc_dir = str(tmp_path / "inc")
    build_index(spark, first, inc_dir, input_id="first@150", bucket_groups=1)
    tf_mtime = os.path.getmtime(os.path.join(inc_dir, "tf", "_SUCCESS"))

    built = append_documents(
        spark,
        __import__("documentindex_spark.plans.build_index", fromlist=["BuiltIndex"]).BuiltIndex.open(inc_dir),
        rest,
        input_id="union@200",
        bucket_groups=1,
    )
    assert built.n_docs == 200

    # appended ids follow the existing corpus and match the original
    docs = spark.read.parquet(os.path.join(inc_dir, "docs"))
    got = {
        (r["repo"], r["path"], r["commit"]): r["doc_id"]
        for r in docs.collect()
    }
    want = {
        (r["repo"], r["path"], r["commit"]): r["doc_id"]
        for r in all200.collect()
    }
    assert got == want  # same natural-key order ⇒ same ids

    full_dir = str(tmp_path / "full")
    build_index(spark, all200, full_dir, input_id="union@200", bucket_groups=1)
    assert _index_content(spark, inc_dir) == _index_content(spark, full_dir)

    # the manifest records the append; stats are the union's
    man = json.load(open(os.path.join(inc_dir, "_manifest.json")))
    assert man["tf"].get("appended") is True
    stats = json.load(open(os.path.join(inc_dir, "stats.json")))
    assert stats["n_docs"] == 200