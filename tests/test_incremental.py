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

def test_append_after_compaction_no_id_collision(spark, tmp_path):
    """Round-4 advice (medium): compaction preserves surviving doc_ids
    with holes, so append's id base must be max(doc_id)+1, not the row
    count — a count base would re-issue live ids and corrupt
    tf/postings silently."""
    from documentindex_spark.plans.build_index import BuiltIndex
    from documentindex_spark.plans.delete import (
        compact_index,
        delete_documents,
    )

    all120 = with_doc_ids(generate_repo_files(spark, 120)).cache()
    first = all120.filter("doc_id < 80")
    rest = (
        all120.filter("doc_id >= 80")
        .drop("doc_id")
        .orderBy("repo", "path", "commit")
    )

    base_dir = str(tmp_path / "base")
    build_index(spark, first, base_dir, input_id="first@80",
                bucket_groups=1)
    # delete LOW ids so the surviving set has holes: ids 20..79,
    # count 60 < max_id+1 = 80
    delete_documents(spark, base_dir, range(20))
    comp_dir = str(tmp_path / "compacted")
    compact_index(spark, base_dir, comp_dir, input_id="first@80-compact",
                  bucket_groups=1)

    built = append_documents(
        spark,
        BuiltIndex.open(comp_dir),
        rest,
        input_id="compact+40",
        bucket_groups=1,
    )
    docs = spark.read.parquet(os.path.join(comp_dir, "docs"))
    ids = sorted(r["doc_id"] for r in docs.select("doc_id").collect())
    assert built.n_docs == len(ids) == 100
    # survivors keep 20..79; appended docs take 80..119 — never the holes
    assert ids == list(range(20, 120))


def _postings_files(out_dir):
    import glob

    return {
        p: (os.path.getmtime(p), os.path.getsize(p))
        for p in glob.glob(
            os.path.join(out_dir, "postings", "**", "*.parquet"),
            recursive=True,
        )
    }


def test_stale_append_frozen_stats(spark, tmp_path):
    """Round-4 verdict #2: stale_stats=True appends the batch as a new
    segment group under FROZEN corpus stats — no existing blob is
    rewritten, and every score (old doc or new) is BM25 under the
    frozen N/avgdl/df, with df=0 (max idf) for terms the frozen corpus
    never saw."""
    from pyspark.sql import functions as F

    from documentindex_spark import oracle
    from documentindex_spark.api import Engine
    from documentindex_spark.plans.build_index import BuiltIndex

    all200 = with_doc_ids(generate_repo_files(spark, 200)).cache()
    first = all200.filter("doc_id < 150")
    # the appended docs gain a marker term the frozen corpus has never
    # seen, pinning the df=0 path
    rest = (
        all200.filter("doc_id >= 150")
        .drop("doc_id")
        .withColumn("content", F.concat("content", F.lit(" zzznewterm")))
        .drop("content_sha")
        .orderBy("repo", "path", "commit")
    )

    out = str(tmp_path / "stale")
    build_index(spark, first, out, input_id="first@150", bucket_groups=1)
    pre_files = _postings_files(out)

    built = append_documents(
        spark,
        BuiltIndex.open(out),
        rest,
        input_id="union@200-stale",
        stale_stats=True,
        bucket_groups=1,
    )

    # stats stay frozen; provenance records the append
    stats = json.load(open(os.path.join(out, "stats.json")))
    assert built.n_docs == stats["n_docs"] == 150
    assert stats["n_docs_total"] == 200
    assert stats["stale_appends"][0]["n_docs"] == 50

    # no existing posting file was rewritten (batch-sized work only)
    post_files = _postings_files(out)
    for p, sig in pre_files.items():
        assert post_files[p] == sig, f"existing blob rewritten: {p}"
    assert len(post_files) > len(pre_files)  # the new group landed

    # scoring == numpy oracle over the UNION corpus with FROZEN stats
    union_docs = {
        int(r["doc_id"]): r["content"]
        for r in spark.read.parquet(os.path.join(out, "docs"))
        .select("doc_id", "content")
        .collect()
    }
    assert len(union_docs) == 200
    orc = oracle.OracleIndex(union_docs)
    frozen = oracle.OracleIndex(
        {d: t for d, t in union_docs.items() if d < 150}
    )
    orc.n, orc.avgdl, orc.df = frozen.n, frozen.avgdl, frozen.df

    eng = Engine.open(
        spark, out, spark.read.parquet(os.path.join(out, "docs"))
    )
    for q in ("merge block", "zzznewterm", "merge zzznewterm"):
        want = orc.topk(q, 10)
        got = [
            (int(r["doc_id"]), float(r["score"]))
            for r in eng.search(q, 10).orderBy("rank").collect()
        ]
        assert got == want, q
    # the unseen-term query hits ONLY appended docs
    hits = {d for d, _ in orc.topk("zzznewterm", 10)}
    assert hits and all(d >= 150 for d in hits)


def test_stale_append_then_refresh_equals_fresh_build(spark, tmp_path):
    """Two stale appends stack (frozen df read back from segment
    metadata), and refresh_index folds them into an index
    content-identical to a fresh build over the union corpus."""
    from documentindex_spark.plans.build_index import BuiltIndex
    from documentindex_spark.plans.incremental import refresh_index

    all200 = with_doc_ids(generate_repo_files(spark, 200)).cache()
    first = all200.filter("doc_id < 120")
    batch1 = (
        all200.filter("doc_id >= 120 AND doc_id < 160")
        .drop("doc_id")
        .orderBy("repo", "path", "commit")
    )
    batch2 = (
        all200.filter("doc_id >= 160")
        .drop("doc_id")
        .orderBy("repo", "path", "commit")
    )

    out = str(tmp_path / "stale2")
    build_index(spark, first, out, input_id="first@120", bucket_groups=1)
    append_documents(
        spark, BuiltIndex.open(out), batch1, input_id="b1",
        stale_stats=True, bucket_groups=1,
    )
    built = append_documents(
        spark, BuiltIndex.open(out), batch2, input_id="b2",
        stale_stats=True, bucket_groups=1,
    )
    stats = json.load(open(os.path.join(out, "stats.json")))
    assert built.n_docs == 120  # still frozen
    assert stats["n_docs_total"] == 200
    assert [a["group"] for a in stats["stale_appends"]] == [1, 2]

    refreshed = refresh_index(
        spark, BuiltIndex.open(out), input_id="union@200",
        bucket_groups=1,
    )
    assert refreshed.n_docs == 200
    stats = json.load(open(os.path.join(out, "stats.json")))
    assert "stale_appends" not in stats  # markers folded away

    full_dir = str(tmp_path / "full")
    build_index(
        spark, all200, full_dir, input_id="union@200", bucket_groups=1
    )
    assert _index_content(spark, out) == _index_content(spark, full_dir)
