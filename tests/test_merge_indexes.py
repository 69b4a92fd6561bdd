"""Shard-merge: independently built shard indexes merge into an index
content-identical to a single-shot build of the union corpus, without
re-tokenizing any shard."""

from __future__ import annotations

import json
import os

import pytest

from documentindex_spark.corpus import generate_repo_files
from documentindex_spark.plans.build_index import build_index
from documentindex_spark.plans.merge import merge_indexes
from documentindex_spark.sources.registry import with_doc_ids


def _index_content(spark, out_dir):
    rows = spark.read.parquet(os.path.join(out_dir, "postings")).collect()
    return sorted(
        (r["term"], r["seg_idx"], r["df"], bytes(r["doc_blob"]),
         bytes(r["impact_blob"]))
        for r in rows
    )


def test_merge_equals_full_build(spark, tmp_path):
    all200 = with_doc_ids(generate_repo_files(spark, 200)).cache()
    # shard split by contiguous doc_id ranges; each shard re-ids its
    # own slice densely from 0 (an independent build knows nothing of
    # the other shards). with_doc_ids orders by (repo, path, commit),
    # so contiguous slices re-id to the same relative order.
    s1 = with_doc_ids(all200.filter("doc_id < 120").drop("doc_id"))
    s2 = with_doc_ids(all200.filter("doc_id >= 120").drop("doc_id"))

    d1, d2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    build_index(spark, s1, d1, input_id="s1@120", bucket_groups=1)
    build_index(spark, s2, d2, input_id="s2@80", bucket_groups=1)
    tf1_mtime = os.path.getmtime(os.path.join(d1, "tf", "_SUCCESS"))

    merged_dir = str(tmp_path / "merged")
    built = merge_indexes(
        spark, [d1, d2], merged_dir, input_id="union@200",
        bucket_groups=1,
    )
    assert built.n_docs == 200

    # shard tf untouched (no re-tokenize of shard corpora)
    assert os.path.getmtime(os.path.join(d1, "tf", "_SUCCESS")) == tf1_mtime

    # merged ids equal the union build's ids (offset re-id aligns
    # with the global natural-key order)
    docs = spark.read.parquet(os.path.join(merged_dir, "docs"))
    got = {
        (r["repo"], r["path"], r["commit"]): r["doc_id"]
        for r in docs.collect()
    }
    want = {
        (r["repo"], r["path"], r["commit"]): r["doc_id"]
        for r in all200.collect()
    }
    assert got == want

    full_dir = str(tmp_path / "full")
    build_index(spark, all200, full_dir, input_id="union@200",
                bucket_groups=1)
    assert _index_content(spark, merged_dir) == _index_content(
        spark, full_dir
    )

    man = json.load(open(os.path.join(merged_dir, "_manifest.json")))
    assert man["tf"]["merged_from"] == [d1, d2]
    stats = json.load(open(os.path.join(merged_dir, "stats.json")))
    assert stats["n_docs"] == 200


def test_merge_compacted_shard_no_id_collision(spark, tmp_path):
    """Round-4 advice (medium): a compacted shard keeps surviving
    doc_ids WITH HOLES (count < max_id+1). Offsetting the next shard
    by row count would re-issue live ids; the max(doc_id)+1 offset
    must keep every merged id unique and every doc retrievable."""
    from documentindex_spark.plans.delete import (
        compact_index,
        delete_documents,
    )

    all120 = with_doc_ids(generate_repo_files(spark, 120)).cache()
    s1 = with_doc_ids(all120.filter("doc_id < 80").drop("doc_id"))
    s2 = with_doc_ids(all120.filter("doc_id >= 80").drop("doc_id"))
    d1, d2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    build_index(spark, s1, d1, input_id="s1@80", bucket_groups=1)
    build_index(spark, s2, d2, input_id="s2@40", bucket_groups=1)

    # Punch holes in shard 1: delete LOW ids so count(60) < max_id+1(80).
    delete_documents(spark, d1, range(20))
    d1c = str(tmp_path / "s1_compacted")
    compact_index(spark, d1, d1c, input_id="s1@80-compact",
                  bucket_groups=1)
    docs1 = spark.read.parquet(os.path.join(d1c, "docs"))
    assert docs1.count() == 60
    assert docs1.agg({"doc_id": "max"}).first()[0] == 79  # holes proven

    merged_dir = str(tmp_path / "merged_holes")
    built = merge_indexes(
        spark, [d1c, d2], merged_dir, input_id="holes@100",
        bucket_groups=1,
    )
    docs = spark.read.parquet(os.path.join(merged_dir, "docs"))
    ids = [r["doc_id"] for r in docs.select("doc_id").collect()]
    assert built.n_docs == len(ids) == 100
    assert len(set(ids)) == 100  # collision-free under holes
    # shard-1 keeps 20..79; shard-2 re-ids to 80..119 (after the max,
    # never into the holes)
    assert sorted(ids) == list(range(20, 120))


def test_merge_rejects_inplace_shard(spark, tmp_path):
    with pytest.raises(ValueError, match="materialized"):
        merge_indexes(
            spark, [str(tmp_path / "nonexistent")],
            str(tmp_path / "out"), input_id="x",
        )
