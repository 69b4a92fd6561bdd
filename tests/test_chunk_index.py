"""Chunk-level retrieval (the reference's retrieval unit) + bottom-up
parent synthesis."""

from __future__ import annotations

import pytest

from documentindex_spark import oracle
from documentindex_spark.operators.bmw import bmw_topk
from documentindex_spark.operators.chunker import (
    build_nodes,
    synthesize_node_summaries,
)
from documentindex_spark.plans.chunk_index import (
    build_chunk_index,
    chunks_with_ids,
    rollup_to_files,
)

QUERY = "merge block"


@pytest.fixture(scope="module")
def chunk_built(spark, repo_files_small, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("chunk_idx"))
    built, chunk_map = build_chunk_index(
        spark, repo_files_small, out, input_id="rf@200-chunks",
        bucket_groups=1,
    )
    return built, chunk_map


def test_chunk_ids_dense_and_reproducible(spark, repo_files_small):
    a = chunks_with_ids(repo_files_small)
    ids = [r["chunk_id"] for r in a.select("chunk_id").orderBy("chunk_id").collect()]
    assert ids == list(range(len(ids)))
    b = chunks_with_ids(repo_files_small.repartition(7))
    pa = {(r["doc_id"], r["chunk_index"]): r["chunk_id"] for r in a.collect()}
    pb = {(r["doc_id"], r["chunk_index"]): r["chunk_id"] for r in b.collect()}
    assert pa == pb


def test_chunk_level_rank_identity(spark, chunk_built, repo_files_small):
    built, _ = chunk_built
    chunks = chunks_with_ids(repo_files_small).select("chunk_id", "text").collect()
    orc = oracle.OracleIndex({int(r["chunk_id"]): r["text"] for r in chunks})
    got = [
        (int(r["doc_id"]), float(r["score"]))
        for r in bmw_topk(spark, built.postings_path, {0: QUERY}, k=10)
        .orderBy("rank")
        .collect()
    ]
    want = orc.topk(QUERY, 10)
    assert [d for d, _ in got] == [d for d, _ in want]
    assert [s for _, s in got] == pytest.approx([s for _, s in want], abs=1e-12)


def test_rollup_to_files(spark, chunk_built):
    built, chunk_map = chunk_built
    hits = bmw_topk(spark, built.postings_path, {0: QUERY}, k=20).select(
        "doc_id", "score"
    )
    rolled = rollup_to_files(hits, chunk_map).collect()
    assert rolled
    hit_rows = {int(r["doc_id"]): float(r["score"]) for r in hits.collect()}
    cmap = {
        int(r["doc_id"]): int(r["file_doc_id"]) for r in chunk_map.collect()
    }
    import collections

    per_file = collections.defaultdict(list)
    for cid, s in hit_rows.items():
        per_file[cmap[cid]].append((s, cid))
    for r in rolled:
        want = per_file[int(r["file_doc_id"])]
        assert float(r["best_score"]) == pytest.approx(max(s for s, _ in want))
        assert r["n_chunks_hit"] == len(want)
        best = sorted(want, key=lambda x: (-x[0], x[1]))[0][1]
        assert int(r["best_chunk_id"]) == best


def test_parent_synthesis(spark):
    text = (
        "# module m\n## section 1.1 alpha\ndef aa(x):\n    one\n"
        "def bb(x):\n    two\n## section 2.1 beta\ndef cc(x):\n    three\n"
    )
    df = spark.createDataFrame(
        [(0, text, "python")], "doc_id long, content string, lang string"
    )
    nodes = synthesize_node_summaries(build_nodes(df))
    by_title = {r["title"]: r["summary"] for r in nodes.collect()}
    assert by_title["aa"] == "aa"  # leaf: summary = title
    assert by_title["section 1.1 alpha"] == "section 1.1 alpha: aa; bb"
    assert by_title["section 2.1 beta"] == "section 2.1 beta: cc"
    # root preamble aggregates its direct children (the two sections)
    assert (
        by_title["<preamble>"]
        == "<preamble>: section 1.1 alpha: aa; bb; section 2.1 beta: cc"
    )