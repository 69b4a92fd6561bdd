"""Two-phase document deletion (plans/delete.py): tombstones give
Lucene liveDocs semantics at query time (deleted docs vanish from
every query path, survivors keep their exact stale-stats scores);
compaction rewrites the index to the true retained-corpus scores
without re-tokenizing. Reference analog: per-doc index removal,
cache.py:361."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from documentindex_spark import oracle
from documentindex_spark.api import Engine
from documentindex_spark.plans.build_index import build_index
from documentindex_spark.plans.delete import (
    delete_documents,
    load_tombstones,
)

QUERY = "merge block"


@pytest.fixture(scope="module")
def deleted_engine(spark, repo_files_small, tmp_path_factory):
    """Index over the 200-doc corpus with the QUERY's top-2 docs
    tombstoned. Returns (engine, deleted_ids, pre_delete_top)."""
    out = str(tmp_path_factory.mktemp("del_idx"))
    eng = Engine.index(
        spark, repo_files_small, out, input_id="rf@200-del",
        bucket_groups=1,
    )
    pre = eng.search_serve(QUERY, 200)  # full pre-delete ranking
    deleted = [d for d, _ in pre[:2]]
    n = eng.delete(deleted)
    assert n == 2
    return eng, deleted, pre


def test_search_excludes_and_keeps_stale_scores(
    deleted_engine, local_docs
):
    """Post-delete top-k == exhaustive-rank-then-filter with the
    PRE-delete stats (the Lucene contract: df/avgdl stay stale until
    compaction), float64-identical scores."""
    eng, deleted, _ = deleted_engine
    orc = oracle.OracleIndex(local_docs)  # full-corpus (stale) stats
    want = [
        (d, s) for d, s in orc.topk(QUERY, 200) if d not in deleted
    ][:10]
    got = [
        (int(r["doc_id"]), float(r["score"]))
        for r in eng.search(QUERY, 10).orderBy("rank").collect()
    ]
    assert got == want
    assert not (set(d for d, _ in got) & set(deleted))


def test_serve_paths_match_distributed(deleted_engine):
    eng, _, _ = deleted_engine
    dist = [
        (int(r["doc_id"]), float(r["score"]))
        for r in eng.search(QUERY, 10).orderBy("rank").collect()
    ]
    assert eng.search_serve(QUERY, 10) == dist
    assert eng.search_serve_arrow(QUERY, 10) == dist
    assert eng.search_cached(QUERY, 10) == dist


def test_threshold_path_excludes(deleted_engine, local_docs):
    eng, deleted, _ = deleted_engine
    orc = oracle.OracleIndex(local_docs)
    rows = eng.extract_all(QUERY, threshold=1.0).collect()
    got = sorted(int(r["doc_id"]) for r in rows)
    want = sorted(
        d for d, _ in orc.all_matches(QUERY, 1.0) if d not in deleted
    )
    assert got == want


def test_tombstones_persist_and_idempotent(deleted_engine, spark,
                                           repo_files_small):
    eng, deleted, _ = deleted_engine
    # a fresh open on the same dir sees the tombstones
    reopened = Engine.open(
        spark, eng.built.out_dir, repo_files_small
    )
    assert reopened._deleted == frozenset(deleted)
    # re-deleting the same ids is a no-op at read time
    assert eng.delete(deleted) == len(deleted)
    assert load_tombstones(spark, eng.built.out_dir) == frozenset(deleted)


def test_nodes_exclude_deleted(deleted_engine):
    """Structure paths read the live-docs view: no TreeNode rows for
    tombstoned docs (Lucene hides deleted docs' stored fields)."""
    eng, deleted, _ = deleted_engine
    node_docs = {
        int(r["doc_id"])
        for r in eng.nodes().select("doc_id").distinct().collect()
    }
    assert not (node_docs & set(deleted))
    assert len(node_docs) == 200 - len(deleted)


def test_more_like_this_rejects_deleted_source(deleted_engine):
    eng, deleted, _ = deleted_engine
    with pytest.raises(ValueError, match="deleted"):
        eng.more_like_this(deleted[0], k=5)


def test_compact_identical_to_fresh_retained_build(
    deleted_engine, spark, repo_files_small, tmp_path_factory
):
    """compact() must produce the index a from-scratch build of the
    retained corpus (same doc_ids) produces — content-identical
    postings, correct (post-delete) stats, no tombstones carried."""
    from tests.test_merge_indexes import _index_content

    eng, deleted, _ = deleted_engine
    dest = str(tmp_path_factory.mktemp("del_compacted"))
    ceng = eng.compact(dest, input_id="rf@198-compact")
    assert ceng.built.n_docs == 200 - len(deleted)
    assert ceng._deleted == frozenset()

    retained = repo_files_small.filter(
        ~repo_files_small.doc_id.isin(deleted)
    )
    full = str(tmp_path_factory.mktemp("del_fresh"))
    build_index(
        spark, retained, full, input_id="rf@198-compact",
        bucket_groups=1,
    )
    assert _index_content(spark, dest) == _index_content(spark, full)

    # post-compaction scores = true retained-corpus scores
    rows = {
        int(r["doc_id"]) for r in ceng.search(QUERY, 10).collect()
    }
    assert not (rows & set(deleted))

    # tf was filtered, not re-tokenized: the compacted tf row count
    # equals the source's minus the deleted docs' rows
    src_tf = spark.read.parquet(
        os.path.join(eng.built.out_dir, "tf")
    )
    n_dropped = src_tf.filter(src_tf.doc_id.isin(deleted)).count()
    n_compacted = spark.read.parquet(os.path.join(dest, "tf")).count()
    assert n_compacted == src_tf.count() - n_dropped


def test_delete_where_by_natural_key(spark, repo_files_small,
                                     tmp_path_factory):
    """Deletion by the reference's key shape (repo/path), resolved
    through the stored doc_map."""
    out = str(tmp_path_factory.mktemp("del_where"))
    eng = Engine.index(
        spark, repo_files_small, out, input_id="rf@200-delw",
        bucket_groups=1,
    )
    victim = repo_files_small.select("repo", "path", "doc_id").head()
    n = eng.delete_where(
        (F.col("repo") == victim["repo"])
        & (F.col("path") == victim["path"])
    )
    assert n >= 1
    assert int(victim["doc_id"]) in eng._deleted
    # no-match condition is a no-op
    assert eng.delete_where("repo = 'no-such-repo'") == n
    # overflow guard
    with pytest.raises(RuntimeError, match="filtered source"):
        eng.delete_where("repo IS NOT NULL", max_delete=10)


def test_tombstone_overflow_guard(spark, repo_files_small,
                                  tmp_path_factory):
    out = str(tmp_path_factory.mktemp("del_guard"))
    build_index(
        spark, repo_files_small, out, input_id="rf@200-guard",
        bucket_groups=1,
    )
    with pytest.raises(RuntimeError, match="compact_index"):
        delete_documents(
            spark, out, range(150), max_tombstone_frac=0.5
        )
    # Guard-before-write (round-4 advice): the rejected delete must
    # leave NO tombstones behind — a later open sees an empty set.
    assert load_tombstones(spark, out) == frozenset()
    # And a subsequent under-cap delete still works normally.
    assert delete_documents(
        spark, out, [0, 1], max_tombstone_frac=0.5
    ) == 2
    assert load_tombstones(spark, out) == frozenset({0, 1})
