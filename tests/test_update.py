"""Upsert by natural key (Engine.update_documents): replaced
versions are tombstoned, the new versions append incrementally, and
post-update results equal exhaustive scoring over old∪new docs with
the replaced ids filtered out (the delete + append stale-stats
contracts composed). Reference analog: re-indexing a changed document
replaces its per-doc index (cache.py:361)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from documentindex_spark import oracle
from documentindex_spark.api import Engine

QUERY = "merge block"
SENTINEL = "zzzupdated"


@pytest.fixture(scope="module")
def updated(spark, repo_files_small, tmp_path_factory):
    """Index the 200-doc corpus, then replace 2 docs by (repo, path)
    with new-commit versions whose content gains a sentinel term.
    Returns (new_engine, old_ids, {new_doc_id: new_content})."""
    out = str(tmp_path_factory.mktemp("upd_idx"))
    eng = Engine.index(
        spark, repo_files_small, out, input_id="rf@200-upd",
        bucket_groups=1,
    )
    targets = repo_files_small.orderBy("doc_id").limit(2).collect()
    old_ids = [int(r["doc_id"]) for r in targets]
    rows = [
        (r["repo"], r["path"], r["commit"] + "_v2", r["lang"],
         f"{SENTINEL} merge " + r["content"])
        for r in targets
    ]
    batch = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string,"
        " content string",
    ).withColumn("content_sha", F.sha2(F.col("content"), 256))
    eng2 = eng.update_documents(
        batch, input_id="rf@200-upd2", bucket_groups=1,
    )
    docs = spark.read.parquet(os.path.join(out, "docs"))
    new_docs = {
        int(r["doc_id"]): r["content"]
        for r in docs.filter(F.col("commit").endswith("_v2")).collect()
    }
    return eng2, old_ids, new_docs


def test_new_ids_follow_corpus_and_old_ids_tombstoned(updated):
    eng2, old_ids, new_docs = updated
    assert sorted(new_docs) == [200, 201]
    assert set(old_ids) <= set(eng2._deleted)
    # live count is unchanged: 2 replaced, 2 added
    assert eng2.built.n_docs == 202
    assert len(eng2._deleted) == 2


def test_sentinel_query_returns_only_new_versions(updated):
    eng2, old_ids, new_docs = updated
    got = [
        int(r["doc_id"]) for r in eng2.search(SENTINEL, 10).collect()
    ]
    assert sorted(got) == sorted(new_docs)


def test_post_update_scores_equal_composed_oracle(
    updated, local_docs
):
    """Exhaustive old∪new oracle (202 docs — tombstoned tf rows still
    feed the stats, exactly as after delete) filtered to live docs,
    float64-identical to the engine's top-k."""
    eng2, old_ids, new_docs = updated
    orc = oracle.OracleIndex({**local_docs, **new_docs})
    want = [
        (d, s) for d, s in orc.topk(QUERY, 300) if d not in old_ids
    ][:10]
    got = [
        (int(r["doc_id"]), float(r["score"]))
        for r in eng2.search(QUERY, 10).orderBy("rank").collect()
    ]
    assert [d for d, _ in got] == [d for d, _ in want]
    assert [s for _, s in got] == pytest.approx(
        [s for _, s in want], abs=1e-12
    )


def test_unmatched_key_is_plain_insert(
    updated, spark, tmp_path_factory
):
    """A batch whose key exists nowhere tombstones nothing."""
    eng2, _, _ = updated
    rows = [("repo-new", "src/brand_new.py", "c0", "python",
             f"{SENTINEL} fresh insert only")]
    batch = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string,"
        " content string",
    ).withColumn("content_sha", F.sha2(F.col("content"), 256))
    before = set(eng2._deleted)
    eng3 = eng2.update_documents(
        batch, input_id="rf@200-upd3", bucket_groups=1,
    )
    assert set(eng3._deleted) == before
    assert eng3.built.n_docs == 203
    got = [
        int(r["doc_id"]) for r in eng3.search(SENTINEL, 10).collect()
    ]
    assert 202 in got
