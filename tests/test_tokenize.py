"""Tokenizer + corpus determinism + sha invariant (SURVEY.md §5.1/3)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from documentindex_spark import oracle
from documentindex_spark.corpus import generate_repo_files
from documentindex_spark.functions.tokenize import (
    doc_lengths,
    query_terms,
    term_frequencies,
    tokenize,
)


def test_corpus_deterministic(spark):
    a = generate_repo_files(spark, 50, num_partitions=2).orderBy("repo", "path")
    b = generate_repo_files(spark, 50, num_partitions=7).orderBy("repo", "path")
    assert [r.asDict() for r in a.collect()] == [r.asDict() for r in b.collect()]


def test_content_sha_invariant(repo_files_small):
    """Per-row invariant: sha2(content,256) matches a driver-side
    recomputation (BASELINE.json:15)."""
    rows = repo_files_small.select("content", "content_sha").limit(20).collect()
    for r in rows:
        assert (
            hashlib.sha256(r["content"].encode()).hexdigest() == r["content_sha"]
        )


def test_spark_tokenizer_matches_oracle(spark):
    texts = [
        "Hello, World! foo_bar baz-42",
        "  leading and trailing  ",
        "",
        "UPPER lower 123abc",
        "punct...only!!!",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, content string"
    )
    got = (
        tokenize(df)
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list(F.struct("pos", "term"))).alias("t"))
        .collect()
    )
    by_id = {r["doc_id"]: [x["term"] for x in r["t"]] for r in got}
    for i, t in enumerate(texts):
        assert by_id.get(i, []) == oracle.tokenize(t), f"doc {i}"


def test_tf_and_dl_match_oracle(spark, repo_files_small, local_docs):
    orc = oracle.OracleIndex(local_docs)
    tf = term_frequencies(repo_files_small).collect()
    for r in tf[:500]:
        assert orc.tf[r["doc_id"]][r["term"]] == r["tf"]
    dl = {r["doc_id"]: r["dl"] for r in doc_lengths(repo_files_small).collect()}
    assert dl == orc.dl


def test_query_terms_frozen_semantics():
    assert query_terms("The THE merge merge zeta") == ["merge", "the", "zeta"]
    assert query_terms("...") == []
