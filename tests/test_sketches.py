"""Sketch layer: estimates honor their published bounds vs exact
answers computed on the same corpus."""

from __future__ import annotations

from collections import Counter

import pytest

from documentindex_spark.functions import sketches


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (i, " ".join(
            ["the", "data", f"tok{i % 37}", "merge"]
            + (["hot"] * (1 + i % 3))
        ))
        for i in range(400)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _exact_counts(rows):
    c = Counter()
    for _, t in rows:
        c.update(t.split())
    return c


def test_corpus_sketch_stats_bounds(corpus):
    row = sketches.corpus_sketch_stats(corpus).head()
    texts = [(r["doc_id"], r["text"]) for r in corpus.collect()]
    exact = _exact_counts(texts)
    n_distinct = len(exact)
    assert row["n_docs"] == 400
    assert row["total_tokens"] == sum(exact.values())
    # HLL at lgK=12 on ~40 distinct values is essentially exact
    assert abs(row["distinct_terms_est"] - n_distinct) <= 0.05 * n_distinct
    dls = sorted(len(t.split()) for _, t in texts)
    # GK approx_percentile returns an element of the multiset within
    # rank tolerance — for this tiny spread just require membership
    assert row["dl_p50"] in set(map(float, dls))
    assert row["dl_p99"] >= row["dl_p90"] >= row["dl_p50"]


def test_count_min_overestimates_within_eps(spark, corpus):
    texts = [(r["doc_id"], r["text"]) for r in corpus.collect()]
    exact = _exact_counts(texts)
    total = sum(exact.values())
    eps = 0.001
    blob = sketches.term_count_sketch(corpus, eps=eps)
    got = sketches.cms_estimate_spark(
        spark, blob, ["the", "hot", "tok5", "absent_term"]
    )
    for term in ("the", "hot", "tok5"):
        assert got[term] >= exact[term]  # one-sided
        assert got[term] <= exact[term] + eps * total
    assert got["absent_term"] <= eps * total
