"""More-like-this (doc-as-query BM25) and sparse tf-idf document
similarity — verified against the independent python OracleIndex."""

from __future__ import annotations

import math

import pytest

from documentindex_spark import oracle
from documentindex_spark.functions.tokenize import (
    doc_lengths,
    term_frequencies,
)
from documentindex_spark.operators.bm25 import (
    impacts,
    more_like_this,
    tfidf_similar_pairs,
)
from documentindex_spark.operators.stats import (
    corpus_stats,
    document_frequencies,
)


@pytest.fixture(scope="module")
def impact_df(spark, repo_files_small):
    tf = term_frequencies(repo_files_small)
    dl = doc_lengths(repo_files_small)
    stats = corpus_stats(dl)
    dfreq = document_frequencies(tf)
    df = impacts(tf, dl, dfreq, stats).cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def orc(local_docs):
    return oracle.OracleIndex(local_docs)


def _py_vectors(orc, max_df=None):
    vecs = {}
    for d, cnt in orc.tf.items():
        vecs[d] = {
            t: orc.impact(t, d)
            for t in cnt
            if max_df is None or orc.df[t] <= max_df
        }
    return vecs


def _py_cos(va, vb):
    shared = set(va) & set(vb)
    dot = sum(va[t] * vb[t] for t in shared)
    na = math.sqrt(sum(x * x for x in va.values()))
    nb = math.sqrt(sum(x * x for x in vb.values()))
    return dot / (na * nb) if na and nb and dot else 0.0


@pytest.mark.parametrize("src", [0, 5, 42])
def test_more_like_this_matches_oracle(impact_df, orc, src):
    n_terms, k = 8, 10
    got = [
        (int(r["doc_id"]), float(r["score"]), int(r["rank"]))
        for r in more_like_this(
            impact_df, src, k=k, max_query_terms=n_terms
        ).collect()
    ]
    # python replica: source terms by (round(impact,6) DESC, term ASC)
    qt = sorted(
        orc.tf[src].keys(),
        key=lambda t: (-round(orc.impact(t, src), 6), t),
    )[:n_terms]
    scored = []
    for d in orc.tf:
        if d == src:
            continue
        s = 0.0
        for t in sorted(qt):  # frozen ascending-term summation
            s += orc.impact(t, d)
        if s > 0.0:
            scored.append((d, s))
    scored.sort(key=lambda x: (-x[1], x[0]))
    want = [(d, s, i + 1) for i, (d, s) in enumerate(scored[:k])]
    assert [g[0] for g in got] == [w[0] for w in want]
    assert [g[2] for g in got] == [w[2] for w in want]
    for g, w in zip(got, want):
        assert g[1] == pytest.approx(w[1], abs=1e-12)


def test_more_like_this_excludes_source(impact_df):
    out = more_like_this(impact_df, 3, k=50).collect()
    assert all(r["doc_id"] != 3 for r in out)


def test_tfidf_similar_pairs_matches_oracle(impact_df, orc, local_docs):
    th = 0.8
    got = {
        (r["doc_a"], r["doc_b"]): r["cos"]
        for r in tfidf_similar_pairs(impact_df, threshold=th).collect()
    }
    vecs = _py_vectors(orc)
    ids = sorted(local_docs)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            c = round(_py_cos(vecs[a], vecs[b]), 6)
            if c >= th:
                want[(a, b)] = c
    assert set(got) == set(want)
    for p, c in got.items():
        assert c == pytest.approx(want[p], abs=2e-6)


def test_tfidf_max_df_guard(impact_df, orc, local_docs):
    """Capping df drops hot terms from join AND norms (self-consistent
    cosine over the capped vectors)."""
    cap, th = 50, 0.5
    got = {
        (r["doc_a"], r["doc_b"]): r["cos"]
        for r in tfidf_similar_pairs(
            impact_df, threshold=th, max_df=cap
        ).collect()
    }
    vecs = _py_vectors(orc, max_df=cap)
    ids = sorted(local_docs)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            c = round(_py_cos(vecs[a], vecs[b]), 6)
            if c >= th:
                want[(a, b)] = c
    assert set(got) == set(want)
