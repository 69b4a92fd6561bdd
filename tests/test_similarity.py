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


def test_doc_keywords_matches_oracle(impact_df, orc, local_docs):
    from documentindex_spark.operators.bm25 import doc_keywords

    got = {}
    for r in doc_keywords(impact_df, n=3).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["keyword_rank"], r["term"], r["impact"])
        )
    for d in local_docs:
        terms = sorted(
            orc.tf[d].keys(),
            key=lambda t: (-round(orc.impact(t, d), 6), t),
        )[:3]
        want = [
            (i + 1, t, round(orc.impact(t, d), 6))
            for i, t in enumerate(terms)
        ]
        rows = sorted(got.get(d, []))
        assert [(r[0], r[1]) for r in rows] == [(w[0], w[1]) for w in want]
        for r, w in zip(rows, want):
            assert r[2] == pytest.approx(w[2], abs=1e-6)


def test_engine_mlt_matches_operator(spark, tmp_path):
    """Engine.more_like_this (stored tf/dl/postings-df + BMW) returns
    exactly what the exhaustive operator computes from the impact
    table — same docs, ranks, and float64 scores."""
    from documentindex_spark.api import Engine
    from documentindex_spark.functions.tokenize import (
        doc_lengths as dls,
    )
    from documentindex_spark.functions.tokenize import (
        term_frequencies as tfs,
    )
    from documentindex_spark.operators.stats import (
        corpus_stats as cs,
    )
    from documentindex_spark.operators.stats import (
        document_frequencies as dfs,
    )
    from documentindex_spark.sources.registry import with_doc_ids

    rows = [
        ("r%d" % i, "p%d" % i, "c", "en", txt)
        for i, txt in enumerate(
            [
                "merge sort window data function example text",
                "merge sort data window text value",
                "window filter example function value batch",
                "sort merge batch data example",
                "completely different words entirely elsewhere",
                "merge window sort function text example data",
            ]
        )
    ]
    docs = spark.createDataFrame(
        rows,
        "repo string, path string, commit string, lang string, "
        "content string",
    )
    files = with_doc_ids(docs)
    idx = str(tmp_path / "idx")
    eng = Engine.index(spark, files, idx, input_id="mlt-t",
                       bucket_groups=1)

    tf = tfs(files)
    dl = dls(files)
    imp = impacts(tf, dl, dfs(tf), cs(dl))

    for src in (0, 3):
        got = [
            (r["doc_id"], r["score"], r["rank"])
            for r in eng.more_like_this(src, k=4, max_query_terms=5)
            .collect()
        ]
        want = [
            (r["doc_id"], r["score"], r["rank"])
            for r in more_like_this(imp, src, k=4, max_query_terms=5)
            .collect()
        ]
        assert [g[0] for g in got] == [w[0] for w in want]
        assert [g[2] for g in got] == [w[2] for w in want]
        for g, w in zip(got, want):
            assert g[1] == pytest.approx(w[1], abs=1e-12)
        assert all(g[0] != src for g in got)
    eng.close()
