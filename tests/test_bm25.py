"""Exhaustive Spark BM25 vs the independent numpy oracle —
score-identical (float64 exact: same impacts, same summation order)
and rank-identical (SURVEY.md §5.2)."""

from __future__ import annotations

import pytest

from documentindex_spark import oracle
from documentindex_spark.functions.tokenize import doc_lengths, term_frequencies
from documentindex_spark.operators.bm25 import impacts, score_query, topk
from documentindex_spark.operators.stats import (
    corpus_stats,
    document_frequencies,
)

QUERIES = [
    "merge block",
    "the",
    "index0 token1 parse2",
    "def class return",
    "zzzz_not_in_vocab merge",  # OOV term mixed with in-vocab
    "zzzz_only_oov",            # fully OOV → empty result
]


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


@pytest.mark.parametrize("query", QUERIES)
def test_exhaustive_rank_and_score_identity(impact_df, orc, query):
    k = 10
    got = [
        (int(r["doc_id"]), float(r["score"]))
        for r in topk(score_query(impact_df, query), k).orderBy("rank").collect()
    ]
    want = orc.topk(query, k)
    assert [d for d, _ in got] == [d for d, _ in want], "rank identity"
    for (gd, gs), (wd, ws) in zip(got, want):
        assert gs == pytest.approx(ws, abs=1e-12), f"doc {gd} score"


def test_all_matches_threshold_mode(impact_df, orc):
    """Provenance 'find ALL evidence' semantics: threshold filter,
    no limit (reference provenance.py:84-139)."""
    query = "merge block"
    th = 1.0
    got = sorted(
        (int(r["doc_id"]), float(r["score"]))
        for r in score_query(impact_df, query)
        .filter("score >= %f" % th)
        .collect()
    )
    want = sorted(orc.all_matches(query, th))
    assert [d for d, _ in got] == [d for d, _ in want]
    for (gd, gs), (wd, ws) in zip(got, want):
        assert gs == pytest.approx(ws, abs=1e-12)


def test_boolean_conjunctive_matches_oracle(impact_df, orc, local_docs):
    """AND semantics: only docs containing EVERY query term; scores
    equal the ranked scorer's for those docs."""
    from documentindex_spark.operators.bm25 import score_query_boolean

    query = "merge block"
    got = {
        int(r["doc_id"]): (float(r["score"]), r["n_matched"])
        for r in score_query_boolean(impact_df, query).collect()
    }
    import re

    want_scores = dict(orc.all_matches(query, float("-inf")))
    want_ids = {
        d for d, text in local_docs.items()
        if {"merge", "block"}
        <= set(t for t in re.split(r"[^a-z0-9]+", text.lower()) if t)
    }
    assert set(got) == want_ids
    for d, (s, n) in got.items():
        assert n == 2
        assert s == pytest.approx(want_scores[d], abs=1e-12)


def test_boolean_min_should_match(impact_df, local_docs):
    """msm=1 degenerates to the disjunctive scorer's doc set."""
    from documentindex_spark.operators.bm25 import score_query_boolean

    query = "merge block"
    msm1 = {
        int(r["doc_id"])
        for r in score_query_boolean(impact_df, query, 1).collect()
    }
    disj = {
        int(r["doc_id"]) for r in score_query(impact_df, query).collect()
    }
    assert msm1 == disj
    msm2 = {
        int(r["doc_id"])
        for r in score_query_boolean(impact_df, query, 2).collect()
    }
    assert msm2 <= msm1


def test_grouped_topk_matches_naive_per_facet(spark, impact_df, repo_files_small):
    """topk_grouped (sharded two-stage) == plain per-facet top-k under
    the (round(score,6) DESC, doc_id ASC) order, for any shard count."""
    from documentindex_spark.operators.bm25 import topk_grouped

    scored = score_query(impact_df, "merge block").join(
        repo_files_small.select("doc_id", "repo"), "doc_id"
    )
    rows = [
        (r["repo"], int(r["doc_id"]), round(float(r["score"]), 6))
        for r in scored.collect()
    ]
    k = 3
    want: dict[str, list[tuple[int, int]]] = {}
    for repo in {f for f, _, _ in rows}:
        members = sorted(
            ((s, d) for f, d, s in rows if f == repo),
            key=lambda x: (-x[0], x[1]),
        )[:k]
        want[repo] = [(d, i + 1) for i, (_, d) in enumerate(members)]

    for n_shards in (1, 4, 32):
        got: dict[str, list[tuple[int, int]]] = {}
        res = topk_grouped(scored, "repo", k, n_shards=n_shards)
        for r in sorted(
            res.collect(), key=lambda r: (r["repo"], r["rank"])
        ):
            got.setdefault(r["repo"], []).append(
                (int(r["doc_id"]), int(r["rank"]))
            )
        assert got == want, f"n_shards={n_shards}"


def test_grouped_topk_k_exceeds_group_size(spark, impact_df, repo_files_small):
    """k larger than a facet's member count returns every member once
    with contiguous ranks."""
    from documentindex_spark.operators.bm25 import topk_grouped

    scored = score_query(impact_df, "merge block").join(
        repo_files_small.select("doc_id", "repo"), "doc_id"
    )
    res = topk_grouped(scored, "repo", 10_000).collect()
    per_facet: dict[str, list[int]] = {}
    for r in res:
        per_facet.setdefault(r["repo"], []).append(int(r["rank"]))
    n_matches = scored.count()
    assert sum(len(v) for v in per_facet.values()) == n_matches
    for repo, ranks in per_facet.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_facet_counts_matches_naive(spark, impact_df, repo_files_small):
    """facet_counts == per-facet count/max/avg computed naively on the
    collected scored set."""
    from documentindex_spark.operators.bm25 import facet_counts

    scored = score_query(impact_df, "merge block").join(
        repo_files_small.select("doc_id", "repo"), "doc_id"
    )
    rows = [(r["repo"], float(r["score"])) for r in scored.collect()]
    want = {}
    for repo in {f for f, _ in rows}:
        ss = [s for f, s in rows if f == repo]
        want[repo] = (len(ss), round(max(ss), 6), round(sum(ss) / len(ss), 6))

    got = {
        r["repo"]: (
            int(r["n_matches"]),
            round(float(r["max_score"]), 6),
            round(float(r["avg_score"]), 6),
        )
        for r in facet_counts(scored, "repo").collect()
    }
    assert got.keys() == want.keys()
    for repo in want:
        g, w = got[repo], want[repo]
        assert g[0] == w[0] and g[1] == w[1], repo
        assert abs(g[2] - w[2]) < 1e-9, repo


def test_search_after_pages_tile_the_ranking(spark, impact_df):
    """Successive search_after pages reproduce the full ranking under
    (round(score,6) DESC, doc_id ASC) exactly, with no gaps/overlaps,
    and the final partial page + empty page behave."""
    from documentindex_spark.operators.bm25 import search_after

    scored = score_query(impact_df, "merge block")
    full = sorted(
        ((round(float(r["score"]), 6), int(r["doc_id"])) for r in scored.collect()),
        key=lambda x: (-x[0], x[1]),
    )
    k = 7
    pages: list[tuple[float, int]] = []
    cursor = None
    while True:
        if cursor is None:
            from pyspark.sql import functions as F

            page = (
                scored.orderBy(F.round("score", 6).desc(), F.asc("doc_id"))
                .limit(k)
                .collect()
            )
        else:
            page = search_after(scored, cursor[0], cursor[1], k).collect()
            ranks = [int(r["rank"]) for r in page]
            assert ranks == list(range(1, len(page) + 1))
        if not page:
            break
        got = [
            (round(float(r["score"]), 6), int(r["doc_id"])) for r in page
        ]
        got.sort(key=lambda x: (-x[0], x[1]))
        pages.extend(got)
        cursor = got[-1]
        if len(page) < k:
            assert search_after(scored, cursor[0], cursor[1], k).count() == 0
            break
    assert pages == full


def test_rm3_expansion_deterministic_and_weighted(spark, impact_df):
    """expand_query_rm3: (a) twice-run identical; (b) with
    expand_weight=0 it degrades to the plain query scores; (c) the
    rescore includes docs matched only via expansion terms when
    weight > 0."""
    from documentindex_spark.operators.bm25 import expand_query_rm3

    a = {
        int(r["doc_id"]): round(float(r["score"]), 6)
        for r in expand_query_rm3(impact_df, "merge block").collect()
    }
    b = {
        int(r["doc_id"]): round(float(r["score"]), 6)
        for r in expand_query_rm3(impact_df, "merge block").collect()
    }
    assert a == b and a

    plain = {
        int(r["doc_id"]): round(float(r["score"]), 6)
        for r in score_query(impact_df, "merge block").collect()
    }
    zero = {
        int(r["doc_id"]): round(float(r["score"]), 6)
        for r in expand_query_rm3(
            impact_df, "merge block", expand_weight=1e-12
        ).collect()
    }
    # weight≈0: original-term docs keep (approximately) plain scores
    for d, s in plain.items():
        assert abs(zero[d] - s) < 1e-6, d
    # weight>0 recruits docs that match only expansion terms
    assert set(a) >= set(plain)
