"""Phrase queries: exact token adjacency vs a pure-Python oracle."""

from __future__ import annotations

import re

import pytest

from documentindex_spark.operators.phrase import (
    phrase_matches,
    phrase_topk,
    phrase_words,
)

DOCS = [
    (0, "merge sort is stable. quick sort is not a merge"),
    (1, "sort merge join beats merge   sort on disk"),  # gap collapses
    (2, "merge, sort"),  # punctuation splits → still adjacent tokens
    (3, "mergesort is one word"),
    (4, "sort sort sort"),
    (5, "nothing relevant here"),
]


def _py_occurrences(text: str, phrase: str) -> int:
    toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
    words = [t for t in re.split(r"[^a-z0-9]+", phrase.lower()) if t]
    n = 0
    for i in range(len(toks) - len(words) + 1):
        if toks[i : i + len(words)] == words:
            n += 1
    return n


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


@pytest.mark.parametrize(
    "phrase", ["merge sort", "sort merge", "sort sort", "quick sort is"]
)
def test_phrase_matches_python_oracle(docs_df, phrase):
    got = {
        r["doc_id"]: r["n_occ"]
        for r in phrase_matches(docs_df, phrase).collect()
    }
    want = {
        i: _py_occurrences(t, phrase)
        for i, t in DOCS
        if _py_occurrences(t, phrase) > 0
    }
    assert got == want, phrase


def test_phrase_words_keep_order_and_dups():
    assert phrase_words("Sort, MERGE sort!") == ["sort", "merge", "sort"]


def test_phrase_at_document_start(docs_df):
    # doc 0 starts with the phrase: leading-position artifact handling
    got = {
        r["doc_id"]: r["n_occ"]
        for r in phrase_matches(docs_df, "merge sort").collect()
    }
    assert got[0] == 1 and got[1] == 1 and got[2] == 1
    assert 3 not in got and 4 not in got


def test_overlapping_occurrences(docs_df):
    got = {
        r["doc_id"]: r["n_occ"]
        for r in phrase_matches(docs_df, "sort sort").collect()
    }
    assert got == {4: 2}


def test_proximity_matches_python_oracle(docs_df):
    from documentindex_spark.operators.phrase import proximity_matches

    got = {
        r["doc_id"]: (r["n_pairs"], r["min_dist"])
        for r in proximity_matches(docs_df, "merge", "sort", 3).collect()
    }
    want = {}
    for i, t in DOCS:
        toks = [x for x in re.split(r"[^a-z0-9]+", t.lower()) if x]
        pa = [p for p, x in enumerate(toks) if x == "merge"]
        pb = [p for p, x in enumerate(toks) if x == "sort"]
        pairs = [
            abs(a - b) for a in pa for b in pb
            if abs(a - b) <= 3 and a != b
        ]
        if pairs:
            want[i] = (len(pairs), min(pairs))
    assert got == want


def test_phrase_topk_indexed_equals_tokenize_path(spark, docs_df, tmp_path):
    """The positional-index phrase scorer must be rank-, score- AND
    n_occ-identical to the per-query-tokenize operator — same frozen
    semantics, index-resident cost model."""
    from documentindex_spark.functions.tokenize import (
        doc_lengths,
        term_frequencies,
    )
    from documentindex_spark.operators.bm25 import impacts
    from documentindex_spark.operators.stats import (
        corpus_stats,
        document_frequencies,
    )
    from documentindex_spark.plans.positions import (
        build_positions_table,
        phrase_topk_indexed,
    )

    pos_path = build_positions_table(
        spark, docs_df.withColumnRenamed("text", "content"),
        str(tmp_path), text_col="content",
    )
    tf = term_frequencies(docs_df, text_col="text")
    dl = doc_lengths(docs_df, text_col="text")
    imp = impacts(tf, dl, document_frequencies(tf), corpus_stats(dl))
    for phrase in ["merge sort", "sort sort", "sort merge join"]:
        got = sorted(
            (r["rank"], int(r["doc_id"]), r["score"], r["n_occ"])
            for r in phrase_topk_indexed(spark, pos_path, phrase, 10).collect()
        )
        want = sorted(
            (r["rank"], int(r["doc_id"]), r["score"], r["n_occ"])
            for r in phrase_topk(docs_df, imp, phrase, 10).collect()
        )
        assert got == want, phrase


def test_phrase_topk_restricts_and_ranks(spark, docs_df):
    from documentindex_spark.functions.tokenize import (
        doc_lengths,
        term_frequencies,
    )
    from documentindex_spark.operators.bm25 import impacts
    from documentindex_spark.operators.stats import (
        corpus_stats,
        document_frequencies,
    )

    tf = term_frequencies(docs_df, text_col="text")
    dl = doc_lengths(docs_df, text_col="text")
    imp = impacts(tf, dl, document_frequencies(tf), corpus_stats(dl))
    rows = phrase_topk(docs_df, imp, "merge sort", k=10).collect()
    ids = {int(r["doc_id"]) for r in rows}
    assert ids == {0, 1, 2}  # only true phrase matches
    ranks = sorted((r["rank"], int(r["doc_id"])) for r in rows)
    scores = [r["score"] for r in sorted(rows, key=lambda r: r["rank"])]
    assert scores == sorted(scores, reverse=True)
    assert all(r["n_occ"] >= 1 for r in rows)
    assert [rk for rk, _ in ranks] == [1, 2, 3]


def test_proximity_indexed_equals_tokenize_path(spark, docs_df, tmp_path):
    """proximity from the positional index must be row-identical to
    the per-query-tokenize operator across window widths, including
    the same-term case (pa != pb excludes self-pairs)."""
    from documentindex_spark.operators.phrase import proximity_matches
    from documentindex_spark.plans.positions import (
        build_positions_table,
        proximity_indexed,
    )

    pos_path = build_positions_table(
        spark, docs_df.withColumnRenamed("text", "content"),
        str(tmp_path / "prox"), text_col="content",
    )
    for ta, tb, w in [
        ("merge", "sort", 3),
        ("merge", "sort", 1),
        ("sort", "sort", 2),
        ("merge", "join", 5),
        ("merge", "zzz_absent", 4),
    ]:
        got = sorted(
            (int(r["doc_id"]), int(r["n_pairs"]), int(r["min_dist"]))
            for r in proximity_indexed(spark, pos_path, ta, tb, w).collect()
        )
        want = sorted(
            (int(r["doc_id"]), int(r["n_pairs"]), int(r["min_dist"]))
            for r in proximity_matches(docs_df, ta, tb, w).collect()
        )
        assert got == want, (ta, tb, w)
