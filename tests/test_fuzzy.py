"""Fuzzy term matching: candidate completeness vs a quadratic
levenshtein ground truth, and the distance-2 leak is filtered."""

from __future__ import annotations

import pytest

from documentindex_spark.operators import fuzzy


def _lev(a: str, b: str) -> int:
    m, n = len(a), len(b)
    d = list(range(n + 1))
    for i in range(1, m + 1):
        prev, d[0] = d[0], i
        for j in range(1, n + 1):
            prev, d[j] = d[j], min(
                d[j] + 1, d[j - 1] + 1, prev + (a[i - 1] != b[j - 1])
            )
    return d[n]


@pytest.fixture(scope="module")
def vocab_df(spark):
    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox function data merge sort"),
            (1, "then function data index quick"),
            (2, "tea that fix merge brown brown"),
        ],
        "doc_id long, text string",
    )
    return fuzzy.vocabulary(docs).cache()


def test_matches_equal_quadratic_ground_truth(vocab_df):
    queries = ["teh", "functoin", "data", "quik", "xyzzy", "fox"]
    got = sorted(
        (r["query_term"], r["term"], int(r["df"]), int(r["dist"]))
        for r in fuzzy.fuzzy_term_matches(vocab_df, queries).collect()
    )
    vocab = {r["term"]: int(r["df"]) for r in vocab_df.collect()}
    want = sorted(
        (q, t, df, _lev(q, t))
        for q in sorted(set(queries))
        for t, df in vocab.items()
        if _lev(q, t) <= 1
    )
    assert got == want
    # sanity on the interesting cases: substitution+transposition-ish
    pairs = {(q, t) for q, t, _, _ in got}
    assert ("quik", "quick") in pairs  # deletion
    assert ("data", "data") in pairs  # exact
    assert not any(q == "xyzzy" for q, _ in pairs)  # nothing close


def test_distance2_leak_is_filtered(spark):
    """'abc' and 'bcd' share deletion variant 'bc' but are distance 2 —
    the candidate join alone would match them; the residual must not."""
    vocab = spark.createDataFrame([("bcd", 1)], "term string, df long")
    got = fuzzy.fuzzy_term_matches(vocab, ["abc"]).collect()
    assert got == []


def test_teh_the_is_distance_two_documented(vocab_df):
    """lev('teh','the') is 2 (two substitutions) — classic
    transposition needs Damerau; document the contract by asserting
    the PAIR APPEARS only if levenshtein says so."""
    got = {
        (r["query_term"], r["term"])
        for r in fuzzy.fuzzy_term_matches(vocab_df, ["teh"]).collect()
    }
    assert ("teh", "the") not in got  # plain levenshtein: distance 2
    assert ("teh", "tea") in got  # substitution: distance 1
