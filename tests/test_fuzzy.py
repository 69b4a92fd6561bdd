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


def test_stored_table_identical_to_inmemory(spark, vocab_df, tmp_path):
    """The persisted sidecar path must return exactly what the
    in-memory Generate path returns, its query plan must contain NO
    Generate (the whole point: the vocabulary explode ran at build
    time), and the scan must prune on the v1 partition column."""
    from documentindex_spark.plans import fuzzy_table as ft

    # build from a postings-shaped frame (term, df, any other cols)
    out = str(tmp_path / "fuzzy")
    ft.build_fuzzy_table(vocab_df.withColumn("bucket", vocab_df.df * 0), out)

    queries = ["teh", "functoin", "data", "quik", "xyzzy", "fox"]
    mem = sorted(
        (r["query_term"], r["term"], int(r["df"]), int(r["dist"]))
        for r in fuzzy.fuzzy_term_matches(vocab_df, queries).collect()
    )
    stored_df = ft.fuzzy_matches_stored(spark, out, queries)
    got = sorted(
        (r["query_term"], r["term"], int(r["df"]), int(r["dist"]))
        for r in stored_df.collect()
    )
    assert got == mem and len(got) > 0

    plan = stored_df._jdf.queryExecution().executedPlan().toString()
    assert "Generate" not in plan  # no vocab explode at query time
    formatted = stored_df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "PartitionFilters" in formatted
    # the prune set: variants of a term start with its 1st or 2nd char
    assert "v1" in formatted


def test_engine_correct_query_uses_sidecar(spark, tmp_path):
    """correct_query builds the sidecar once, reuses it on the next
    call, and rebuilds when the index stats change underneath it."""
    import json
    import os

    from documentindex_spark.api import Engine

    docs = spark.createDataFrame(
        [(f"r{i}", f"p{i}", "c", "en",
          "merge sort window data function example text")
         for i in range(8)],
        "repo string, path string, commit string, lang string, "
        "content string",
    )
    from documentindex_spark.sources.registry import with_doc_ids

    idx = str(tmp_path / "idx")
    eng = Engine.index(spark, with_doc_ids(docs), idx, input_id="t",
                       bucket_groups=1)
    assert eng.correct_query("merg sort") == "merge sort"
    meta_p = os.path.join(idx, "fuzzy", "_fuzzy_meta.json")
    assert os.path.exists(meta_p)
    mtime = os.path.getmtime(meta_p)
    # second OOV correction: reuses the sidecar (meta untouched)
    assert eng.correct_query("windoww data") == "data window"
    assert os.path.getmtime(meta_p) == mtime
    # stale meta (simulated append) → rebuild on next correction
    meta = json.load(open(meta_p))
    meta["n_docs"] = -1
    json.dump(meta, open(meta_p, "w"))
    assert eng.correct_query("merg sort") == "merge sort"
    assert json.load(open(meta_p))["n_docs"] == eng.built.n_docs
    eng.close()


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


def test_engine_suggest_prefix(spark, tmp_path):
    """Engine.suggest: identity rows of the stored sidecar, pruned to
    the prefix's first-char partition, df-ranked with term tiebreak."""
    from documentindex_spark.api import Engine
    from documentindex_spark.sources.registry import with_doc_ids

    rows = [
        ("r0", "p0", "c", "en", "sort sorted spark sort"),
        ("r1", "p1", "c", "en", "sort spark scan"),
        ("r2", "p2", "c", "en", "scan sorted"),
        ("r3", "p3", "c", "en", "other words"),
    ]
    docs = spark.createDataFrame(
        rows,
        "repo string, path string, commit string, lang string, "
        "content string",
    )
    idx = str(tmp_path / "idx")
    eng = Engine.index(spark, with_doc_ids(docs), idx, input_id="t",
                       bucket_groups=1)
    got = [(r["term"], r["df"]) for r in eng.suggest("s", limit=3).collect()]
    assert got == [("scan", 2), ("sort", 2), ("sorted", 2)]
    assert [r["term"] for r in eng.suggest("sor").collect()] == [
        "sort", "sorted",
    ]
    # partition pruning: the scan touches only the prefix's partition
    plan = eng.suggest("s")._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    import pytest as _pt

    with _pt.raises(ValueError):
        eng.suggest("")
    eng.close()
