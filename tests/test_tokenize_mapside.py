"""term_frequencies_mapside must be row-identical to the frozen
explode+hashAgg analyzer — it is a PHYSICAL variant (zero-exchange
map-side-complete TF), never a semantic one."""

from __future__ import annotations

from pyspark.sql import functions as F

from documentindex_spark.functions.tokenize import (
    doc_lengths,
    doc_token_counts,
    term_frequencies,
    term_frequencies_colocated,
    term_frequencies_mapside,
)


def _rows(df):
    return sorted(
        (int(r["doc_id"]), r["term"], int(r["tf"]))
        for r in df.collect()
    )


def test_identical_on_corpus(repo_files_small):
    ref = _rows(term_frequencies(repo_files_small))
    assert _rows(term_frequencies_mapside(repo_files_small)) == ref
    assert _rows(term_frequencies_colocated(repo_files_small)) == ref


def test_colocated_identical_with_duplicate_id_rows(spark):
    """Co-location makes the in-stage agg global per key even when a
    doc_id spans input rows — tf sums across the rows."""
    df = spark.createDataFrame(
        [(0, "alpha beta"), (0, "beta gamma"), (1, "alpha")],
        "doc_id long, content string",
    )
    assert _rows(term_frequencies_colocated(df)) == _rows(
        term_frequencies(df)
    ) == [
        (0, "alpha", 1), (0, "beta", 2), (0, "gamma", 1), (1, "alpha", 1),
    ]


def test_dl_regexp_identical(repo_files_small, spark):
    """doc_token_counts ≡ doc_lengths (regexp token runs == nonempty
    split segments), including zero-token and null docs."""
    ref = sorted(
        (int(r["doc_id"]), int(r["dl"]))
        for r in doc_lengths(repo_files_small).collect()
    )
    got = sorted(
        (int(r["doc_id"]), int(r["dl"]))
        for r in doc_token_counts(repo_files_small).collect()
    )
    assert got == ref
    df = spark.createDataFrame(
        [(0, None), (1, ""), (2, "..."), (3, "a-b c")],
        "doc_id long, content string",
    )
    got2 = {
        int(r["doc_id"]): (None if r["dl"] is None else int(r["dl"]))
        for r in doc_token_counts(df).collect()
    }
    ref2 = {
        int(r["doc_id"]): int(r["dl"]) for r in doc_lengths(df).collect()
    }
    # regexp_count of NULL is NULL; doc_lengths coalesces to 0 — the
    # build pipeline coalesces at the dl join, so align here.
    got2 = {k: (0 if v is None else v) for k, v in got2.items()}
    assert got2 == ref2 == {0: 0, 1: 0, 2: 0, 3: 3}


def test_identical_on_unicode_edges(spark):
    """Separator agreement on non-ASCII: lowercasing stays JVM-side in
    both variants, so only re.split vs Java split can diverge — and the
    negated-ASCII class makes every non-[a-z0-9] unit a separator in
    both (surrogate pairs collapse inside separator runs)."""
    texts = [
        "",
        "   ",
        "...",
        "plain ascii 123",
        "Hello, World! foo_bar baz-42",
        "café naïve résumé",  # accents
        "Kelvin İstanbul STRAßE",  # K-sign, dotted I, sharp s
        "emoji \U0001f600mid\U0001f680 pair",  # astral-plane separators
        "１２３ fullwidth",  # full-width digits (non-ascii)
        "a b null\tctrl\nchars",
        "ends-with-sep!",
        "!starts-with-sep",
        "é",  # lone non-ascii → zero tokens
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, content string"
    )
    assert _rows(term_frequencies_mapside(df)) == _rows(term_frequencies(df))


def test_null_and_empty_content(spark):
    df = spark.createDataFrame(
        [(0, None), (1, ""), (2, "one token-two")],
        "doc_id long, content string",
    )
    got = _rows(term_frequencies_mapside(df))
    assert got == [(2, "one", 1), (2, "token", 1), (2, "two", 1)]


def test_no_exchange_in_plan(spark, repo_files_small, tmp_path):
    """The point of the variant: the physical plan has no shuffle.
    Plan inspected over a plain parquet scan — the cached test fixture
    embeds its dense-id build plan (which has exchanges) inside the
    InMemoryRelation string."""
    p = str(tmp_path / "docs")
    repo_files_small.select("doc_id", "content").write.parquet(p)
    docs = spark.read.parquet(p)
    plan = term_frequencies_mapside(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    ref = term_frequencies(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in ref  # the baseline it removes


def test_colocated_plan_single_content_exchange(spark, repo_files_small, tmp_path):
    """The colocated plan's ONLY exchange is hashpartitioning(doc_id)
    below the Generate — the (doc_id, term) tf-row exchange is gone
    (HashPartitioning(doc_id) satisfies the agg's distribution)."""
    import re

    p = str(tmp_path / "docs2")
    repo_files_small.select("doc_id", "content").write.parquet(p)
    docs = spark.read.parquet(p)
    plan = term_frequencies_colocated(docs)._jdf.queryExecution().executedPlan().toString()
    exchanges = re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan)
    assert len(exchanges) == 1, plan
    assert "term" not in exchanges[0] and "doc_id" in exchanges[0], plan
    # the naive plan's exchange carries BOTH grouping keys
    ref = term_frequencies(docs)._jdf.queryExecution().executedPlan().toString()
    ref_ex = re.findall(r"Exchange hashpartitioning\(([^)]*)\)", ref)
    assert any("term" in e for e in ref_ex), ref
