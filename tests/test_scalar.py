"""Scalar bank + batching + natural sort + doc-type detector
(SURVEY.md §2.8/§2.5/§2.6/§2.2)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from documentindex_spark.functions import scalar as S


def _one(spark, expr, **cols):
    df = spark.createDataFrame(
        [tuple(cols.values())], ", ".join(f"{k} string" for k in cols)
    )
    return df.select(expr.alias("v")).collect()[0]["v"]


def test_truncate_middle(spark):
    long = "a" * 50 + "MID" + "b" * 50
    v = _one(spark, S.truncate_middle(F.col("t"), 20), t=long)
    assert v.startswith("a" * 10) and v.endswith("b" * 10) and " ... " in v
    assert _one(spark, S.truncate_middle(F.col("t"), 20), t="short") == "short"


def test_normalize_and_sentences(spark):
    v = _one(spark, S.normalize_whitespace(F.col("t")), t="a\r\nb\t\tc  d ")
    assert v == "a\nb c d"
    s = _one(spark, S.sentence_split(F.col("t")), t="One. Two! Three? Four")
    assert s == ["One.", "Two!", "Three?", "Four"]


def test_highlight_and_estimates(spark):
    v = _one(spark, S.highlight_terms(F.col("t"), ["merge"]), t="a Merge b")
    assert v == "a **Merge** b"
    assert _one(spark, S.token_estimate(F.col("t")), t="x" * 40) == 10
    df = spark.createDataFrame([(1_500_000.0,), (2500.0,), (12.0,)], "x double")
    got = [r["v"] for r in df.select(S.format_number_kmb(F.col("x")).alias("v")).collect()]
    assert got == ["1.5M", "2.5K", "12.0"]


def test_multi_format_dates(spark):
    rows = ["2024-03-05", "03/05/2024", "March 5, 2024", "20240305", "garbage"]
    df = spark.createDataFrame([(r,) for r in rows], "t string")
    got = [r["v"] for r in df.select(S.parse_date_multi(F.col("t")).alias("v")).collect()]
    want = dt.date(2024, 3, 5)
    assert got[:4] == [want] * 4 and got[4] is None
    q = df.limit(1).select(
        S.fiscal_quarter(S.parse_date_multi(F.col("t"))).alias("q")
    ).collect()[0]["q"]
    assert q == 1


def test_jaccard(spark):
    df = spark.createDataFrame(
        [(["a", "b", "c"], ["b", "c", "d"])],
        "a array<string>, b array<string>",
    )
    v = df.select(S.jaccard_tokens(F.col("a"), F.col("b")).alias("v")).collect()[0]["v"]
    assert v == pytest.approx(2 / 4)


def test_roman(spark):
    df = spark.createDataFrame(
        [("xiv",), ("IX",), ("mcmxcix",), ("hello",), ("",)], "t string"
    )
    got = [r["v"] for r in df.select(S.roman_to_int(F.col("t")).alias("v")).collect()]
    assert got == [14, 9, 1999, None, None]


def test_structure_natural_sort(spark):
    df = spark.createDataFrame(
        [("1.10",), ("1.2",), ("1.9",), ("2.1",), ("1.2.1",)], "structure string"
    )
    got = [r["structure"] for r in S.sort_by_structure(df).collect()]
    assert got == ["1.2", "1.2.1", "1.9", "1.10", "2.1"]


def test_pack_into_batches(spark):
    rows = [(i, 30) for i in range(10)]  # budget 100 → 3 per batch
    df = spark.createDataFrame(rows, "id long, cost long")
    got = {
        r["id"]: r["batch_id"]
        for r in S.pack_into_batches(df, ["id"], "cost", 100.0).collect()
    }
    assert [got[i] for i in range(10)] == [0, 0, 0, 0, 1, 1, 1, 2, 2, 2]
    # with max_per_batch=2 each cum-batch splits further
    got2 = S.pack_into_batches(df, ["id"], "cost", 100.0, max_per_batch=2)
    sizes = got2.groupBy("batch_id").count().collect()
    assert all(r["count"] <= 2 for r in sizes)


def test_pack_into_batches_exact_never_exceeds_budget(spark):
    """The exact greedy path honors the reference's invariant (a
    batch total never exceeds budget unless a single row does) —
    the closed-form path documents its +max(cost) overflow instead."""
    rows = [(u, i, c) for u in range(3)
            for i, c in enumerate([3000, 3000, 3000, 6000, 100, 4950])]
    df = spark.createDataFrame(rows, "user long, id long, cost long")
    out = S.pack_into_batches_exact(
        df, ["id"], "cost", 5000.0, partition_col="user"
    )
    per_batch = (
        out.groupBy("user", "batch_id")
        .agg({"cost": "sum", "id": "count"})
        .collect()
    )
    for r in per_batch:
        assert r["sum(cost)"] <= 6000  # only the single 6000-row overflows
        assert r["sum(cost)"] <= 5000 or r["count(id)"] == 1
    # python greedy oracle for one user
    got = {
        r["id"]: r["batch_id"]
        for r in out.filter("user = 0").collect()
    }
    want, bid, acc = {}, 0, 0.0
    for i, c in enumerate([3000, 3000, 3000, 6000, 100, 4950]):
        if acc > 0 and acc + c > 5000:
            bid, acc = bid + 1, 0.0
        acc += c
        want[i] = str(bid)
    assert got == want


def test_detect_doc_type(spark):
    df = spark.createDataFrame(
        [
            (0, "import os\ndef f(x):\n    pass\nclass A:\n    pass"),
            (1, "# Title\n- item\n[link](http://x)"),
            (2, "Plain sentences here. The weather and the news of today."),
            (3, "zzz"),
        ],
        "doc_id long, content string",
    )
    got = {r["doc_id"]: r for r in S.detect_doc_type(df).collect()}
    assert got[0]["doc_type"] == "python" and got[0]["confidence"] == 1.0
    assert got[1]["doc_type"] == "markdown"
    assert got[2]["doc_type"] == "prose"
    assert got[3]["doc_type"] == "generic"