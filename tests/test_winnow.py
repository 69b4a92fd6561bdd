"""Winnowing fingerprints (Schleimer et al. 2003) — python-replica
oracle, the winnowing guarantee, and the hot-fingerprint skew guard."""

from __future__ import annotations

import hashlib
import re

from documentindex_spark.constants import TOKEN_SPLIT_RE
from documentindex_spark.operators.dedup import (
    winnow_fingerprints,
    winnow_similar_pairs,
)

K, W = 5, 4


def _py_winnow(text: str, k: int = K, w: int = W) -> set[int]:
    toks = [t for t in re.split(TOKEN_SPLIT_RE, text.lower()) if t]
    grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    hs = [
        int(hashlib.md5(g.encode()).hexdigest()[:15], 16) for g in grams
    ]
    return {min(hs[i - w + 1 : i + 1]) for i in range(w - 1, len(hs))}


def test_matches_python_replica(spark):
    texts = [
        (0, "the quick brown fox jumps over the lazy dog again and again"),
        (1, "pack my box with five dozen liquor jugs says the fox"),
        (2, "short text"),  # < k+w-1 tokens -> no fingerprints
        (3, "a b c d e f g h"),  # exactly k+w-1 = 8 tokens -> 1 window
    ]
    docs = spark.createDataFrame(texts, ["doc_id", "text"])
    got = {
        (r["doc_id"], r["fp"])
        for r in winnow_fingerprints(docs).collect()
    }
    want = {
        (did, fp) for did, txt in texts for fp in _py_winnow(txt)
    }
    assert got == want
    assert not any(d == 2 for d, _ in got)
    assert sum(1 for d, _ in got if d == 3) == 1


def test_winnowing_guarantee(spark):
    # two docs sharing a run of w+k-1 = 8 tokens must share >= 1 fp
    shared = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [
            (0, "intro words first " + shared + " trailing piece one"),
            (1, "totally different opening here " + shared + " and end"),
        ],
        ["doc_id", "text"],
    )
    fps = winnow_fingerprints(docs)
    a = {r["fp"] for r in fps.filter("doc_id = 0").collect()}
    b = {r["fp"] for r in fps.filter("doc_id = 1").collect()}
    assert a & b


def test_similar_pairs_and_guard(spark):
    boiler = "one two three four five six seven eight nine ten"
    rows = [(i, f"doc number {i} unique filler " + boiler) for i in range(6)]
    rows.append((100, "completely unrelated content with no overlap at all"))
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = winnow_similar_pairs(docs, min_shared=1)
    got = {(r["doc_a"], r["doc_b"]) for r in pairs.collect()}
    # all 15 boilerplate pairs found, the unrelated doc in none
    assert {(a, b) for a in range(6) for b in range(6) if a < b} <= got
    assert not any(100 in p for p in got)
    # skew guard: the boilerplate fingerprints live in 6 docs; capping
    # df at 5 removes every cross-boilerplate pair
    guarded = winnow_similar_pairs(docs, min_shared=1, max_fp_df=5)
    got_g = {(r["doc_a"], r["doc_b"]) for r in guarded.collect()}
    assert not ({(a, b) for a in range(6) for b in range(6) if a < b} & got_g)


def test_density_bound(spark):
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).limit(20)
    fps = winnow_fingerprints(docs)
    import pyspark.sql.functions as F

    from documentindex_spark.functions.tokenize import doc_token_counts

    n = doc_token_counts(docs, text_col="text").withColumnRenamed("dl", "n")
    per = fps.groupBy("doc_id").agg(F.count(F.lit(1)).alias("nfp")).join(n, "doc_id")
    # selected fingerprints never exceed the number of full windows
    bad = per.filter(F.col("nfp") > F.col("n") - (K + W - 1) + 1).count()
    assert bad == 0
