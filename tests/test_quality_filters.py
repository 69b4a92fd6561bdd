"""Gopher/C4 repetition + line-boilerplate filters — hand-computed
oracles on crafted documents (the synthetic corpora are single-line
and low-repetition, so the interesting branches need crafted input;
the corpus-wide values are value-checked by the driver gate)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from documentindex_spark.functions.textstats import (
    line_quality_features,
    repetition_features,
)


def _rows(df):
    return {r["doc_id"]: r.asDict() for r in df.collect()}


class TestRepetitionFeatures:
    def test_hand_computed(self, spark):
        docs = spark.createDataFrame(
            [
                # 6×'a': top_word 6/6; 2-grams: 'a a'×5 → 2*5/6;
                # 3-grams: ×4 → 3*4/6=2.0 (caps only by data, not
                # clamped — frozen); 5-grams: 2 total, 1 distinct.
                (0, "a a a a a a"),
                # no repetition at all
                (1, "b c d e f g h"),
                # 'x y' repeated: tokens = x y x y x y (6);
                # top word 3/6; 'x y'×3,'y x'×2 → 2*3/6 = 1.0;
                # 3-grams: 'x y x'×2,'y x y'×2 → 3*2/6 = 1.0;
                # 5-grams: 'x y x y x','y x y x y' both unique → 0
                (2, "x y x y x y"),
                (3, ""),  # zero tokens
                (4, "only four tiny words"),  # < 5 tokens: no 5-grams
            ],
            ["doc_id", "text"],
        )
        out = _rows(repetition_features(docs))
        assert out[0]["n_tokens"] == 6
        assert out[0]["top_word_frac"] == 1.0
        assert out[0]["top_2gram_frac"] == pytest.approx(10 / 6, abs=1e-6)
        assert out[0]["top_3gram_frac"] == 2.0
        assert out[0]["dup_5gram_frac"] == 0.5
        assert out[1]["top_word_frac"] == pytest.approx(1 / 7, abs=1e-6)
        assert out[1]["top_2gram_frac"] == pytest.approx(2 / 7, abs=1e-6)
        assert out[1]["dup_5gram_frac"] == 0.0
        assert out[2]["top_2gram_frac"] == 1.0
        assert out[2]["top_3gram_frac"] == 1.0
        assert out[2]["dup_5gram_frac"] == 0.0
        assert out[3]["n_tokens"] == 0
        assert out[3]["top_word_frac"] == 0.0
        assert out[4]["dup_5gram_frac"] == 0.0
        assert out[4]["top_2gram_frac"] == pytest.approx(2 / 4, abs=1e-6)

    def test_uses_frozen_analyzer(self, spark):
        # punctuation separates tokens exactly like tokenize()
        docs = spark.createDataFrame(
            [(0, "Spam! spam, SPAM. spam")], ["doc_id", "text"]
        )
        out = _rows(repetition_features(docs))
        assert out[0]["n_tokens"] == 4
        assert out[0]["top_word_frac"] == 1.0


class TestLineQualityFeatures:
    def test_hand_computed(self, spark):
        text0 = "\n".join(
            [
                "Home | About | Contact",   # dup ×3
                "A real sentence lives right here.",  # terminal
                "Home | About | Contact",
                "- bullet one",             # bullet + short
                "* bullet two",             # bullet + short
                "read more…",               # ellipsis + short
                "to be continued...",        # ellipsis + short
                "Home | About | Contact",
                "   ",                       # blank: dropped
            ]
        )
        docs = spark.createDataFrame(
            [(0, text0), (1, "one single line no punct"), (2, "")],
            ["doc_id", "text"],
        )
        out = _rows(line_quality_features(docs))
        r = out[0]
        assert r["n_lines"] == 8
        assert r["dup_line_frac"] == 0.25  # 2 repeats / 8
        # occurrence chars 151, distinct-line chars 107 → 44 dup chars
        lens = [22, 33, 22, 12, 12, 10, 18, 22]
        assert r["dup_line_char_frac"] == pytest.approx(
            44 / sum(lens), abs=1e-6
        )
        assert r["bullet_line_frac"] == 0.25
        assert r["ellipsis_line_frac"] == 0.25
        # '...'-terminated lines end in '.' too (frozen: regex [.!?]$)
        assert r["terminal_punct_line_frac"] == 0.25
        # short (<5 words): bullets (3 words) ×2, 'read more…' (2),
        # 'to be continued...' (3) → 4/8
        assert r["short_line_frac"] == 0.5
        assert out[1]["n_lines"] == 1
        assert out[1]["dup_line_frac"] == 0.0
        assert out[1]["terminal_punct_line_frac"] == 0.0
        assert out[1]["short_line_frac"] == 0.0
        assert out[2]["n_lines"] == 0
        assert out[2]["dup_line_frac"] == 0.0

    def test_trim_and_dedup_interaction(self, spark):
        # same line with differing surrounding whitespace IS a dup
        docs = spark.createDataFrame(
            [(0, "  footer \nfooter\nbody text present here today.")],
            ["doc_id", "text"],
        )
        out = _rows(line_quality_features(docs))
        assert out[0]["n_lines"] == 3
        assert out[0]["dup_line_frac"] == pytest.approx(1 / 3, abs=1e-6)


def test_corpus_smoke(spark):
    """Both banks run over the sf0.001 documents table and produce a
    row per document with fractions in range."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    n = docs.count()
    rep = repetition_features(docs)
    assert rep.count() == n
    bad = rep.filter(
        (F.col("top_word_frac") < 0)
        | (F.col("dup_5gram_frac") < 0)
        | (F.col("dup_5gram_frac") > 1)
    ).count()
    assert bad == 0
    lq = line_quality_features(docs)
    assert lq.count() == n
    assert (
        lq.filter(
            (F.col("dup_line_frac") < 0) | (F.col("dup_line_frac") > 1)
        ).count()
        == 0
    )
