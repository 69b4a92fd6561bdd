"""PMI co-occurrence, prefix suggestion, duplicate-span coverage —
python-replica oracles on crafted corpora."""

from __future__ import annotations

import math
import re
from collections import Counter
from itertools import combinations

import pytest

from documentindex_spark.constants import TOKEN_SPLIT_RE
from documentindex_spark.functions.textstats import term_cooccurrence_pmi
from documentindex_spark.operators.dedup import (
    dup_span_coverage,
    exact_substring_spans,
)
from documentindex_spark.operators.fuzzy import prefix_suggest, vocabulary

_SPLIT = re.compile(TOKEN_SPLIT_RE)


def _toks(t):
    return [x for x in _SPLIT.split(t.lower()) if x]


class TestPMI:
    TEXTS = [
        (0, "spark shuffle join spark"),
        (1, "spark shuffle agg"),
        (2, "spark join window"),
        (3, "shuffle join"),
        (4, "window agg shuffle spark"),
        (5, "totally unrelated words"),
    ]

    def _replica(self, min_count, max_df=None):
        docsets = {d: set(_toks(t)) for d, t in self.TEXTS}
        n = len(docsets)
        dfc = Counter(t for s in docsets.values() for t in s)
        if max_df is not None:
            docsets = {
                d: {t for t in s if dfc[t] <= max_df}
                for d, s in docsets.items()
            }
        pair_c = Counter()
        for s in docsets.values():
            for a, b in combinations(sorted(s), 2):
                pair_c[(a, b)] += 1
        out = {}
        for (a, b), c in pair_c.items():
            if c >= min_count:
                out[(a, b)] = round(
                    math.log(c * n / (dfc[a] * dfc[b])), 6
                )
        return out

    def test_matches_replica(self, spark):
        docs = spark.createDataFrame(self.TEXTS, ["doc_id", "text"])
        got = {
            (r["term_a"], r["term_b"]): (r["n_ab"], r["pmi"])
            for r in term_cooccurrence_pmi(docs, min_count=2).collect()
        }
        want = self._replica(2)
        assert set(got) == set(want)
        for p, (c, pmi) in got.items():
            assert pmi == pytest.approx(want[p], abs=1e-6)
        # multiplicity ignored: (join, spark) co-occur in docs 0,2 only
        assert got[("join", "spark")][0] == 2

    def test_max_df_guard(self, spark):
        docs = spark.createDataFrame(self.TEXTS, ["doc_id", "text"])
        got = {
            (r["term_a"], r["term_b"])
            for r in term_cooccurrence_pmi(
                docs, min_count=2, max_df=3
            ).collect()
        }
        want = set(self._replica(2, max_df=3))
        assert got == want
        # 'spark' (df=4) and 'shuffle' (df=4) pairs are gone
        assert not any("spark" in p or "shuffle" in p for p in got)


class TestPrefixSuggest:
    def test_rank_tiebreak_limit(self, spark):
        docs = spark.createDataFrame(
            [
                (0, "sort sorted spark sort"),
                (1, "sort spark scan"),
                (2, "scan sorted"),
                (3, "other words"),
            ],
            ["doc_id", "text"],
        )
        vocab = vocabulary(docs)
        out = [
            (r["term"], r["df"])
            for r in prefix_suggest(vocab, "s", limit=3).collect()
        ]
        # dfs: sort=2, spark=2, scan=2, sorted=2 → all tied, term asc
        assert out == [("scan", 2), ("sort", 2), ("sorted", 2)]
        out2 = [
            r["term"] for r in prefix_suggest(vocab, "sor").collect()
        ]
        assert out2 == ["sort", "sorted"]
        assert prefix_suggest(vocab, "zzz").count() == 0


class TestDupCoverage:
    def test_union_not_sum(self, spark):
        # doc 0/1 share a 10-token run; with k=8 the duplicated gram
        # starts are 0..2 (doc0 offsets) — coverage is the UNION
        # (10 tokens), not 3 spans × 8
        shared = "a b c d e f g h i j"
        docs = spark.createDataFrame(
            [
                (0, shared + " unique0 tail0 xx0 yy0"),
                (1, "pre1 qre1 rre1 " + shared),
                (2, "nothing shared here at all beyond anything"),
            ],
            ["doc_id", "text"],
        )
        out = {
            r["doc_id"]: r.asDict()
            for r in dup_span_coverage(docs, k=8, min_count=2).collect()
        }
        assert out[0]["covered_tokens"] == 10
        assert out[0]["dl"] == 14
        assert out[0]["dup_frac"] == pytest.approx(10 / 14, abs=1e-6)
        assert out[1]["covered_tokens"] == 10
        assert out[2]["covered_tokens"] == 0
        assert out[2]["dup_frac"] == 0.0

    def test_consistent_with_spans(self, spark):
        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        )
        cov = {
            r["doc_id"]: r["covered_tokens"]
            for r in dup_span_coverage(docs, k=8, min_count=2).collect()
        }
        spans = exact_substring_spans(docs, k=8, min_count=2).collect()
        # span-sum is an upper bound on union coverage, and every doc
        # with a span has coverage > 0
        from collections import defaultdict

        span_sum = defaultdict(int)
        for r in spans:
            span_sum[r["doc_id"]] += r["span_len_tokens"]
        for d, s in span_sum.items():
            assert 0 < cov[d] <= s

    def test_hash_and_string_keys_identical(self, spark):
        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        )
        a = set(
            map(
                tuple,
                dup_span_coverage(docs, use_hash=True).collect(),
            )
        )
        b = set(
            map(
                tuple,
                dup_span_coverage(docs, use_hash=False).collect(),
            )
        )
        assert a == b


class TestSentenceDedup:
    def test_global_first_occurrence_kept(self, spark):
        from documentindex_spark.operators.dedup import (
            drop_duplicate_sentences,
        )

        docs = spark.createDataFrame(
            [
                (0, "Alpha beta gamma. Shared footer text here. Tail zero."),
                (1, "Shared footer text here. Unique middle part! Tail one."),
                (2, "Shared footer text here. Shared footer text here."),
                (3, ""),
            ],
            ["doc_id", "text"],
        )
        out = {
            r["doc_id"]: r.asDict()
            for r in drop_duplicate_sentences(docs).collect()
        }
        assert out[0]["text_clean"] == (
            "Alpha beta gamma. Shared footer text here. Tail zero."
        )
        assert out[0]["n_dropped"] == 0
        # doc 1 loses the footer (doc 0 owns the first occurrence)
        assert out[1]["text_clean"] == "Unique middle part! Tail one."
        assert out[1]["n_dropped"] == 1
        # doc 2: BOTH occurrences drop (in-document repeat of a
        # sentence first seen in doc 0)
        assert out[2]["text_clean"] == ""
        assert out[2]["n_dropped"] == 2
        assert out[3]["n_sentences"] == 0
        assert out[3]["text_clean"] == ""

    def test_in_document_repeat_keeps_first(self, spark):
        from documentindex_spark.operators.dedup import (
            drop_duplicate_sentences,
        )

        docs = spark.createDataFrame(
            [(0, "Same line here. Same line here. Same line here.")],
            ["doc_id", "text"],
        )
        out = drop_duplicate_sentences(docs).collect()[0]
        assert out["text_clean"] == "Same line here."
        assert out["n_sentences"] == 3
        assert out["n_dropped"] == 2
