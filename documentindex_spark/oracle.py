"""Independent exhaustive BM25 oracle — pure Python/numpy, NO Spark.

Used by tests to verify the Spark engine (both the exhaustive
DataFrame scorer and the BMW compressed-index scorer) score- and
rank-identically (SURVEY.md §5.2, golden_topk in FIXTURES.md §4).

Implements the exact frozen semantics of constants.py independently:
same tokenizer regex, same idf, same float64 ascending-term summation,
same (score DESC, doc_id ASC) tie-break.
"""

from __future__ import annotations

import math
import re
from collections import Counter

from .constants import BM25_B, BM25_K1, TOKEN_SPLIT_RE

_SPLIT = re.compile(TOKEN_SPLIT_RE)


def tokenize(text: str) -> list[str]:
    return [t for t in _SPLIT.split((text or "").lower()) if t]


class OracleIndex:
    def __init__(self, docs: dict[int, str]):
        self.tf: dict[int, Counter] = {
            d: Counter(tokenize(t)) for d, t in docs.items()
        }
        self.dl = {d: sum(c.values()) for d, c in self.tf.items()}
        self.n = len(docs)
        self.avgdl = (sum(self.dl.values()) / self.n) if self.n else 0.0
        self.df: Counter = Counter()
        for c in self.tf.values():
            for term in c:
                self.df[term] += 1

    def impact(self, term: str, doc: int) -> float:
        tf = self.tf[doc].get(term, 0)
        if tf == 0:
            return 0.0
        df = self.df[term]
        idf = math.log(1.0 + (self.n - df + 0.5) / (df + 0.5))
        norm = (tf * (BM25_K1 + 1.0)) / (
            tf + BM25_K1 * (1.0 - BM25_B + BM25_B * self.dl[doc] / self.avgdl)
        )
        return idf * norm

    def score(self, query: str, doc: int) -> float:
        s = 0.0
        for term in sorted(set(tokenize(query))):  # frozen order
            s += self.impact(term, doc)
        return s

    def topk(self, query: str, k: int) -> list[tuple[int, float]]:
        scored = [
            (d, s)
            for d in self.tf
            if (s := self.score(query, d)) > 0.0
        ]
        scored.sort(key=lambda x: (-x[1], x[0]))
        return scored[:k]

    def all_matches(self, query: str, threshold: float = 0.0) -> list[tuple[int, float]]:
        """'find ALL evidence' mode: threshold-only, no limit
        (reference provenance.py:84-139 semantics)."""
        scored = [
            (d, s)
            for d in self.tf
            if (s := self.score(query, d)) >= threshold and s > 0.0
        ]
        scored.sort(key=lambda x: (-x[1], x[0]))
        return scored
