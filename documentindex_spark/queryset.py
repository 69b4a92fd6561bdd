"""The reference query set (FIXTURES.md §3): 50 deterministic queries
over the corpus vocabulary — 20 single-term, 15 two-term, 10
three-term, 5 with one out-of-vocabulary term (df=0 edge); 5 of them
use k=100 for deep-rank checks. Seeded; never changes between runs.
"""

from __future__ import annotations

import numpy as np

from .corpus import _HOT, _VOCAB

SEED = 42


def reference_query_set() -> list[dict]:
    """[{query_id, query_text, k}] — pure function of the seed."""
    rng = np.random.default_rng(SEED)
    vocab = list(_VOCAB) + list(_HOT)
    queries: list[dict] = []

    def pick(n: int) -> list[str]:
        return [vocab[int(i)] for i in rng.integers(0, len(vocab), n)]

    qid = 0
    for _ in range(20):
        queries.append({"query_id": qid, "query_text": " ".join(pick(1))})
        qid += 1
    for _ in range(15):
        queries.append({"query_id": qid, "query_text": " ".join(pick(2))})
        qid += 1
    for _ in range(10):
        queries.append({"query_id": qid, "query_text": " ".join(pick(3))})
        qid += 1
    for i in range(5):
        terms = pick(1) + [f"zzoov{i}term"]
        queries.append({"query_id": qid, "query_text": " ".join(terms)})
        qid += 1
    deep = set(int(i) for i in rng.choice(50, size=5, replace=False))
    for q in queries:
        q["k"] = 100 if q["query_id"] in deep else 10
    return queries
