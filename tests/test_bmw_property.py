"""Property test: Block-Max WAND == exhaustive oracle on RANDOM
corpora/queries (hypothesis). Complements the fixed 50-query golden
set — randomized tie patterns, OOV mixes, empty docs, and forced
multi-segment splits exercise the cursor/skip logic paths small
fixed corpora miss (see the round-1 BMW bugs both found by corpus
variety, tests/test_bmw_regression.py)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from documentindex_spark import oracle
from documentindex_spark.functions.tokenize import query_terms
from documentindex_spark.operators.bmw import bmw_topk_local
from tests.test_index_bmw import _segments_from_oracle

VOCAB = ["merge", "sort", "block", "the", "data", "scan", "a", "zz9"]

_doc = st.lists(st.sampled_from(VOCAB), min_size=0, max_size=30).map(
    " ".join
)
_corpus = st.lists(_doc, min_size=1, max_size=25).filter(
    lambda ds: any(d.strip() for d in ds)
)
_query = st.lists(
    st.sampled_from(VOCAB + ["oovword"]), min_size=1, max_size=4
).map(" ".join)


@settings(max_examples=80, deadline=None)
@given(_corpus, _query, st.sampled_from([1, 3, 10]),
       st.sampled_from([None, 3]))
def test_bmw_local_equals_oracle_on_random_corpora(docs, q, k, max_seg):
    local = {i: t for i, t in enumerate(docs)}
    orc = oracle.OracleIndex(local)
    terms = query_terms(q)
    segs = _segments_from_oracle(orc, terms, max_seg)
    got = bmw_topk_local(segs, k)
    want = orc.topk(q, k)
    assert [d for d, _ in got] == [d for d, _ in want], (docs, q, k)
    assert [s for _, s in got] == pytest.approx(
        [s for _, s in want], abs=1e-12
    )


_boost = st.sampled_from([0.5, 1.0, 2.5])


@settings(max_examples=80, deadline=None)
@given(
    _corpus,
    st.lists(st.sampled_from(VOCAB), min_size=1, max_size=4,
             unique=True),
    st.data(),
    st.sampled_from([1, 3, 10]),
    st.sampled_from([None, 3]),
)
def test_boolean_bmw_local_equals_replica(docs, qterms, data, k, max_seg):
    """Boosts + must clauses + liveDocs exclusion against a direct
    replica on random corpora: the boost-scaled bounds and the
    heap-admission gate must stay exact under every tie/skip
    pattern."""
    local = {i: t for i, t in enumerate(docs)}
    orc = oracle.OracleIndex(local)
    boosts = {t: data.draw(_boost, label=f"boost:{t}") for t in qterms}
    must = {
        t for t in qterms if data.draw(st.booleans(), label=f"must:{t}")
    }
    exclude = {
        d for d in range(len(docs))
        if data.draw(st.booleans(), label=f"del:{d}")
    }
    segs = _segments_from_oracle(orc, qterms, max_seg)
    got = bmw_topk_local(
        segs, k, exclude=exclude or None, boosts=boosts,
        must=must or None,
    )
    want = []
    for d in orc.tf:
        if d in exclude:
            continue
        if any(orc.tf[d].get(t, 0) == 0 for t in must):
            continue
        s = 0.0
        for t in sorted(qterms):
            s += boosts[t] * orc.impact(t, d)
        if s > 0.0:
            want.append((d, s))
    want.sort(key=lambda x: (-x[1], x[0]))
    want = want[:k]
    assert [d for d, _ in got] == [d for d, _ in want], (
        docs, qterms, boosts, must, exclude, k,
    )
    assert [s for _, s in got] == pytest.approx(
        [s for _, s in want], abs=1e-12
    )
