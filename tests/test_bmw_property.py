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
