"""Varbyte/delta codec roundtrips + block-max correctness
(SURVEY.md §5.1), including hypothesis property tests."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from documentindex_spark.constants import BLOCK_SIZE
from documentindex_spark.operators.codec import (
    encode_segment,
    varbyte_decode,
    varbyte_encode,
)


def test_varbyte_roundtrip_simple():
    vals = np.array([0, 1, 127, 128, 300, 2**20, 2**40, 2**63 - 1], dtype=np.uint64)
    blob, lens = varbyte_encode(vals)
    assert lens.tolist() == [1, 1, 1, 2, 2, 3, 6, 9]
    out = varbyte_decode(blob)
    assert out.tolist() == vals.tolist()


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=2**62), min_size=0, max_size=500)
)
def test_varbyte_roundtrip_property(vals):
    arr = np.array(vals, dtype=np.uint64)
    blob, _ = varbyte_encode(arr)
    assert varbyte_decode(blob).tolist() == vals


def _mk_segment(n, seed=0, term="t"):
    rng = np.random.default_rng(seed)
    doc_ids = np.cumsum(rng.integers(1, 50, size=n)).astype(np.int64)
    tfs = rng.integers(1, 30, size=n).astype(np.int64)
    impacts = rng.random(n).astype(np.float64) * 5.0
    return doc_ids, tfs, impacts, encode_segment(term, n, doc_ids, tfs, impacts)


def test_segment_block_decode_roundtrip():
    for n in [1, 127, 128, 129, 1000, 5000]:
        doc_ids, tfs, impacts, seg = _mk_segment(n, seed=n)
        got_d, got_i, got_t = [], [], []
        for b in range(seg.n_blocks):
            d, i = seg.decode_block(b)
            got_d.append(d)
            got_i.append(i)
            got_t.append(seg.decode_block_tfs(b))
        assert np.concatenate(got_d).tolist() == doc_ids.tolist()
        assert np.concatenate(got_t).tolist() == tfs.tolist()
        assert np.concatenate(got_i).tolist() == impacts.tolist()


def test_segment_decode_all_matches_blockwise():
    doc_ids, tfs, impacts, seg = _mk_segment(3000, seed=7)
    d, t, i = seg.decode_all()
    assert d.tolist() == doc_ids.tolist()
    assert t.tolist() == tfs.tolist()
    assert i.tolist() == impacts.tolist()


def test_block_max_metadata():
    doc_ids, tfs, impacts, seg = _mk_segment(1000, seed=3)
    for b in range(seg.n_blocks):
        lo, hi = b * BLOCK_SIZE, min((b + 1) * BLOCK_SIZE, len(doc_ids))
        assert seg.block_max_doc[b] == doc_ids[hi - 1]
        assert seg.block_max_impact[b] == impacts[lo:hi].max()
        assert seg.block_n[b] == hi - lo
