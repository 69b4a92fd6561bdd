"""Posting-list codec: delta + varbyte compression with per-block
block-max metadata (Ding & Suel, SIGIR 2011 — Block-Max WAND).

All encode/decode paths are numpy-vectorized: the only Python loops
are over BYTE-WIDTH (≤10 iterations) or over blocks, never over
postings (BASELINE.json:15 "no per-row Python").

Layout per posting segment (one term, ascending doc_ids, ≤
MAX_SEGMENT_POSTINGS entries):

- ``doc_blob``    varbyte of doc-id gaps; gaps RESTART at each block
                  boundary (first entry of a block is absolute), so a
                  block is independently decodable for skipping.
- ``tf_blob``     varbyte of term frequencies, block-aligned offsets.
- ``impact_blob`` raw little-endian float64 of the precomputed
                  query-independent BM25 impacts (idf × tf-norm);
                  block b lives at [sum(block_n[:b])*8, ...).
- ``block_*``     per-block metadata: entry count, max doc_id, max
                  impact, byte offsets into doc/tf blobs.

The reference has no index at all (it re-reads every node per query,
/root/reference/src/documentindex/searcher.py:81); this module is the
target-only compressed store mandated by the north rule.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..constants import BLOCK_SIZE

# ---------------------------------------------------------------- varbyte


def varbyte_encode(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """Encode uint64 values → (blob, per-value byte length array).

    Little-endian 7-bit groups; high bit = continuation. Vectorized:
    the loop is over byte positions (≤10), not values.
    """
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = len(v)
    if n == 0:
        return b"", np.zeros(0, dtype=np.int64)
    nbytes = np.ones(n, dtype=np.int64)
    tmp = v >> np.uint64(7)
    while tmp.any():
        nbytes += (tmp > 0).astype(np.int64)
        tmp = tmp >> np.uint64(7)
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    rem = v.copy()
    for b in range(int(nbytes.max())):
        mask = nbytes > b
        byte = (rem[mask] & np.uint64(0x7F)).astype(np.uint8)
        cont = (nbytes[mask] - 1) != b
        out[starts[mask] + b] = byte | (cont.astype(np.uint8) << 7)
        rem[mask] = rem[mask] >> np.uint64(7)
    return out.tobytes(), nbytes


def varbyte_decode(blob: bytes | memoryview) -> np.ndarray:
    """Decode a varbyte blob → uint64 array. Loop over byte-width only."""
    arr = np.frombuffer(blob, dtype=np.uint8)
    if arr.size == 0:
        return np.zeros(0, dtype=np.uint64)
    is_last = (arr & 0x80) == 0
    ends = np.flatnonzero(is_last)
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lengths = ends - starts + 1
    values = np.zeros(len(ends), dtype=np.uint64)
    for b in range(int(lengths.max())):
        mask = lengths > b
        values[mask] |= (arr[starts[mask] + b] & np.uint64(0x7F)).astype(
            np.uint64
        ) << np.uint64(7 * b)
    return values


# ---------------------------------------------------------------- segment


@dataclass
class Segment:
    """Decoded-side view of one stored posting segment row."""

    term: str
    df: int
    n_postings: int
    min_doc_id: int
    max_doc_id: int
    doc_blob: bytes
    tf_blob: bytes
    impact_blob: bytes
    block_n: np.ndarray          # int32, postings per block
    block_max_doc: np.ndarray    # int64
    block_max_impact: np.ndarray  # float64
    block_doc_off: np.ndarray    # int64, byte offsets into doc_blob
    block_tf_off: np.ndarray     # int64, byte offsets into tf_blob

    @property
    def n_blocks(self) -> int:
        return len(self.block_n)

    def decode_block(self, b: int) -> tuple[np.ndarray, np.ndarray]:
        """(doc_ids int64, impacts float64) of block b."""
        d0 = int(self.block_doc_off[b])
        d1 = (
            int(self.block_doc_off[b + 1])
            if b + 1 < self.n_blocks
            else len(self.doc_blob)
        )
        gaps = varbyte_decode(memoryview(self.doc_blob)[d0:d1])
        doc_ids = np.cumsum(gaps.astype(np.int64))  # first gap is absolute
        i0 = int(np.sum(self.block_n[:b])) * 8
        cnt = int(self.block_n[b])
        impacts = np.frombuffer(self.impact_blob, dtype="<f8", count=cnt,
                                offset=i0)
        return doc_ids, impacts

    def decode_block_tfs(self, b: int) -> np.ndarray:
        t0 = int(self.block_tf_off[b])
        t1 = (
            int(self.block_tf_off[b + 1])
            if b + 1 < self.n_blocks
            else len(self.tf_blob)
        )
        return varbyte_decode(memoryview(self.tf_blob)[t0:t1]).astype(np.int64)

    def decode_all(self) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(doc_ids, tfs, impacts) for the whole segment — used by the
        shuffle-merge (shards are whole-decoded, concatenated,
        re-encoded)."""
        gaps = varbyte_decode(self.doc_blob).astype(np.int64)
        # gaps restart per block: rebuild absolute ids blockwise via a
        # segmented cumsum (vectorized: global cumsum minus per-block
        # base correction).
        cs = np.cumsum(gaps)
        starts = np.concatenate(
            [[0], np.cumsum(self.block_n.astype(np.int64))[:-1]]
        )
        # value that cumsum carried INTO each block start (to subtract)
        carry = np.zeros(len(gaps), dtype=np.int64)
        carry_at_start = cs[starts] - gaps[starts]
        reps = np.diff(np.concatenate([starts, [len(gaps)]]))
        carry = np.repeat(carry_at_start, reps)
        doc_ids = cs - carry
        tfs = varbyte_decode(self.tf_blob).astype(np.int64)
        impacts = np.frombuffer(self.impact_blob, dtype="<f8")
        return doc_ids, tfs, impacts


def encode_segment(
    term: str,
    df: int,
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    impacts: np.ndarray,
    block_size: int = BLOCK_SIZE,
) -> Segment:
    """Encode one sorted posting run into a Segment.

    doc_ids must be strictly ascending int64. Gap encoding restarts at
    block boundaries so each block decodes independently.
    """
    n = len(doc_ids)
    doc_ids = np.ascontiguousarray(doc_ids, dtype=np.int64)
    starts = np.arange(0, n, block_size, dtype=np.int64)
    n_blocks = len(starts)
    block_n = np.minimum(starts + block_size, n) - starts

    gaps = np.empty(n, dtype=np.int64)
    gaps[0:] = doc_ids
    gaps[1:] -= doc_ids[:-1]
    gaps[starts] = doc_ids[starts]  # restart: absolute at block head

    doc_blob, doc_lens = varbyte_encode(gaps.astype(np.uint64))
    tf_blob, tf_lens = varbyte_encode(
        np.ascontiguousarray(tfs, dtype=np.uint64)
    )
    doc_cum = np.concatenate([[0], np.cumsum(doc_lens)])
    tf_cum = np.concatenate([[0], np.cumsum(tf_lens)])
    impacts = np.ascontiguousarray(impacts, dtype="<f8")

    ends = starts + block_n
    block_max_doc = doc_ids[ends - 1]
    # per-block max impact via reduceat (vectorized)
    block_max_impact = np.maximum.reduceat(impacts, starts)
    return Segment(
        term=term,
        df=int(df),
        n_postings=n,
        min_doc_id=int(doc_ids[0]),
        max_doc_id=int(doc_ids[-1]),
        doc_blob=doc_blob,
        tf_blob=tf_blob,
        impact_blob=impacts.tobytes(),
        block_n=block_n.astype(np.int32),
        block_max_doc=block_max_doc.astype(np.int64),
        block_max_impact=block_max_impact.astype(np.float64),
        block_doc_off=doc_cum[starts],
        block_tf_off=tf_cum[starts],
    )
