"""Frozen engine constants.

Everything that affects rank-identity lives here, in ONE place, per
SURVEY.md §4.2.4 ("freeze the idf variant in one constants module").

BM25 parameters come from the north rule (BASELINE.json:6: k1=1.2,
b=0.75).  The idf variant is the Lucene/standard one,
``ln(1 + (N - df + 0.5) / (df + 0.5))`` — always positive, so posting
impacts are monotone in tf and block-max skipping is sound.

Reference analog: the reference scores nodes 0-1 via an LLM
(/root/reference/src/documentindex/searcher.py:167-247); we replace it
with deterministic lexical BM25 per the north rule.
"""

from __future__ import annotations

# ---- BM25 (frozen; changing any of these breaks rank-identity) ----
BM25_K1: float = 1.2
BM25_B: float = 0.75

# ---- Engine build-logic version ----
# Bump whenever the BUILD pipeline's code-level semantics change in a
# way constants don't capture (encoder layout, merge order, id
# assignment). It feeds checkpoint.config_fingerprint, so a bump
# self-invalidates every stale checkpoint — no manual /tmp cleanup.
ENGINE_BUILD_VERSION: int = 3

# ---- Tokenizer (frozen) ----
# lower-case, split on runs of non-alphanumerics, drop empty tokens.
# Chosen so the EXACT same tokenization is expressible in Spark
# built-ins (F.split/F.explode — JVM side, no Python) and in DuckDB SQL
# (regexp_split_to_array) for the oracle gate.
TOKEN_SPLIT_RE: str = "[^a-z0-9]+"

# ---- Posting-list layout ----
# Entries per block; each block carries (max_doc_id, max_impact)
# block-max metadata (Ding & Suel, SIGIR 2011).
BLOCK_SIZE: int = 128
# Target postings per salt shard during the salted build repartition
# (SURVEY.md §4.2.1). A term with df <= this gets 1 shard; hot terms
# get ceil(df / POSTINGS_PER_SHARD) shards, range-split by doc_id so
# the shuffle-merge is a concatenation of pre-sorted runs.
POSTINGS_PER_SHARD: int = 100_000
# Cap on postings per stored segment row. A term whose merged list
# exceeds this is stored as multiple (term, seg_idx) rows with
# disjoint ascending doc_id ranges — no single row ever holds an
# unbounded blob (hot stopwords at 10^12-file scale).
MAX_SEGMENT_POSTINGS: int = 1_000_000
# Number of hash buckets used as the index's partition column
# (partition pruning: a query touches only its terms' buckets).
NUM_TERM_BUCKETS: int = 64
# Doc-range band width: segments never cross a band boundary, so all
# of a band's postings (for every term) are self-contained — the
# banded BMW path scores one band per task and merges top-k globally,
# giving single-query parallelism at cluster scale. 2^20 docs per
# band ⇒ one band at test scale (no overhead), ~10^6 bands at
# 10^12-file scale.
DOC_BAND_SIZE: int = 1 << 20

# ---- Query semantics (frozen) ----
# Query terms are DE-DUPLICATED and processed in ascending term order;
# doc score = float64 sum of per-(term,doc) impacts in that order;
# ties broken (score DESC, doc_id ASC).
TOPK_DEFAULT: int = 10

# Relevance-threshold defaults, mirroring the reference
# (searcher.py:90 → 0.5 search; provenance.py:182-184 → 0.6; excerpt
# gate provenance.py:310-314 → 0.75). Our scores are BM25 (unbounded),
# so thresholds are expressed as absolute score floors at call sites;
# these constants keep the reference's *relative* semantics available.
SEARCH_THRESHOLD_DEFAULT: float = 0.5
PROVENANCE_THRESHOLD_DEFAULT: float = 0.6
EXCERPT_THRESHOLD_DEFAULT: float = 0.75
