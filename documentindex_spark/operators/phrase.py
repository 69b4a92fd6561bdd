"""Phrase (exact-adjacency) queries — a capability extension beyond
the bag-of-words scorer.

A phrase "merge sort" matches docs where the analyzer tokens appear
CONSECUTIVELY (position i holds 'merge', i+1 holds 'sort'). The
reference approximates phrases through its LLM relevance call
(/root/reference/src/documentindex/searcher.py:167-247 scores free
text); here the semantics are exact and deterministic.

Plan shape (all built-ins): tokenize with positions (posexplode) →
per-word position tables filtered by term (predicate pushdown under
the explode) → (n−1) equi-joins on (doc_id, pos − word_index): a
surviving row IS a phrase occurrence start. Join inputs are
pre-filtered to the phrase's words, so each shuffle moves only those
terms' postings — the same data a positional index would read.
Ranking: BM25 over the phrase's terms, restricted to matching docs
(semi-join), ties (score DESC, doc_id ASC).

SQL-expressible end-to-end → DuckDB oracle (`phrase_topk_*` driver
entries).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..constants import TOKEN_SPLIT_RE, TOPK_DEFAULT
from ..functions.tokenize import tokenize
from .bm25 import score_query, topk


def phrase_words(phrase: str) -> list[str]:
    """Analyzer tokens IN ORDER (phrases are sequences — no dedup, no
    sort, unlike ``query_terms``)."""
    return [t for t in re.split(TOKEN_SPLIT_RE, phrase.lower()) if t]


def phrase_matches(
    df: DataFrame,
    phrase: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id_col, n_occ) for every doc containing the phrase as
    consecutive analyzer tokens; n_occ counts occurrence starts.

    posexplode positions include split artifacts only at document
    boundaries (tokenize docstring), so interior token positions are
    contiguous and ``pos − i`` alignment is exact."""
    words = phrase_words(phrase)
    if not words:
        return df.select(
            F.col(id_col), F.lit(0).cast("long").alias("n_occ")
        ).limit(0)
    toks = tokenize(df, text_col, id_col)
    cur = toks.filter(F.col("term") == words[0]).select(
        id_col, F.col("pos").alias("p0")
    )
    for i, w in enumerate(words[1:], 1):
        nxt = toks.filter(F.col("term") == w).select(
            id_col, (F.col("pos") - i).alias("p0")
        )
        cur = cur.join(nxt, [id_col, "p0"])
    return cur.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_occ"))


def proximity_matches(
    df: DataFrame,
    term_a: str,
    term_b: str,
    window: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id_col, n_pairs, min_dist): docs where ``term_a`` and
    ``term_b`` occur within ``window`` tokens of each other
    (unordered). n_pairs counts qualifying position pairs; min_dist
    is the closest distance.

    Plan: both position tables filter to one term under the explode;
    the |pa−pb| ≤ window predicate rides the doc_id equi-join as a
    residual condition — a hash join, not a cartesian, because
    doc_id is an equality key."""
    toks = tokenize(df, text_col, id_col)
    a = toks.filter(F.col("term") == term_a).select(
        id_col, F.col("pos").alias("pa")
    )
    b = toks.filter(F.col("term") == term_b).select(
        id_col, F.col("pos").alias("pb")
    )
    pairs = a.join(b, id_col).filter(
        (F.abs(F.col("pa") - F.col("pb")) <= window)
        & (F.col("pa") != F.col("pb"))
    )
    return pairs.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.min(F.abs(F.col("pa") - F.col("pb"))).alias("min_dist"),
    )


def phrase_topk(
    docs: DataFrame,
    impact_df: DataFrame,
    phrase: str,
    k: int = TOPK_DEFAULT,
    text_col: str = "text",
) -> DataFrame:
    """Top-k BM25 over docs that contain the exact phrase:
    (doc_id, score, n_occ, rank). Scoring stays bag-of-words over the
    phrase's terms (frozen semantics); the phrase predicate is a join
    with the occurrence table."""
    occ = phrase_matches(docs, phrase, text_col)
    scored = score_query(impact_df, phrase)
    hits = scored.join(occ, "doc_id")
    ranked = topk(
        hits.select("doc_id", "score"), k
    )
    return (
        ranked.join(occ, "doc_id")
        .select(
            "doc_id",
            F.round("score", 6).alias("score"),
            "n_occ",
            "rank",
        )
    )
