"""Provenance / "find ALL evidence" mode + deterministic snippet
extraction.

Reference analog: /root/reference/src/documentindex/provenance.py —
`extract_all` scores EVERY node (max_results = total, :115-122),
keeps score ≥ threshold, extracts excerpts only above a higher gate
(0.75, :309-314 — the filter runs BEFORE the expensive extraction:
predicate pushdown below an expensive projection, SURVEY.md §4.1),
and rolls the top-15 into a summary (:504-538).

Target semantics: same logical plan with BM25 in place of the LLM.
Snippets are deterministic: the text window around the EARLIEST
occurrence of any query term (the LLM excerpt call's replacement,
SURVEY.md §3.3). 100% built-in expressions — `locate` on the lowered
text, `least` over per-term positions, `substring` — so the whole
operator is SQL-expressible and oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.tokenize import query_terms


def first_match_pos(text: Column, terms: list[str]) -> Column:
    """1-based position of the earliest query-term occurrence in
    lower(text); 0 when none match. `locate` returns 0 for a miss, so
    misses are mapped to +inf before `least`."""
    lowered = F.lower(text)
    pos_cols = [
        F.when(F.locate(t, lowered) == 0, F.lit(2_147_483_647)).otherwise(
            F.locate(t, lowered)
        )
        for t in terms
    ]
    best = pos_cols[0] if len(pos_cols) == 1 else F.least(*pos_cols)
    return F.when(best == 2_147_483_647, F.lit(0)).otherwise(best)


def snippet_col(text: Column, terms: list[str], width: int = 120) -> Column:
    """Deterministic excerpt: `width` chars starting at the earliest
    term hit (or the document head when no term literal appears)."""
    pos = first_match_pos(text, terms)
    start = F.greatest(pos, F.lit(1))
    return F.substring(text, start, width)


def find_all_evidence(
    scored: DataFrame,
    docs: DataFrame,
    query: str,
    threshold: float,
    excerpt_threshold: float | None = None,
    text_col: str = "text",
    snippet_width: int = 120,
) -> DataFrame:
    """(doc_id, score, snippet) for every doc scoring ≥ threshold —
    no limit ("find ALL evidence"). Snippets are computed only for
    rows above ``excerpt_threshold`` (filter BEFORE the projection,
    mirroring provenance.py:309-314); below-gate rows keep NULL.

    ``scored``: (doc_id, score) from bm25.score_query or the BMW path
    with k = n_docs. ``docs`` must have (doc_id, text_col).
    """
    terms = query_terms(query)
    ex_th = excerpt_threshold if excerpt_threshold is not None else threshold
    hits = scored.filter(F.col("score") >= threshold)
    joined = hits.join(docs.select("doc_id", text_col), "doc_id")
    return joined.select(
        "doc_id",
        "score",
        F.when(
            F.col("score") >= ex_th,
            snippet_col(F.col(text_col), terms, snippet_width),
        ).alias("snippet"),
    )


def excerpts_col(
    text_col_name: str,
    terms: list[str],
    width: int = 120,
    max_excerpts: int = 3,
) -> Column:
    """array<string> of up to ``max_excerpts`` excerpts — one window
    per DISTINCT first-occurrence position of a query term, ascending
    by position (the reference returns a matched_excerpts LIST per
    hit, models.py:450-471 / provenance.py:297-347; round 1 kept only
    the single earliest window). Pure built-ins via higher-order
    array functions over the tiny terms array — SQL-expressible for
    the oracle gate."""
    tlist = ", ".join(f"'{t}'" for t in terms)  # analyzer terms: [a-z0-9]+
    return F.expr(
        f"transform(slice(array_sort(array_distinct(filter(transform("
        f"array({tlist}), t -> locate(t, lower({text_col_name}))), "
        f"p -> p > 0))), 1, {max_excerpts}), "
        f"p -> substring({text_col_name}, p, {width}))"
    )


def find_all_evidence_multi(
    scored: DataFrame,
    docs: DataFrame,
    topics: dict[int, str],
    threshold: float,
    excerpt_threshold: float | None = None,
    text_col: str = "text",
    snippet_width: int = 120,
) -> DataFrame:
    """N-topic provenance in ONE plan (reference extract_all_topics
    runs N topics with bounded concurrency, provenance.py:255-291;
    here the batch is a single job): ``scored`` is
    (query_id, doc_id, score) for all topics; topics' term lists ride
    a broadcast (query_id, terms) table and the snippet position is
    the array-min of per-term locates — identical semantics to the
    single-topic ``snippet_col``.

    Returns (query_id, doc_id, score, snippet)."""
    spark = scored.sparkSession
    ex_th = excerpt_threshold if excerpt_threshold is not None else threshold
    tdf = spark.createDataFrame(
        [(qid, query_terms(t)) for qid, t in sorted(topics.items())],
        "query_id long, terms array<string>",
    )
    hits = (
        scored.filter(F.col("score") >= threshold)
        .join(docs.select("doc_id", text_col), "doc_id")
        .join(F.broadcast(tdf), "query_id")
    )
    pos = F.expr(
        f"array_min(filter(transform(terms, "
        f"t -> locate(t, lower({text_col}))), p -> p > 0))"
    )
    snippet = F.substring(
        F.col(text_col),
        F.greatest(F.coalesce(pos, F.lit(1)), F.lit(1)),
        snippet_width,
    )
    return hits.select(
        "query_id",
        "doc_id",
        "score",
        F.when(F.col("score") >= ex_th, snippet).alias("snippet"),
    )


def evidence_summary(evidence: DataFrame, top_n: int = 15) -> DataFrame:
    """Top-N rollup (provenance.py:504-538): one row with match count,
    score stats, and the concatenated top-N snippets."""
    top = evidence.orderBy(F.desc("score"), F.asc("doc_id")).limit(top_n)
    return top.agg(
        F.count(F.lit(1)).alias("n_top"),
        F.round(F.max("score"), 6).alias("max_score"),
        F.round(F.avg("score"), 6).alias("avg_score"),
        F.concat_ws(
            " | ", F.collect_list(F.coalesce("snippet", F.lit("")))
        ).alias("summary_input"),
    )
