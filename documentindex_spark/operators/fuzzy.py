"""Typo-tolerant term matching — SymSpell-style deletion-neighborhood
candidates + exact Levenshtein verify.

The reference's LLM scorer is inherently robust to query typos
(/root/reference/src/documentindex/searcher.py:167-247 — the model
reads past them); a lexical engine needs an explicit operator. The
naive plan (vocab × query cross join + levenshtein) is quadratic in
|vocab|; the scale plan here is the SymSpell decomposition:

1. each vocab term explodes into its ≤|t|+1 single-deletion variants
   (plus itself) — one Generate, rows ≈ vocab × avg_len;
2. the query's variants (a driver-built table of a few dozen rows)
   BROADCAST-join against them — candidates only, never all pairs;
3. candidates pass through an exact ``levenshtein ≤ 1`` residual
   filter, because deletion-set intersection alone admits distance-2
   pairs through deletions at different positions ("abc" ~ "bcd" via
   shared variant "bc") — the filter makes the op exact, and the
   DuckDB oracle is the labeled-quadratic cross join + levenshtein
   (the same ground-truth/scale-path split as ngram_jaccard).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.tokenize import tokenize


def _deletion_variants(term: str) -> list[str]:
    return [term] + [term[:i] + term[i + 1 :] for i in range(len(term))]


def vocabulary(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(term, df) — document frequency per distinct term."""
    return (
        tokenize(df, text_col, id_col)
        .groupBy("term")
        .agg(F.countDistinct(id_col).alias("df"))
    )


def vocab_variants(vocab: DataFrame) -> DataFrame:
    """(term, df, variant): each vocab term plus its single-deletion
    neighborhood — ONE Generate over the vocabulary. Shared by the
    per-query path below and the build-time stored table
    (plans/fuzzy_table.py), which persists this frame so queries never
    re-run the Generate."""
    return vocab.select(
        "term",
        "df",
        F.explode(F.sequence(F.lit(0), F.length("term"))).alias("i"),
    ).select(
        "term",
        "df",
        F.when(
            F.col("i") == F.length("term"), F.col("term")
        ).otherwise(
            F.concat(
                F.expr("substring(term, 1, i)"),
                F.expr("substring(term, i + 2, length(term))"),
            )
        ).alias("variant"),
    )


def query_variants(spark, query_terms: list[str]) -> DataFrame:
    """Driver-built (query_term, variant) table — a few dozen rows,
    always broadcast."""
    qrows = [
        (qt, v)
        for qt in sorted(set(query_terms))
        for v in sorted(set(_deletion_variants(qt)))
    ]
    return spark.createDataFrame(qrows, "query_term string, variant string")


def _verify_candidates(cand: DataFrame, max_dist: int) -> DataFrame:
    return (
        cand.select("query_term", "term", "df")
        .distinct()
        .select(
            "query_term",
            "term",
            "df",
            F.levenshtein("query_term", "term").alias("dist"),
        )
        .filter(F.col("dist") <= max_dist)
    )


def fuzzy_term_matches(
    vocab: DataFrame, query_terms: list[str], max_dist: int = 1
) -> DataFrame:
    """(query_term, term, df, dist) for every vocab term within
    ``max_dist`` (≤1) edits of a query term. Deterministic result set.

    Deletion neighborhoods cover distance ≤1 completely (insertion,
    deletion, substitution all share a variant); the levenshtein
    residual then rejects the distance-2 pairs the intersection lets
    through. For max_dist > 1 the neighborhood depth would need to
    grow with it, so this implementation pins max_dist ≤ 1.
    """
    if max_dist > 1:
        raise ValueError("deletion neighborhood implemented for max_dist <= 1")
    qvar = query_variants(vocab.sparkSession, query_terms)
    # vocab side: one Generate — i == len(term) keeps the term itself
    cand = vocab_variants(vocab).join(F.broadcast(qvar), "variant")
    return _verify_candidates(cand, max_dist)


def prefix_suggest(
    vocab: DataFrame, prefix: str, limit: int = 20
) -> DataFrame:
    """(term, df) — autocomplete/typeahead: vocabulary terms starting
    with ``prefix``, ranked by document frequency DESC with the term
    itself as the deterministic tie-break, LIMIT ``limit``.

    ``vocab`` is any (term, df) table — the corpus `vocabulary()`,
    or the stored fuzzy sidecar's identity rows (variant = term, so
    its first-char partitioning prunes to the prefix's partition).
    The startswith predicate plans as a pushable StartsWith filter;
    the top-k is a TakeOrderedAndProject — no global sort.
    """
    return (
        vocab.filter(F.col("term").startswith(prefix))
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(limit)
        .select("term", F.col("df").cast("long").alias("df"))
    )
