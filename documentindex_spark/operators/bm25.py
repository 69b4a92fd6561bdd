"""Exhaustive BM25 scorer — the permanent rank-identity oracle (M1).

100% built-in Spark expressions (no UDF anywhere): the impact formula
is pure `F.col` arithmetic, the per-doc sum is a deterministic
`sort_array` + `F.aggregate` fold so float64 addition order is fixed
(ascending term), and top-k plans as TakeOrderedAndProject
(distributed partial top-k, no global sort).

Replaces the reference's LLM relevance scan
(/root/reference/src/documentindex/searcher.py:56-247): same logical
plan — scan → score → [filter] → sort desc → limit k — with
deterministic lexical scoring per the north rule.

Frozen semantics (constants.py): Lucene idf
``ln(1 + (N - df + 0.5)/(df + 0.5))``; tf norm
``tf*(k1+1)/(tf + k1*(1 - b + b*dl/avgdl))``; query terms deduped and
summed in ascending term order; ties broken (score DESC, doc_id ASC).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..constants import BM25_B, BM25_K1
from ..functions.tokenize import query_terms
from .stats import CorpusStats


def idf_col(df_col: Column, n_docs: int) -> Column:
    return F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - df_col + F.lit(0.5)) / (df_col + F.lit(0.5))
    )


def tf_norm_col(tf_col: Column, dl_col: Column, avgdl: float) -> Column:
    k1, b = F.lit(BM25_K1), F.lit(BM25_B)
    return (tf_col * (k1 + F.lit(1.0))) / (
        tf_col + k1 * (F.lit(1.0) - b + b * dl_col / F.lit(float(avgdl)))
    )


def impacts(
    tf: DataFrame, doc_lens: DataFrame, dfreq: DataFrame, stats: CorpusStats
) -> DataFrame:
    """(doc_id, term, impact) — the query-independent per-posting
    weight. Precomputing it at build time is what lets the BMW scorer
    skip any doc-length lookup at query time (SURVEY.md §4.2.2/3).

    Join shape: tf ⋈ doc_lens on doc_id (both doc-keyed — co-
    partitioned by the same shuffle key), then ⋈ dfreq on term.
    """
    return (
        tf.join(doc_lens, "doc_id")
        .join(dfreq, "term")
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            (
                idf_col(F.col("df").cast("double"), stats.n_docs)
                * tf_norm_col(
                    F.col("tf").cast("double"),
                    F.col("dl").cast("double"),
                    stats.avgdl,
                )
            ).alias("impact"),
        )
    )
    # tf/df are carried for the posting-list builder (postings.py);
    # query paths select only (doc_id, term, impact) — Catalyst prunes.


def impacts_keyed(
    tf_k: DataFrame, doc_lens: DataFrame, tdict: DataFrame,
    stats: CorpusStats,
) -> DataFrame:
    """impacts() with int64 term keys (round-3 verdict #5): tf_k is
    (doc_id, tkey, tf) and tdict is the vocab dictionary
    (tkey, df, bucket) — the token-mass ⋈ vocab join and every
    downstream encode shuffle move an 8-byte key plus small ints, no
    term strings. Numerically identical to impacts(): same
    idf/tf_norm expressions over the same values."""
    return (
        tf_k.join(doc_lens, "doc_id")
        .join(tdict.select("tkey", "df", "bucket"), "tkey")
        .select(
            "doc_id",
            "tkey",
            "bucket",
            "tf",
            "df",
            (
                idf_col(F.col("df").cast("double"), stats.n_docs)
                * tf_norm_col(
                    F.col("tf").cast("double"),
                    F.col("dl").cast("double"),
                    stats.avgdl,
                )
            ).alias("impact"),
        )
    )


def _ordered_sum(df_grouped_terms: DataFrame) -> DataFrame:
    """Deterministic float64 per-doc sum: collect (term, impact)
    structs, sort_array (ascending term), fold with F.aggregate.
    All JVM-side."""
    return df_grouped_terms.groupBy("doc_id").agg(
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("term", "impact"))),
            F.lit(0.0),
            lambda acc, x: acc + x["impact"],
        ).alias("score")
    )


def score_query(impact_df: DataFrame, query: str) -> DataFrame:
    """(doc_id, score) for every doc matching ≥1 query term.

    The query-term side is a literal isin() filter — Catalyst pushes
    it into the impact scan; no join needed for a handful of terms.
    OOV terms simply match nothing (score contribution 0).
    """
    terms = query_terms(query)
    if not terms:
        return impact_df.select("doc_id", F.lit(0.0).alias("score")).limit(0)
    matched = impact_df.filter(F.col("term").isin(terms))
    return _ordered_sum(matched)


def score_query_boolean(
    impact_df: DataFrame, query: str, min_should_match: int | None = None
) -> DataFrame:
    """Boolean-mode BM25: (doc_id, score, n_matched) for docs
    matching ≥ ``min_should_match`` DISTINCT query terms (default:
    ALL terms — conjunctive AND). Scoring stays the frozen ordered
    float64 sum; the boolean predicate is a HAVING on the distinct
    matched-term count inside the same aggregate (no second pass).

    Lucene's BooleanQuery minimumNumberShouldMatch semantics over
    the same impact table the ranked scorer uses."""
    terms = query_terms(query)
    if not terms:
        return (
            impact_df.select(
                "doc_id",
                F.lit(0.0).alias("score"),
                F.lit(0).alias("n_matched"),
            ).limit(0)
        )
    need = len(terms) if min_should_match is None else min_should_match
    matched = impact_df.filter(F.col("term").isin(terms))
    return (
        matched.groupBy("doc_id")
        .agg(
            F.aggregate(
                F.sort_array(F.collect_list(F.struct("term", "impact"))),
                F.lit(0.0),
                lambda acc, x: acc + x["impact"],
            ).alias("score"),
            F.count_distinct(F.col("term")).cast("int").alias("n_matched"),
        )
        .filter(F.col("n_matched") >= need)
    )


def topk(scored: DataFrame, k: int) -> DataFrame:
    """(doc_id, score, rank) — TakeOrderedAndProject plan."""
    from pyspark.sql.window import Window

    lim = scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return lim.withColumn("rank", F.row_number().over(w))


def score_queries_batch(impact_df: DataFrame, queries: DataFrame) -> DataFrame:
    """Batched scoring: ``queries`` is (query_id, term) — broadcast to
    the impact table (query side is tiny), one shuffle on
    (query_id, doc_id). Used by the bench harness for the full
    reference query set in one job."""
    joined = impact_df.join(F.broadcast(queries), "term")
    return joined.groupBy("query_id", "doc_id").agg(
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("term", "impact"))),
            F.lit(0.0),
            lambda acc, x: acc + x["impact"],
        ).alias("score")
    )


def topk_batch(scored: DataFrame, k: int) -> DataFrame:
    """Per-query top-k via window rank — one shuffle on query_id."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
