"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Engine: documentindex_spark (see SURVEY.md). Scores are rounded to
6 decimals on BOTH sides so the value-hash compare is robust to
float summation order; the engine's internal rank-identity tests
(tests/) assert exact float64 equality separately.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from documentindex_spark.constants import BM25_B, BM25_K1  # noqa: E402
from documentindex_spark.functions.tokenize import (  # noqa: E402
    doc_lengths,
    term_frequencies,
)
from documentindex_spark.operators.bm25 import (  # noqa: E402
    impacts,
    score_query,
    topk,
)
from documentindex_spark.operators.stats import (  # noqa: E402
    corpus_stats,
    document_frequencies,
)
from documentindex_spark.sources.registry import load_documents  # noqa: E402

# ---------------------------------------------------------------- helpers

# The frozen analyzer, as one DuckDB CTE prefix reused by every oracle.
_ORACLE_TOKS = """
WITH toks AS (
    SELECT doc_id, t.term AS term
    FROM documents,
         unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS t(term)
    WHERE t.term <> ''
),
tf AS (
    SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2
),
dl AS (
    SELECT doc_id, count(*)::BIGINT AS dl FROM toks GROUP BY 1
),
stats AS (
    SELECT count(*)::BIGINT AS n_docs,
           sum(dl)::DOUBLE / count(*) AS avgdl
    FROM dl
),
dfreq AS (
    SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1
),
imp AS (
    SELECT tf.doc_id, tf.term,
           ln(1.0 + (stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
           * (tf.tf * ({k1} + 1.0))
             / (tf.tf + {k1} * (1.0 - {b} + {b} * dl.dl / stats.avgdl))
           AS impact
    FROM tf
    JOIN dl USING (doc_id)
    JOIN dfreq USING (term)
    CROSS JOIN stats
)
""".format(k1=BM25_K1, b=BM25_B)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_documents(spark, sf_dir)


def _impact_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    tf = term_frequencies(docs, text_col="text")
    dl = doc_lengths(docs, text_col="text")
    stats = corpus_stats(dl)
    dfreq = document_frequencies(tf)
    return impacts(tf, dl, dfreq, stats)


def _bm25_topk(query: str, k: int):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        scored = score_query(_impact_df(spark, sf_dir), query)
        return topk(scored, k).select(
            "doc_id", F.round("score", 6).alias("score"), "rank"
        )

    return run


def _bm25_oracle(terms: list[str], k: int) -> str:
    tlist = ", ".join(f"'{t}'" for t in terms)
    return (
        _ORACLE_TOKS
        + f"""
, scored AS (
    SELECT doc_id, sum(impact) AS score
    FROM imp WHERE term IN ({tlist}) GROUP BY doc_id
)
SELECT doc_id, round(score, 6) AS score,
       row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank
FROM scored ORDER BY score DESC, doc_id ASC LIMIT {k}
"""
    )


# ---------------------------------------------------------------- contract


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: BM25 top-10 for 'merge sort window' on sf0.001."""
    sf_dir = "/root/testdata/sf0.001"
    scored = score_query(_impact_df(spark, sf_dir), "merge sort window")
    return topk(scored, 10)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    def q_tf_sample(spark, sf_dir):
        docs = _docs(spark, sf_dir)
        return term_frequencies(docs, text_col="text").filter(
            F.col("doc_id") % 50 == 0
        )

    def q_doc_lengths(spark, sf_dir):
        docs = _docs(spark, sf_dir)
        return doc_lengths(docs, text_col="text").filter(
            F.col("doc_id") % 50 == 0
        )

    def q_corpus_stats(spark, sf_dir):
        docs = _docs(spark, sf_dir)
        dl = doc_lengths(docs, text_col="text")
        return dl.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("dl").alias("total_tokens"),
            F.round(F.sum("dl") / F.count(F.lit(1)), 6).alias("avgdl"),
        )

    def q_dfreq_hot(spark, sf_dir):
        docs = _docs(spark, sf_dir)
        tf = term_frequencies(docs, text_col="text")
        return document_frequencies(tf).filter(F.col("df") >= 100)

    def q_bm25_threshold(spark, sf_dir):
        """'find ALL evidence' mode: threshold, no limit
        (reference provenance.py:84-139 semantics)."""
        scored = score_query(_impact_df(spark, sf_dir), "merge sort")
        return scored.select(
            "doc_id", F.round("score", 6).alias("score")
        ).filter(F.col("score") >= 0.7)

    return {
        "tf_sample": q_tf_sample,
        "doc_lengths": q_doc_lengths,
        "corpus_stats": q_corpus_stats,
        "dfreq_hot": q_dfreq_hot,
        "bm25_topk_merge_sort": _bm25_topk("merge sort", 10),
        "bm25_topk_single_hot": _bm25_topk("the", 10),
        "bm25_topk_three_terms": _bm25_topk("spark window filter", 10),
        "bm25_threshold_all": q_bm25_threshold,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "tf_sample": _ORACLE_TOKS
        + "SELECT doc_id, term, tf FROM tf WHERE doc_id % 50 = 0",
        "doc_lengths": _ORACLE_TOKS
        + "SELECT doc_id, dl FROM dl WHERE doc_id % 50 = 0",
        "corpus_stats": _ORACLE_TOKS
        + """SELECT count(*)::BIGINT AS n_docs,
                    sum(dl)::BIGINT AS total_tokens,
                    round(sum(dl)::DOUBLE / count(*), 6) AS avgdl
             FROM dl""",
        "dfreq_hot": _ORACLE_TOKS
        + "SELECT term, df FROM dfreq WHERE df >= 100",
        "bm25_topk_merge_sort": _bm25_oracle(["merge", "sort"], 10),
        "bm25_topk_single_hot": _bm25_oracle(["the"], 10),
        "bm25_topk_three_terms": _bm25_oracle(
            ["filter", "spark", "window"], 10
        ),
        "bm25_threshold_all": _ORACLE_TOKS
        + """
, scored AS (
    SELECT doc_id, sum(impact) AS score
    FROM imp WHERE term IN ('merge', 'sort') GROUP BY doc_id
)
SELECT doc_id, round(score, 6) AS score FROM scored
WHERE round(score, 6) >= 0.7
""",
    }
