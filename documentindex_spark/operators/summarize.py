"""Deterministic extractive summaries — the last TreeNode field gap.

Reference nodes carry a ``summary`` filled by an LLM
(/root/reference/src/documentindex/models.py:138-240, populated in
indexer.py:684-770). An LLM is nondeterministic and unavailable here;
the deterministic analog is extractive: a node's summary is its
top-scoring sentence, where a sentence scores the sum of corpus IDF
over its DISTINCT terms (the BM25 idf component — informative terms
win, boilerplate loses). Ties break on earliest sentence.

All scoring is JVM built-ins (split/explode/groupBy/window); the
corpus df table is ONE aggregation shared across every node — no
per-node work beyond its own sentences. SQL-expressible end to end,
so the document-granularity form is a full-oracle gate entry
(``node_summaries``); the node-span wiring (chunker substrings) rides
the pytest-pinned chunker.

Scale: sentences explode ≈ corpus token mass; the (id, sentence)
aggregation shuffles on the id — same order of magnitude as the TF
stage, one pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..constants import TOKEN_SPLIT_RE
from ..functions.scalar import sentence_split
from ..functions.tokenize import term_frequencies
from .stats import document_frequencies


def corpus_idf(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(term, idf): the BM25 idf component over the corpus —
    ln(1 + (N - df + 0.5)/(df + 0.5)). One tokenize + two aggs."""
    tf = term_frequencies(docs, text_col=text_col)
    dfreq = document_frequencies(tf)
    n_docs = docs.count()
    return dfreq.select(
        "term",
        F.log(
            F.lit(1.0)
            + (F.lit(float(n_docs)) - F.col("df") + 0.5)
            / (F.col("df") + 0.5)
        ).alias("idf"),
    )


def extractive_summaries(
    units: DataFrame,
    idf: DataFrame,
    text_col: str = "text",
    id_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """One row per unit that has ≥1 sentence:
    (*id_cols, summary, score, sent_idx) — the argmax sentence by
    (rounded idf-sum DESC, sentence index ASC).

    ``units`` is any frame with id columns + a text column (whole
    documents, or node substrings); ``idf`` comes from corpus_idf
    over the FULL corpus so node scores are comparable globally.
    Scores round to 6dp BEFORE ranking so the DuckDB twin ranks
    identically."""
    ids = list(id_cols)
    sents = units.select(
        *ids,
        F.posexplode(sentence_split(F.col(text_col))).alias(
            "sent_idx", "sentence"
        ),
    )
    # Sentence TEXT stays out of the scoring path: term rows key on
    # (ids, sent_idx) only — carrying the full sentence string on
    # every term row (and in the group key) would multiply the
    # scoring shuffle by avg sentence length. Only the one winning
    # sentence per unit is fetched back, by (ids, sent_idx) join.
    terms = sents.select(
        *ids,
        "sent_idx",
        F.explode(
            F.split(F.lower(F.col("sentence")), TOKEN_SPLIT_RE)
        ).alias("term"),
    ).filter(F.col("term") != "")
    distinct_terms = terms.dropDuplicates(ids + ["sent_idx", "term"])
    # term-sorted sequential sum (same device as the BM25 scorers):
    # float addition isn't associative, so an unordered SUM can differ
    # from the DuckDB twin in the last ulp and flip a 6dp rounding —
    # both engines sum idfs in term order instead.
    scored = (
        distinct_terms.join(idf, "term", "left")
        .groupBy(*ids, "sent_idx")
        .agg(
            F.round(
                F.aggregate(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col("term"),
                                F.coalesce("idf", F.lit(0.0)).alias("idf"),
                            )
                        )
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x["idf"],
                ),
                6,
            ).alias("score")
        )
    )
    w = Window.partitionBy(*ids).orderBy(
        F.desc("score"), F.asc("sent_idx")
    )
    best = (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(*ids, "score", "sent_idx")
    )
    return best.join(sents, ids + ["sent_idx"]).select(
        *ids,
        F.col("sentence").alias("summary"),
        "score",
        "sent_idx",
    )


def extractive_node_summaries(
    nodes: DataFrame,
    docs: DataFrame,
    text_col: str = "content",
    idf: DataFrame | None = None,
) -> DataFrame:
    """nodes + ``summary`` column: the node span's top-idf sentence,
    falling back to the node title for sentence-less spans (empty
    preambles, pure headings) — every node keeps a row."""
    if idf is None:
        idf = corpus_idf(docs, text_col=text_col)
    spans = nodes.join(docs.select("doc_id", text_col), "doc_id").select(
        "doc_id",
        "node_id",
        F.expr(
            f"substring({text_col}, cast(start_char + 1 as int), "
            "cast(end_char - start_char as int))"
        ).alias("node_text"),
    )
    best = extractive_summaries(
        spans, idf, text_col="node_text", id_cols=("doc_id", "node_id")
    ).select("doc_id", "node_id", F.col("summary").alias("_summary"))
    return nodes.join(best, ["doc_id", "node_id"], "left").withColumn(
        "summary", F.coalesce("_summary", F.col("title"))
    ).drop("_summary")
