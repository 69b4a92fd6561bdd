"""Corpus statistics — plain Spark aggregates, per the north rule
("document-frequency and length stats computed as Spark aggregates",
BASELINE.json:6).

Reference analog: `total_chunks` / `total_chars` list-ops
(/root/reference/src/documentindex/models.py:342-358) — the reference
has no BM25 and no df/avgdl; these are target-only (SURVEY.md §2.5).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class CorpusStats:
    n_docs: int
    avgdl: float


def corpus_stats(doc_lens: DataFrame) -> CorpusStats:
    """N and avgdl from the (doc_id, dl) table — one tiny aggregate.

    avgdl is computed as sum(dl)/N in float64 (not F.avg) so the
    numpy oracle and the DuckDB oracle can reproduce it exactly.
    """
    row = doc_lens.agg(
        F.count(F.lit(1)).alias("n"), F.sum("dl").alias("s")
    ).collect()[0]
    n = int(row["n"])
    return CorpusStats(n_docs=n, avgdl=float(row["s"]) / n if n else 0.0)


def document_frequencies(tf: DataFrame) -> DataFrame:
    """(term, df) from the (doc_id, term, tf) table.

    tf already has one row per (doc, term), so df = count(*) per term
    — a hash agg with map-side partial aggregation, no countDistinct.
    """
    return tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
