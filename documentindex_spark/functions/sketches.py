"""Bounded-memory approximate statistics — Spark's built-in sketches
wired for corpus-scale monitoring.

At 100 TB, exact `groupBy(term).count()` for a dashboard is a full
shuffle of the token mass; the sketch layer answers the same
questions in one map-side-mergeable pass with fixed memory per
partition:

- distinct terms:     DataSketches HLL (`hll_sketch_agg`) — merges
                      associatively, so partial aggregation applies;
- term frequencies:   Count-Min (`count_min_sketch`) — point lookups
                      with one-sided (over-)estimates;
- length quantiles:   `approx_percentile` (GK sketch).

All three are JVM built-ins (no UDFs anywhere); error bounds are the
published ones (HLL: ~1.04/√2^lgK rel. std. err.; CMS: ε=2/width
overcount at δ=1−(1/2)^depth) and are asserted against exact answers
in tests/test_sketches.py. Estimates are approximate by construction
⇒ no value-level DuckDB twin; the suite pins the bounds instead.

Reference analog: none (the reference holds its whole index in
memory); this is target-side scope — the monitoring face of the
training-data pipeline ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..constants import TOKEN_SPLIT_RE


def _terms(df: DataFrame, text_col: str) -> DataFrame:
    return df.select(
        F.explode(
            F.split(F.lower(F.col(text_col)), TOKEN_SPLIT_RE)
        ).alias("term")
    ).filter(F.col("term") != "")


def corpus_sketch_stats(
    df: DataFrame,
    text_col: str = "text",
    lg_k: int = 12,
    percentiles: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """ONE row: (n_docs, distinct_terms_est, total_tokens, dl_p50,
    dl_p90, dl_p99) — a single pass + single (partial-aggregated)
    reduction over the corpus; every aggregate is sketch- or
    counter-shaped, so partition results merge in fixed memory."""
    toks = df.select(
        "doc_id",
        F.size(
            F.filter(
                F.split(F.lower(F.col(text_col)), TOKEN_SPLIT_RE),
                lambda t: t != "",
            )
        ).alias("dl"),
    )
    pcols = [
        F.round(
            F.expr(f"approx_percentile(dl, {p})").cast("double"), 6
        ).alias(f"dl_p{int(p * 100)}")
        for p in percentiles
    ]
    base = toks.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("total_tokens"),
        *pcols,
    )
    distinct = _terms(df, text_col).agg(
        F.round(
            F.hll_sketch_estimate(
                F.hll_sketch_agg("term", F.lit(lg_k))
            ).cast("double"),
            1,
        ).alias("distinct_terms_est")
    )
    return base.crossJoin(distinct)


def term_count_sketch(
    df: DataFrame,
    text_col: str = "text",
    eps: float = 0.0001,
    confidence: float = 0.99,
    seed: int = 42,
) -> bytes:
    """Serialized Count-Min sketch over the corpus token stream —
    built by ONE aggregate (Spark's `count_min_sketch`), mergeable
    across batches. Query with ``cms_estimate_spark``."""
    row = _terms(df, text_col).agg(
        F.count_min_sketch(
            "term", F.lit(eps), F.lit(confidence), F.lit(seed)
        ).alias("cms")
    ).head()
    return bytes(row["cms"])


def cms_estimate_spark(spark, sketch: bytes, terms: list[str]) -> dict:
    """{term: estimated count} via the JVM CountMinSketch reader —
    the validated query path for ``term_count_sketch`` output."""
    jvm = spark._jvm
    bis = jvm.java.io.ByteArrayInputStream(bytearray(sketch))
    cms = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(bis)
    # plain java.lang.String: CountMinSketchImpl routes String items
    # through their UTF-8 bytes — the same hashing the SQL aggregate
    # applied to UTF8String columns
    return {t: int(cms.estimateCount(t)) for t in terms}


__all__ = [
    "corpus_sketch_stats",
    "term_count_sketch",
    "cms_estimate_spark",
]
