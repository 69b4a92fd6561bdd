"""Tokenization — the engine's one frozen analyzer.

The hot path is 100% Spark built-ins (``lower`` → ``split`` →
``explode``), i.e. JVM-side inside WholeStageCodegen — no Python in
the per-token loop. A code-aware variant (camelCase / snake_case
splitting) is provided as a vectorized pandas UDF for the parity
layer, but the frozen default stays SQL-expressible so the DuckDB
oracle can reproduce it bit-for-bit.

Reference analog: token estimation & sentence splitting
(/root/reference/src/documentindex/chunker.py:424-439,
utils.py:227-263). The reference never builds a term index; we do,
per the north rule.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..constants import TOKEN_SPLIT_RE


def tokens_col(text: Column) -> Column:
    """array<string> of tokens for one text column (frozen analyzer).

    NOTE: uses a higher-order array filter, which Spark interprets
    per-element (no codegen) — fine for small arrays / tests, but the
    hot paths below use explode + a relational WHERE instead, which
    measured 3.6× faster at 15M tokens."""
    return F.filter(
        F.split(F.lower(text), TOKEN_SPLIT_RE), lambda t: t != F.lit("")
    )


def tokenize(
    df: DataFrame, text_col: str = "content", id_col: str = "doc_id"
) -> DataFrame:
    """(id_col, term, pos) — one row per token occurrence.

    ``pos`` is the ordinal in the raw split array (empty-string
    artifacts occur only at document start, so positions are
    contiguous except possibly the first); recompute with row_number
    if gap-free ordinals are needed. All built-ins: split → posexplode
    → WHERE (codegen'd; measured 3.6× faster than array-filter)."""
    return (
        df.select(
            id_col,
            F.posexplode(F.split(F.lower(F.col(text_col)), TOKEN_SPLIT_RE))
            .alias("pos", "term"),
        )
        .where(F.col("term") != "")
    )


def term_frequencies(
    df: DataFrame, text_col: str = "content", id_col: str = "doc_id"
) -> DataFrame:
    """(id_col, term, tf) — partial+final hash agg, map-side combined."""
    return (
        df.select(
            id_col,
            F.explode(F.split(F.lower(F.col(text_col)), TOKEN_SPLIT_RE))
            .alias("term"),
        )
        .where(F.col("term") != "")
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def doc_lengths(
    df: DataFrame, text_col: str = "content", id_col: str = "doc_id"
) -> DataFrame:
    """(id_col, dl) — token count per document; zero-token docs kept
    with dl=0 (N and avgdl count every document)."""
    counts = (
        df.select(
            id_col,
            F.explode(F.split(F.lower(F.col(text_col)), TOKEN_SPLIT_RE))
            .alias("term"),
        )
        .where(F.col("term") != "")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("dl"))
    )
    return df.select(id_col).join(counts, id_col, "left").select(
        id_col, F.coalesce(F.col("dl"), F.lit(0)).cast("long").alias("dl")
    )


def term_frequencies_colocated(
    df: DataFrame,
    text_col: str = "content",
    id_col: str = "doc_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """(id_col, term, tf) with the exchange moved BELOW the explode.

    The naive plan (term_frequencies) shuffles the partially-aggregated
    TF table on (doc_id, term) — at 80k files that is 39.6M rows, ~5×
    the corpus's content bytes. But hash-repartitioning the DOCUMENTS
    by doc_id first makes ``HashPartitioning(doc_id)`` satisfy the
    aggregation's ``ClusteredDistribution(doc_id, term)`` (partitioning
    keys ⊆ grouping keys), so Catalyst plans NO second exchange: the
    partial and final hash aggregates run back-to-back in the same
    post-shuffle stage, and the only exchange moves content bytes.

    Measured (tools/bench_tf.py, 80k files, local[8], 3 interleaved
    reps): 17.9s median vs 40.1s for the naive plan and 37.3s for a
    zero-exchange mapInPandas Counter — every rep beat every rep of
    both alternatives (BENCH/tf_ab.json). On a network-shuffle cluster
    the same ordering holds a fortiori for corpora whose token mass
    exceeds content bytes; term_frequencies_mapside remains the
    zero-exchange fallback for shuffle-hostile topologies.

    Row-identical to term_frequencies for ANY input (even duplicate
    id rows: co-location makes the in-stage aggregation global per
    key) — asserted in tests/test_tokenize_mapside.py.
    """
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = max(
            df.rdd.getNumPartitions(),
            int(spark.conf.get("spark.sql.shuffle.partitions")),
        )
    return (
        df.repartition(num_partitions, id_col)
        .select(
            id_col,
            F.explode(F.split(F.lower(F.col(text_col)), TOKEN_SPLIT_RE))
            .alias("term"),
        )
        .where(F.col("term") != "")
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def doc_token_counts(
    df: DataFrame, text_col: str = "content", id_col: str = "doc_id"
) -> DataFrame:
    """(id_col, dl) in ONE narrow pass over the documents — no explode,
    no shuffle, no join.

    dl = Σ tf per doc = the number of maximal [a-z0-9]+ runs in the
    lowered text (nonempty split segments ≡ token-char runs), so
    ``regexp_count`` computes it per row; zero-token docs get 0
    directly (the left join doc_lengths needs is gone). Lowering stays
    first for the same reason tokenize lowers first: characters like
    U+212A (Kelvin) only become token chars after lower().
    Row-identical to doc_lengths (tests/test_tokenize_mapside.py).
    """
    return df.select(
        id_col,
        F.regexp_count(F.lower(F.col(text_col)), F.lit("[a-z0-9]+"))
        .cast("long")
        .alias("dl"),
    )


def term_frequencies_mapside(
    df: DataFrame, text_col: str = "content", id_col: str = "doc_id"
) -> DataFrame:
    """(id_col, term, tf) with ZERO exchange — map-side-complete TF.

    Every token of a document lives in that document's single input
    row, so the (doc_id, term) aggregation keys NEVER span input
    partitions and the explode→hashAgg plan's exchange moves the
    fully-aggregated TF table once for a final agg that merges
    nothing. This variant computes the same counts per Arrow batch
    (re.split + collections.Counter) and emits final rows directly —
    no exchange, no 15M-row Generate, one narrow stage.

    Identity with the frozen analyzer is structural, not approximate:
    lower-casing stays JVM-side (F.lower — byte-identical to the
    explode path), and TOKEN_SPLIT_RE is a negated-ASCII class, so
    Java regex / Python re / RE2 agree on every codepoint (any
    non-[a-z0-9] unit is a separator in all three; surrogate-pair vs
    codepoint iteration differences collapse inside separator runs).
    Asserted row-identical to term_frequencies in
    tests/test_tokenize_mapside.py.
    """
    lowered = df.select(id_col, F.lower(F.col(text_col)).alias("_lc"))
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("term", T.StringType()),
            T.StructField("tf", T.LongType()),
        ]
    )
    split = re.compile(TOKEN_SPLIT_RE)

    def _tf_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from collections import Counter

        for pdf in it:
            ids: list[int] = []
            terms: list[str] = []
            tfs: list[int] = []
            for did, txt in zip(pdf[id_col].values, pdf["_lc"].values):
                c = Counter(split.split(txt or ""))
                c.pop("", None)  # split artifacts at string edges
                if c:
                    ids.extend([did] * len(c))
                    terms.extend(c.keys())
                    tfs.extend(c.values())
            yield pd.DataFrame({id_col: ids, "term": terms, "tf": tfs})

    return lowered.mapInPandas(_tf_batches, out_schema)


# ---- code-aware variant (parity layer; NOT the frozen analyzer) ----

_CAMEL = re.compile(r"(?<=[a-z0-9])(?=[A-Z])")
_SPLIT = re.compile(TOKEN_SPLIT_RE)


@F.pandas_udf(T.ArrayType(T.StringType()))
def code_tokens_udf(texts: Iterator[pd.Series]) -> Iterator[pd.Series]:
    """camelCase/snake_case-aware tokens; vectorized per Arrow batch."""
    for s in texts:
        yield s.map(
            lambda t: [
                w
                for w in _SPLIT.split(_CAMEL.sub(" ", t or "").lower())
                if w
            ]
        )


def query_terms(query: str) -> list[str]:
    """Frozen query analyzer: same tokenizer, DE-DUPed, sorted asc.

    Sorted ascending so per-doc impact summation order is fixed
    (fp determinism, SURVEY.md §4.2.4)."""
    toks = [t for t in re.split(TOKEN_SPLIT_RE, query.lower()) if t]
    return sorted(set(toks))
