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
