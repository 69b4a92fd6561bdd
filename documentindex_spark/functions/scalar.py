"""Scalar function bank — SURVEY.md §2.8 parity, plus the ordered
operators of §2.5/§2.6 (token-aware batch packing, structure-number
natural sort).

Everything here is built-in Spark expressions except roman-numeral
conversion (tiny pandas UDF — no builtin exists; reference
utils.py:169-224).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ------------------------------------------------------------- strings


def truncate_middle(text: Column, max_chars: int) -> Column:
    """Keep head+tail halves around a budget (reference
    utils.py:45-60, indexer.py:906-937 head-tail sampling)."""
    half = max_chars // 2
    return F.when(F.length(text) <= max_chars, text).otherwise(
        F.concat(
            F.substring(text, 1, half),
            F.lit(" ... "),
            F.substring(text, -half, half),
        )
    )


def normalize_whitespace(text: Column) -> Column:
    """Line-ending + whitespace normalization (chunker.py:158,
    utils.py:63-88)."""
    return F.trim(
        F.regexp_replace(
            F.regexp_replace(text, r"\r\n?", "\n"), r"[ \t]+", " "
        )
    )


def sentence_split(text: Column) -> Column:
    """array<string> of sentences (utils.py:91-104)."""
    return F.filter(
        F.split(text, r"(?<=[.!?])\s+"), lambda s: F.trim(s) != ""
    )


def highlight_terms(text: Column, terms: list[str]) -> Column:
    """Wrap term occurrences in ** ** (utils.py:340-356; cosmetic)."""
    pat = "(?i)(" + "|".join(terms) + ")"
    return F.regexp_replace(text, pat, r"**$1**")


def token_estimate(text: Column) -> Column:
    """len/4 token estimate (utils.py:227-239)."""
    return (F.length(text) / 4).cast("int")


def format_number_kmb(x: Column) -> Column:
    """1234567 → '1.2M' (utils.py:107-125; cosmetic)."""
    ax = F.abs(x)
    return (
        F.when(ax >= 1e9, F.concat(F.round(x / 1e9, 1).cast("string"), F.lit("B")))
        .when(ax >= 1e6, F.concat(F.round(x / 1e6, 1).cast("string"), F.lit("M")))
        .when(ax >= 1e3, F.concat(F.round(x / 1e3, 1).cast("string"), F.lit("K")))
        .otherwise(x.cast("string"))
    )


# ------------------------------------------------------------- dates

# The reference parses 9 date formats (metadata.py:60-70, utils.py:128-166)
DATE_FORMATS = [
    "yyyy-MM-dd", "MM/dd/yyyy", "MMMM d, yyyy", "MMM d, yyyy",
    "d MMMM yyyy", "yyyyMMdd", "MM-dd-yyyy", "yyyy/MM/dd", "dd.MM.yyyy",
]


def parse_date_multi(text: Column) -> Column:
    """coalesce(to_date(c, f) for f in formats) — first format wins."""
    candidates = [F.try_to_timestamp(text, F.lit(f)).cast("date") for f in DATE_FORMATS]
    return F.coalesce(*candidates)


def fiscal_quarter(d: Column) -> Column:
    """Calendar-quarter bucketing (metadata.py:127-137: months 1-3→Q1)."""
    return F.ceil(F.month(d) / 3).cast("int")


# ------------------------------------------------------------- jaccard


def jaccard_tokens(a: Column, b: Column) -> Column:
    """Word-overlap Jaccard of two token-array columns
    (utils.py:301-337 find_best_match core)."""
    return (
        F.size(F.array_intersect(a, b))
        / F.size(F.array_union(a, b))
    )


# ------------------------------------------------------------- roman

_ROMAN = {"i": 1, "v": 5, "x": 10, "l": 50, "c": 100, "d": 500, "m": 1000}


def _roman_to_int_py(s: str) -> int | None:
    s = (s or "").strip().lower()
    if not s or any(ch not in _ROMAN for ch in s):
        return None
    total = 0
    for i, ch in enumerate(s):
        v = _ROMAN[ch]
        if i + 1 < len(s) and _ROMAN[s[i + 1]] > v:
            total -= v
        else:
            total += v
    return total


@F.pandas_udf(T.IntegerType())
def roman_to_int(s: pd.Series) -> pd.Series:
    """'xiv' → 14; NULL for non-roman (utils.py:169-224)."""
    return s.map(_roman_to_int_py).astype("Int32")


# -------------------------------------------- structure natural sort


def structure_sort_key(structure: Column) -> Column:
    """Sortable key for hierarchical section numbers: '1.2.10' sorts
    after '1.2.9' (indexer.py:586-611 _structure_sort_key). Roman
    parts must be pre-converted (roman_to_int) — this handles the
    numeric-dotted form with zero-padded array elements."""
    return F.transform(
        F.split(structure, r"\."),
        lambda p: F.lpad(F.regexp_replace(p, r"[^0-9]", ""), 8, "0"),
    )


def sort_by_structure(df: DataFrame, col: str = "structure") -> DataFrame:
    return df.orderBy(structure_sort_key(F.col(col)))


# --------------------------------------- token-aware batch grouping


def pack_into_batches(
    df: DataFrame,
    order_cols: list[str],
    cost_col: str,
    budget: float,
    max_per_batch: int | None = None,
    partition_col: str | None = None,
) -> DataFrame:
    """Assign a ``batch_id`` so consecutive rows (in ``order_cols``
    order) pack toward ``budget`` total cost and ≤ max_per_batch
    rows — the reference's token-aware LLM batching
    (indexer.py:772-805, provenance.py:349-380) as a window
    cumulative sum.

    batch boundaries: floor((cumsum - cost) / budget) bucketing with
    an optional row-count sub-split. NOTE this closed form does NOT
    reset the accumulator at batch boundaries, so a batch's total can
    exceed ``budget`` by up to max(cost) − the caller should pad the
    budget accordingly (uniform costs 3000 with budget 5000 yield
    2-row batches of 6000). It is fully relational (one window, no
    Python) — the scale default. For the reference's exact
    never-exceed greedy semantics use ``exact=True``
    (``pack_into_batches_exact``): an applyInPandas pass, sequential
    per partition.
    """
    from pyspark.sql.window import Window

    # partition_col is the scale path: without it the cumsum window
    # is a single global sort task (fine for one bounded stream,
    # wrong for a corpus — always pass a partition key at scale).
    w = Window.orderBy(*order_cols)
    if partition_col:
        w = Window.partitionBy(partition_col).orderBy(*order_cols)
    csum = F.sum(cost_col).over(w.rowsBetween(Window.unboundedPreceding, 0))
    batch = F.floor((csum - F.col(cost_col)) / F.lit(budget))
    out = df.withColumn("batch_id", batch.cast("long"))
    if max_per_batch:
        w2 = (
            Window.partitionBy(
                *( [partition_col] if partition_col else [] ), "batch_id"
            ).orderBy(*order_cols)
        )
        out = out.withColumn(
            "batch_id",
            F.concat_ws(
                "_",
                F.col("batch_id"),
                F.floor(
                    (F.row_number().over(w2) - 1) / F.lit(max_per_batch)
                ),
            ),
        )
    return out


def pack_into_batches_exact(
    df: DataFrame,
    order_cols: list[str],
    cost_col: str,
    budget: float,
    max_per_batch: int | None = None,
    partition_col: str | None = None,
) -> DataFrame:
    """TRUE greedy packing (the reference's semantics: a batch NEVER
    exceeds ``budget`` unless a single row does, indexer.py:772-805).
    Sequential by nature → one applyInPandas pass per
    ``partition_col`` group (or a single group when None — use only
    when the stream fits one task; the relational
    ``pack_into_batches`` is the scale path)."""
    import pandas as pd
    from pyspark.sql import types as T

    out_fields = df.schema.fields + [
        T.StructField("batch_id", T.StringType())
    ]
    schema = T.StructType(out_fields)

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols, kind="mergesort")
        ids = []
        bid = 0
        acc = 0.0
        n = 0
        for cost in pdf[cost_col].tolist():
            over_budget = acc > 0 and acc + cost > budget
            over_count = max_per_batch is not None and n >= max_per_batch
            if over_budget or over_count:
                bid += 1
                acc = 0.0
                n = 0
            acc += float(cost)
            n += 1
            ids.append(str(bid))
        pdf = pdf.copy()
        pdf["batch_id"] = ids
        return pdf

    if partition_col:
        return df.groupBy(partition_col).applyInPandas(pack, schema)
    return df.coalesce(1).mapInPandas(
        lambda it: iter([pack(pd.concat(list(it)))]), schema
    )


# ----------------------------------------------- doc-type detection


# Pattern-vote classifier at reference parity: 12 pattern-bearing
# types + 'generic' fallback = 13 outcomes (reference models.py:25-39
# DocumentType), 44 voting regexes (reference detector.py:28-103 has
# 40+ across its banks). Code-corpus flavor: classify source kind.
# Every pattern is RE2-safe (no lookaround/backrefs) so the SAME
# string runs in Spark rlike (Java) and the auto-generated DuckDB
# oracle (regexp_matches).
DOC_TYPE_PATTERNS: dict[str, list[str]] = {
    "python": [
        r"(?m)^def \w+\(",
        r"(?m)^import \w+",
        r"(?m)^class \w+[:(]",
        r"(?m)^from \w+(\.\w+)* import ",
        r"(?m)^\s+return\b",
    ],
    "javascript": [
        r"(?m)^function \w+\(",
        r"\bconst \w+\s*=",
        r"=>\s*\{",
        r"(?m)^export (default |const |function )",
    ],
    "sql": [
        r"(?i)\bselect\b[\s\S]*\bfrom\b",
        r"(?im)^create (table|view|index)\b",
        r"(?i)\bgroup by\b",
        r"(?i)\binsert into\b",
    ],
    "shell": [
        r"(?m)^#!/bin/(ba)?sh",
        r"(?m)^\s*(fi|done|esac)\s*$",
        r"\$\{\w+\}",
        r"(?m)^(export |set -e)",
    ],
    "html": [
        r"(?i)<!DOCTYPE html",
        r"(?i)<html\b",
        r"(?i)<div\b",
        r"</\w+>",
    ],
    "json": [
        r"(?m)^\s*\{\s*$",
        r"\"[a-z_]+\"\s*:\s*(\"|\d|\[|\{)",
        r"(?m)^\s*\],?\s*$",
    ],
    "yaml": [
        r"(?m)^---\s*$",
        r"(?m)^[a-z_]+:\s*$",
        r"(?m)^\s+- \w+",
    ],
    "markdown": [
        r"(?m)^#{1,6} ",
        r"\[.+\]\(.+\)",
        r"(?m)^[-*] ",
        r"(?m)^```",
    ],
    "config": [
        r"(?m)^\[\w+(\.\w+)*\]\s*$",
        r"(?m)^\w+\s*[:=]\s*\S+",
        r"(?m)^[;#] ",
    ],
    "log": [
        r"(?m)^\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}",
        r"(?i)\b(error|warning|fatal)\b",
        r"Traceback \(most recent call last\)",
        r"(?m)^\tat \w+",
    ],
    "rst": [
        r"(?m)^={3,}\s*$",
        r"(?m)^\.\. \w+::",
        r"(?m)^:param \w+:",
    ],
    "prose": [
        r"[.!?]\s+[A-Z]",
        r"\b(the|and|of)\b",
        r"(?m)^[A-Z][a-z]+ [a-z]+ [a-z]+",
    ],
}

# Filename hints: extension / name fragment → type, checked BEFORE
# content voting exactly like the reference's filename branch
# (detector.py:127-149). First match wins, ordered most-specific
# first.
DOC_TYPE_FILENAME_HINTS: list[tuple[str, str]] = [
    (r"\.py$", "python"),
    (r"\.(js|jsx|ts|tsx|mjs)$", "javascript"),
    (r"\.sql$", "sql"),
    (r"\.(sh|bash)$", "shell"),
    (r"\.(html|htm)$", "html"),
    (r"\.json$", "json"),
    (r"\.(yaml|yml)$", "yaml"),
    (r"\.(md|markdown)$", "markdown"),
    (r"\.(ini|cfg|toml|conf)$", "config"),
    (r"\.log$", "log"),
    (r"\.rst$", "rst"),
    (r"\.txt$", "prose"),
]


def detect_doc_type(
    df: DataFrame,
    text_col: str = "content",
    path_col: str | None = None,
) -> DataFrame:
    """(doc_id, votes_<type>..., doc_type, confidence) — sum of
    pattern hits per type; argmax with min-votes=2 else 'generic';
    confidence = min(1, votes/k) like detector.py:158-187.

    ``path_col``: when given, filename hints override the content
    vote (reference detector.py:127-149 checks the filename first);
    hinted docs get confidence 1.0. Ties between types at equal votes
    break by type name ascending (deterministic)."""
    cols = [df["doc_id"]]
    for t in sorted(DOC_TYPE_PATTERNS):
        votes = None
        for p in DOC_TYPE_PATTERNS[t]:
            hit = F.when(F.col(text_col).rlike(p), 1).otherwise(0)
            votes = hit if votes is None else votes + hit
        cols.append(votes.alias(f"votes_{t}"))
    if path_col is not None:
        hint = F.lit(None).cast("string")
        for pat, t in reversed(DOC_TYPE_FILENAME_HINTS):
            hint = F.when(
                F.lower(F.col(path_col)).rlike(pat), F.lit(t)
            ).otherwise(hint)
        cols.append(hint.alias("_hint"))
    scored = df.select(*cols)
    types = sorted(DOC_TYPE_PATTERNS)
    best = F.greatest(*[F.col(f"votes_{t}") for t in types])
    pred = F.lit("generic")
    for t in reversed(types):
        pred = F.when(
            (F.col(f"votes_{t}") == best) & (best >= 2), F.lit(t)
        ).otherwise(pred)
    k = F.lit(3.0)
    conf = F.round(F.least(F.lit(1.0), best / k), 6)
    if path_col is not None:
        pred = F.coalesce(F.col("_hint"), pred)
        conf = F.when(F.col("_hint").isNotNull(), F.lit(1.0)).otherwise(conf)
        return (
            scored.withColumn("doc_type", pred)
            .withColumn("confidence", conf)
            .drop("_hint")
        )
    return scored.withColumn("doc_type", pred).withColumn(
        "confidence", conf
    )
