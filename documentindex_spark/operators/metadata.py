"""Per-document metadata extraction — regex-only, 100% built-ins.

Reference analog: /root/reference/src/documentindex/metadata.py
(`extract_sync` :157-209 — regex bank over the document, merged
field-wise with coalesce/union semantics :325-359). The reference
extracts SEC metadata (CIK, ticker, dates, revenue); the code-corpus
equivalents are imports, symbol names, line counts, comment ratios,
and filename hints — same operator: regexp_extract / _extract_all
projections, `F.coalesce` merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_IMPORT_RE = r"(?m)^import ([a-z_][a-z0-9_]*)"
_DEF_RE = r"(?m)^def ([A-Za-z_][\w]*)"
_CLASS_RE = r"(?m)^class ([A-Za-z_][\w]*)"
_COMMENT_RE = r"(?m)^\s*#"


def extract_code_metadata(
    files: DataFrame, text_col: str = "content"
) -> DataFrame:
    """(doc_id, n_lines, n_imports, imports, n_defs, n_classes,
    symbols, n_comment_lines, comment_ratio, header_module)."""
    c = F.col(text_col)
    imports = F.regexp_extract_all(c, F.lit(_IMPORT_RE), F.lit(1))
    defs = F.regexp_extract_all(c, F.lit(_DEF_RE), F.lit(1))
    classes = F.regexp_extract_all(c, F.lit(_CLASS_RE), F.lit(1))
    n_lines = F.size(F.split(c, "\n"))
    n_comments = F.size(F.regexp_extract_all(c, F.lit(_COMMENT_RE), F.lit(0)))
    return files.select(
        "doc_id",
        n_lines.alias("n_lines"),
        F.size(imports).alias("n_imports"),
        F.array_sort(F.array_distinct(imports)).alias("imports"),
        F.size(defs).alias("n_defs"),
        F.size(classes).alias("n_classes"),
        F.array_sort(
            F.array_distinct(F.concat(defs, classes))
        ).alias("symbols"),
        n_comments.alias("n_comment_lines"),
        F.round(n_comments / n_lines, 6).alias("comment_ratio"),
        # filename-hint parse (reference metadata.py:249-263 analog)
        F.regexp_extract(c, r"# module ([a-z_][a-z0-9_]*)", 1).alias(
            "header_module"
        ),
    )


def merge_metadata(primary: DataFrame, secondary: DataFrame) -> DataFrame:
    """Field-wise outer-join merge preferring non-null primary values;
    list fields unioned (reference metadata.py:325-359 semantics:
    coalesce per scalar, union per list)."""
    p = primary.alias("p")
    s = secondary.alias("s")
    joined = p.join(s, "doc_id", "full")
    out_cols = [F.col("doc_id")]
    for name in primary.columns:
        if name == "doc_id":
            continue
        pc, sc = F.col(f"p.{name}"), F.col(f"s.{name}")
        if name not in secondary.columns:
            out_cols.append(pc.alias(name))
        elif dict(primary.dtypes)[name].startswith("array"):
            out_cols.append(
                F.array_sort(
                    F.array_distinct(
                        F.concat(
                            F.coalesce(pc, F.array()), F.coalesce(sc, F.array())
                        )
                    )
                ).alias(name)
            )
        else:
            out_cols.append(F.coalesce(pc, sc).alias(name))
    return joined.select(*out_cols)
