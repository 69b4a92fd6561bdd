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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.scalar import fiscal_quarter, parse_date_multi

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


# Reference regex bank (metadata.py:39-55), applied with the
# reference's (?im) flags (metadata.py:217 uses IGNORECASE|MULTILINE).
# RE2-safe so the driver oracle reuses the identical strings.
METADATA_PATTERNS: dict[str, str] = {
    "cik": r"(?:CIK|Central Index Key)[:\s#]*(\d{10}|\d{7})",
    "ticker": r"(?:Trading Symbol|Ticker Symbol|Stock Symbol)[:\s]*([A-Z]{1,5})",
    "company_name": r"(?:Company Name|Registrant|REGISTRANT)[:\s]*([A-Z][A-Za-z0-9 ,.&]+?)(?:\n|FORM|$)",
    "filing_date": r"(?:Filed|Filing Date|Date Filed)[:\s]*(\w+ \d{1,2},? \d{4}|\d{4}-\d{2}-\d{2}|\d{1,2}/\d{1,2}/\d{4})",
    "period_end": r"(?:For the (?:fiscal )?(?:year|quarter|period) ended?|Period of Report)[:\s]*(\w+ \d{1,2},? \d{4}|\d{4}-\d{2}-\d{2})",
    "fiscal_year": r"(?:Fiscal Year|FY)\s*(?:End(?:ing|ed)?)?[:\s]*(\d{4})",
}

# Key financial numbers (metadata.py:47-55, :222-232) — raw matched
# strings, exactly like the reference's key_numbers dict values.
KEY_NUMBER_PATTERNS: dict[str, str] = {
    "revenue": r"(?:Total\s+)?(?:Net\s+)?Revenue[s]?[:\s]*\$?\s*([\d,\.]+)\s*(?:million|billion|M|B)?",
    "net_income": r"Net\s+Income[:\s]*\$?\s*([\d,\.]+)\s*(?:million|billion|M|B)?",
    "eps": r"(?:Diluted\s+)?(?:EPS|Earnings\s+[Pp]er\s+[Ss]hare)[:\s]*\$?\s*([\d\.]+)",
    "total_assets": r"Total\s+Assets[:\s]*\$?\s*([\d,\.]+)\s*(?:million|billion|M|B)?",
    "total_liabilities": r"Total\s+Liabilities[:\s]*\$?\s*([\d,\.]+)\s*(?:million|billion|M|B)?",
    "shareholders_equity": r"(?:Total\s+)?(?:Shareholders?'?|Stockholders?'?)\s+Equity[:\s]*\$?\s*([\d,\.]+)\s*(?:million|billion|M|B)?",
}

# key_people (reference metadata.py:292-341): LLM-extracted there
# ("key_people": ["CEO Name", "CFO Name"]); the deterministic analog
# is a title-anchored proper-name regex. Case-SENSITIVE (titles and
# names are cased tokens) and RE2-safe — the driver oracle runs the
# identical string through DuckDB regexp_extract_all.
KEY_PEOPLE_RE = (
    r"(?:Chief Executive Officer|Chief Financial Officer|"
    r"Chief Operating Officer|CEO|CFO|COO|Chairman|President)"
    r"[,:]?\s+([A-Z][a-z]+(?: [A-Z][a-z]*){1,2})"
)  # 2nd/3rd tokens may be bare initials ("John Q Smith")

# Filename hints (metadata.py:249-263): ticker from 'AAPL_10K_2024',
# fiscal year from '_2024_' / '-2024.' fragments — only when the
# content extraction came up empty (coalesce order matches).
FILENAME_TICKER_RE = r"^([A-Z]{1,5})[-_]"
FILENAME_YEAR_RE = r"[_-](\d{4})[._-]"


def _nonempty(c: Column) -> Column:
    """regexp_extract returns '' on miss → NULL (the reference
    returns None)."""
    return F.when(c != "", c)


def extract_document_metadata(
    files: DataFrame,
    text_col: str = "content",
    path_col: str | None = None,
    sample_chars: int = 20000,
) -> DataFrame:
    """The reference's ``MetadataExtractor.extract_sync``
    (metadata.py:157-209) as one built-in projection:

    (doc_id, company_name, ticker, cik, filing_date,
     period_end_date, fiscal_year, fiscal_quarter,
     revenue, net_income, eps, total_assets, total_liabilities,
     shareholders_equity, key_numbers map).

    Regexes run over the first ``sample_chars`` chars (the header
    area, metadata.py:33 sample_size); dates parse through the same
    9-format bank (functions.scalar.DATE_FORMATS ↔ reference
    DATE_FORMATS :58-68); fiscal_quarter derives from the period-end
    month (:123-133); filename hints fill ticker/fiscal_year only
    when content yielded nothing (:249-263).
    """
    sample = F.substring(F.col(text_col), 1, sample_chars)

    def rx(pat: str) -> Column:
        return _nonempty(F.regexp_extract(sample, f"(?im){pat}", 1))

    company = _nonempty(
        F.regexp_replace(
            F.trim(rx(METADATA_PATTERNS["company_name"])), r"[,.]+$", ""
        )
    )
    ticker = rx(METADATA_PATTERNS["ticker"])
    fy = rx(METADATA_PATTERNS["fiscal_year"]).cast("int")
    if path_col is not None:
        base = F.element_at(F.split(F.col(path_col), "/"), -1)
        ticker = F.coalesce(
            ticker, _nonempty(F.regexp_extract(base, FILENAME_TICKER_RE, 1))
        )
        fy = F.coalesce(
            fy,
            _nonempty(F.regexp_extract(base, FILENAME_YEAR_RE, 1)).cast(
                "int"
            ),
        )
    period_end = parse_date_multi(rx(METADATA_PATTERNS["period_end"]))
    knum_cols = {
        name: rx(pat) for name, pat in KEY_NUMBER_PATTERNS.items()
    }
    key_numbers = F.map_filter(
        F.create_map(
            *[
                x
                for name in KEY_NUMBER_PATTERNS
                for x in (F.lit(name), knum_cols[name])
            ]
        ),
        lambda _, v: v.isNotNull(),
    )
    return files.select(
        "doc_id",
        company.alias("company_name"),
        ticker.alias("ticker"),
        rx(METADATA_PATTERNS["cik"]).alias("cik"),
        parse_date_multi(rx(METADATA_PATTERNS["filing_date"])).alias(
            "filing_date"
        ),
        period_end.alias("period_end_date"),
        fy.alias("fiscal_year"),
        fiscal_quarter(period_end).alias("fiscal_quarter"),
        *[knum_cols[name].alias(name) for name in KEY_NUMBER_PATTERNS],
        key_numbers.alias("key_numbers"),
        # sorted+distinct, matching the reference's merge-time dedup
        # of the key_people list (metadata.py:337-341)
        F.array_sort(
            F.array_distinct(
                F.regexp_extract_all(sample, F.lit(KEY_PEOPLE_RE), 1)
            )
        ).alias("key_people"),
    )


def parse_json_metadata(
    df: DataFrame,
    json_col: str,
    schema: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Typed extraction from a JSON string column via ``from_json``
    (the reference parses JSON metadata out of LLM responses,
    metadata.py:300-322 — here it's a first-class column extractor
    for JSON-bearing corpora; malformed rows yield NULL fields, the
    reference's error path). ``schema`` is a DDL string, e.g.
    ``"lang string, n_chars bigint, tags array<string>"``."""
    return df.select(
        id_col, F.from_json(F.col(json_col), schema).alias("_m")
    ).select(id_col, "_m.*")


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
