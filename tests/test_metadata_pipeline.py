"""extract_document_metadata: the reference MetadataExtractor
.extract_sync analog (metadata.py:157-209) — regex bank, 9-format
date parsing, fiscal quarter inference, filename hints, key numbers
(mirrors reference tests/test_metadata.py fixtures)."""

from __future__ import annotations

import datetime

import pytest

from documentindex_spark.operators.metadata import (
    extract_document_metadata,
    merge_metadata,
)

HEADER_10K = """UNITED STATES SECURITIES AND EXCHANGE COMMISSION
Company Name: Example Tech Inc.
CIK: 0001234567
Trading Symbol: EXTI
Filed: March 15, 2024
For the fiscal year ended December 31, 2023
Fiscal Year: 2023
Total Revenue: $1,234.5 million
Net Income: $234 million
Diluted EPS: 3.21
"""

NO_CONTENT_HINTS = "plain body with nothing extractable at all"


@pytest.fixture(scope="module")
def extracted(spark):
    df = spark.createDataFrame(
        [
            (0, HEADER_10K, "docs/misc.txt"),
            (1, NO_CONTENT_HINTS, "AAPL_10K_2024.txt"),
        ],
        "doc_id long, content string, path string",
    )
    return {
        r["doc_id"]: r
        for r in extract_document_metadata(df, path_col="path").collect()
    }


def test_header_fields(extracted):
    r = extracted[0]
    assert r["company_name"] == "Example Tech Inc"  # trailing '.' stripped
    assert r["cik"] == "0001234567"
    assert r["ticker"] == "EXTI"  # content wins over filename
    assert r["filing_date"] == datetime.date(2024, 3, 15)
    assert r["period_end_date"] == datetime.date(2023, 12, 31)
    assert r["fiscal_year"] == 2023
    assert r["fiscal_quarter"] == 4  # December → Q4


def test_key_numbers(extracted):
    r = extracted[0]
    assert r["revenue"] == "1,234.5"
    assert r["net_income"] == "234"
    assert r["eps"] == "3.21"
    assert r["key_numbers"]["revenue"] == "1,234.5"
    assert "total_assets" not in r["key_numbers"]


def test_filename_hints_fill_gaps(extracted):
    r = extracted[1]
    assert r["ticker"] == "AAPL"
    assert r["fiscal_year"] == 2024
    assert r["company_name"] is None
    assert r["filing_date"] is None
    assert r["fiscal_quarter"] is None


def test_parse_json_metadata_typed_and_malformed(spark):
    from documentindex_spark.operators.metadata import parse_json_metadata

    df = spark.createDataFrame(
        [
            (0, '{"lang": "en", "n": 42, "tags": ["a", "b"]}'),
            (1, "not json at all"),
            (2, '{"lang": "fr"}'),  # missing fields → NULL
        ],
        "doc_id long, meta string",
    )
    got = {
        r["doc_id"]: (r["lang"], r["n"], r["tags"])
        for r in parse_json_metadata(
            df, "meta", "lang string, n bigint, tags array<string>"
        ).collect()
    }
    assert got[0] == ("en", 42, ["a", "b"])
    assert got[1] == (None, None, None)
    assert got[2] == ("fr", None, None)


def test_merge_prefers_primary_and_unions_lists(spark):
    p = spark.createDataFrame(
        [(0, "A", ["x"]), (1, None, ["y"])],
        "doc_id long, name string, tags array<string>",
    )
    s = spark.createDataFrame(
        [(0, "B", ["z"]), (1, "C", ["y", "w"])],
        "doc_id long, name string, tags array<string>",
    )
    got = {r["doc_id"]: r for r in merge_metadata(p, s).collect()}
    assert got[0]["name"] == "A" and got[0]["tags"] == ["x", "z"]
    assert got[1]["name"] == "C" and got[1]["tags"] == ["w", "y"]


def test_key_people_extraction_and_merge(spark):
    """Deterministic analog of the reference's LLM key_people list
    (metadata.py:292-341): title-anchored proper names, sorted +
    distinct; merge_metadata unions the lists."""
    from documentindex_spark.operators.metadata import (
        extract_document_metadata,
        merge_metadata,
    )

    rows = [
        (0, "CEO Jane Doe\nChief Financial Officer: John Q Smith\n"
            "President Jane Doe\nVice President nobody lowercase"),
        (1, "no people here"),
        (2, "Chairman Ada Lovelace, CFO Alan Turing"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, content string")
    md = extract_document_metadata(df)
    got = {r["doc_id"]: list(r["key_people"]) for r in md.collect()}
    assert got[0] == ["Jane Doe", "John Q Smith"]  # distinct + sorted
    assert got[1] == []
    assert got[2] == ["Ada Lovelace", "Alan Turing"]
    # merge unions lists (reference merge semantics)
    other = spark.createDataFrame(
        [(0, ["Jane Doe", "Zed Zane"]), (1, ["Solo Person"])],
        "doc_id long, key_people array<string>",
    )
    merged = merge_metadata(md.select("doc_id", "key_people"), other)
    m = {r["doc_id"]: list(r["key_people"]) for r in merged.collect()}
    assert m[0] == ["Jane Doe", "John Q Smith", "Zed Zane"]
    assert m[1] == ["Solo Person"]
    assert m[2] == ["Ada Lovelace", "Alan Turing"]
