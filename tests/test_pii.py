"""PII detection/redaction — crafted-document oracles (the synthetic
corpus carries no PII, so the gate entry injects deterministic PII in
both twins; the real match/redact behavior is pinned here)."""

from __future__ import annotations

from documentindex_spark.functions.pii import pii_features, redact_pii


def _rows(df):
    return {r["doc_id"]: r.asDict() for r in df.collect()}


def test_counts_per_family(spark):
    docs = spark.createDataFrame(
        [
            (0, "mail a.b+c@ex-ample.co.uk and d@e.io today"),
            (1, "host 10.0.255.7 then 192.168.1.1:8080"),
            (2, "ssn 123-45-6789 phone 555-867-5309 alt 555.867.5309"),
            (3, "card 4111 1111 1111 1111 or 4111-1111-1111-1111"),
            (4, "nothing personal here at all"),
        ],
        ["doc_id", "text"],
    )
    out = _rows(pii_features(docs))
    assert out[0]["n_email"] == 2 and out[0]["has_pii"]
    assert out[1]["n_ipv4"] == 2
    assert out[2]["n_ssn"] == 1
    assert out[2]["n_phone"] == 2
    assert out[2]["n_email"] == 0
    assert out[3]["n_card"] == 2
    assert out[4]["has_pii"] is False
    assert all(out[4][k] == 0 for k in
               ("n_email", "n_ipv4", "n_ssn", "n_phone", "n_card"))


def test_redaction_text(spark):
    docs = spark.createDataFrame(
        [
            (0, "write bob@example.com from 10.0.0.1 re 123-45-6789"),
            (1, "call 555-867-5309, card 4111 1111 1111 1111."),
        ],
        ["doc_id", "text"],
    )
    out = _rows(redact_pii(docs))
    assert out[0]["text_redacted"] == "write [EMAIL] from [IPV4] re [SSN]"
    assert out[1]["text_redacted"] == "call [PHONE], card [CARD]."


def test_ssn_phone_disjoint(spark):
    # group widths differ: an SSN never double-counts as a phone
    docs = spark.createDataFrame(
        [(0, "123-45-6789"), (1, "123-456-7890")], ["doc_id", "text"]
    )
    out = _rows(pii_features(docs))
    assert out[0]["n_ssn"] == 1 and out[0]["n_phone"] == 0
    assert out[1]["n_ssn"] == 0 and out[1]["n_phone"] == 1


def test_email_edge_not_ipv4(spark):
    # dotted-digit local/domain parts belong to the email match, and
    # a version string like 1.2.3.4 IS an ipv4 shape (documented FP)
    docs = spark.createDataFrame(
        [(0, "v1 user9@10best.com and release 1.2.3.4 notes")],
        ["doc_id", "text"],
    )
    out = _rows(pii_features(docs))
    assert out[0]["n_email"] == 1
    assert out[0]["n_ipv4"] == 1


def test_corpus_smoke_no_pii(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = pii_features(docs)
    assert out.filter("has_pii").count() == 0
    red = redact_pii(docs).join(docs, "doc_id")
    assert red.filter("text_redacted <> text").count() == 0
