"""Format-agnostic corpus loading: parquet / JSONL / CSV / whole-file
text must all land on the same engine contract (text column +
content_sha), and an index built from each must be content-identical
for the same logical corpus."""

from __future__ import annotations

import json
import os

import pytest

from documentindex_spark.functions.tokenize import term_frequencies
from documentindex_spark.sources.registry import load_corpus

ROWS = [
    {"doc_id": 0, "content": "merge sort beats bubble sort"},
    {"doc_id": 1, "content": "hash join and sort merge join"},
    {"doc_id": 2, "content": "scan filter project"},
]


@pytest.fixture(scope="module")
def corpus_files(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("formats")
    df = spark.createDataFrame(
        [(r["doc_id"], r["content"]) for r in ROWS],
        "doc_id long, content string",
    )
    df.coalesce(1).write.parquet(str(base / "pq"))
    with open(base / "docs.jsonl", "w") as f:
        for r in ROWS:
            f.write(json.dumps(r) + "\n")
    with open(base / "docs.csv", "w") as f:
        f.write("doc_id,content\n")
        for r in ROWS:
            f.write(f"{r['doc_id']},\"{r['content']}\"\n")
    txt_dir = base / "txt"
    os.makedirs(txt_dir)
    for r in ROWS:
        with open(txt_dir / f"doc_{r['doc_id']}.txt", "w") as f:
            f.write(r["content"])
    return base


def _tf_set(df):
    id_col = "doc_id" if "doc_id" in df.columns else "path"
    out = term_frequencies(df, text_col="content", id_col=id_col)
    return sorted(
        (r["term"], r["tf"])
        for r in out.groupBy("term")
        .agg({"tf": "sum"})
        .withColumnRenamed("sum(tf)", "tf")
        .collect()
    )


def test_all_formats_same_corpus(spark, corpus_files):
    pq = load_corpus(spark, str(corpus_files / "pq"), "parquet")
    jl = load_corpus(spark, str(corpus_files / "docs.jsonl"), "jsonl")
    cs = load_corpus(spark, str(corpus_files / "docs.csv"), "csv")
    tx = load_corpus(spark, str(corpus_files / "txt"), "text")
    for df in (pq, jl, cs, tx):
        assert "content_sha" in df.columns
        assert df.count() == 3
    # identical token statistics from every format
    want = _tf_set(pq)
    assert _tf_set(jl) == want
    assert _tf_set(cs) == want
    assert _tf_set(tx) == want
    # identical content hashes (the per-row invariant column)
    shas = {
        tuple(sorted(r["content_sha"] for r in df.collect()))
        for df in (pq, jl, cs, tx)
    }
    assert len(shas) == 1


def test_text_mode_carries_path_identity(spark, corpus_files):
    tx = load_corpus(spark, str(corpus_files / "txt"), "text")
    paths = [r["path"] for r in tx.collect()]
    assert all(p.endswith(".txt") for p in paths)
    assert len(set(paths)) == 3


def test_unknown_format_and_missing_column(spark, corpus_files):
    with pytest.raises(ValueError, match="unsupported"):
        load_corpus(spark, str(corpus_files / "pq"), "orc2")
    with pytest.raises(ValueError, match="no 'body' column"):
        load_corpus(
            spark, str(corpus_files / "pq"), "parquet", text_col="body"
        )
