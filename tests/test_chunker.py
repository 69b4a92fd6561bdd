"""Chunker invariants (mirrors reference tests/test_chunker.py:80-163
contract) + node hierarchy shape (test_indexer.py:104-132 analog)."""

from __future__ import annotations

from documentindex_spark.operators.chunker import (
    build_nodes,
    chunk_documents,
    leaf_nodes,
)

SECTIONED = """# module demo
## section 1.1 intro
    some words here in the preamble of the module
def alpha(arg):
    alpha body words one two three
class Beta:
    beta body words four five six
def gamma(arg):
    gamma body words seven eight nine
"""


def _df(spark, text, lang="python"):
    return spark.createDataFrame(
        [(0, text, lang)], "doc_id long, content string, lang string"
    )


def test_offsets_slice_back_to_text(spark, repo_files_small):
    """content[start:end] == chunk text for EVERY chunk — the
    reference's core chunker invariant."""
    sample = repo_files_small.limit(30)
    chunks = chunk_documents(sample).collect()
    originals = {
        r["doc_id"]: r["content"]
        for r in sample.select("doc_id", "content").collect()
    }
    assert len(chunks) > 30
    for c in chunks:
        src = originals[c["doc_id"]]
        assert src[c["start_char"] : c["end_char"]] == c["text"]


def test_chunks_cover_document(spark):
    rows = sorted(
        chunk_documents(_df(spark, SECTIONED)).collect(),
        key=lambda r: r["chunk_index"],
    )
    assert rows[0]["start_char"] == 0
    assert rows[-1]["end_char"] == len(SECTIONED)
    for a, b in zip(rows, rows[1:]):
        assert b["start_char"] <= a["end_char"]  # no gaps


def test_section_titles_and_levels(spark):
    rows = chunk_documents(_df(spark, SECTIONED)).collect()
    titles = {(r["section_title"], r["section_level"]) for r in rows}
    assert ("alpha", 2) in titles
    assert ("Beta", 1) in titles
    assert ("section 1.1 intro", 1) in titles


def test_node_hierarchy(spark):
    nodes = {r["node_id"]: r for r in build_nodes(_df(spark, SECTIONED)).collect()}
    by_title = {r["title"]: r for r in nodes.values()}
    # defs (level 2) nest under the nearest level-1 section
    assert by_title["alpha"]["parent_id"] == by_title["section 1.1 intro"]["node_id"]
    # level-1 nodes nest under the level-0 preamble (document root);
    # sibling level-1 sections do NOT nest under each other
    preamble = by_title["<preamble>"]["node_id"]
    assert by_title["Beta"]["parent_id"] == preamble
    assert by_title["section 1.1 intro"]["parent_id"] == preamble
    assert by_title["gamma"]["parent_id"] == by_title["Beta"]["node_id"]
    # spans nest inside parents
    for n in nodes.values():
        if n["parent_id"] is not None:
            p = nodes[n["parent_id"]]
            assert p["start_char"] <= n["start_char"]


def test_leaf_nodes(spark):
    ndf = build_nodes(_df(spark, SECTIONED))
    leaves = {r["title"] for r in leaf_nodes(ndf).collect()}
    assert "alpha" in leaves and "gamma" in leaves
    assert "Beta" not in leaves  # has child gamma


def test_long_section_splits_with_overlap(spark):
    body = "\n".join(f"line {i} " + "word " * 30 for i in range(400))
    text = f"def big(arg):\n{body}\n"
    rows = sorted(
        chunk_documents(_df(spark, text)).collect(),
        key=lambda r: r["chunk_index"],
    )
    assert len(rows) > 1
    for r in rows:
        assert r["end_char"] - r["start_char"] <= 4000
    for a, b in zip(rows, rows[1:]):
        assert b["start_char"] < a["end_char"]  # overlap
    assert text[rows[0]["start_char"] : rows[0]["end_char"]] == rows[0]["text"]


def test_doc_type_aware_section_patterns(spark):
    """Doc-type pattern selection (reference get_section_patterns,
    detector.py:258-311): a config file sections on [headers], SQL on
    CREATE statements, and the markdown common fallback fires inside
    any type; legacy lang behavior is untouched when no doc_type_col
    is given."""
    from documentindex_spark.operators.chunker import build_nodes

    cfg = "[core]\nname = x\n[log.sink]\nlevel = info\n"
    sql = "CREATE TABLE t1 (a INT);\nSELECT 1;\nCREATE VIEW v2 AS SELECT 1;\n"
    mixed = "# Overview\nprose here\n[section1]\nk = v\n"
    df = spark.createDataFrame(
        [
            (0, cfg, "txt", "config"),
            (1, sql, "txt", "sql"),
            (2, mixed, "txt", "config"),
        ],
        "doc_id long, content string, lang string, doc_type string",
    )
    nodes = build_nodes(df, doc_type_col="doc_type").collect()
    titles = {}
    for r in nodes:
        titles.setdefault(r["doc_id"], []).append(r["title"])
    assert titles[0] == ["core", "log.sink"]
    assert titles[1] == ["t1", "v2"]  # CREATE on line 1 → no preamble
    # markdown common fallback + the type's own pattern in one doc
    assert titles[2] == ["Overview", "section1"]
    # legacy path (no doc_type_col): config text has no code headers
    legacy = build_nodes(df).collect()
    legacy_titles = [r["title"] for r in legacy if r["doc_id"] == 0]
    assert legacy_titles == ["<preamble>"]
