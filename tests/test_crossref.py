"""Cross-ref detect / resolve / reverse-adjacency / 1-hop expansion
(reference tests/test_cross_ref.py:21-358 analog)."""

from __future__ import annotations

from pyspark.sql import functions as F

from documentindex_spark.operators.chunker import build_nodes
from documentindex_spark.operators.crossref import (
    detect_references,
    expand_matches,
    referencing_nodes,
    resolve_references,
)

DOC_A = """# module alpha_mod
see module beta_helper
refer to section 2.1
import gamma_util
## section 1.1 intro
    intro words, see module beta_helper
## section 2.1 details
    detail words
"""

DOC_B = """# module beta_mod
def beta_helper(arg):
    helper body
"""


def _nodes(spark):
    df = spark.createDataFrame(
        [(0, DOC_A, "python"), (1, DOC_B, "python")],
        "doc_id long, content string, lang string",
    )
    nodes = build_nodes(df)
    # attach node text for detection (slice from original)
    texts = df.selectExpr("doc_id", "content")
    return nodes.join(texts, "doc_id").withColumn(
        "text",
        F.expr("substring(content, start_char + 1, end_char - start_char)"),
    ).drop("content")


def test_detect_and_dedup(spark):
    edges = detect_references(_nodes(spark)).collect()
    got = {(e["doc_id"], e["ref_type"], e["ref_id"]) for e in edges}
    assert (0, "module", "beta_helper") in got
    assert (0, "section", "2.1") in got
    assert (0, "import", "gamma_util") in got
    # 'see module beta_helper' appears twice in doc 0 but in different
    # nodes — dedup is per (doc, node, type, target) like the reference
    mods = [e for e in edges if e["ref_type"] == "module"]
    assert len(mods) == len({(e["src_node_id"]) for e in mods})


def test_resolution(spark):
    nodes = _nodes(spark)
    resolved = resolve_references(detect_references(nodes), nodes).collect()
    by_key = {(r["ref_type"], r["ref_id"]): r for r in resolved}
    sec = by_key[("section", "2.1")]
    assert sec["resolved"] and sec["dst_doc_id"] == 0
    mod = by_key[("module", "beta_helper")]
    assert mod["resolved"] and mod["dst_doc_id"] == 1  # cross-document
    imp = by_key[("import", "gamma_util")]
    assert not imp["resolved"] and imp["dst_node_id"] is None


def test_reverse_adjacency(spark):
    nodes = _nodes(spark)
    rev = referencing_nodes(
        resolve_references(detect_references(nodes), nodes)
    ).collect()
    tgt = {(r["dst_doc_id"]): r["n_referencing"] for r in rev}
    assert tgt[1] >= 1  # beta_helper is referenced from doc 0


def test_one_hop_expansion(spark):
    nodes = _nodes(spark)
    edges = resolve_references(detect_references(nodes), nodes)
    matches = spark.createDataFrame([(0, 2.0)], "doc_id long, score double")
    scored_all = spark.createDataFrame(
        [(0, 2.0), (1, 0.9)], "doc_id long, score double"
    )
    out = {
        r["doc_id"]: r["score"]
        for r in expand_matches(matches, edges, scored_all, 0.5).collect()
    }
    assert out == {0: 2.0, 1: 0.9}  # doc 1 pulled in via the edge
    out2 = {
        r["doc_id"]
        for r in expand_matches(matches, edges, scored_all, 1.0).collect()
    }
    assert out2 == {0}  # threshold excludes the frontier
