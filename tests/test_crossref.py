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


DOC_C = """Overview paragraph, see Appendix A for schema details.
Costs are described in Item 1A. As shown in Table 4.2 the cache
hit rate rises; see Figure 7 for the curve. Refer to Note 15 for
revenue policy, refer to Exhibit 10.1 for the contract, in Part II
we cover ops, see page 42, refer to section 3.2 for the protocol.
"""


def _nodes_c(spark, titles):
    """One doc, given node titles; every node carries DOC_C's text so
    each family's pattern fires."""
    rows = [(0, str(i), t, DOC_C) for i, t in enumerate(titles)]
    return spark.createDataFrame(
        rows, "doc_id long, node_id string, title string, text string"
    )


def test_detect_all_reference_families(spark):
    """All 10 reference families detect (cross_ref.py:36-70 analog;
    reference tests/test_cross_ref.py detection block)."""
    nodes = _nodes_c(spark, ["root"])
    got = {
        (e["ref_type"], e["ref_id"])
        for e in detect_references(nodes).collect()
    }
    assert {
        ("appendix", "A"),
        ("item", "1A"),
        ("table", "4.2"),
        ("figure", "7"),
        ("note", "15"),
        ("exhibit", "10.1"),
        ("part", "II"),
        ("page", "42"),
        ("section", "3.2"),
    } <= got


def test_exact_structural_resolution_doc_local(spark):
    nodes = _nodes_c(
        spark,
        ["Appendix A - schemas", "Table 4.2 cache", "Section 3.2 protocol"],
    )
    res = {
        (r["ref_type"], r["ref_id"]): r
        for r in resolve_references(detect_references(nodes), nodes).collect()
    }
    assert res[("appendix", "A")]["resolved"]
    assert res[("appendix", "A")]["dst_node_id"] == "0"
    assert res[("table", "4.2")]["dst_node_id"] == "1"
    assert res[("section", "3.2")]["dst_node_id"] == "2"
    assert not res[("page", "42")]["resolved"]  # nothing titles a page


def test_fuzzy_note_prefix_resolution(spark):
    """'refer to Note 15' must match a node titled
    '15. Revenue Recognition' — the reference's documented special
    case (cross_ref.py:265-268)."""
    nodes = _nodes_c(spark, ["15. Revenue Recognition", "intro"])
    res = {
        (r["ref_type"], r["ref_id"]): r
        for r in resolve_references(detect_references(nodes), nodes).collect()
    }
    note = res[("note", "15")]
    assert note["resolved"] and note["dst_node_id"] == "0"


def test_fuzzy_contains_resolution(spark):
    """'see Appendix A' matches 'APPENDIX A - Financial Tables' even
    though the exact (type, id) key also fires; and 'Item 1A' matches
    a title that merely CONTAINS 'item ... 1a' (fuzzy contains pass,
    cross_ref.py:252-284)."""
    nodes = _nodes_c(spark, ["Details for item 1A risk factors"])
    res = {
        (r["ref_type"], r["ref_id"]): r
        for r in resolve_references(detect_references(nodes), nodes).collect()
    }
    item = res[("item", "1A")]
    assert item["resolved"] and item["dst_node_id"] == "0"


def test_fuzzy_pick_is_deterministic(spark):
    """Two equally-matching titles → min node_id wins, every run."""
    nodes = _nodes_c(
        spark, ["note 15 policy copy B", "note 15 policy copy A"]
    )
    res = {
        (r["ref_type"], r["ref_id"]): r["dst_node_id"]
        for r in resolve_references(detect_references(nodes), nodes).collect()
    }
    assert res[("note", "15")] == "0"


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
