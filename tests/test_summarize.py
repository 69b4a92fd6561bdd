"""Extractive node summaries: scoring semantics, node-span wiring,
title fallback (the deterministic analog of the reference's
LLM-filled TreeNode.summary — models.py:138-240)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from documentindex_spark.operators.summarize import (
    corpus_idf,
    extractive_node_summaries,
    extractive_summaries,
)


def _corpus(spark):
    # 'zebra' appears in one doc (high idf); 'the'/'cat' everywhere
    rows = [
        (0, "The cat sat. The zebra watched quietly. The cat left."),
        (1, "The cat sat on the mat. A cat is a cat."),
        (2, "The cat ran. The cat and the cat sat."),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_top_idf_sentence_wins(spark):
    docs = _corpus(spark)
    idf = corpus_idf(docs, text_col="text")
    out = {
        r["doc_id"]: (r["summary"], r["sent_idx"])
        for r in extractive_summaries(docs, idf, text_col="text").collect()
    }
    # doc 0: the zebra sentence carries the rarest terms
    assert out[0] == ("The zebra watched quietly.", 1)
    # every doc gets exactly one summary row
    assert set(out) == {0, 1, 2}


def test_score_matches_hand_idf(spark):
    docs = _corpus(spark)
    idf = {r["term"]: r["idf"] for r in corpus_idf(docs).collect()}
    n = 3
    # hand idf for a term in 1 of 3 docs
    assert math.isclose(
        idf["zebra"], math.log(1 + (n - 1 + 0.5) / (1 + 0.5))
    )
    got = {
        r["doc_id"]: r["score"]
        for r in extractive_summaries(
            docs, corpus_idf(docs), text_col="text"
        ).collect()
    }
    want0 = round(
        sum(sorted(idf[t] for t in ("the", "zebra", "watched", "quietly"))),
        6,
    )
    assert got[0] == want0


def test_node_summaries_and_title_fallback(spark):
    content = (
        "Introduction\n\n"
        "The cat sat. The zebra watched quietly.\n\n"
        "Conclusion\n\nThe cat left. All cats sat."
    )
    docs = spark.createDataFrame(
        [(0, content, "en")], "doc_id long, content string, lang string"
    )
    from documentindex_spark.operators.chunker import build_nodes

    nodes = build_nodes(docs)
    out = extractive_node_summaries(nodes, docs)
    rows = out.collect()
    assert "summary" in out.columns and len(rows) == nodes.count()
    # no node lost; sentence-less spans fall back to the title
    for r in rows:
        assert r["summary"] is not None
        span = content[r["start_char"]:r["end_char"]]
        assert (r["summary"] in span) or r["summary"] == r["title"]


def test_engine_nodes_summaries_flag(spark, tmp_path):
    from documentindex_spark.api import Engine
    from documentindex_spark.sources.registry import with_doc_ids

    docs = spark.createDataFrame(
        [("r", f"p{i}", "c", "en",
          "The cat sat. The zebra watched quietly. The cat left.")
         for i in range(3)],
        "repo string, path string, commit string, lang string, "
        "content string",
    )
    eng = Engine.index(
        spark, with_doc_ids(docs), str(tmp_path / "idx"), input_id="t",
        bucket_groups=1,
    )
    out = eng.nodes(summaries=True)
    assert "summary" in out.columns
    assert out.filter(F.col("summary").isNull()).count() == 0
    eng.close()
