"""Banded BMW: segments split at doc-band boundaries at build time;
(query_id, band)-parallel scoring must be rank- AND score-identical
to the unbanded path and the oracle."""

from __future__ import annotations

import pytest

from documentindex_spark import oracle
from documentindex_spark.operators.bmw import bmw_topk
from documentindex_spark.plans.build_index import build_index

QUERIES = {0: "merge block", 1: "the import def", 2: "index0 token1"}


@pytest.fixture(scope="module")
def banded_index(spark, repo_files_small, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("banded_idx"))
    # band width 37 docs over a 200-doc corpus → ~6 bands, deliberately
    # not aligned with anything
    return build_index(
        spark,
        repo_files_small,
        out,
        input_id="rf@200-banded",
        bucket_groups=1,
        band_size=37,
    )


def test_segments_respect_band_boundaries(spark, banded_index):
    rows = spark.read.parquet(banded_index.postings_path).collect()
    for r in rows:
        assert r["min_doc_id"] // 37 == r["max_doc_id"] // 37, r["term"]


def test_banded_bmw_rank_identity(spark, banded_index, local_docs):
    orc = oracle.OracleIndex(local_docs)
    res = bmw_topk(
        spark, banded_index.postings_path, QUERIES, k=10, band_size=37
    ).collect()
    by_q: dict[int, list] = {}
    for r in res:
        by_q.setdefault(r["query_id"], []).append(
            (r["rank"], int(r["doc_id"]), float(r["score"]))
        )
    for qid, q in QUERIES.items():
        got = sorted(by_q.get(qid, []))
        want = orc.topk(q, 10)
        assert [d for _, d, _ in got] == [d for d, _ in want], f"q{qid}"
        assert [s for _, _, s in got] == pytest.approx(
            [s for _, s in want], abs=1e-12
        )


def test_engine_search_defaults_to_banded_on_multiband(
    spark, banded_index, repo_files_small, local_docs
):
    """Engine.search must pass band_size automatically when the index
    spans >1 band, so one heavy query parallelizes (VERDICT r1 #4)."""
    from documentindex_spark.api import Engine

    eng = Engine.open(
        spark, banded_index.out_dir, repo_files_small, text_col="content"
    )
    assert eng.built.band_size == 37 and eng.built.n_docs > 37
    res = eng.search("merge block", k=10)
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "doc_band" in plan  # banded grouping key in effect
    got = [(r["rank"], int(r["doc_id"]), float(r["score"]))
           for r in res.collect()]
    orc = oracle.OracleIndex(local_docs)
    want = orc.topk("merge block", 10)
    assert [d for _, d, _ in sorted(got)] == [d for d, _ in want]
    assert [s for _, _, s in sorted(got)] == pytest.approx(
        [s for _, s in want], abs=1e-12
    )


def test_banded_equals_unbanded(spark, banded_index):
    a = bmw_topk(
        spark, banded_index.postings_path, QUERIES, k=10, band_size=37
    ).collect()
    b = bmw_topk(spark, banded_index.postings_path, QUERIES, k=10).collect()
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    assert sorted(
        [(r["query_id"], r["rank"], r["doc_id"], r["score"]) for r in a]
    ) == sorted([(r["query_id"], r["rank"], r["doc_id"], r["score"]) for r in b])