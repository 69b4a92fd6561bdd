"""Regression: BMW pivot extension over equal-doc cursors.

The 200-file corpus never triggered the skip path that loses
multi-term docs; the 500-doc driver documents table did (found by the
sf0.01 oracle gate): without extending the pivot across cursors
parked at the same doc_id, the block-max upper bound undercounts and
BMW silently drops docs containing several query terms."""

from __future__ import annotations

import pytest

from documentindex_spark import oracle
from documentindex_spark.operators.bmw import bmw_topk_local
from tests.test_index_bmw import _segments_from_oracle

QUERIES = ["merge sort", "the data table", "spark window filter", "merge"]


@pytest.fixture(scope="module")
def docs_orc(spark):
    rows = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )
    return oracle.OracleIndex({int(r["doc_id"]): r["text"] for r in rows})


@pytest.mark.parametrize("q", QUERIES)
@pytest.mark.parametrize("k", [10, 50])
def test_bmw_rank_identity_on_documents_corpus(docs_orc, q, k):
    terms = sorted(set(oracle.tokenize(q)))
    got = bmw_topk_local(_segments_from_oracle(docs_orc, terms), k)
    want = docs_orc.topk(q, k)
    assert [d for d, _ in got] == [d for d, _ in want]
    assert [s for _, s in got] == pytest.approx(
        [s for _, s in want], abs=1e-12
    )
