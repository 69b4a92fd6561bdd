"""The full 50-query reference set (FIXTURES.md §3/§4): engine top-k
must be rank- AND score-identical to the independent oracle on every
query, including the k=100 deep-rank checks and OOV edges — the
north-rule acceptance test in miniature."""

from __future__ import annotations

import pytest

from documentindex_spark import oracle
from documentindex_spark.operators.bmw import bmw_topk
from documentindex_spark.plans.build_index import build_index
from documentindex_spark.queryset import reference_query_set


@pytest.fixture(scope="module")
def built(spark, repo_files_small, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("golden_idx"))
    return build_index(
        spark, repo_files_small, out, input_id="rf@200-golden",
        bucket_groups=1, postings_per_shard=64,
    )


def test_full_query_set_rank_identity(spark, built, local_docs):
    orc = oracle.OracleIndex(local_docs)
    qs = reference_query_set()
    assert len(qs) == 50
    # one batched Spark job per k-group (10 and 100)
    for k in (10, 100):
        grp = {q["query_id"]: q["query_text"] for q in qs if q["k"] == k}
        res = bmw_topk(spark, built.postings_path, grp, k=k).collect()
        by_q: dict[int, list] = {}
        for r in res:
            by_q.setdefault(int(r["query_id"]), []).append(
                (r["rank"], int(r["doc_id"]), float(r["score"]))
            )
        for qid, qtext in grp.items():
            got = sorted(by_q.get(qid, []))
            want = orc.topk(qtext, k)
            assert [d for _, d, _ in got] == [d for d, _ in want], (
                f"q{qid}: {qtext!r}"
            )
            assert [s for _, _, s in got] == pytest.approx(
                [s for _, s in want], abs=1e-12
            ), f"q{qid} scores"


def test_query_set_is_frozen():
    a = reference_query_set()
    b = reference_query_set()
    assert a == b
    kinds = [len(q["query_text"].split()) for q in a]
    assert kinds[:20] == [1] * 20 and kinds[20:35] == [2] * 15
    assert sum(1 for q in a if q["k"] == 100) == 5