"""BMW rank-identity: the compressed-index Block-Max WAND scorer must
return doc_ids AND float64 scores identical to the exhaustive oracle
(the north-rule acceptance check, SURVEY.md §5.2)."""

from __future__ import annotations

import numpy as np
import pytest

from documentindex_spark import oracle
from documentindex_spark.operators.bmw import bmw_topk, bmw_topk_local
from documentindex_spark.operators.codec import encode_segment
from documentindex_spark.plans.build_index import BuiltIndex, build_index

QUERIES = {
    0: "merge block",
    1: "the",
    2: "index0 token1 parse2",
    3: "def class return",
    4: "zzzz_not_in_vocab merge",
    5: "zzzz_only_oov",
    6: "the import def return class for if data",  # all hot terms
    7: "scan44",  # rare term
}


def _segments_from_oracle(orc: oracle.OracleIndex, terms, max_seg=None):
    """Build compressed segments straight from the oracle's impacts —
    isolates the BMW algorithm from the Spark build."""
    by_term = {}
    for t in terms:
        docs = sorted(d for d in orc.tf if orc.tf[d].get(t))
        if not docs:
            continue
        doc_ids = np.array(docs, dtype=np.int64)
        tfs = np.array([orc.tf[d][t] for d in docs], dtype=np.int64)
        imps = np.array([orc.impact(t, d) for d in docs], dtype=np.float64)
        if max_seg:
            segs = [
                encode_segment(t, len(docs), doc_ids[i : i + max_seg],
                               tfs[i : i + max_seg], imps[i : i + max_seg])
                for i in range(0, len(docs), max_seg)
            ]
        else:
            segs = [encode_segment(t, len(docs), doc_ids, tfs, imps)]
        by_term[t] = segs
    return by_term


@pytest.fixture(scope="module")
def orc(local_docs):
    return oracle.OracleIndex(local_docs)


@pytest.mark.parametrize("qid", list(QUERIES))
@pytest.mark.parametrize("k", [1, 10, 100])
def test_bmw_local_rank_identity(orc, qid, k):
    terms = oracle.tokenize(QUERIES[qid])
    got = bmw_topk_local(_segments_from_oracle(orc, sorted(set(terms))), k)
    want = orc.topk(QUERIES[qid], k)
    assert [d for d, _ in got] == [d for d, _ in want]
    assert [s for _, s in got] == pytest.approx(
        [s for _, s in want], abs=1e-12
    )


def test_bmw_local_multi_segment(orc):
    """Segment caps (hot-term splitting) must not change results."""
    q = "the import merge"
    terms = sorted(set(oracle.tokenize(q)))
    got = bmw_topk_local(_segments_from_oracle(orc, terms, max_seg=17), 25)
    want = orc.topk(q, 25)
    assert [d for d, _ in got] == [d for d, _ in want]


@pytest.fixture(scope="module")
def built(spark, repo_files_small, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("index"))
    # tiny shard size so the salted multi-shard path actually runs
    return build_index(
        spark,
        repo_files_small,
        out,
        input_id="repo_files_small@200",
        bucket_groups=2,
        postings_per_shard=64,
    )


def test_spark_build_and_bmw_end_to_end(spark, built: BuiltIndex, orc):
    res = bmw_topk(spark, built.postings_path, QUERIES, k=10)
    rows = res.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(
            (r["rank"], int(r["doc_id"]), float(r["score"]))
        )
    for qid, q in QUERIES.items():
        got = sorted(by_q.get(qid, []))
        want = orc.topk(q, 10)
        assert [d for _, d, _ in got] == [d for d, _ in want], f"q{qid}: {q!r}"
        assert [s for _, _, s in got] == pytest.approx(
            [s for _, s in want], abs=1e-12
        ), f"q{qid} scores"


def test_bmw_serve_matches_oracle(spark, built: BuiltIndex, orc):
    from documentindex_spark.operators.bmw import bmw_serve

    postings = spark.read.parquet(built.postings_path)
    for q in ["merge block", "the import def", "zzzz_only_oov"]:
        got = bmw_serve(postings, q, k=10)
        want = orc.topk(q, 10)
        assert [d for d, _ in got] == [d for d, _ in want], q
        assert [s for _, s in got] == pytest.approx(
            [s for _, s in want], abs=1e-12
        )
    with pytest.raises(ValueError):
        bmw_serve(postings, "the", k=10, max_collect_postings=1)


def test_bmw_serve_arrow_matches_oracle(built: BuiltIndex, orc):
    """The Spark-free pyarrow serve path must be score-identical to
    the oracle (and therefore to bmw_serve / bmw_topk) — partition
    pruning + row-group skipping happen in pyarrow, BMW in-process."""
    from documentindex_spark.operators.bmw import bmw_serve_arrow

    for q in ["merge block", "the import def", "zzzz_only_oov"]:
        got = bmw_serve_arrow(built.postings_path, q, k=10)
        want = orc.topk(q, 10)
        assert [d for d, _ in got] == [d for d, _ in want], q
        assert [s for _, s in got] == pytest.approx(
            [s for _, s in want], abs=1e-12
        )
    with pytest.raises(ValueError):
        bmw_serve_arrow(
            built.postings_path, "the", k=10, max_collect_postings=1
        )


def test_index_df_consistency(spark, built: BuiltIndex, orc):
    """Stored df and total postings per term match the oracle."""
    segs = spark.read.parquet(built.postings_path).collect()
    by_term: dict[str, list] = {}
    for r in segs:
        by_term.setdefault(r["term"], []).append(r)
    assert set(by_term) == set(orc.df)
    for t, rows in by_term.items():
        assert rows[0]["df"] == orc.df[t], t
        assert sum(r["n_postings"] for r in rows) == orc.df[t], t
        # segments must tile the doc space disjointly & ascending
        rows = sorted(rows, key=lambda r: r["min_doc_id"])
        for a, b in zip(rows, rows[1:]):
            assert a["max_doc_id"] < b["min_doc_id"]


def test_score_threshold_all_identity_and_plan(spark, built, local_docs):
    """The threshold-first provenance scorer must be VALUE-identical
    (float64, frozen ascending-term sum) to the exhaustive oracle for
    every doc >= threshold, and its plan must contain no top-k heap
    merge (no global window / TakeOrdered)."""
    from documentindex_spark.operators.bmw import score_threshold_all

    orc = oracle.OracleIndex(local_docs)
    for qid, q in QUERIES.items():
        for th in (0.5, 2.0):
            res = score_threshold_all(
                spark, built.postings_path, {0: q}, threshold=th
            )
            got = {
                int(r["doc_id"]): float(r["score"]) for r in res.collect()
            }
            want = {
                d: s for d, s in orc.all_matches(q, th)
            }
            assert got == want, (qid, th)
    plan = score_threshold_all(
        spark, built.postings_path, {0: "merge block"}, threshold=1.0
    )._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrdered" not in plan
    assert "Window" not in plan


def test_hashed_term_keys_build_is_identical(spark, tmp_path):
    """The int64-keyed build (xxhash64 keys through the encode
    shuffles, dictionary join at the write — round-3 verdict #5) must
    produce EXACTLY the same stored index as the string-keyed path:
    every column of every segment row, including buckets and
    block-max metadata."""
    import os

    from documentindex_spark.corpus import generate_repo_files
    from documentindex_spark.plans.build_index import build_index
    from documentindex_spark.sources.registry import with_doc_ids

    files = with_doc_ids(generate_repo_files(spark, 120)).cache()

    def content(out_dir):
        rows = spark.read.parquet(os.path.join(out_dir, "postings")).collect()
        return sorted(
            (
                r["term"], int(r["seg_idx"]), int(r["df"]),
                int(r["n_postings"]), int(r["min_doc_id"]),
                int(r["max_doc_id"]), bytes(r["doc_blob"]),
                bytes(r["tf_blob"]), bytes(r["impact_blob"]),
                tuple(r["block_n"]), tuple(r["block_max_doc"]),
                tuple(r["block_max_impact"]), tuple(r["block_doc_off"]),
                tuple(r["block_tf_off"]), int(r["bucket"]),
            )
            for r in rows
        )

    a = str(tmp_path / "str_keys")
    b = str(tmp_path / "int_keys")
    build_index(spark, files, a, input_id="rf@120", bucket_groups=2)
    build_index(spark, files, b, input_id="rf@120", bucket_groups=2,
                hashed_term_keys=True)
    ca, cb = content(a), content(b)
    assert len(ca) > 0 and ca == cb
    files.unpersist()
