"""End-to-end per-row invariant (BASELINE.json:15): sha2(content,256)
computed at ingest survives into every derived table and equals a
driver-side recomputation; stats.json matches the oracle."""

from __future__ import annotations

import hashlib
import json
import os

import pytest

from documentindex_spark import oracle
from documentindex_spark.plans.build_index import build_index


@pytest.fixture(scope="module")
def built(spark, repo_files_small, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("inv_idx"))
    return build_index(
        spark, repo_files_small, out, input_id="rf@200-inv", bucket_groups=1
    )


def test_doc_map_carries_sha_invariant(spark, built, repo_files_small):
    doc_map = spark.read.parquet(built.doc_map_path)
    assert "content_sha" in doc_map.columns
    joined = (
        doc_map.select("doc_id", "content_sha")
        .join(repo_files_small.select("doc_id", "content"), "doc_id")
        .collect()
    )
    assert len(joined) == 200
    for r in joined:
        assert (
            hashlib.sha256(r["content"].encode()).hexdigest()
            == r["content_sha"]
        ), r["doc_id"]


def test_stats_match_oracle(built, local_docs):
    orc = oracle.OracleIndex(local_docs)
    with open(os.path.join(built.out_dir, "stats.json")) as f:
        stats = json.load(f)
    assert stats["n_docs"] == orc.n
    assert stats["avgdl"] == pytest.approx(orc.avgdl, abs=1e-12)


def test_doc_map_dl_matches_oracle(spark, built, local_docs):
    orc = oracle.OracleIndex(local_docs)
    dl = {
        r["doc_id"]: r["dl"]
        for r in spark.read.parquet(built.doc_map_path)
        .select("doc_id", "dl")
        .collect()
    }
    assert dl == orc.dl