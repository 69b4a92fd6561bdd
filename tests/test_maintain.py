"""Engine.maintain(): the merge-policy analog — fold deferred work
(tombstones, stale-append windows) back to exact truth only when it
crosses a documented threshold."""

from __future__ import annotations

import os

import pytest

from documentindex_spark.api import Engine
from documentindex_spark.corpus import generate_repo_files
from documentindex_spark.plans.build_index import BuiltIndex, build_index
from documentindex_spark.plans.incremental import append_documents
from documentindex_spark.sources.registry import with_doc_ids


def _index_content(spark, out_dir):
    rows = spark.read.parquet(os.path.join(out_dir, "postings")).collect()
    return sorted(
        (r["term"], r["seg_idx"], r["df"], bytes(r["doc_blob"]),
         bytes(r["impact_blob"]))
        for r in rows
    )


def _open(spark, out_dir):
    docs = spark.read.parquet(os.path.join(out_dir, "docs"))
    return Engine.open(spark, out_dir, docs)


def test_maintain_noop_on_healthy_index(spark, tmp_path):
    files = with_doc_ids(generate_repo_files(spark, 60))
    out = str(tmp_path / "idx")
    build_index(spark, files, out, input_id="base@60", bucket_groups=1)
    eng = _open(spark, out)

    st = eng.maintenance_stats()
    assert st["stale_frac"] == 0.0
    assert st["tombstone_frac"] == 0.0
    assert st["n_docs_total"] == 60

    action, same = eng.maintain("maint@60")
    assert action == "noop"
    assert same is eng


def test_maintain_refreshes_past_stale_threshold(spark, tmp_path):
    all160 = with_doc_ids(generate_repo_files(spark, 160)).cache()
    first = all160.filter("doc_id < 120")
    batch = (
        all160.filter("doc_id >= 120")
        .drop("doc_id")
        .orderBy("repo", "path", "commit")
    )
    out = str(tmp_path / "idx")
    build_index(spark, first, out, input_id="first@120", bucket_groups=1)
    append_documents(
        spark, BuiltIndex.open(out), batch, input_id="b1",
        stale_stats=True, bucket_groups=1,
    )

    eng = _open(spark, out)
    st = eng.maintenance_stats()
    assert st["stale_docs"] == 40
    assert st["stale_append_groups"] == 1
    assert st["stale_frac"] == pytest.approx(40 / 160)

    # under threshold -> untouched
    action, _ = eng.maintain("maint", max_stale_frac=0.5)
    assert action == "noop"

    action, fresh = eng.maintain(
        "union@160", max_stale_frac=0.10, bucket_groups=1
    )
    assert action == "refresh"
    after = fresh.maintenance_stats()
    assert after["stale_frac"] == 0.0
    assert after["n_docs_exact_stats"] == 160

    full = str(tmp_path / "full")
    build_index(spark, all160, full, input_id="union@160", bucket_groups=1)
    assert _index_content(spark, out) == _index_content(spark, full)


def test_maintain_compacts_past_tombstone_threshold(spark, tmp_path):
    files = with_doc_ids(generate_repo_files(spark, 80)).cache()
    out = str(tmp_path / "idx")
    build_index(spark, files, out, input_id="base@80", bucket_groups=1)
    eng = _open(spark, out)
    eng.delete(list(range(0, 16)))  # 20% tombstoned

    st = eng.maintenance_stats()
    assert st["tombstones"] == 16
    assert st["tombstone_frac"] == pytest.approx(16 / 80)

    # compaction rewrites the index -> dest_dir is mandatory
    with pytest.raises(ValueError, match="dest_dir"):
        eng.maintain("maint@80")

    dest = str(tmp_path / "compacted")
    action, fresh = eng.maintain(
        "compact@64", dest_dir=dest, bucket_groups=1
    )
    assert action == "compact"
    after = fresh.maintenance_stats()
    assert after["tombstones"] == 0
    assert after["n_docs_total"] == 64

    # compaction == fresh build of the survivors (surviving ids kept)
    survivors = files.filter("doc_id >= 16")
    full = str(tmp_path / "survivors")
    build_index(spark, survivors, full, input_id="compact@64",
                bucket_groups=1)
    assert _index_content(spark, dest) == _index_content(spark, full)


def test_maintain_compact_outranks_refresh(spark, tmp_path):
    """When both thresholds are crossed one rewrite suffices: compact
    re-derives global stats over the surviving tf, clearing the
    stale-append window in the same pass."""
    all100 = with_doc_ids(generate_repo_files(spark, 100)).cache()
    first = all100.filter("doc_id < 80")
    batch = (
        all100.filter("doc_id >= 80")
        .drop("doc_id")
        .orderBy("repo", "path", "commit")
    )
    out = str(tmp_path / "idx")
    build_index(spark, first, out, input_id="first@80", bucket_groups=1)
    append_documents(
        spark, BuiltIndex.open(out), batch, input_id="b1",
        stale_stats=True, bucket_groups=1,
    )
    eng = _open(spark, out)
    eng.delete(list(range(0, 20)))

    st = eng.maintenance_stats()
    assert st["stale_frac"] == pytest.approx(20 / 100)
    assert st["tombstone_frac"] == pytest.approx(20 / 100)

    dest = str(tmp_path / "compacted")
    action, fresh = eng.maintain("both@80", dest_dir=dest, bucket_groups=1)
    assert action == "compact"
    after = fresh.maintenance_stats()
    assert after["tombstones"] == 0
    assert after["stale_frac"] == 0.0
    assert after["n_docs_total"] == 80

    survivors = all100.filter("doc_id >= 20")
    full = str(tmp_path / "survivors")
    build_index(spark, survivors, full, input_id="both@80", bucket_groups=1)
    assert _index_content(spark, dest) == _index_content(spark, full)
