"""Provenance, metadata, textstats, multimodal, streaming — the
remaining parity + pipeline operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from documentindex_spark.functions import multimodal, textstats
from documentindex_spark.operators.metadata import (
    extract_code_metadata,
    merge_metadata,
)
from documentindex_spark.operators.provenance import (
    evidence_summary,
    find_all_evidence,
)
from documentindex_spark.streaming import events as ev

# ------------------------------------------------------ provenance


def test_find_all_evidence_snippets(spark):
    docs = spark.createDataFrame(
        [
            (0, "intro words then MERGE logic appears here and more text follows"),
            (1, "no relevant terms at all in this one"),
            (2, "merge at the very start"),
        ],
        "doc_id long, text string",
    )
    scored = spark.createDataFrame(
        [(0, 2.0), (1, 0.2), (2, 1.0)], "doc_id long, score double"
    )
    out = {
        r["doc_id"]: r
        for r in find_all_evidence(
            scored, docs, "merge", threshold=0.5, excerpt_threshold=1.5,
            snippet_width=20,
        ).collect()
    }
    assert set(out) == {0, 2}  # threshold filter, no limit
    assert out[0]["snippet"].lower().startswith("merge")
    assert out[2]["snippet"] is None  # below excerpt gate: no extraction
    summ = evidence_summary(
        find_all_evidence(scored, docs, "merge", 0.5)
    ).collect()[0]
    assert summ["n_top"] == 2 and summ["max_score"] == 2.0


# -------------------------------------------------------- metadata


def test_code_metadata(spark):
    text = (
        "# module alpha_mod\nimport os_util\nimport re_util\n"
        "def f_one(x):\n    pass\nclass Big:\n    pass\n# comment\n"
    )
    df = spark.createDataFrame([(0, text)], "doc_id long, content string")
    m = extract_code_metadata(df).collect()[0]
    assert m["n_imports"] == 2 and m["imports"] == ["os_util", "re_util"]
    assert m["n_defs"] == 1 and m["n_classes"] == 1
    assert m["symbols"] == ["Big", "f_one"]
    assert m["header_module"] == "alpha_mod"
    assert m["n_comment_lines"] == 2  # '# module...' and '# comment'


def test_merge_metadata_coalesce_and_union(spark):
    p = spark.createDataFrame(
        [(0, None, ["a"]), (1, 5, ["b"])],
        "doc_id long, n_lines int, imports array<string>",
    )
    s = spark.createDataFrame(
        [(0, 7, ["c"]), (2, 9, ["d"])],
        "doc_id long, n_lines int, imports array<string>",
    )
    got = {r["doc_id"]: r for r in merge_metadata(p, s).collect()}
    assert got[0]["n_lines"] == 7 and got[0]["imports"] == ["a", "c"]
    assert got[1]["n_lines"] == 5 and got[1]["imports"] == ["b"]
    assert got[2]["n_lines"] == 9 and got[2]["imports"] == ["d"]


# -------------------------------------------------------- textstats


def test_language_and_quality(spark):
    df = spark.createDataFrame(
        [
            (0, "the cat and the dog of the house is big"),
            (1, "der hund und die katze das ist gut"),
            (2, "!!! ??? ***"),
        ],
        "doc_id long, text string",
    )
    langs = {r["doc_id"]: r["lang_pred"] for r in textstats.language_scores(df).collect()}
    assert langs[0] == "en" and langs[1] == "de"
    q = {r["doc_id"]: r for r in textstats.quality_features(df).collect()}
    assert q[0]["quality_score"] > q[2]["quality_score"]
    assert q[2]["n_tokens"] == 0 and q[2]["quality_score"] == 0.0
    t = {r["doc_id"]: r for r in textstats.token_counts(df).collect()}
    assert t[0]["ws_tokens"] == 10
    fp = {r["doc_id"]: r for r in textstats.doc_fingerprints(df).collect()}
    assert fp[0]["content_sha"] != fp[1]["content_sha"]
    assert fp[2]["min_token_fp"] is None  # no tokens


# ------------------------------------------------------- multimodal


def test_multimodal_plumbing(spark):
    assets = multimodal.synth_assets(spark, 30).cache()
    assert assets.count() == 30
    feats = multimodal.extract_features(assets, dim=16).collect()
    assert len(feats) == 30
    for r in feats:
        assert len(r["feature"]) == 16
        # BMP images and PCM WAV decode for REAL (in-repo byte
        # parsers); only codec formats (mp4 video) use the stub
        want_decoder = "stub" if r["kind"] == "video" else "real"
        assert r["decoder"] == want_decoder, (r["asset_id"], r["kind"])
        assert all(0.0 <= v < 1.0 for v in r["feature"])
    # determinism across recomputation
    again = multimodal.extract_features(assets, dim=16).collect()
    assert {r["asset_id"]: r["feature"] for r in feats} == {
        r["asset_id"]: r["feature"] for r in again
    }
    plan = multimodal.frame_sample_plan(assets, every_ms=1000)
    vids = assets.filter("kind = 'video'").collect()
    got = plan.groupBy("asset_id").count().collect()
    want = {
        v["asset_id"]: v["meta"]["duration_ms"] // 1000 + 1 for v in vids
    }
    assert {r["asset_id"]: r["count"] for r in got} == want


# -------------------------------------------------------- streaming


def test_windowed_stream_equals_batch(spark, tmp_path):
    # streaming parquet source requires a DIRECTORY: stage the table
    src = str(tmp_path / "events_dir")
    spark.read.parquet("/root/testdata/sf0.001/events.parquet").repartition(
        4
    ).write.parquet(src)
    events = spark.read.parquet(src)
    batch = {
        (r["win_start"], r["event_type"]): (r["n"], r["total"])
        for r in ev.windowed_counts_batch(events).collect()
    }
    agg = ev.windowed_counts_stream(spark, src)
    ev.run_stream_to_memory(agg, "win_test")
    stream = {
        (r["win_start"], r["event_type"]): (r["n"], r["total"])
        for r in spark.sql("select * from win_test").collect()
    }
    assert stream == batch


def test_sessionize(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0, 10, "click", 1.0, "{}"),
        (2, t0 + dt.timedelta(minutes=5), 10, "click", 1.0, "{}"),
        (3, t0 + dt.timedelta(minutes=90), 10, "click", 1.0, "{}"),
        (4, t0, 20, "view", 1.0, "{}"),
    ]
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    got = {
        (r["user_id"], r["session_idx"]): r["n_events"]
        for r in ev.sessionize(events, gap_minutes=30).collect()
    }
    assert got == {(10, 0): 2, (10, 1): 1, (20, 0): 1}


def test_multi_grain_rollup_internally_consistent(spark):
    """Each coarser grain's totals must equal the sum of its finer
    buckets (one GROUPING SETS pass produces all three)."""
    from documentindex_spark.operators.rollup import multi_grain_rollup

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    rows = multi_grain_rollup(events).collect()
    by_grain: dict[str, dict] = {"5m": {}, "1h": {}, "1d": {}}
    for r in rows:
        by_grain[r["grain"]][(r["win_start"], r["event_type"])] = (
            r["n"], r["total"],
        )
    assert by_grain["5m"] and by_grain["1h"] and by_grain["1d"]
    # roll 5m up to 1h by hand and compare counts
    import collections

    agg = collections.Counter()
    for (ws, et), (n, _) in by_grain["5m"].items():
        agg[(ws.replace(minute=0, second=0, microsecond=0), et)] += n
    assert dict(agg) == {k: n for k, (n, _) in by_grain["1h"].items()}
    total_events = events.count()
    for grain in ("5m", "1h", "1d"):
        assert sum(n for n, _ in by_grain[grain].values()) == total_events


def test_lm_quality_scores_hand_computed(spark):
    """Corpus: (a,b)x3, (b,a)x1, (b,c)x1 -> ctx a:3, b:2.
    doc0 = 'a b a b': mean(ln1, ln.5, ln1) = ln(.5)/3;
    doc1 = 'a b c':   mean(ln1, ln.5)      = ln(.5)/2."""
    import math

    from documentindex_spark.functions import textstats

    docs = spark.createDataFrame(
        [(0, "a b a b"), (1, "a b c")], "doc_id long, text string"
    )
    got = {
        int(r["doc_id"]): (int(r["n_bigrams"]), float(r["avg_logprob"]))
        for r in textstats.lm_quality_scores(docs).collect()
    }
    assert got[0] == (3, round(math.log(0.5) / 3, 6))
    assert got[1] == (2, round(math.log(0.5) / 2, 6))
    assert set(got) == {0, 1}


def test_stratified_sample_exact_membership(spark):
    """Membership is a pure function of (seed, doc_id): the Spark
    result must equal a driver-side md5 recomputation EXACTLY, and be
    invariant to partitioning."""
    import hashlib

    from documentindex_spark.functions import textstats

    rows = [(i, ["en", "de", "fr"][i % 3]) for i in range(300)]
    fr = {"en": 0.3, "de": 1.0}
    df = spark.createDataFrame(rows, "doc_id long, lang string")

    def member(i, lang):
        f = fr.get(lang, 0.0)
        h = int(hashlib.md5(f"s1|{i}".encode()).hexdigest()[:8], 16)
        return (h % textstats.SAMPLE_BUCKETS) < int(
            f * textstats.SAMPLE_BUCKETS
        )

    want = sorted(i for i, lang in rows if member(i, lang))
    got = sorted(
        int(r["doc_id"])
        for r in textstats.stratified_sample(
            df, fr, strata_col="lang", seed="s1"
        ).collect()
    )
    assert got == want
    assert all(lang != "fr" for i, lang in rows if i in set(got))
    got7 = sorted(
        int(r["doc_id"])
        for r in textstats.stratified_sample(
            df.repartition(7), fr, strata_col="lang", seed="s1"
        ).collect()
    )
    assert got7 == want
    # de is fraction 1.0: every de row kept
    assert all(i in set(got) for i, lang in rows if lang == "de")
