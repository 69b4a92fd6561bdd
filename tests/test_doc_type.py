"""Doc-type detector at reference parity: 12 pattern families +
generic fallback (reference detector.py:28-190, models.py:25-39),
filename hints override content votes (detector.py:127-149), fixture
texts per type mirror reference tests/test_detector.py:14-133."""

from __future__ import annotations

import pytest

from documentindex_spark.functions.scalar import (
    DOC_TYPE_FILENAME_HINTS,
    DOC_TYPE_PATTERNS,
    detect_doc_type,
)

FIXTURES = {
    "python": "import os\nimport sys\n\nclass Indexer:\n    def run(self):\n        return 1\n\ndef main():\n    return 0\n",
    "javascript": "export default function render(x) {\n  const out = x.map(v => { return v * 2 })\n  return out\n}\nfunction helper(y) { const z = y }\n",
    "sql": "CREATE TABLE t (a INT);\nINSERT INTO t VALUES (1);\nSELECT a, count(*) FROM t GROUP BY a;\n",
    "shell": "#!/bin/bash\nset -e\nexport OUT=${HOME}/x\nif [ -f a ]; then\n  echo hi\nfi\n",
    "html": "<!DOCTYPE html>\n<html>\n<body><div class=\"x\">hello</div></body>\n</html>\n",
    "json": "{\n  \"name\": \"pkg\",\n  \"deps\": [\n    \"a\"\n  ],\n}\n",
    "yaml": "---\nserver:\n  - host\n  - port\nlimits:\n  - cpu\n",
    "markdown": "# Title\n\nSome [link](http://x) here.\n\n- item one\n- item two\n\n```py\nx = 1\n```\n",
    "config": "[core]\nname = engine\nthreads = 8\n; comment line\n[log.sink]\nlevel = info\n",
    "log": "2024-03-01 12:00:01 INFO start\n2024-03-01T12:00:02 ERROR boom\nTraceback (most recent call last):\n",
    "rst": ".. module:: engine\n\nTitle\n=====\n\n:param x: the input\n",
    "prose": "The quick brown fox jumps over the fence. It was a fine day, and the end of it was near.\n",
}


@pytest.fixture(scope="module")
def detected(spark):
    rows = [(i, t, text) for i, (t, text) in enumerate(sorted(FIXTURES.items()))]
    df = spark.createDataFrame(rows, "doc_id long, want string, content string")
    out = detect_doc_type(df)
    return {
        r["doc_id"]: r
        for r in out.join(df.select("doc_id", "want"), "doc_id").collect()
    }


def test_bank_size_at_reference_parity():
    assert len(DOC_TYPE_PATTERNS) == 12  # + generic ⇒ 13 outcomes
    assert sum(len(v) for v in DOC_TYPE_PATTERNS.values()) >= 40


def test_each_fixture_detected_as_its_type(detected):
    for _, r in sorted(detected.items()):
        assert r["doc_type"] == r["want"], (r["want"], r["doc_type"])
        assert r["confidence"] >= 2 / 3 - 1e-9


def test_generic_fallback(spark):
    df = spark.createDataFrame(
        [(0, "zzz qqq"), (1, "")], "doc_id long, content string"
    )
    out = {r["doc_id"]: r["doc_type"] for r in detect_doc_type(df).collect()}
    assert out == {0: "generic", 1: "generic"}


def test_filename_hint_overrides_content(spark):
    # python-looking content but a .md path → hint wins (reference
    # checks filename before content patterns)
    df = spark.createDataFrame(
        [
            (0, FIXTURES["python"], "docs/README.md"),
            (1, FIXTURES["python"], "src/engine.py"),
            (2, "zzz", "notes/odd.xyz"),  # no hint, no votes → generic
        ],
        "doc_id long, content string, path string",
    )
    out = {
        r["doc_id"]: (r["doc_type"], r["confidence"])
        for r in detect_doc_type(df, path_col="path").collect()
    }
    assert out[0] == ("markdown", 1.0)
    assert out[1] == ("python", 1.0)
    assert out[2][0] == "generic"


def test_hint_table_covers_every_type():
    hinted = {t for _, t in DOC_TYPE_FILENAME_HINTS}
    assert hinted == set(DOC_TYPE_PATTERNS)
