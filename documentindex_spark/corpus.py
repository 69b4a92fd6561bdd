"""Deterministic synthetic source-code corpus generator.

Produces the input table mandated by BASELINE.json:15 —
``(repo:string, path:string, commit:string, lang:string, content:string)``
— one row per source file, plus ``content_sha = sha2(content, 256)``
computed at ingest (the per-row invariant).

Determinism: every file's content is a pure function of its index
``i`` and the global seed — per-row RNG seeding — so the corpus is
identical regardless of Spark partitioning, executor count, or run
order. Generation itself is distributed (``spark.range`` →
``mapInPandas``), so the same generator scales to arbitrarily large
synthetic corpora without a driver bottleneck.

FIXTURES.md §1 is the contract; the planted section headers
(``def``/``class``/``##``) and cross-references ("see module util_N",
"refer to section X.Y") give the chunker (operators/chunker.py) and
cross-ref detector (operators/crossref.py) known ground truth, the
same way the reference's handcrafted fixtures do
(/root/reference/tests/conftest.py:10-232).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SEED = 42

_LANGS = ["python", "java", "scala", "go", "js", "md", "txt"]
_LANG_WEIGHTS = np.array([0.30, 0.15, 0.10, 0.10, 0.15, 0.10, 0.10])
_EXT = {
    "python": "py",
    "java": "java",
    "scala": "scala",
    "go": "go",
    "js": "js",
    "md": "md",
    "txt": "txt",
}

# ~2k-term deterministic vocabulary: code-ish identifiers with a
# Zipf-like draw so the corpus has genuinely hot terms (stopword tier)
# for the skew-handling path to chew on.
_STEMS = [
    "index", "token", "parse", "merge", "block", "query", "score", "cache",
    "shard", "batch", "chunk", "node", "tree", "graph", "hash", "list",
    "table", "scan", "join", "sort", "heap", "queue", "stack", "buffer",
    "stream", "write", "read", "load", "store", "fetch", "build", "encode",
    "decode", "pack", "split", "slice", "range", "count", "total", "value",
]
_VOCAB = [f"{s}{n}" for s in _STEMS for n in range(50)]  # 2000 terms
_HOT = ["the", "import", "def", "return", "class", "for", "if", "data"]
# ndarray copies for rng.choice: passing the LIST made every call
# re-run np.asarray over 2000 strings — ~2.4M conversions per 200k
# files, 62% of generation time. Drawn values are identical (choice
# converts via asarray either way); measured 4.15 → 0.66 ms/file.
_VOCAB_ARR = np.array(_VOCAB)
_HOT_ARR = np.array(_HOT)


def _content_for(i: int) -> tuple[str, str, str, str]:
    """(repo, path, lang, content) for file index i — pure function."""
    rng = np.random.default_rng(SEED * 1_000_003 + i)
    repo = f"org{i % 7}/proj{i % 23}"
    lang = _LANGS[int(rng.choice(len(_LANGS), p=_LANG_WEIGHTS))]
    name = f"{_STEMS[int(rng.integers(len(_STEMS)))]}_{i % 97}"
    path = f"src/pkg{int(rng.integers(12))}/{name}.{_EXT[lang]}"

    n_blocks = int(rng.integers(3, 21))
    lines: list[str] = [
        f"# module {name} in {repo}",
        f"# see module util_{int(rng.integers(20))} for helpers",
    ]
    for _ in range(int(rng.integers(1, 4))):
        lines.append(f"import {_VOCAB[int(rng.integers(len(_VOCAB)))]}")
    for b in range(n_blocks):
        header_kind = rng.random()
        title = f"{_STEMS[int(rng.integers(len(_STEMS)))]}_{b}"
        if header_kind < 0.45:
            lines.append(f"def {title}(arg):")
        elif header_kind < 0.7:
            lines.append(f"class {title.capitalize()}:")
        else:
            lines.append(f"## section {b + 1}.{int(rng.integers(1, 5))} {title}")
        body_words = int(rng.integers(20, 120))
        # Zipf-ish mixture: hot terms dominate, tail from the vocab.
        n_hot = int(body_words * 0.35)
        hot = rng.choice(_HOT_ARR, size=n_hot)
        tail = rng.choice(_VOCAB_ARR, size=body_words - n_hot)
        words = np.concatenate([hot, tail])
        rng.shuffle(words)
        # wrap into lines of ~10 words (joining list slices, not
        # np.str_ slices — same bytes, far cheaper)
        wl = words.tolist()
        for j in range(0, len(wl), 10):
            lines.append("    " + " ".join(wl[j : j + 10]))
        if rng.random() < 0.25:
            lines.append(
                f"    # refer to section {int(rng.integers(1, 9))}."
                f"{int(rng.integers(1, 9))}"
            )
    content = "\n".join(lines) + "\n"
    return repo, path, lang, content


def _gen_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        rows = []
        for i in pdf["id"].tolist():
            repo, path, lang, content = _content_for(int(i))
            commit = hashlib.sha256(f"commit-{i}".encode()).hexdigest()[:12]
            rows.append((repo, path, commit, lang, content))
        yield pd.DataFrame(
            rows, columns=["repo", "path", "commit", "lang", "content"]
        )


REPO_FILES_SCHEMA = "repo string, path string, commit string, lang string, content string"


def generate_repo_files(
    spark: SparkSession,
    n_files: int,
    num_partitions: int | None = None,
    materialize: bool = True,
) -> DataFrame:
    """Distributed deterministic corpus of ``n_files`` source files.

    ``content_sha`` is attached here, at ingest, and carried through
    every derived table (SURVEY.md §1.2 per-row invariant).

    ``materialize``: persist the generated rows so downstream
    multi-pass consumers evaluate the Python generator ONCE. Without
    it, ``with_doc_ids`` alone re-runs generation three times (the
    range-partitioner sampling job, the pinned key-table
    materialization, and the content join pass) — measured 15.3 s vs
    6.2 s end-to-end at 20k files (tools/profile_gen_r6.py). The
    cache registers under Spark's plan-keyed CacheManager, so
    repeated calls with the same ``n_files`` share one entry.
    """
    parts = num_partitions or max(4, min(64, n_files // 256 or 1))
    base = spark.range(0, n_files, 1, parts)
    df = base.mapInPandas(_gen_batch, schema=REPO_FILES_SCHEMA)
    df = df.withColumn("content_sha", F.sha2(F.col("content"), 256))
    if materialize:
        df = df.persist()
    return df
