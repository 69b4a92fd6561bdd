"""Shared fixtures: one SparkSession per test run; small deterministic
corpus fixtures per FIXTURES.md."""

from __future__ import annotations

import pytest

from documentindex_spark.corpus import generate_repo_files
from documentindex_spark.session import get_spark
from documentindex_spark.sources.registry import with_doc_ids


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="documentindex-tests",
        master="local[4]",
        shuffle_partitions=4,
    )
    yield s


@pytest.fixture(scope="session")
def repo_files_small(spark):
    """200-file deterministic corpus with dense doc_ids, cached."""
    df = with_doc_ids(generate_repo_files(spark, 200)).cache()
    df.count()
    return df


@pytest.fixture(scope="session")
def local_docs(repo_files_small):
    """Driver-side {doc_id: content} for the numpy oracle."""
    rows = repo_files_small.select("doc_id", "content").collect()
    return {int(r["doc_id"]): r["content"] for r in rows}
