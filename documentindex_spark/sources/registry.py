"""Source adapters.

The real target is an Iceberg table of source-code repositories
(BASELINE.json:15). This sandbox has no Iceberg runtime jar and no
network, so the adapter reads the same schema from Parquet and is
written so an Iceberg catalog table can be swapped in by name
(``spark.read.table``) without touching the engine.

Also registers the driver-provided testdata tables
(/root/testdata/sf*/ — see TESTDATA.md) used by the oracle gate.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TESTDATA_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver `documents` table (doc_id, text, lang, source, n_chars)
    with the per-row sha256 invariant column attached at ingest."""
    df = load_table(spark, sf_dir, "documents")
    return df.withColumn("content_sha", F.sha2(F.col("text"), 256))


def load_repo_files(
    spark: SparkSession,
    path: str | None = None,
    table: str | None = None,
) -> DataFrame:
    """(repo, path, commit, lang, content, content_sha).

    ``table``: Iceberg/HMS table name (production path).
    ``path``: Parquet directory (sandbox path).
    """
    if table:
        df = spark.read.table(table)
    elif path:
        df = spark.read.parquet(path)
    else:
        raise ValueError("need table= or path=")
    if "content_sha" not in df.columns:
        df = df.withColumn("content_sha", F.sha2(F.col("content"), 256))
    return df


def with_doc_ids(df: DataFrame) -> DataFrame:
    """Assign the dense, RUN-REPRODUCIBLE doc_id.

    row_number over (repo, path, commit) — NOT
    monotonically_increasing_id, which depends on physical partitioning
    (SURVEY.md §1.3).

    Scale shape: the global window runs over the KEY COLUMNS ONLY
    (repo, path, commit — bytes, not documents); `content` never moves
    through the single window partition. The wide rows rejoin by key
    afterwards — a hash join co-partitioned on the natural key. At
    10^12 files even the key window would shift to two-pass
    per-partition offsets; the semantic contract (dense ids ordered by
    the natural key) stays identical.
    """
    from pyspark.sql.window import Window

    w = Window.orderBy("repo", "path", "commit")
    ids = (
        df.select("repo", "path", "commit")
        .withColumn("doc_id", F.row_number().over(w).cast("long") - 1)
    )
    # broadcast the slim id table: the wide rows (content) never
    # shuffle. (At a scale where even ids outgrow a broadcast, swap to
    # two-pass per-partition offsets.)
    return df.join(F.broadcast(ids), ["repo", "path", "commit"])
