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


# range-partitioned intermediates pinned by dense_ids, released via
# release_id_caches() once results are safely materialized. Keyed by
# an ownership scope (round-3 advice: a process-global flat list let
# one Engine.close() unpersist pins belonging to ANOTHER live engine
# or an in-flight append — a later action on an unmaterialized
# id-bearing frame would re-plan the range exchange and silently
# reassign ids). None = ad-hoc/unscoped pins.
_PINNED_RANGES: dict[str | None, list[DataFrame]] = {}

_ALL_SCOPES = object()  # sentinel: release everything (explicit opt-in)


def release_id_caches(scope=_ALL_SCOPES) -> int:
    """Unpersist range-partitioned intermediates pinned by
    ``dense_ids`` (round-2 leak: one pinned copy of the key columns
    per id assignment, held for the session's lifetime). Returns the
    number released.

    ``scope``: release only the pins created under that ownership
    token (e.g. an index out_dir — what ``Engine.close`` passes, so
    closing one engine never unpins another's). Default releases
    EVERY scope — session-teardown semantics for ad-hoc users.

    SAFE only once the scope's id-bearing results are materialized to
    their own storage (``.cache()`` + action, or written out):
    partition-EVICTION recompute reuses the materialized plan's RDD
    graph, so boundaries stay stable — but a fresh ACTION on an
    unmaterialized result re-plans the range exchange with a new
    sampling seed and would assign DIFFERENT ids."""
    scopes = (
        list(_PINNED_RANGES) if scope is _ALL_SCOPES else [scope]
    )
    n = 0
    for sc in scopes:
        for df in _PINNED_RANGES.pop(sc, []):
            df.unpersist()
            n += 1
    return n


def dense_ids(
    df: DataFrame,
    order_cols: list[str],
    id_name: str = "doc_id",
    offset: int = 0,
    scope: str | None = None,
) -> DataFrame:
    """Dense, RUN-REPRODUCIBLE ids ordered by ``order_cols`` — the
    TWO-PASS assignment (no single-task global sort anywhere):

    1. range-repartition on the keys; collect ONE COUNT PER PARTITION
       (a ``shuffle_partitions``-row collect, not data);
    2. broadcast the prefix-sum offsets back as a literal map and rank
       rows with a PER-PARTITION window: id = offset[pid] + rank − 1.

    Ids equal ``row_number() OVER (ORDER BY order_cols) − 1 + offset``
    by construction: partitions are range-ordered, ranks are local,
    and each partition's offset is the exact count of rows in lower
    ranges — independent of where the sampled range boundaries fall,
    so the assignment is stable even though RangePartitioner samples.
    Every stage is as wide as ``spark.sql.shuffle.partitions``
    (the round-1 version was a one-task global window — the plan's
    only SinglePartition exchange; asserted gone in
    tests/test_invariants.py).
    """
    from pyspark.sql.window import Window

    spark = df.sparkSession
    n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    ranged = (
        df.repartitionByRange(n, *order_cols)
        .withColumn("_pid", F.spark_partition_id())
        # pin partition boundaries: the count pass and the id pass
        # must see the SAME partitioning. Partition-level eviction
        # recompute is safe (same RDD graph ⇒ same boundaries), but a
        # fresh action RE-PLANS the exchange with a new sampling seed
        # — measured to reassign ids — so this persist is
        # load-bearing until release_id_caches().
        .persist()
    )
    _PINNED_RANGES.setdefault(scope, []).append(ranged)
    counts = {
        r["_pid"]: r["cnt"]
        for r in ranged.groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    acc = offset
    pairs: list = []
    for pid in sorted(counts):
        pairs += [F.lit(pid), F.lit(acc)]
        acc += counts[pid]
    omap = F.create_map(*pairs) if pairs else F.create_map()
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    return (
        ranged.withColumn("_rn", F.row_number().over(w))
        .withColumn(
            id_name,
            (F.element_at(omap, F.col("_pid")) + F.col("_rn") - 1).cast(
                "long"
            ),
        )
        .drop("_pid", "_rn")
    )


def load_corpus(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    text_col: str = "content",
    **options,
) -> DataFrame:
    """Format-agnostic corpus reader: parquet | json (JSONL) | csv |
    text — each lands on the engine's contract (a ``text_col`` plus
    whatever identity columns the source carries, ``content_sha``
    attached). ``text`` mode reads one document per file
    (wholetext=True) and yields (path, content).

    All formats go through the same DataFrameReader machinery, so
    Catalyst pushdown/pruning and the 16m maxPartitionBytes split
    tuning apply regardless of format."""
    fmt = fmt.lower()
    if fmt == "parquet":
        df = spark.read.options(**options).parquet(path)
    elif fmt in ("json", "jsonl"):
        df = spark.read.options(**options).json(path)
    elif fmt == "csv":
        df = spark.read.options(header=True, **options).csv(path)
    elif fmt == "text":
        df = (
            spark.read.option("wholetext", True)
            .text(path)
            .select(
                F.input_file_name().alias("path"),
                F.col("value").alias(text_col),
            )
        )
    else:
        raise ValueError(f"unsupported corpus format: {fmt}")
    if text_col not in df.columns:
        raise ValueError(
            f"source at {path} has no '{text_col}' column: {df.columns}"
        )
    if "content_sha" not in df.columns:
        df = df.withColumn("content_sha", F.sha2(F.col(text_col), 256))
    return df


def with_doc_ids(df: DataFrame, scope: str | None = None) -> DataFrame:
    """Assign the dense doc_id ordered by (repo, path, commit) — NOT
    monotonically_increasing_id, which depends on physical
    partitioning (SURVEY.md §1.3).

    Scale shape: the two-pass assignment (``dense_ids``) runs over the
    KEY COLUMNS ONLY — ``content`` never shuffles; the wide rows
    rejoin by natural key against the broadcast slim id table. (At a
    scale where the id table outgrows a broadcast, drop the
    projection and run ``dense_ids`` on the full rows — one parallel
    range shuffle of content.)
    """
    ids = dense_ids(
        df.select("repo", "path", "commit"),
        ["repo", "path", "commit"],
        "doc_id",
        scope=scope,
    )
    return df.join(F.broadcast(ids), ["repo", "path", "commit"])
