"""Chunk-level retrieval — the reference's retrieval unit.

The reference scores tree NODES, not whole documents
(/root/reference/src/documentindex/searcher.py:167-247;
SURVEY.md §1.3: "a node is the retrieval unit"). This plan chunks
every file (operators/chunker.py), assigns each chunk a dense global
``chunk_id`` (row_number over (doc_id, chunk_index) — run-
reproducible), and builds the SAME inverted index over chunk text:
the engine core is unit-agnostic, only the input table changes.

File-level retrieval = chunk scores aggregated per file
(max / sum per doc_id), mirroring the survey's "file-level retrieval
= chunk scores aggregated by (repo, path, commit)".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.chunker import chunk_documents
from .build_index import BuiltIndex, build_index


def chunks_with_ids(files: DataFrame, text_col: str = "content") -> DataFrame:
    """(chunk_id, doc_id, chunk_index, start_char, end_char,
    section_title, section_level, text) with dense global chunk_id.

    Two-pass assignment over slim key columns only (sources.registry
    .dense_ids — no single-task window; chunk text never moves
    through the id shuffle)."""
    from ..sources.registry import dense_ids

    chunks = chunk_documents(files, text_col)
    keys = chunks.select("doc_id", "chunk_index")
    ids = dense_ids(keys, ["doc_id", "chunk_index"], "chunk_id")
    return chunks.join(F.broadcast(ids), ["doc_id", "chunk_index"])


def build_chunk_index(
    spark: SparkSession,
    files: DataFrame,
    out_dir: str,
    input_id: str,
    text_col: str = "content",
    **kwargs,
) -> tuple[BuiltIndex, DataFrame]:
    """Chunk the corpus, re-key on chunk_id, build the standard index.

    Returns (BuiltIndex over chunks, chunk_map) where chunk_map keeps
    the chunk→file projection for rollups. Inside the index the chunk
    IS the document: ``doc_id`` column = chunk_id.
    """
    chunks = chunks_with_ids(files, text_col)
    as_docs = chunks.select(
        F.col("chunk_id").alias("doc_id"),
        F.col("doc_id").alias("file_doc_id"),
        "chunk_index",
        "start_char",
        "end_char",
        "section_title",
        "section_level",
        F.col("text").alias("content"),
    ).withColumn("content_sha", F.sha2(F.col("content"), 256))
    built = build_index(
        spark, as_docs, out_dir, input_id, text_col="content", **kwargs
    )
    chunk_map = spark.read.parquet(built.doc_map_path)
    return built, chunk_map


def rollup_to_files(chunk_hits: DataFrame, chunk_map: DataFrame) -> DataFrame:
    """Aggregate chunk-level hits to file-level results:
    (file_doc_id, best_score, sum_score, n_chunks_hit, best_chunk_id).
    One hash agg; ties inside a file resolved by chunk_id ASC."""
    joined = chunk_hits.join(
        chunk_map.select("doc_id", "file_doc_id"), "doc_id"
    )
    return joined.groupBy("file_doc_id").agg(
        F.max("score").alias("best_score"),
        F.sum("score").alias("sum_score"),
        F.count(F.lit(1)).alias("n_chunks_hit"),
        F.min_by("doc_id", F.struct(F.negate(F.col("score")), F.col("doc_id"))).alias(
            "best_chunk_id"
        ),
    )
