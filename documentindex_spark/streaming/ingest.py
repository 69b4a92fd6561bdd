"""Streaming index ingestion — readStream → foreachBatch →
incremental append.

The maintenance loop a live corpus needs: new document files land in
a directory, Structured Streaming picks them up (file source tracks
processed files in its checkpoint — exactly-once per file), and each
micro-batch flows through ``plans.incremental.append_documents`` —
so every batch tokenizes ONLY its own documents and the stored index
stays byte-identical to a from-scratch batch build over everything
ingested so far (the incremental plan's invariant, asserted again
under streaming in tests/test_streaming_ingest.py).

foreachBatch (not a streaming sink) is the right shape here: the
append is a multi-stage batch job with its own checkpointed stages,
and Spark's contract for foreachBatch is precisely "run an arbitrary
batch action per micro-batch with replay-safe batch ids". The
streaming checkpoint makes redelivery possible after a crash
mid-batch; append idempotence lives in ``append_documents`` itself: a
fully-applied batch is detected by its input_id-derived stage
fingerprints (replay resumes the build instead of re-appending), and
a crash mid-append is rolled back via the manifest's write-ahead
``_pending_append`` part-file list (orphans from the dead attempt are
removed before the retry re-appends). Both paths are exercised in
tests/test_streaming_ingest.py.

Reference analog: none (the reference re-reads the corpus per query,
/root/reference/src/documentindex/searcher.py:81); survey §2.9 names
this the incremental-append row's streaming face.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..plans.build_index import BuiltIndex
from ..plans.incremental import append_documents

INGEST_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("commit", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("content", T.StringType()),
    ]
)


def ingest_stream(
    spark: SparkSession,
    built: BuiltIndex,
    inbox_dir: str,
    checkpoint_dir: str,
    text_col: str = "content",
    schema: T.StructType = INGEST_SCHEMA,
    max_files_per_trigger: int = 1,
    **build_kwargs,
):
    """Start (and return) a streaming query appending every JSON-lines
    file dropped into ``inbox_dir`` to ``built``. Call
    ``query.processAllAvailable()`` to drain in tests, ``.stop()`` to
    end; restart with the same checkpoint_dir resumes where it left
    off."""
    os.makedirs(inbox_dir, exist_ok=True)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .json(inbox_dir)
    )

    def _append(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        append_documents(
            spark,
            BuiltIndex.open(built.out_dir),  # re-read stats each batch
            batch_df,
            input_id=f"stream-batch-{batch_id}",
            text_col=text_col,
            **build_kwargs,
        )

    return (
        stream.writeStream.foreachBatch(_append)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
