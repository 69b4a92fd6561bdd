"""Stored fuzzy-match sidecar — the vocabulary's deletion-variant
table persisted next to the index.

Round-3 verdict #4: ``Engine.correct_query`` re-ran the SymSpell
Generate over the FULL vocabulary on every out-of-vocabulary query.
The variant table is query-independent, so it belongs on disk with
the index — the same sidecar pattern as plans/positions.py and
plans/ann_index.py. After ``build_fuzzy_table`` a correction is a
partition-pruned scan + broadcast join:

- layout: parquet partitioned by ``v1`` = first character of the
  variant ("_" for the empty variant of 1-char terms). A query term's
  deletion variants can only start with its first or second character,
  so the scan prunes to ≤ 2 letter-partitions per OOV term
  (PartitionFilters, asserted in tests/test_fuzzy.py);
- query side: a driver-built variant table of a few dozen rows,
  always broadcast — never vocab × query;
- exactness: the same ``levenshtein ≤ 1`` residual as the in-memory
  path (operators/fuzzy.py), so results are identical by
  construction (asserted in tests).

Staleness: ``_fuzzy_meta.json`` records (n_docs, n_terms,
engine_build_version); ``Engine.correct_query`` rebuilds the sidecar
when the open index's stats no longer match (e.g. after an
incremental append).

Reference analog: none — the reference's LLM scorer absorbs typos
implicitly (/root/reference/src/documentindex/searcher.py:167-247);
this is the lexical engine's explicit equivalent, made serving-grade.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.fuzzy import (
    _deletion_variants,
    _verify_candidates,
    query_variants,
    vocab_variants,
)

META_NAME = "_fuzzy_meta.json"


def _v1_col():
    return F.when(F.length("variant") == 0, F.lit("_")).otherwise(
        F.substring("variant", 1, 1)
    )


def build_fuzzy_table(
    postings: DataFrame, out_path: str, n_docs: int | None = None
) -> str:
    """Materialize (variant, term, df) partitioned by first character.

    ``postings`` is the stored index frame (term, df, ... per
    segment); the vocabulary is its distinct (term, df). One Generate
    + one partitioned write — at 100 TB the variant table is
    |vocab| × avg_len rows, written once and shared by every query
    thereafter. ``repartition("v1")`` keeps one file per letter at
    test scale; a production build would hash into
    ``repartition(n, "v1", "variant")`` before partitionBy to spread
    hot letters — the read path is unaffected.
    """
    from .. import constants as C

    vocab = postings.groupBy("term").agg(F.max("df").alias("df"))
    var = vocab_variants(vocab).withColumn("v1", _v1_col())
    (
        var.repartition("v1")
        .sortWithinPartitions("variant", "term")
        .write.mode("overwrite")
        .partitionBy("v1")
        .parquet(out_path)
    )
    n_terms = vocab.count()
    meta = {
        "n_docs": n_docs,
        "n_terms": n_terms,
        "engine_build_version": C.ENGINE_BUILD_VERSION,
    }
    with open(os.path.join(out_path, META_NAME), "w") as f:
        json.dump(meta, f)
    return out_path


def fuzzy_meta(out_path: str) -> dict | None:
    p = os.path.join(out_path, META_NAME)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def fuzzy_matches_stored(
    spark: SparkSession,
    out_path: str,
    query_terms: list[str],
    max_dist: int = 1,
) -> DataFrame:
    """(query_term, term, df, dist) from the STORED variant table —
    no Generate over the vocabulary at query time (plan-asserted in
    tests/test_fuzzy.py), partition-pruned to the query variants'
    first characters."""
    if max_dist > 1:
        raise ValueError("deletion neighborhood implemented for max_dist <= 1")
    qvar = query_variants(spark, query_terms)
    prefixes = sorted(
        {
            (v[:1] or "_")
            for qt in set(query_terms)
            for v in _deletion_variants(qt)
        }
    )
    stored = spark.read.parquet(out_path).filter(
        F.col("v1").isin(prefixes)
    )
    cand = stored.join(F.broadcast(qvar), "variant")
    return _verify_candidates(cand, max_dist)
