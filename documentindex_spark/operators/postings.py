"""Posting-list construction — the index build core (SURVEY.md M2,
north rule: "build per-partition sorted posting lists ... then
shuffle-merge them into a global term-partitioned inverted index with
salted repartitioning for hot-term skew").

Two grouped stages, both Arrow-batched:

1. **Salted partial build** — every (term, doc) impact row gets a
   ``shard`` = floor(doc_id / shard_width(term)); shard count scales
   with the term's df (hot terms → many shards, rare terms → 1), so
   no single reducer ever owns a whole stopword. Range-sharding by
   doc_id (not hash-salting) is deliberate: shard doc-id ranges are
   DISJOINT and ordered, so the merge is a concatenation of
   pre-sorted runs — no re-sort. ``groupBy(term, shard)
   .applyInPandas`` sorts its group by doc_id and encodes one partial
   segment (delta+varbyte blocks + block-max metadata, codec.py).

2. **Shuffle-merge** — ``groupBy(term).applyInPandas`` receives the
   ≤S compressed partial segments of a term (bytes, not postings —
   the second shuffle moves ~100× less data), concatenates them in
   min_doc_id order, and re-encodes into final segments capped at
   MAX_SEGMENT_POSTINGS so a 10^12-scale stopword becomes many
   bounded rows instead of one unbounded blob. Single-shard terms
   within the cap pass their blobs through untouched.

The stored index is partitioned by ``bucket = crc32(term) %
NUM_TERM_BUCKETS`` — query-side partition pruning reads only the
buckets of the query's terms.

AQE's skew handling only splits join/shuffle-read skew, not hot
groupBy keys — this explicit salting is required (SURVEY.md §4.2.1).

Literature (PAPERS.md): the columnar posting layout follows
"Columnar Formatted Inverted Index for Highly-Paralleled, Vectorized
Query Processing" (ICDE 2025) — postings as columnar blobs inside a
columnar store; the salted two-stage repartition is the standard
petabyte-scale shuffle decomposition ("Hyper Dimension Shuffle",
VLDB 2019); the Arrow-batched encode path follows "Accelerating
Python UDFs in Vectorized Query Execution" (CIDR 2022).
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..constants import (
    DOC_BAND_SIZE,
    MAX_SEGMENT_POSTINGS,
    NUM_TERM_BUCKETS,
    POSTINGS_PER_SHARD,
)
from .codec import Segment, encode_segment


def _split_runs(
    doc_ids: np.ndarray, band_size: int, cap: int
) -> list[tuple[int, int]]:
    """Split a sorted doc_id run into segment (start, end) slices that
    (a) never cross a doc-band boundary (banded query execution) and
    (b) never exceed ``cap`` postings (bounded rows for hot terms)."""
    n = len(doc_ids)
    band_breaks = (np.flatnonzero(np.diff(doc_ids // band_size)) + 1).tolist()
    bounds = [0] + band_breaks + [n]
    out: list[tuple[int, int]] = []
    for a, b in zip(bounds, bounds[1:]):
        for s in range(a, b, cap):
            out.append((s, min(s + cap, b)))
    return out

# ------------------------------------------------------------- schemas

SEGMENT_FIELDS = [
    T.StructField("term", T.StringType()),
    T.StructField("df", T.LongType()),
    T.StructField("seg_idx", T.IntegerType()),
    T.StructField("n_postings", T.LongType()),
    T.StructField("min_doc_id", T.LongType()),
    T.StructField("max_doc_id", T.LongType()),
    T.StructField("doc_blob", T.BinaryType()),
    T.StructField("tf_blob", T.BinaryType()),
    T.StructField("impact_blob", T.BinaryType()),
    T.StructField("block_n", T.ArrayType(T.IntegerType())),
    T.StructField("block_max_doc", T.ArrayType(T.LongType())),
    T.StructField("block_max_impact", T.ArrayType(T.DoubleType())),
    T.StructField("block_doc_off", T.ArrayType(T.LongType())),
    T.StructField("block_tf_off", T.ArrayType(T.LongType())),
]
SEGMENT_SCHEMA = T.StructType(SEGMENT_FIELDS)
INDEX_SCHEMA = T.StructType(SEGMENT_FIELDS + [T.StructField("bucket", T.IntegerType())])


def term_bucket(term: str) -> int:
    """Deterministic, language-independent bucket for partition
    pruning — replicable at query time without Spark."""
    return zlib.crc32(term.encode("utf-8")) % NUM_TERM_BUCKETS


def write_bucketed(
    df: DataFrame, path: str, sort_cols: tuple[str, ...] = ("term", "seg_idx")
) -> None:
    """Write a bucket-partitioned table with ONE file per bucket,
    term-clustered rows.

    Without the repartition, every encode task writes a sliver into
    every bucket it touches: measured 1,347 files for a 90 MB index at
    20k docs (tools/profile_encode_r6.py), which costs the build
    open/commit overhead (7.5 s → 4.3 s for the write) and costs every
    later reader a 337-task scan (each query over the resident index
    scheduled 337 tasks; 32 after). Hashing on the partition column
    lands each bucket's rows in exactly one task → one file; the
    within-file sort by term makes parquet row-group min/max stats
    tight, so term-pruned reads (pyarrow serve path, cold query scans)
    skip non-matching row groups. Partition count stays
    shuffle.partitions/AQE-derived — nothing here is tuned to the
    local core count."""
    (
        df.repartition("bucket")
        .sortWithinPartitions("bucket", *sort_cols)
        .write.mode("overwrite")
        # 2 MB row groups (session default is 16 MB): with term-sorted
        # rows, parquet min/max stats per row group become the serving
        # tier's skip index — a point lookup reads ~one row group
        # instead of the whole bucket file. Scan-split sizing is
        # byte-range based, so Spark-side parallelism is unaffected.
        .option("parquet.block.size", str(2 * 1024 * 1024))
        .partitionBy("bucket")
        .parquet(path)
    )


def _segment_to_dict(seg: Segment, seg_idx: int) -> dict:
    return {
        "term": seg.term,
        "df": seg.df,
        "seg_idx": seg_idx,
        "n_postings": seg.n_postings,
        "min_doc_id": seg.min_doc_id,
        "max_doc_id": seg.max_doc_id,
        "doc_blob": seg.doc_blob,
        "tf_blob": seg.tf_blob,
        "impact_blob": seg.impact_blob,
        "block_n": seg.block_n.tolist(),
        "block_max_doc": seg.block_max_doc.tolist(),
        "block_max_impact": seg.block_max_impact.tolist(),
        "block_doc_off": seg.block_doc_off.tolist(),
        "block_tf_off": seg.block_tf_off.tolist(),
    }


def row_to_segment(row) -> Segment:
    """Rebuild a Segment view from a stored row (Row or dict-like)."""
    return Segment(
        term=row["term"],
        df=int(row["df"]),
        n_postings=int(row["n_postings"]),
        min_doc_id=int(row["min_doc_id"]),
        max_doc_id=int(row["max_doc_id"]),
        doc_blob=bytes(row["doc_blob"]),
        tf_blob=bytes(row["tf_blob"]),
        impact_blob=bytes(row["impact_blob"]),
        block_n=np.asarray(row["block_n"], dtype=np.int32),
        block_max_doc=np.asarray(row["block_max_doc"], dtype=np.int64),
        block_max_impact=np.asarray(row["block_max_impact"], dtype=np.float64),
        block_doc_off=np.asarray(row["block_doc_off"], dtype=np.int64),
        block_tf_off=np.asarray(row["block_tf_off"], dtype=np.int64),
    )


# ------------------------------------------------------- stage 1: salted


def _encode_partial(pdf: pd.DataFrame) -> pd.DataFrame:
    """One (term, shard) group → one compressed partial segment row."""
    pdf = pdf.sort_values("doc_id")
    seg = encode_segment(
        term=pdf["term"].iloc[0],
        df=int(pdf["df"].iloc[0]),
        doc_ids=pdf["doc_id"].to_numpy(np.int64),
        tfs=pdf["tf"].to_numpy(np.int64),
        impacts=pdf["impact"].to_numpy(np.float64),
    )
    return pd.DataFrame([_segment_to_dict(seg, 0)])


def build_partial_segments(
    impact_tf: DataFrame,
    n_docs: int,
    postings_per_shard: int = POSTINGS_PER_SHARD,
) -> DataFrame:
    """impact_tf: (doc_id, term, tf, impact, df) → partial segments.

    shard = floor(doc_id / ceil(n_docs / n_shards(term))) with
    n_shards = ceil(df / postings_per_shard): range-sharded salt.
    """
    n_shards = F.ceil(F.col("df") / F.lit(postings_per_shard))
    shard_width = F.ceil(F.lit(n_docs) / n_shards)
    salted = impact_tf.withColumn(
        "shard", F.floor(F.col("doc_id") / shard_width).cast("int")
    )
    return salted.groupBy("term", "shard").applyInPandas(
        _encode_partial, schema=SEGMENT_SCHEMA
    )


# ------------------------------------------------------ stage 2: merge


def _encode_runs(
    term: str,
    df_: int,
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    imps: np.ndarray,
    band_size: int,
    bucket: int | None = None,
) -> pd.DataFrame:
    rows = []
    for seg_idx, (start, end) in enumerate(
        _split_runs(doc_ids, band_size, MAX_SEGMENT_POSTINGS)
    ):
        seg = encode_segment(
            term, df_, doc_ids[start:end], tfs[start:end], imps[start:end]
        )
        d = _segment_to_dict(seg, seg_idx)
        d["bucket"] = term_bucket(term) if bucket is None else bucket
        rows.append(d)
    return pd.DataFrame(rows)[[f.name for f in INDEX_SCHEMA.fields]]


def _merge_term_fn(band_size: int):
    def _merge_term(pdf: pd.DataFrame) -> pd.DataFrame:
        """All partial segments of one term → final segments split at
        band boundaries and capped at MAX_SEGMENT_POSTINGS."""
        pdf = pdf.sort_values("min_doc_id")
        term = pdf["term"].iloc[0]
        df_ = int(pdf["df"].iloc[0])
        total = int(pdf["n_postings"].sum())

        if (
            len(pdf) == 1
            and total <= MAX_SEGMENT_POSTINGS
            and int(pdf["min_doc_id"].iloc[0]) // band_size
            == int(pdf["max_doc_id"].iloc[0]) // band_size
        ):
            out = pdf.iloc[[0]].copy()  # pass-through: blobs reused as-is
            out["seg_idx"] = 0
            out["bucket"] = term_bucket(term)
            return out[[f.name for f in INDEX_SCHEMA.fields]]

        docs, tfs, imps = [], [], []
        for _, row in pdf.iterrows():
            d, t, i = row_to_segment(row).decode_all()
            docs.append(d)
            tfs.append(t)
            imps.append(i)
        doc_ids = np.concatenate(docs)
        tfs = np.concatenate(tfs)
        imps = np.concatenate(imps)
        # shards are disjoint ascending ranges — concatenation IS
        # sorted; assert rather than re-sort (re-sorting would hide
        # salt bugs).
        assert bool(np.all(np.diff(doc_ids) > 0)), f"unsorted merge {term!r}"
        return _encode_runs(term, df_, doc_ids, tfs, imps, band_size)

    return _merge_term


def merge_segments(
    partial: DataFrame, band_size: int = DOC_BAND_SIZE
) -> DataFrame:
    """Shuffle-merge: repartition by term (blobs only — cheap) and
    concat each term's pre-sorted shard runs into final segments."""
    return partial.groupBy("term").applyInPandas(
        _merge_term_fn(band_size), schema=INDEX_SCHEMA
    )


# ------------------------------------- map-side partial encode path


def _mapside_partial_fn(projected_cols: list[str]):
    """Whole-partition partial encoder for ``build_segments_mapside``:
    accumulate each term's (doc_id, tf, impact) rows across the
    partition's Arrow batches, sort locally, emit ONE compressed
    partial segment per (term, partition). Raw TF rows never leave
    the map task — only blobs cross the exchange (guide §2.3
    "shuffle keys and metadata instead of payloads")."""

    def _partials(it):
        acc: dict[str, list[pd.DataFrame]] = {}
        dfs: dict[str, int] = {}
        for pdf in it:
            for term, grp in pdf.groupby("term", sort=False):
                acc.setdefault(term, []).append(grp)
                if term not in dfs:
                    dfs[term] = int(grp["df"].iloc[0])
        rows = []
        for term, parts in acc.items():
            g = pd.concat(parts, ignore_index=True) if len(parts) > 1 else parts[0]
            g = g.sort_values("doc_id")
            seg = encode_segment(
                term=term,
                df=dfs[term],
                doc_ids=g["doc_id"].to_numpy(np.int64),
                tfs=g["tf"].to_numpy(np.int64),
                impacts=g["impact"].to_numpy(np.float64),
            )
            rows.append(_segment_to_dict(seg, 0))
        if rows:
            yield pd.DataFrame(rows)[projected_cols]
        else:
            yield pd.DataFrame({c: [] for c in projected_cols})

    return _partials


def _merge_term_mapside_fn(band_size: int):
    def _merge_term(pdf: pd.DataFrame) -> pd.DataFrame:
        """All partial segments of one term (one per map partition,
        doc ranges OVERLAPPING in general) → final segments. Unlike
        the range-sharded merge, runs are concatenated and re-sorted
        by doc_id (unique per term, so the sort is deterministic
        regardless of shuffle arrival order)."""
        term = pdf["term"].iloc[0]
        df_ = int(pdf["df"].iloc[0])
        total = int(pdf["n_postings"].sum())
        if (
            len(pdf) == 1
            and total <= MAX_SEGMENT_POSTINGS
            and int(pdf["min_doc_id"].iloc[0]) // band_size
            == int(pdf["max_doc_id"].iloc[0]) // band_size
        ):
            out = pdf.iloc[[0]].copy()
            out["seg_idx"] = 0
            out["bucket"] = term_bucket(term)
            return out[[f.name for f in INDEX_SCHEMA.fields]]
        docs, tfs, imps = [], [], []
        for _, row in pdf.iterrows():
            d, t, i = row_to_segment(row).decode_all()
            docs.append(d)
            tfs.append(t)
            imps.append(i)
        doc_ids = np.concatenate(docs)
        order = np.argsort(doc_ids, kind="stable")
        doc_ids = doc_ids[order]
        tfs = np.concatenate(tfs)[order]
        imps = np.concatenate(imps)[order]
        assert bool(np.all(np.diff(doc_ids) > 0)), f"dup doc_id {term!r}"
        return _encode_runs(term, df_, doc_ids, tfs, imps, band_size)

    return _merge_term


def build_segments_mapside(
    impact_tf: DataFrame,
    n_docs: int,
    postings_per_shard: int = POSTINGS_PER_SHARD,
    band_size: int = DOC_BAND_SIZE,
) -> DataFrame:
    """build_segments with the encode moved BELOW the exchange.

    One pass: mapInPandas partial-encodes each map partition's rows
    into per-term compressed runs (NO shuffle — narrow over the tf
    scan), then a single groupBy(term) moves blobs only and merges.
    vs the grouped path, the exchange carries ~compressed-index bytes
    instead of raw (doc_id, term, tf, impact, df) rows, and the
    impact subtree is scanned ONCE (the old single/hot union scanned
    it twice). Final segment bytes are identical (the merge re-sorts
    by doc_id and re-encodes with the same splitter; asserted in
    tests/test_postings_mapside.py).

    ``postings_per_shard`` is unused here (no salting needed: partial
    encode is bounded by map-partition size, the merge by term like
    the sharded merge) — kept for signature compatibility.
    """
    cols = ["term", "df", "doc_id", "tf", "impact"]
    partial_cols = [f.name for f in SEGMENT_SCHEMA.fields]
    partial = impact_tf.select(*cols).mapInPandas(
        _mapside_partial_fn(partial_cols), schema=SEGMENT_SCHEMA
    )
    return partial.groupBy("term").applyInPandas(
        _merge_term_mapside_fn(band_size), schema=INDEX_SCHEMA
    )


# --------------------------------------------- adaptive single-pass


def _encode_final_fn(band_size: int):
    def _encode_final(pdf: pd.DataFrame) -> pd.DataFrame:
        """One single-shard term → final segment rows directly
        (no second shuffle), split at band boundaries + cap."""
        pdf = pdf.sort_values("doc_id")
        return _encode_runs(
            pdf["term"].iloc[0],
            int(pdf["df"].iloc[0]),
            pdf["doc_id"].to_numpy(np.int64),
            pdf["tf"].to_numpy(np.int64),
            pdf["impact"].to_numpy(np.float64),
            band_size,
        )

    return _encode_final


def build_segments(
    impact_tf: DataFrame,
    n_docs: int,
    postings_per_shard: int = POSTINGS_PER_SHARD,
    band_size: int = DOC_BAND_SIZE,
) -> DataFrame:
    """Adaptive index build — the cost-based route the reference's
    'multi-model routing' maps to (SURVEY.md §4.1 last row):

    - terms with df ≤ postings_per_shard (the overwhelming majority —
      Zipf tail) encode in ONE grouped pass: a single shuffle, no
      merge stage at all;
    - hot terms (df > postings_per_shard) take the salted two-stage
      path: range-sharded partial segments, then the blob-only
      shuffle-merge.

    Both paths produce identical bytes for a given term (asserted in
    tests), so the split is purely physical.

    The two branches consume ONE shared ``repartition("term")``
    exchange: without it, each branch's filter pushed into its own
    subtree and the tf scan + impact joins evaluated TWICE (union
    branches share nothing unless the subplans are identical). Hash
    partitioning on ``term`` satisfies the single-path groupBy's
    distribution, so no second exchange appears for the tail, and
    AQE's stage reuse materializes the common shuffle once — measured
    30.8 s → 27.9 s at 200k docs with byte-identical output and
    unchanged shuffle volume (tools/bench_encode_ab_r6.py).
    """
    common = impact_tf.repartition("term")
    single = common.filter(
        F.col("df") <= postings_per_shard
    ).groupBy("term").applyInPandas(
        _encode_final_fn(band_size), schema=INDEX_SCHEMA
    )
    hot = common.filter(F.col("df") > postings_per_shard)
    merged = merge_segments(
        build_partial_segments(hot, n_docs, postings_per_shard), band_size
    )
    return single.unionByName(merged)


# ------------------------------------------ int64-keyed build variant
#
# Round-3 verdict #5 (the next per-byte lever after the §9 TF
# relocation: on bandwidth-bound hardware cutting bytes/row beats
# adding threads): the encode shuffles carry an 8-byte
# ``tkey = xxhash64(term)`` instead of the term string; the string
# rejoins at SEGMENT granularity (vocab-sized, broadcast) just before
# the index write, so the STORED format — term strings + crc32
# buckets, query-side pushdown — is byte-identical to the default
# path (asserted in tests/test_index_bmw.py). Collisions are guarded
# at dictionary build (plans/build_index.py raises on any tkey with
# two terms — 2⁻⁶⁴-scale, but an identity-breaking hazard if ignored).

KEYED_SEGMENT_SCHEMA = T.StructType(
    [T.StructField("tkey", T.LongType())]
    + SEGMENT_FIELDS
    + [T.StructField("bucket", T.IntegerType())]
)
_KEYED_COLS = [f.name for f in KEYED_SEGMENT_SCHEMA.fields]


def _encode_partial_keyed(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values("doc_id")
    seg = encode_segment(
        term="",
        df=int(pdf["df"].iloc[0]),
        doc_ids=pdf["doc_id"].to_numpy(np.int64),
        tfs=pdf["tf"].to_numpy(np.int64),
        impacts=pdf["impact"].to_numpy(np.float64),
    )
    d = _segment_to_dict(seg, 0)
    d["tkey"] = int(pdf["tkey"].iloc[0])
    d["bucket"] = int(pdf["bucket"].iloc[0])
    return pd.DataFrame([d])[_KEYED_COLS]


def _encode_final_keyed_fn(band_size: int):
    def _encode_final_keyed(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        out = _encode_runs(
            "",
            int(pdf["df"].iloc[0]),
            pdf["doc_id"].to_numpy(np.int64),
            pdf["tf"].to_numpy(np.int64),
            pdf["impact"].to_numpy(np.float64),
            band_size,
            bucket=int(pdf["bucket"].iloc[0]),
        )
        out.insert(0, "tkey", int(pdf["tkey"].iloc[0]))
        return out[_KEYED_COLS]

    return _encode_final_keyed


def _merge_term_keyed_fn(band_size: int):
    def _merge_term_keyed(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("min_doc_id")
        tkey = int(pdf["tkey"].iloc[0])
        bucket = int(pdf["bucket"].iloc[0])
        df_ = int(pdf["df"].iloc[0])
        total = int(pdf["n_postings"].sum())

        if (
            len(pdf) == 1
            and total <= MAX_SEGMENT_POSTINGS
            and int(pdf["min_doc_id"].iloc[0]) // band_size
            == int(pdf["max_doc_id"].iloc[0]) // band_size
        ):
            out = pdf.iloc[[0]].copy()
            out["seg_idx"] = 0
            return out[_KEYED_COLS]

        docs, tfs, imps = [], [], []
        for _, row in pdf.iterrows():
            d, t, i = row_to_segment(row).decode_all()
            docs.append(d)
            tfs.append(t)
            imps.append(i)
        doc_ids = np.concatenate(docs)
        tfs = np.concatenate(tfs)
        imps = np.concatenate(imps)
        assert bool(np.all(np.diff(doc_ids) > 0)), f"unsorted merge {tkey}"
        out = _encode_runs(
            "", df_, doc_ids, tfs, imps, band_size, bucket=bucket
        )
        out.insert(0, "tkey", tkey)
        return out[_KEYED_COLS]

    return _merge_term_keyed


def build_segments_keyed(
    impact_tf_k: DataFrame,
    n_docs: int,
    postings_per_shard: int = POSTINGS_PER_SHARD,
    band_size: int = DOC_BAND_SIZE,
) -> DataFrame:
    """build_segments over (doc_id, tkey, bucket, tf, impact, df) —
    same adaptive single-pass/salted split, int64 group keys, term
    column left '' for the dictionary join in plans/build_index.py.
    Shares one tkey exchange across the branches like
    build_segments."""
    common = impact_tf_k.repartition("tkey")
    single = common.filter(
        F.col("df") <= postings_per_shard
    ).groupBy("tkey").applyInPandas(
        _encode_final_keyed_fn(band_size), schema=KEYED_SEGMENT_SCHEMA
    )
    hot = common.filter(F.col("df") > postings_per_shard)
    n_shards = F.ceil(F.col("df") / F.lit(postings_per_shard))
    shard_width = F.ceil(F.lit(n_docs) / n_shards)
    salted = hot.withColumn(
        "shard", F.floor(F.col("doc_id") / shard_width).cast("int")
    )
    partial = salted.groupBy("tkey", "shard").applyInPandas(
        _encode_partial_keyed, schema=KEYED_SEGMENT_SCHEMA
    )
    merged = partial.groupBy("tkey").applyInPandas(
        _merge_term_keyed_fn(band_size), schema=KEYED_SEGMENT_SCHEMA
    )
    return single.unionByName(merged)
