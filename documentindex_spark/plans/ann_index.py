"""Persisted IVF-ANN index: centroid-partitioned parquet + metadata.

The stored-index maturity step for vector search, mirroring the text
index's layout discipline (postings: bucket-partitioned parquet +
stats.json): ``ivf_assign`` runs ONCE at build, inverted lists land
as parquet partitioned by ``centroid_id``, centroids + config go to
a JSON sidecar. A query then reads ONLY its ``n_probe`` lists — the
scan shows PartitionFilters, so at 10^9 vectors a probe touches
n_probe/C of the data (asserted on the plan in tests/test_ann.py).

Query results are bit-identical to the in-memory ``ann.ivf_topk``
over the same quantizer (same HALF_UP 6dp rounding and (cos DESC, id
ASC) tie-breaks at both the probe-selection and rescore stages) —
asserted in tests and checked against the same DuckDB oracle as
`ann_ivf_topk` in the driver gate (`ann_index_topk`).
"""

from __future__ import annotations

import json
import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.ann import ivf_assign, ivf_centroids, ivf_centroids_kmeans
from ..operators.dedup import cosine_sim_col


def build_ann_index(
    emb: DataFrame,
    out_dir: str,
    n_centroids: int = 8,
    quantizer: str = "sampled",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """Build the stored IVF index; returns ``out_dir``. quantizer ∈
    {'sampled' (deterministic, oracle-able), 'kmeans' (production)}."""
    if quantizer == "sampled":
        cents = ivf_centroids(emb, n_centroids, id_col, vec_col)
    elif quantizer == "kmeans":
        cents = ivf_centroids_kmeans(
            emb, n_centroids, id_col=id_col, vec_col=vec_col
        )
    else:
        raise ValueError(f"unknown quantizer {quantizer!r}")
    rows = sorted(cents.collect(), key=lambda r: r["centroid_id"])
    os.makedirs(out_dir, exist_ok=True)
    ivf_assign(emb, cents, id_col, vec_col).write.mode(
        "overwrite"
    ).partitionBy("centroid_id").parquet(os.path.join(out_dir, "lists"))
    with open(os.path.join(out_dir, "centroids.json"), "w") as f:
        json.dump(
            {
                "n_centroids": n_centroids,
                "quantizer": quantizer,
                "id_col": id_col,
                "vec_col": vec_col,
                "centroids": [
                    {
                        "centroid_id": int(r["centroid_id"]),
                        "centroid": [float(x) for x in r["centroid"]],
                    }
                    for r in rows
                ],
            },
            f,
        )
    return out_dir


def append_ann_index(
    emb_new: DataFrame, out_dir: str
) -> str:
    """Append new vectors to a stored IVF index WITHOUT touching the
    existing lists: the frozen quantizer (sidecar centroids) assigns
    the batch, and the new rows land in their centroid partitions via
    parquet append — the ingestion shape for a live vector corpus.
    (Quantizer drift under heavy append is the standard IVF caveat:
    rebuild with quantizer='kmeans' when list sizes skew; list row
    counts are one `groupBy(centroid_id).count()` away.)"""
    with open(os.path.join(out_dir, "centroids.json")) as f:
        meta = json.load(f)
    spark = emb_new.sparkSession
    cents = spark.createDataFrame(
        [
            (c["centroid_id"], c["centroid"])
            for c in meta["centroids"]
        ],
        "centroid_id long, centroid array<double>",
    )
    ivf_assign(
        emb_new, cents, meta["id_col"], meta["vec_col"]
    ).write.mode("append").partitionBy("centroid_id").parquet(
        os.path.join(out_dir, "lists")
    )
    return out_dir


def _round6_half_up(x: np.ndarray) -> np.ndarray:
    return np.trunc(x * 1e6 + np.copysign(0.5, x)) / 1e6


def probe_lists(out_dir: str, query_vec: list[float], n_probe: int) -> list[int]:
    """Driver-side probe selection from the JSON sidecar — no Spark
    job: centroid count is broadcast-sized by definition. Rounding and
    tie-break replicate the relational path exactly (HALF_UP 6dp,
    qcos DESC, centroid_id ASC)."""
    with open(os.path.join(out_dir, "centroids.json")) as f:
        meta = json.load(f)
    ids = np.asarray(
        [c["centroid_id"] for c in meta["centroids"]], dtype=np.int64
    )
    cmat = np.vstack(
        [np.asarray(c["centroid"], dtype=np.float64) for c in meta["centroids"]]
    )
    q = np.asarray(query_vec, dtype=np.float64)
    cos = (cmat @ q) / (np.linalg.norm(cmat, axis=1) * np.linalg.norm(q))
    cos6 = _round6_half_up(cos)
    order = np.lexsort((ids, -cos6))  # qcos DESC, centroid_id ASC
    return [int(i) for i in ids[order[:n_probe]]]


def ann_index_topk(
    spark: SparkSession,
    out_dir: str,
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 3,
) -> DataFrame:
    """(vec_id, cos, rank) from the STORED index: partition-pruned
    scan of the n_probe inverted lists, exact rescore inside (JVM
    lambda — the measured winner for 1-dot/row, BASELINE.md §7.5)."""
    with open(os.path.join(out_dir, "centroids.json")) as f:
        meta = json.load(f)
    id_col, vec_col = meta["id_col"], meta["vec_col"]
    probes = probe_lists(out_dir, query_vec, n_probe)
    lists = spark.read.parquet(os.path.join(out_dir, "lists"))
    cand = lists.filter(F.col("centroid_id").isin(probes))
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = cand.select(
        id_col, F.round(cosine_sim_col(F.col(vec_col), q), 6).alias("cos")
    )
    from pyspark.sql.window import Window

    lim = scored.orderBy(F.desc("cos"), F.asc(id_col)).limit(k)
    w = Window.orderBy(F.desc("cos"), F.asc(id_col))
    return lim.withColumn("rank", F.row_number().over(w))
