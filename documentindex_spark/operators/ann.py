"""Similarity search over embedding columns (array<float>).

- ``brute_force_topk``: exact cosine top-k — the baseline/oracle.
  Pure built-ins (zip_with dot product, TakeOrderedAndProject) —
  a full scan, fine up to ~10^7 vectors per executor-core.
- ``lsh_sign_buckets`` + ``lsh_topk``: random-hyperplane LSH — a
  scale path. Vectors bucket by the sign-bit pattern of R seeded
  hyperplane projections (one vectorized pandas pass, numpy matmul);
  a query probes its own bucket plus all buckets within
  ``probe_bits`` Hamming flips (multi-probe), then scores exactly
  within the probed buckets. Candidates shrink ~2^R-fold; recall is
  tunable via R/probe_bits (measured in tests, not assumed).
- ``ivf_centroids`` + ``ivf_assign`` + ``ivf_topk``: IVF — the other
  scale path. A coarse quantizer partitions vectors into C inverted
  lists; a query scans only the ``n_probe`` nearest lists. The
  quantizer here is deterministic id-ordered sampling (swap in
  pyspark.ml KMeans without touching assign/probe) so the whole
  pipeline is DuckDB-reproducible; recall measured in tests.

Task-brief scope (training-data pipeline ops); no reference analog —
the reference has no vector search.
"""

from __future__ import annotations

from itertools import combinations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .dedup import cosine_sim_col

SEED = 42


def brute_force_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: (vec_id, cos, rank), ties (cos DESC, id ASC).

    Scoring stays on the JVM lambda (``cosine_sim_col``) by MEASURED
    decision, not assumption: an Arrow-batched pandas-UDF matvec was
    A/B'd interleaved (tools/bench_cosine.py, BENCH/BASELINE.md §7.5)
    and LOST for single-dot-per-row shapes — 0.94s vs 2.59s at
    400k×128 and 0.76s vs 1.10s at 100k×768 — because the per-row
    Arrow transfer of the vector column outweighs the interpreted
    lambda. The matmul form wins only when each transferred row feeds
    MANY dot products (see ``ivf_assign``: C=64 → 8-14×)."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = emb.select(
        id_col, F.round(cosine_sim_col(F.col(vec_col), q), 6).alias("cos")
    )
    from pyspark.sql.window import Window

    lim = scored.orderBy(F.desc("cos"), F.asc(id_col)).limit(k)
    w = Window.orderBy(F.desc("cos"), F.asc(id_col))
    return lim.withColumn("rank", F.row_number().over(w))


# ----------------------------------------------------------------- IVF


def ivf_centroids(
    emb: DataFrame,
    n_centroids: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic sampled coarse quantizer: the ``n_centroids``
    lowest-id vectors become centroids. (Production IVF trains
    k-means on a sample; id-ordered sampling keeps the quantizer
    deterministic AND DuckDB-reproducible for the oracle gate — swap
    in pyspark.ml KMeans centroids without touching assign/probe.)"""
    return (
        emb.orderBy(id_col)
        .limit(n_centroids)
        .select(
            F.col(id_col).alias("centroid_id"),
            F.col(vec_col).alias("centroid"),
        )
    )


def ivf_centroids_kmeans(
    emb: DataFrame,
    n_centroids: int,
    seed: int = SEED,
    max_iter: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """KMeans-trained coarse quantizer (the production IVF path) —
    pyspark.ml KMeans over the embedding column, seeded for
    reproducibility. Returns the same (centroid_id, centroid) shape
    as ``ivf_centroids``, so assign/probe are unchanged. Not
    SQL-reproducible (iterative) — covered by recall tests rather
    than the DuckDB oracle (the sampled quantizer keeps that role)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    spark = emb.sparkSession
    feats = emb.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias(
            "features"
        )
    )
    model = KMeans(
        k=n_centroids, seed=seed, maxIter=max_iter, featuresCol="features"
    ).fit(feats)
    rows = [
        (i, [float(x) for x in c])
        for i, c in enumerate(model.clusterCenters())
    ]
    return spark.createDataFrame(
        rows, f"centroid_id long, centroid array<double>"
    )


def ivf_assign(
    emb: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, embedding, centroid_id): nearest centroid by cosine
    (rounded to 6dp; ties → min centroid_id — deterministic).

    Centroids collect to the driver (C is broadcast-sized by
    definition) and ride the UDF closure; assignment is ONE
    (batch × dim) @ (dim × C) numpy matmul per Arrow batch. This
    replaces the round-2 crossJoin + interpreted-lambda + per-vector
    window plan, which materialized |emb|×C rows and paid the lambda
    interpreter per element — at 10^9 vectors the assign pass IS the
    index build. Rounding is HALF_UP at 6dp (trunc(x·1e6 ± 0.5)) to
    mirror F.round/DuckDB round, and ids are scanned ascending so
    numpy's first-max argmax reproduces the (cos DESC, centroid_id
    ASC) tie-break exactly. Persist the result — it IS the IVF
    index.

    Residual boundary risk (round-3 advice, acknowledged): the
    trunc-based HALF_UP rounds the BINARY double while Spark/DuckDB
    round the shortest-decimal representation, and numpy matmul's
    pairwise summation can differ from a sequential sum in the last
    ulp — so a cosine landing within ~1e-16 of a .5×10⁻⁶ rounding
    boundary could assign differently than the SQL twin on another
    corpus. Accepted rather than papered over: an exact-recompute
    fallback for near-tie centroids would put a second pass in the
    hot path of every build for a hazard the verify suite has never
    observed; the gate corpus asserts identity, and any future
    mismatch localizes here."""
    rows = sorted(centroids.collect(), key=lambda r: r["centroid_id"])
    ids = np.asarray([int(r["centroid_id"]) for r in rows], dtype=np.int64)
    cmat = np.vstack(
        [np.asarray(r["centroid"], dtype=np.float64) for r in rows]
    ).T  # dim × C
    cnorm = np.linalg.norm(cmat, axis=0)

    @F.pandas_udf(T.LongType())
    def best_centroid(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype="int64")
        m = np.vstack(vecs.to_numpy()).astype(np.float64)
        sims = (m @ cmat) / (
            np.linalg.norm(m, axis=1)[:, None] * cnorm[None, :]
        )
        sims6 = np.trunc(sims * 1e6 + np.copysign(0.5, sims)) / 1e6
        return pd.Series(ids[np.argmax(sims6, axis=1)])

    return emb.select(
        id_col, vec_col, best_centroid(F.col(vec_col)).alias("centroid_id")
    )


def ivf_topk(
    assigned: DataFrame,
    centroids: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: rank centroids by cosine to the query, scan
    ONLY the top ``n_probe`` inverted lists, score exactly inside —
    candidates shrink ~C/n_probe-fold. (vec_id, cos, rank).

    Candidate rescoring keeps the JVM-lambda cosine — single dot per
    row; the pandas matvec measured SLOWER for that shape (see
    brute_force_topk docstring / BENCH/BASELINE.md §7.5)."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    probes = [
        r["centroid_id"]
        for r in centroids.select(
            "centroid_id",
            F.round(cosine_sim_col(F.col("centroid"), q), 6).alias("qcos"),
        )
        .orderBy(F.desc("qcos"), F.asc("centroid_id"))
        .limit(n_probe)
        .collect()
    ]
    cand = assigned.filter(F.col("centroid_id").isin(probes))
    scored = cand.select(
        id_col, F.round(cosine_sim_col(F.col(vec_col), q), 6).alias("cos")
    )
    from pyspark.sql.window import Window

    lim = scored.orderBy(F.desc("cos"), F.asc(id_col)).limit(k)
    w = Window.orderBy(F.desc("cos"), F.asc(id_col))
    return lim.withColumn("rank", F.row_number().over(w))


def _hyperplanes(dim: int, n_planes: int) -> np.ndarray:
    rng = np.random.default_rng(SEED)
    return rng.standard_normal((dim, n_planes))


def lsh_sign_buckets(
    emb: DataFrame,
    dim: int,
    n_planes: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, embedding, bucket) — bucket = packed sign bits of the
    seeded hyperplane projections. One Arrow-batched pandas pass;
    inside, a single (batch × dim) @ (dim × planes) matmul.

    Projections run in float64 (inputs are float32): the DuckDB twin
    of embedding_near_dup_lsh computes the same projections as
    sequential double sums, and float32 matmul error (~1e-6 relative)
    made sign flips near zero plausible; in float64 the residual
    divergence is matmul's pairwise-vs-sequential summation order,
    last-ulp only (~1e-16 relative) — a projection would have to land
    within ~1e-15 of zero to flip. Same accepted boundary-risk class
    as ivf_assign's rounding note."""
    planes = _hyperplanes(dim, n_planes)

    @F.pandas_udf(T.LongType())
    def bucket_of(vecs: pd.Series) -> pd.Series:
        m = np.vstack(vecs.to_numpy()).astype(np.float64)
        signs = (m @ planes) > 0
        weights = (1 << np.arange(n_planes)).astype(np.int64)
        return pd.Series(signs.astype(np.int64) @ weights)

    return emb.select(
        id_col, vec_col, bucket_of(F.col(vec_col)).alias("bucket")
    )


def _probe_buckets(bucket: int, n_planes: int, probe_bits: int) -> list[int]:
    out = [bucket]
    for r in range(1, probe_bits + 1):
        for flips in combinations(range(n_planes), r):
            b = bucket
            for f in flips:
                b ^= 1 << f
            out.append(b)
    return out


def lsh_topk(
    bucketed: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 12,
    probe_bits: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: exact cosine within the query's probed
    buckets only. `bucketed` comes from lsh_sign_buckets (persist it —
    it's the 'index')."""
    planes = _hyperplanes(len(query_vec), n_planes)
    signs = (np.asarray(query_vec) @ planes) > 0
    qb = int(signs.astype(np.int64) @ (1 << np.arange(n_planes)))
    probes = _probe_buckets(qb, n_planes, probe_bits)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    cand = bucketed.filter(F.col("bucket").isin(probes))
    scored = cand.select(
        id_col, F.round(cosine_sim_col(F.col(vec_col), q), 6).alias("cos")
    )
    from pyspark.sql.window import Window

    lim = scored.orderBy(F.desc("cos"), F.asc(id_col)).limit(k)
    w = Window.orderBy(F.desc("cos"), F.asc(id_col))
    return lim.withColumn("rank", F.row_number().over(w))
