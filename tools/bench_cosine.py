"""A/B: interpreted higher-order-lambda cosine vs vectorized pandas
UDF (numpy matmul per Arrow batch) on the ANN hot loops.

Two stages, matching the round-2 verdict's scale-weak call-outs:
  rescore — score N vectors against one query vector
            (brute_force_topk / ivf_topk / lsh_topk inner loop)
  assign  — nearest-of-C centroid assignment
            (old: crossJoin + lambda + per-vector window;
             new: one (batch × dim) @ (dim × C) matmul per batch)

Protocol per CLAUDE.md: interleaved A/B (noisy box), medians over
REPEATS runs, input persisted + counted before timing. Writes one
JSON line and BENCH/cosine_ab.json.

Usage: python tools/bench_cosine.py [N_VECS] [DIM] [N_CENTROIDS] [REPEATS]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

from documentindex_spark.operators import ann  # noqa: E402
from documentindex_spark.operators.dedup import cosine_sim_col  # noqa: E402
from documentindex_spark.session import get_spark  # noqa: E402


def cosine_to_query_pandas(vec_col, query_vec):
    """The B side of the rescore A/B: Arrow-batched pandas matvec.
    Lives here (not in the engine) because it LOST the measurement —
    kept runnable so the decision stays re-checkable on new hardware."""
    qv = np.asarray(query_vec, dtype=np.float64)
    qn = float(np.linalg.norm(qv))

    @F.pandas_udf(T.DoubleType())
    def _cos(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype="float64")
        m = np.vstack(vecs.to_numpy()).astype(np.float64)
        return pd.Series((m @ qv) / (np.linalg.norm(m, axis=1) * qn))

    return _cos(vec_col)


def _assign_crossjoin(emb, centroids, id_col="vec_id", vec_col="embedding"):
    """Round-2 ivf_assign plan, kept here ONLY as the A side of the
    benchmark: crossJoin to |emb|×C rows, interpreted-lambda cosine,
    per-vector window for the argmax."""
    from pyspark.sql.window import Window

    ccos = F.round(cosine_sim_col(F.col(vec_col), F.col("centroid")), 6)
    scored = emb.crossJoin(F.broadcast(centroids)).select(
        id_col, "centroid_id", ccos.alias("ccos")
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("ccos"), F.asc("centroid_id"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(id_col, "centroid_id")
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    n_cent = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 5
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "bench-cosine", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )

    # deterministic synthetic vectors: dim columns of seeded rand
    emb = (
        spark.range(n)
        .select(
            F.col("id").alias("vec_id"),
            F.array(
                *[(F.rand(seed=1000 + i) * 2 - 1) for i in range(dim)]
            ).alias("embedding"),
        )
        .persist()
    )
    emb.count()
    qvec = [((i * 2654435761) % 1000) / 500.0 - 1.0 for i in range(dim)]
    q_lit = F.array(*[F.lit(float(x)) for x in qvec])
    centroids = ann.ivf_centroids(emb, n_cent).persist()
    centroids.count()

    def time_action(df) -> float:
        t0 = time.time()
        df.agg(F.sum("x")).collect()
        return time.time() - t0

    variants = {
        "rescore_lambda": lambda: time_action(
            emb.select(cosine_sim_col(F.col("embedding"), q_lit).alias("x"))
        ),
        "rescore_pandas": lambda: time_action(
            emb.select(
                cosine_to_query_pandas(F.col("embedding"), qvec).alias("x")
            )
        ),
        "assign_crossjoin_lambda": lambda: time_action(
            _assign_crossjoin(emb, centroids).select(
                F.col("centroid_id").alias("x")
            )
        ),
        "assign_matmul_pandas": lambda: time_action(
            ann.ivf_assign(emb, centroids).select(
                F.col("centroid_id").alias("x")
            )
        ),
    }

    samples: dict[str, list[float]] = {k: [] for k in variants}
    for rep in range(reps):  # interleave: noisy-box protocol
        for name, fn in variants.items():
            samples[name].append(fn())
            print(f"rep {rep} {name}: {samples[name][-1]:.2f}s", flush=True)

    med = {k: round(statistics.median(v), 3) for k, v in samples.items()}
    out = {
        "metric": "cosine_ab_medians_sec",
        "n_vecs": n,
        "dim": dim,
        "n_centroids": n_cent,
        "repeats": reps,
        "cores": int(cpus),
        "medians": med,
        "speedup_rescore": round(
            med["rescore_lambda"] / med["rescore_pandas"], 2
        ),
        "speedup_assign": round(
            med["assign_crossjoin_lambda"] / med["assign_matmul_pandas"], 2
        ),
        "samples": {k: [round(x, 3) for x in v] for k, v in samples.items()},
    }
    print(json.dumps(out))
    os.makedirs("BENCH", exist_ok=True)
    # _last, not the curated BENCH/cosine_ab.json decision record
    with open("BENCH/cosine_ab_last.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
