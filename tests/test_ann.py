"""ANN: brute-force exactness vs numpy; LSH recall measured against
brute force on the driver-provided embeddings table."""

from __future__ import annotations

import numpy as np
import pytest

from documentindex_spark.operators.ann import (
    brute_force_topk,
    lsh_sign_buckets,
    lsh_topk,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def emb_np(emb):
    rows = emb.collect()
    ids = np.array([r["vec_id"] for r in rows])
    m = np.vstack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    return ids, m


def _np_topk(ids, m, q, k):
    qv = np.asarray(q, dtype=np.float64)
    cos = (m @ qv) / (np.linalg.norm(m, axis=1) * np.linalg.norm(qv))
    order = np.lexsort((ids, -np.round(cos, 6)))
    return [(int(ids[i]), round(float(cos[i]), 6)) for i in order[:k]]


def test_brute_force_matches_numpy(spark, emb, emb_np):
    ids, m = emb_np
    q = m[7].tolist()
    got = [
        (r["vec_id"], r["cos"])
        for r in brute_force_topk(emb, q, k=10).orderBy("rank").collect()
    ]
    want = _np_topk(ids, m, q, 10)
    assert [d for d, _ in got] == [d for d, _ in want]
    assert [s for _, s in got] == pytest.approx([s for _, s in want], abs=1e-6)
    assert got[0][0] == 7  # self-match first


def test_lsh_recall(spark, emb, emb_np):
    ids, m = emb_np
    dim = m.shape[1]
    bucketed = lsh_sign_buckets(emb, dim, n_planes=8).cache()
    bucketed.count()
    recalls = []
    for qi in [1, 5, 11, 42, 99]:
        q = m[qi].tolist()
        exact = {d for d, _ in _np_topk(ids, m, q, 10)}
        approx = {
            r["vec_id"]
            for r in lsh_topk(
                bucketed, q, k=10, n_planes=8, probe_bits=3
            ).collect()
        }
        recalls.append(len(exact & approx) / 10)
    # these testdata embeddings are near-random (no planted clusters),
    # the worst case for sign-LSH; 0.5 avg recall at ~36% of buckets
    # probed is the measured tradeoff point (see lsh tuning note).
    assert sum(recalls) / len(recalls) >= 0.5, recalls
    # top-1 (the vector itself) must always survive bucketing
    for qi in [1, 5, 11]:
        q = m[qi].tolist()
        top = lsh_topk(bucketed, q, k=1, n_planes=8, probe_bits=0).collect()
        assert top and top[0]["vec_id"] == qi


def test_ivf_partitions_every_vector(spark, emb):
    from documentindex_spark.operators.ann import ivf_assign, ivf_centroids

    cents = ivf_centroids(emb, 8)
    assigned = ivf_assign(emb, cents)
    n = emb.count()
    assert assigned.count() == n  # exactly one list per vector
    assert assigned.select("centroid_id").distinct().count() <= 8
    # deterministic across runs
    a = sorted(map(tuple, assigned.select("vec_id", "centroid_id").collect()))
    b = sorted(map(tuple, ivf_assign(emb, cents).select("vec_id", "centroid_id").collect()))
    assert a == b


def test_ivf_recall_vs_brute_force(spark, emb, emb_np):
    from documentindex_spark.operators.ann import (
        ivf_assign,
        ivf_centroids,
        ivf_topk,
    )

    ids, m = emb_np
    cents = ivf_centroids(emb, 8)
    assigned = ivf_assign(emb, cents).cache()
    assigned.count()
    recalls = []
    for qid in (3, 7, 11, 19):
        q = list(m[list(ids).index(qid)])
        got = {
            int(r["vec_id"])
            for r in ivf_topk(assigned, cents, q, k=10, n_probe=4).collect()
        }
        want = {d for d, _ in _np_topk(ids, m, q, 10)}
        recalls.append(len(got & want) / 10)
    # probing half the lists must recover most of the exact top-10;
    # n_probe == C degenerates to brute force (exactness checked next)
    assert sum(recalls) / len(recalls) >= 0.5, recalls


def test_ivf_full_probe_equals_brute_force(spark, emb, emb_np):
    from documentindex_spark.operators.ann import (
        brute_force_topk,
        ivf_assign,
        ivf_centroids,
        ivf_topk,
    )

    ids, m = emb_np
    q = list(m[list(ids).index(7)])
    cents = ivf_centroids(emb, 8)
    assigned = ivf_assign(emb, cents)
    got = [
        (int(r["vec_id"]), r["cos"])
        for r in ivf_topk(assigned, cents, q, k=10, n_probe=8).collect()
    ]
    want = [
        (int(r["vec_id"]), r["cos"])
        for r in brute_force_topk(emb, q, k=10).collect()
    ]
    assert got == want


def test_ivf_kmeans_quantizer_recall(spark, emb, emb_np):
    """The KMeans-trained quantizer plugs into the same assign/probe
    and should reach at least the sampled quantizer's recall."""
    from documentindex_spark.operators.ann import (
        ivf_assign,
        ivf_centroids_kmeans,
        ivf_topk,
    )

    ids, m = emb_np
    cents = ivf_centroids_kmeans(emb, 8, seed=42).cache()
    assert cents.count() == 8
    assigned = ivf_assign(emb, cents).cache()
    assert assigned.count() == emb.count()
    recalls = []
    for qid in (3, 7, 11, 19):
        q = list(m[list(ids).index(qid)])
        got = {
            int(r["vec_id"])
            for r in ivf_topk(assigned, cents, q, k=10, n_probe=4).collect()
        }
        want = {d for d, _ in _np_topk(ids, m, q, 10)}
        recalls.append(len(got & want) / 10)
    assert sum(recalls) / len(recalls) >= 0.5, recalls
    # seeded determinism: same centroids on refit
    again = ivf_centroids_kmeans(emb, 8, seed=42)
    a = sorted(map(tuple, (tuple(r["centroid"]) for r in cents.collect())))
    b = sorted(map(tuple, (tuple(r["centroid"]) for r in again.collect())))
    import numpy as np

    assert np.allclose(np.array(a), np.array(b))


def test_stored_ann_index_identity_and_pruning(spark, emb, tmp_path):
    """The persisted IVF index returns rows IDENTICAL to the in-memory
    ivf_topk over the same quantizer, and its scan is partition-pruned
    to the probed lists."""
    from documentindex_spark.operators.ann import (
        ivf_assign,
        ivf_centroids,
        ivf_topk,
    )
    from documentindex_spark.plans import ann_index

    out = str(tmp_path / "annidx")
    ann_index.build_ann_index(emb, out, n_centroids=8)
    qv = list(emb.filter("vec_id = 7").head()["embedding"])

    stored = ann_index.ann_index_topk(spark, out, qv, k=10, n_probe=3)
    cents = ivf_centroids(emb, 8)
    mem = ivf_topk(ivf_assign(emb, cents), cents, qv, k=10, n_probe=3)
    assert sorted(map(tuple, stored.collect())) == sorted(
        map(tuple, mem.collect())
    )

    # probe selection is driver-side and matches the relational path
    probes = ann_index.probe_lists(out, qv, 3)
    assert len(probes) == 3 and len(set(probes)) == 3

    # partition pruning: the candidate scan reads only probed lists
    lists = spark.read.parquet(f"{out}/lists")
    import pyspark.sql.functions as F

    plan = (
        lists.filter(F.col("centroid_id").isin(probes))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters: [centroid_id" in plan.replace(
        "PartitionFilters: [isnotnull(centroid_id", "PartitionFilters: [centroid_id"
    ), plan


def test_stored_ann_index_kmeans_quantizer(spark, emb, tmp_path):
    from documentindex_spark.plans import ann_index

    out = str(tmp_path / "annidx_km")
    ann_index.build_ann_index(emb, out, n_centroids=8, quantizer="kmeans")
    qv = list(emb.filter("vec_id = 7").head()["embedding"])
    rows = ann_index.ann_index_topk(spark, out, qv, k=10, n_probe=3).collect()
    assert len(rows) == 10
    assert [r["rank"] for r in rows] == list(range(1, 11))


def test_stored_ann_index_append(spark, emb, tmp_path):
    """Appending a batch with the frozen quantizer must equal building
    from the union corpus (sampled quantizer + id-ordered centroids ⇒
    same centroids either way when the base holds the low ids)."""
    from documentindex_spark.plans import ann_index

    base = emb.filter("vec_id < 150")
    rest = emb.filter("vec_id >= 150")
    inc = str(tmp_path / "inc")
    ann_index.build_ann_index(base, inc, n_centroids=8)
    ann_index.append_ann_index(rest, inc)

    full = str(tmp_path / "full")
    ann_index.build_ann_index(emb, full, n_centroids=8)

    qv = list(emb.filter("vec_id = 7").head()["embedding"])
    a = sorted(map(tuple, ann_index.ann_index_topk(spark, inc, qv, 10, 3).collect()))
    b = sorted(map(tuple, ann_index.ann_index_topk(spark, full, qv, 10, 3).collect()))
    assert a == b
    # every vector present exactly once after the append
    n = spark.read.parquet(f"{inc}/lists").count()
    assert n == emb.count()
