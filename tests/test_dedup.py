"""Dedup suite: exact, n-gram Jaccard, MinHash-LSH, SimHash,
embedding cosine — each verified against a driver-side pure-Python
computation on a corpus with PLANTED duplicates."""

from __future__ import annotations

import hashlib
from itertools import combinations

import pytest

from documentindex_spark.operators import dedup

BASE = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
DOCS = [
    (0, BASE),
    (1, BASE),  # exact dup of 0
    (2, BASE + " extra tail words here"),  # near-dup of 0
    (3, "completely different content about spark and indexes"),
    (4, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),  # near
    (5, "unrelated text with its own vocabulary entirely"),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _py_shingles(text, k=3):
    toks = text.lower().split()
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def _py_jaccard(a, b, k=3):
    sa, sb = _py_shingles(a, k), _py_shingles(b, k)
    return len(sa & sb) / len(sa | sb)


def test_exact_duplicates(docs_df):
    groups = dedup.exact_duplicates(docs_df).collect()
    assert len(groups) == 1
    assert groups[0]["doc_ids"] == [0, 1]


def test_shingles_match_python(docs_df):
    got = {
        (r["doc_id"], r["shingle"])
        for r in dedup.shingles(docs_df, k=3).collect()
    }
    want = {
        (i, sh) for i, t in DOCS for sh in _py_shingles(t, 3)
    }
    assert got == want


def test_ngram_jaccard_pairs(docs_df):
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(docs_df, threshold=0.3).collect()
    }
    want = {}
    for (ia, ta), (ib, tb) in combinations(DOCS, 2):
        j = _py_jaccard(ta, tb)
        if j >= 0.3:
            want[(ia, ib)] = round(j, 6)
    assert set(got) == set(want)
    for kpair in got:
        assert got[kpair] == pytest.approx(want[kpair], abs=1e-6)


def test_minhash_signature_matches_python(docs_df):
    sigs = {r["doc_id"]: r for r in dedup.minhash_signatures(docs_df, 8).collect()}
    for doc_id, text in DOCS:
        for i in range(8):
            want = min(
                int(hashlib.md5(f"{i}|{sh}".encode()).hexdigest()[:8], 16)
                for sh in _py_shingles(text)
            )
            assert sigs[doc_id][f"mh_{i}"] == want, (doc_id, i)


def test_minhash_lsh_finds_planted_dups(docs_df):
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.minhash_near_duplicates(
            docs_df, threshold=0.5, num_hashes=16, bands=8
        ).collect()
    }
    assert (0, 1) in pairs  # exact dup always collides
    assert (3, 5) not in pairs


def test_minhash_near_dup_is_candidates_intersect_exact(docs_df):
    """Candidates-only verification returns exactly
    (LSH candidates) ∩ (exact Jaccard ≥ t) with identical scores —
    same result set as the old all-pairs verify, without the
    quadratic shingle self-join."""
    cand = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.minhash_lsh_candidates(
            docs_df, num_hashes=16, bands=8
        ).collect()
    }
    exact = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(docs_df, threshold=0.5).collect()
    }
    want = {p: j for p, j in exact.items() if p in cand}
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.minhash_near_duplicates(
            docs_df, threshold=0.5, num_hashes=16, bands=8
        ).collect()
    }
    assert got == want


def _py_simhash(text: str) -> int:
    """The original (round-1, applyInPandas) simhash algorithm as a
    driver-side oracle: regression pin for the built-in-aggregate
    rewrite."""
    import re
    from collections import Counter

    tf = Counter(t for t in re.split(r"[^a-z0-9]+", text.lower()) if t)
    acc = [0.0] * 64
    for t, w in tf.items():
        h = int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "big")
        for i in range(64):
            acc[i] += w if (h >> i) & 1 else -w
    sig = 0
    for i in range(64):
        if acc[i] > 0:
            sig |= 1 << i
    return sig - (1 << 64) if sig >= (1 << 63) else sig


def test_simhash_matches_python_oracle(docs_df):
    got = {
        r["doc_id"]: r["simhash"]
        for r in dedup.simhash_signatures(docs_df).collect()
    }
    for doc_id, text in DOCS:
        assert got[doc_id] == _py_simhash(text), doc_id


def test_simhash_plan_has_no_python_stage(docs_df):
    df = dedup.simhash_signatures(docs_df)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" not in plan
    assert "ArrowEvalPython" not in plan


def test_simhash_identical_docs_equal(docs_df):
    sigs = {r["doc_id"]: r["simhash"] for r in dedup.simhash_signatures(docs_df).collect()}
    assert sigs[0] == sigs[1]
    assert sigs[0] != sigs[3]


def test_simhash_near_duplicates(docs_df):
    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in dedup.simhash_near_duplicates(docs_df, max_hamming=10).collect()
    }
    assert got[(0, 1)] == 0
    assert (3, 5) not in got


def test_embedding_near_duplicates(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.99, 0.01, 0.0]),
        (2, [0.0, 1.0, 0.0]),
        (3, [-1.0, 0.0, 0.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.embedding_near_duplicates(emb, 0.95).collect()
    }
    assert got == {(0, 1)}


def _planted_embeddings(spark, n_base=40, n_dups=25, dim=16):
    """Seeded base vectors + near-copies (small perturbation →
    cos ≥ ~0.99): the regime semantic dedup exists for."""
    import numpy as np

    rng = np.random.default_rng(7)
    base = rng.standard_normal((n_base, dim))
    rows = [(i, [float(x) for x in base[i]]) for i in range(n_base)]
    planted = []
    for j in range(n_dups):
        src = j % n_base
        noisy = base[src] + 0.02 * rng.standard_normal(dim)
        rows.append((1000 + j, [float(x) for x in noisy]))
        planted.append((src, 1000 + j))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )
    return emb, planted


def test_embedding_lsh_verified_subset_of_brute(spark):
    """Every pair the LSH path emits must appear in the brute ground
    truth with the IDENTICAL rounded cosine (the verify stage is
    exact — LSH only affects candidate recall, never precision)."""
    emb, _ = _planted_embeddings(spark)
    thr = 0.9
    brute = {
        (r["doc_a"], r["doc_b"]): r["cos"]
        for r in dedup.embedding_near_duplicates(emb, thr).collect()
    }
    lsh = {
        (r["doc_a"], r["doc_b"]): r["cos"]
        for r in dedup.embedding_near_duplicates_lsh(
            emb, thr, dim=16
        ).collect()
    }
    assert set(lsh) <= set(brute)
    for pair, cos in lsh.items():
        assert cos == brute[pair]
    # recall at near-dup similarity: ≥ 90% of planted pairs (16/4
    # banding gives ~98% per-pair survival at q ≥ 0.9; seeded data
    # makes the actual value deterministic)
    assert len(lsh) >= 0.9 * len(brute) > 0


def test_embedding_lsh_bucket_size_guard(spark):
    """100 identical embeddings share every band bucket → B² pair
    mass; the cap drops those buckets while distinct-vector pairs
    from small buckets survive."""
    import numpy as np

    rng = np.random.default_rng(11)
    v = rng.standard_normal(16)
    w = rng.standard_normal(16)
    rows = [(i, [float(x) for x in v]) for i in range(100)]
    rows += [(200, [float(x) for x in w]),
             (201, [float(x) for x in w * 1.001])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    uncapped = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.embedding_lsh_candidates(emb, dim=16).collect()
    }
    assert {(a, b) for a in range(100) for b in range(a + 1, 100)} <= uncapped
    capped = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.embedding_lsh_candidates(
            emb, dim=16, max_bucket_size=10
        ).collect()
    }
    assert not any(a < 100 and b < 100 for a, b in capped)
    assert (200, 201) in capped and (200, 201) in uncapped


def test_minhash_incremental_batch_vs_corpus(docs_df):
    """Incoming-batch dedup: candidates only cross the corpus×new
    boundary; result equals the cross-pair slice of the full
    near-dup set at the same parameters."""
    corpus = docs_df.filter("doc_id % 2 = 0")  # 0, 2, 4
    new = docs_df.filter("doc_id % 2 = 1")     # 1, 3, 5
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.minhash_near_duplicates_incremental(
            new, corpus, threshold=0.5, num_hashes=16, bands=8
        ).collect()
    }
    # doc 1 is an exact copy of corpus doc 0 → must be caught
    assert (0, 1) in got and got[(0, 1)] == 1.0
    # nothing links the unrelated docs
    assert all(a % 2 == 0 and b % 2 == 1 for a, b in got)
    full = {
        tuple(sorted((r["doc_a"], r["doc_b"]))): r["jaccard"]
        for r in dedup.minhash_near_duplicates(
            docs_df, threshold=0.5, num_hashes=16, bands=8
        ).collect()
    }
    for (a, b), j in got.items():
        assert full[tuple(sorted((a, b)))] == j


def test_lsh_bucket_size_guard(spark):
    """max_bucket_size drops mega-buckets (the B² pair explosion from
    duplicate-heavy corpora) from candidate generation, leaving other
    buckets untouched."""
    rows = [(i, BASE) for i in range(5)] + [
        (10, "entirely different words one"),
        (11, "entirely different words one"),  # exact pair: all bands
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.minhash_lsh_candidates(
            df, num_hashes=16, bands=8
        ).collect()
    }
    # the 5 identical docs pair up fully without the cap
    assert {(a, b) for a in range(5) for b in range(a + 1, 5)} <= uncapped
    capped = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.minhash_lsh_candidates(
            df, num_hashes=16, bands=8, max_bucket_size=4
        ).collect()
    }
    # every bucket holding the 5 clones exceeds the cap → dropped;
    # the pair from 2-doc buckets survives
    assert not any(a < 5 and b < 5 for a, b in capped)
    assert (10, 11) in capped and (10, 11) in uncapped


def test_simhash_bucket_size_guard(spark):
    """Same B² guard for simhash: N identical docs share all four
    16-bit segments → every segment bucket holding them exceeds the
    cap and is dropped; a small distinct pair's buckets survive."""
    rows = [(i, BASE) for i in range(6)] + [
        (10, "entirely different words one two three"),
        (11, "entirely different words one two three"),  # exact pair
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.simhash_near_duplicates(df, max_hamming=3).collect()
    }
    assert {(a, b) for a in range(6) for b in range(a + 1, 6)} <= uncapped
    assert (10, 11) in uncapped
    capped = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.simhash_near_duplicates(
            df, max_hamming=3, max_bucket_size=4
        ).collect()
    }
    assert not any(a < 6 and b < 6 for a, b in capped)
    assert (10, 11) in capped


# ------------------------------------------- exact substring spans


def test_exact_substring_spans_planted(spark):
    """Hand-computed spans: a 10-token substring shared across two
    docs, a self-repeating doc, and an unrelated doc with none."""
    docs = spark.createDataFrame(
        [
            (0, "a b c d e f g h i j"),
            (1, "x x a b c d e f g h i j y"),
            (2, "unrelated words only here now there once upon time foo"),
            (3, "p q r s p q r s p q r s"),
        ],
        "doc_id long, text string",
    )
    got = sorted(
        map(tuple, dedup.exact_substring_spans(docs, k=4).collect())
    )
    # doc0: grams 0..6 dup (shared run) -> span (0, 10, 7)
    # doc1: grams 2..8 dup -> span (2, 10, 7)
    # doc3: every gram 0..8 occurs >=2 within the doc -> (0, 12, 9)
    assert got == [(0, 0, 10, 7), (1, 2, 10, 7), (3, 0, 12, 9)], got


def test_exact_substring_spans_hash_eq_string(docs_df):
    a = sorted(
        map(
            tuple,
            dedup.exact_substring_spans(
                docs_df, k=3, use_hash=True
            ).collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            dedup.exact_substring_spans(
                docs_df, k=3, use_hash=False
            ).collect(),
        )
    )
    assert a == b and len(a) > 0


def test_duplicate_clusters_components(spark):
    """Chain, star, and singleton-pair components all collapse to the
    min reachable doc_id; disconnected components stay separate."""
    pairs = spark.createDataFrame(
        # chain 0-1-2-3 (via consecutive pairs), star 10<-{11,12,13},
        # isolated pair (20,21)
        [(0, 1), (1, 2), (2, 3), (10, 11), (10, 12), (10, 13), (20, 21)],
        "doc_a long, doc_b long",
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.duplicate_clusters(pairs).collect()
    }
    assert got == {0: 0, 1: 0, 2: 0, 3: 0,
                   10: 10, 11: 10, 12: 10, 13: 10,
                   20: 20, 21: 20}


def test_duplicate_clusters_long_chain_converges(spark):
    """A 12-node path needs multiple propagation rounds (diameter >
    1) — exercises the fixpoint loop, not just one hop."""
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(11)], "doc_a long, doc_b long"
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.duplicate_clusters(pairs).collect()
    }
    assert got == {i: 0 for i in range(12)}


def test_duplicate_clusters_deep_chain_pointer_jumping(spark):
    """A 120-hop path (diameter far beyond the 20-round stop-loss for
    plain propagation — the versioned-document-chain shape upsert and
    append produce) converges under the default max_iters because the
    pointer-jumping shortcut halves path lengths per round
    (round-4 verdict #3)."""
    n = 121
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.duplicate_clusters(pairs).collect()
    }
    assert got == {i: 0 for i in range(n)}


def test_duplicate_clusters_unconverged_raises(spark):
    """Non-convergence is an ERROR, never silently-wrong labels: a
    chain that cannot settle in max_iters=1 raises instead of
    returning partial propagation (round-4 verdict #3)."""
    import pytest

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "doc_a long, doc_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.duplicate_clusters(pairs, max_iters=1)


def test_duplicate_clusters_matches_duckdb_recursive(spark):
    """Parked gate entry dedup_clusters: Spark fixpoint == DuckDB
    WITH RECURSIVE min-reachable-label on the sf0.001 corpus (the
    same comparison tools/driver_check.py runs for every entry)."""
    import duckdb

    import __spark_entry__ as em

    sf = "/root/testdata/sf0.001"
    sdf = em.queries()["dedup_clusters"](spark, sf).toPandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet')"
    )
    odf = con.execute(em.oracle_sql()["dedup_clusters"]).df()
    s = sdf.sort_values(["doc_id"]).reset_index(drop=True)
    o = odf.sort_values(["doc_id"]).reset_index(drop=True)
    assert len(s) == len(o) > 0
    assert (s["doc_id"].values == o["doc_id"].values).all()
    assert (s["cluster_id"].values == o["cluster_id"].values).all()


def test_curate_corpus_neardup_keep_one_representative(spark):
    """Near-dup clusters keep exactly their min-doc_id member; unique
    docs keep iff quality+language pass; exact dups are subsumed."""
    from documentindex_spark.functions import textstats

    good = ("the data of the index is sorted and the merge of the "
            "window is applied to the files and the rows are kept")
    rows = [
        (0, good),
        (1, good),  # exact dup of 0 → jaccard 1.0 cluster
        (2, good + " with one extra tail here"),  # near-dup of 0
        (3, "short"),  # fails quality gates
        (4, "el la es un una de los las que y el documento grande "
            "de la tabla es una fila de los datos y el texto"),  # es
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = dedup.ngram_jaccard_pairs(docs, threshold=0.25).select(
        "doc_a", "doc_b"
    )
    out = {
        r["doc_id"]: r
        for r in textstats.curate_corpus_neardup(
            docs, pairs=pairs, min_quality=0.6, lang="en"
        ).collect()
    }
    assert not out[0]["is_near_dup"] and out[0]["keep"]
    assert out[1]["is_near_dup"] and not out[1]["keep"]
    assert out[2]["is_near_dup"] and not out[2]["keep"]
    assert not out[3]["is_near_dup"] and not out[3]["keep"]  # quality
    assert not out[4]["keep"]  # language gate


def test_contamination_check_planted(spark):
    """A benchmark doc that copies an 8-token run from the corpus is
    flagged with the exact gram counts; clean docs report 0.0; the
    hash-key scale path equals the string-key path."""
    corpus = spark.createDataFrame(
        [(0, "one two three four five six seven eight nine ten "
             "eleven twelve")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [
            # tokens 0..8 of the corpus doc → grams at ords 0 and 1
            (100, "one two three four five six seven eight nine"),
            (101, "totally novel words that the corpus never saw "
                  "anywhere at all in any doc"),
        ],
        "doc_id long, text string",
    )
    for use_hash in (False, True):
        got = {
            r["bench_id"]: (
                r["n_grams_total"],
                r["n_grams_contaminated"],
                r["contamination"],
            )
            for r in dedup.contamination_check(
                corpus, bench, k=8, use_hash=use_hash
            ).collect()
        }
        assert got[100] == (2, 2, 1.0)
        assert got[101] == (7, 0, 0.0)


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_duplicate_clusters_random_vs_union_find(spark, seed):
    """Randomized graphs vs a driver-side union-find oracle."""
    import numpy as np

    rng = np.random.default_rng(seed)
    n = int(rng.integers(6, 25))
    m = int(rng.integers(3, 30))
    edges = sorted(
        {
            tuple(sorted(p))
            for p in rng.integers(0, n, size=(m, 2)).tolist()
            if p[0] != p[1]
        }
    )
    if not edges:
        pytest.skip("empty graph draw")

    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    nodes = {v for e in edges for v in e}
    want = {v: find(v) for v in sorted(nodes)}

    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.duplicate_clusters(pairs).collect()
    }
    assert got == want, f"seed={seed} n={n} edges={edges}"
