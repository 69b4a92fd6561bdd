"""Deduplication suite for large-scale training-data pipelines.

Five methods, all returning deterministic results so each can carry a
DuckDB oracle where SQL-expressible:

- exact:        sha2-hash groupBy — one shuffle on a 64-char key.
- ngram-jaccard: token-shingle self-join (exact Jaccard) — quadratic
                 in co-shingled docs; the small-corpus ground truth.
- minhash-LSH:  md5-derived minhash signatures, banded; candidate
                 pairs verified with exact Jaccard. The 100TB-scale
                 path: cost is (docs × shingles) + band-bucket joins,
                 never all-pairs. md5 (not xxhash) so DuckDB can
                 reproduce signatures bit-for-bit.
- simhash:      64-bit weighted-bit fingerprints via one built-in
                 hash aggregate (64 conditional sums — zero Python);
                 near-dup = Hamming ≤ t on 16-bit segment buckets.
- embedding:    cosine ≥ threshold pairs; brute self-join baseline
                 (see ann.py for the bucketed scale path).

The reference's only dedup is cross-ref seen-set dropDuplicates
(/root/reference/src/documentindex/cross_ref.py:84-95); this module
is target-side scope (task brief: first-class training-data ops).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.tokenize import doc_token_counts, tokenize

# ------------------------------------------------------------- exact


def exact_duplicates(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(content_hash, n_docs, doc_ids) for every text appearing >1×.
    Hash-groupBy: map-side partial agg, single shuffle on the hash."""
    return (
        df.select(F.sha2(F.col(text_col), 256).alias("content_hash"), id_col)
        .groupBy("content_hash")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sort_array(F.collect_list(id_col)).alias("doc_ids"),
        )
        .filter(F.col("n_docs") > 1)
    )


# ----------------------------------------------- exact substring spans


def _duplicated_gram_positions(
    df: DataFrame,
    k: int,
    text_col: str,
    id_col: str,
    use_hash: bool,
    min_count: int,
) -> DataFrame:
    """(id, ord, gram_key) for positional k-grams whose gram occurs ≥
    min_count times corpus-wide — steps 1-3 of exact_substring_spans,
    shared with dup_span_coverage."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(id_col).orderBy("pos")
    t = tokenize(df, text_col, id_col).withColumn(
        "ord", F.row_number().over(w) - 1
    )
    lead_cols = []
    for i in range(1, k):
        name = f"_lead{i}"
        t = t.withColumn(name, F.lead("term", i).over(w))
        lead_cols.append(name)
    if lead_cols:
        t = t.filter(F.col(lead_cols[-1]).isNotNull())
    gram = F.concat_ws(" ", "term", *lead_cols)
    key = F.xxhash64(gram) if use_hash else gram
    g = t.select(id_col, "ord", key.alias("gram_key"))
    dup_keys = (
        g.groupBy("gram_key")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") >= min_count)
        .select("gram_key")
    )
    return g.join(dup_keys, "gram_key", "left_semi")


def dup_span_coverage(
    df: DataFrame,
    k: int = 8,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    use_hash: bool = True,
) -> DataFrame:
    """(doc_id, dl, covered_tokens, dup_frac) — per-document NOVELTY
    signal: the fraction of token positions lying inside at least one
    corpus-duplicated k-gram (the scalar the Lee et al. 2022 span
    table rolls up to; 1.0 = the document is pure boilerplate, 0.0 =
    entirely novel text). The usual curation gate keeps documents
    below a dup_frac ceiling instead of dropping whole near-dup docs.

    Coverage is the UNION of the duplicated grams' [ord, ord+k-1]
    token intervals (sequence-explode → distinct position), not the
    sum of span lengths — adjacent islands' k−1-token overlaps are
    not double-counted. dl counts every token (zero-token docs keep
    dl=0, dup_frac 0.0); round(6) both sides.

    Plan: shares _duplicated_gram_positions with
    exact_substring_spans (one window pass + one gram-count shuffle);
    the position explode is ≤ k rows per duplicated gram, distinct'd
    on the doc-partitioned key.
    """
    dpos = _duplicated_gram_positions(
        df, k, text_col, id_col, use_hash, min_count
    )
    covered = (
        dpos.select(
            id_col,
            F.explode(
                F.sequence(F.col("ord"), F.col("ord") + F.lit(k - 1))
            ).alias("p"),
        )
        .distinct()
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("covered_tokens"))
    )
    dl = doc_token_counts(df, text_col, id_col)
    return (
        dl.join(covered, id_col, "left")
        .select(
            id_col,
            F.col("dl").cast("long").alias("dl"),
            F.coalesce(F.col("covered_tokens"), F.lit(0))
            .cast("long")
            .alias("covered_tokens"),
            F.round(
                F.when(
                    F.col("dl") > 0,
                    F.coalesce(F.col("covered_tokens"), F.lit(0))
                    / F.col("dl"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("dup_frac"),
        )
    )


def exact_substring_spans(
    df: DataFrame,
    k: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    use_hash: bool = True,
    min_count: int = 2,
) -> DataFrame:
    """Exact-substring duplication at k-token-gram granularity —
    the "dedup by exact substring match" operator of Lee et al. 2022
    ("Deduplicating Training Data Makes Language Models Better"),
    re-expressed relationally instead of via suffix arrays:

    1. positional k-gram per token ordinal (lead window — the same
       self-join-free shape as ``shingles``, but KEEPING position and
       multiplicity);
    2. global gram occurrence counts (partial+final hash agg — the
       one big shuffle; map-side combine absorbs hot boilerplate
       grams);
    3. positions whose gram occurs ≥ ``min_count`` times anywhere in
       the corpus (left-semi join back on the gram key);
    4. maximal spans per document via gaps-and-islands (ord −
       row_number is constant within a consecutive run).

    Returns (doc_id, span_start, span_len_tokens, n_grams): token
    ordinals are contiguous 0-based (row_number over the raw split
    positions), span_len_tokens = run_length + k − 1.

    ``use_hash=True`` shuffles xxhash64(gram) instead of the k-token
    string (8 bytes vs ~8·k — the 100 TB shape; a 64-bit collision
    needs ~2^32 distinct grams in one corpus to appear at even-odds,
    and a collision only risks a spurious span, not data loss).
    ``use_hash=False`` keeps the exact string key — bit-identical to
    the DuckDB oracle by construction and asserted equal to the hash
    variant in tests/test_dedup.py.
    """
    from pyspark.sql.window import Window

    dpos = _duplicated_gram_positions(df, k, text_col, id_col, use_hash, min_count)
    w2 = Window.partitionBy(id_col).orderBy("ord")
    isl = dpos.withColumn(
        "_grp", F.col("ord") - (F.row_number().over(w2) - 1)
    )
    return (
        isl.groupBy(id_col, "_grp")
        .agg(
            F.min("ord").alias("span_start"),
            (F.max("ord") - F.min("ord") + F.lit(k)).alias("span_len_tokens"),
            F.count(F.lit(1)).alias("n_grams"),
        )
        .drop("_grp")
    )


def contamination_check(
    corpus: DataFrame,
    benchmark: DataFrame,
    k: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    use_hash: bool = True,
) -> DataFrame:
    """Benchmark decontamination (the cross-dataset face of Lee et
    al. 2022 §4): which benchmark documents share a verbatim k-token
    gram with the training corpus, and how much.

    Returns (bench_id, n_grams_total, n_grams_contaminated,
    contamination) — one row per benchmark doc, contamination =
    contaminated/total grams (0.0 rows included so the output covers
    every benchmark doc with ≥1 gram).

    Plan: positional k-grams on BOTH sides (the shingles lead-window
    shape), corpus side reduced to DISTINCT gram keys (vocab-sized),
    benchmark grams left-semi-joined against it, one final per-doc
    agg. The corpus — the 100 TB side — is touched exactly once and
    never self-joined; the join key is ``xxhash64(gram)`` by default
    (8 bytes through the shuffle; ``use_hash=False`` keeps the string
    key, which the DuckDB oracle uses and tests assert identical).
    """
    from pyspark.sql.window import Window

    def grams(df: DataFrame, ident: str) -> DataFrame:
        w = Window.partitionBy(id_col).orderBy("pos")
        t = tokenize(df, text_col, id_col)
        lead_cols = []
        for i in range(1, k):
            name = f"_lead{i}"
            t = t.withColumn(name, F.lead("term", i).over(w))
            lead_cols.append(name)
        if lead_cols:
            t = t.filter(F.col(lead_cols[-1]).isNotNull())
        gram = F.concat_ws(" ", "term", *lead_cols)
        key = F.xxhash64(gram) if use_hash else gram
        return t.select(F.col(id_col).alias(ident), key.alias("gram_key"))

    corpus_keys = grams(corpus, "corpus_id").select("gram_key").distinct()
    bg = grams(benchmark, "bench_id")
    hits = bg.join(corpus_keys, "gram_key", "left_semi")
    totals = bg.groupBy("bench_id").agg(
        F.count(F.lit(1)).alias("n_grams_total")
    )
    contam = hits.groupBy("bench_id").agg(
        F.count(F.lit(1)).alias("n_grams_contaminated")
    )
    return (
        totals.join(contam, "bench_id", "left")
        .select(
            "bench_id",
            "n_grams_total",
            F.coalesce("n_grams_contaminated", F.lit(0)).alias(
                "n_grams_contaminated"
            ),
        )
        .withColumn(
            "contamination",
            F.round(
                F.col("n_grams_contaminated") / F.col("n_grams_total"), 6
            ),
        )
    )


# ----------------------------------------------------------- shingles


def shingles(
    df: DataFrame, k: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, shingle) — distinct k-token shingles per document, built
    with a self-join-free window over token positions."""
    toks = tokenize(df, text_col, id_col)
    from pyspark.sql.window import Window

    w = Window.partitionBy(id_col).orderBy("pos")
    t = toks
    lead_cols = []
    for i in range(1, k):
        name = f"_lead{i}"
        t = t.withColumn(name, F.lead("term", i).over(w))
        lead_cols.append(name)
    # concat_ws skips NULLs silently — filter incomplete tails first
    if lead_cols:
        t = t.filter(F.col(lead_cols[-1]).isNotNull())
    return (
        t.withColumn("shingle", F.concat_ws(" ", "term", *lead_cols))
        .select(id_col, "shingle")
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    threshold: float,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact Jaccard over k-token shingles: (doc_a, doc_b, jaccard)
    for all pairs ≥ threshold, doc_a < doc_b.

    Self-join on shingle → |∩| per pair; |∪| = |A|+|B|−|∩|. Exact and
    SQL-expressible (the oracle); cost grows with co-shingled pairs —
    use minhash_lsh_candidates at scale.
    """
    sh = shingles(df, k, text_col, id_col)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col(id_col).alias("doc_a"), "shingle")
    b = sh.select(F.col(id_col).alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return (
        inter.join(
            sizes.select(F.col(id_col).alias("doc_a"), F.col("n_sh").alias("n_a")),
            "doc_a",
        )
        .join(
            sizes.select(F.col(id_col).alias("doc_b"), F.col("n_sh").alias("n_b")),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("n_inter")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# ------------------------------------------------------------ minhash


def _minhash_expr(i: int) -> Column:
    """Deterministic hash_i(shingle): first 8 hex chars of
    md5(i || shingle) as a bigint — identical in DuckDB:
    CAST(concat('0x', substr(md5(concat('<i>|', shingle)), 1, 8)) AS BIGINT)."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{i}|"), F.col("shingle"))), 1, 8),
        16,
        10,
    ).cast("long")


def minhash_signatures(
    df: DataFrame | None = None,
    num_hashes: int = 16,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    sh: DataFrame | None = None,
) -> DataFrame:
    """(id, mh_0..mh_{H-1}) — one grouped agg computes all H minima
    in a single pass over the shingle stream (no H× re-scan).
    ``sh``: precomputed shingle table (skips re-tokenizing)."""
    if sh is None:
        sh = shingles(df, k, text_col, id_col)
    aggs = [
        F.min(_minhash_expr(i)).alias(f"mh_{i}") for i in range(num_hashes)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def minhash_lsh_candidates(
    df: DataFrame | None = None,
    num_hashes: int = 16,
    bands: int = 4,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    sigs: DataFrame | None = None,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """(doc_a, doc_b) candidate pairs: docs sharing ≥1 LSH band.
    Band key = concat of the band's rows; bucket join per band —
    never an all-pairs comparison.

    The band table is a ``stack()`` unpivot (ONE pass over the
    signature table — the earlier 4-way union recomputed the whole
    tokenize→shingle→minhash pipeline once per band). Pass a
    precomputed (ideally persisted) ``sigs`` at scale so the
    self-join's two sides share one materialization.

    ``max_bucket_size``: drop band buckets larger than this from
    candidate generation (the B² skew guard for duplicate-heavy
    corpora — see inline comment). None = unchanged semantics."""
    rows_per_band = num_hashes // bands
    if sigs is None:
        sigs = minhash_signatures(df, num_hashes, k, text_col, id_col)
    stack_args = []
    for b in range(bands):
        cols = ", ".join(
            f"cast(mh_{b * rows_per_band + r} as string)"
            for r in range(rows_per_band)
        )
        stack_args.append(f"{b}, concat_ws('_', {cols})")
    bandtab = sigs.select(
        F.col(id_col).alias("doc"),
        F.expr(
            f"stack({bands}, {', '.join(stack_args)}) as (band, band_key)"
        ),
    )
    if max_bucket_size is not None:
        # Skew guard for duplicate-heavy corpora: a bucket of B docs
        # yields B² candidate pairs — one bucket of 10^6 IDENTICAL
        # documents is 10^12 pairs. Buckets over the cap are dropped
        # from CANDIDATE GENERATION (run exact_duplicates first: the
        # byte-identical mass that creates mega-buckets is exactly
        # what exact dedup removes at one-shuffle cost; near-dups of
        # a capped bucket's docs still surface through their OTHER
        # bands when those are below the cap).
        from pyspark.sql.window import Window

        w = Window.partitionBy("band", "band_key")
        bandtab = (
            bandtab.withColumn("_bsize", F.count(F.lit(1)).over(w))
            .filter(F.col("_bsize") <= max_bucket_size)
            .drop("_bsize")
        )
    a = bandtab.select(F.col("doc").alias("doc_a"), "band", "band_key")
    b_ = bandtab.select(F.col("doc").alias("doc_b"), "band", "band_key")
    return (
        a.join(b_, ["band", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def minhash_near_duplicates(
    df: DataFrame,
    threshold: float,
    num_hashes: int = 16,
    bands: int = 4,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    cache: bool = True,
) -> DataFrame:
    """LSH candidates verified with exact Jaccard, computed ONLY for
    candidate pairs — the 100 TB contract.

    Shape: the shingle table is first semi-joined down to docs that
    appear in ≥1 candidate pair, then intersections come from
    ``cand ⋈ shingles(doc_a) ⋈ shingles(doc_b on (doc, shingle))`` —
    cost is Σ_pairs |shingles(A)|, linear in candidate mass. There is
    NO shingle self-join anywhere in this plan (the all-pairs
    explosion LSH exists to avoid).

    ``cache``: persist the two multiply-consumed intermediates (the
    shingle table — read by the signature agg, both semi-joins, and
    both intersection sides — and the candidate table) so each is
    computed once; AQE exchange reuse catches some of this at runtime
    but not across differently-keyed consumers. Pass False to keep
    the plan fully lazy (caller manages its own persistence)."""
    sh = shingles(df, k, text_col, id_col)
    if cache:
        sh = sh.persist()
    sigs = minhash_signatures(num_hashes=num_hashes, id_col=id_col, sh=sh)
    cand = minhash_lsh_candidates(
        num_hashes=num_hashes, bands=bands, id_col=id_col, sigs=sigs
    )
    if cache:
        cand = cand.persist()
    docs_in_cand = (
        cand.select(F.col("doc_a").alias(id_col))
        .unionByName(cand.select(F.col("doc_b").alias(id_col)))
        .distinct()
    )
    sh_c = sh.join(docs_in_cand, id_col, "left_semi")
    sizes = sh_c.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    inter = (
        cand.join(
            sh_c.select(F.col(id_col).alias("doc_a"), "shingle"), "doc_a"
        )
        .join(
            sh_c.select(F.col(id_col).alias("doc_b"), "shingle"),
            ["doc_b", "shingle"],
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return (
        inter.join(
            sizes.select(F.col(id_col).alias("doc_a"), F.col("n_sh").alias("n_a")),
            "doc_a",
        )
        .join(
            sizes.select(F.col(id_col).alias("doc_b"), F.col("n_sh").alias("n_b")),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("n_inter")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_near_duplicates_incremental(
    new_df: DataFrame,
    corpus_df: DataFrame,
    threshold: float,
    num_hashes: int = 16,
    bands: int = 4,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Dedup an INCOMING batch against an existing corpus — the
    ingestion-pipeline shape at scale: candidates come from
    ``new_bands ⋈ corpus_bands`` (small × large bucket join — the new
    side broadcasts when tiny), never corpus × corpus. Exact Jaccard
    verifies candidate pairs only, with the corpus shingle table
    semi-joined down to candidate docs first.

    Returns (doc_a = corpus id, doc_b = new id, jaccard ≥ threshold).
    In production the corpus band/shingle tables are precomputed and
    persisted (they ARE the dedup index); here they derive from
    ``corpus_df`` lazily so the operator stays self-contained."""
    rows_per_band = num_hashes // bands

    def bandtab(df: DataFrame) -> DataFrame:
        sigs = minhash_signatures(df, num_hashes, k, text_col, id_col)
        args = []
        for b in range(bands):
            cols = ", ".join(
                f"cast(mh_{b * rows_per_band + r} as string)"
                for r in range(rows_per_band)
            )
            args.append(f"{b}, concat_ws('_', {cols})")
        return sigs.select(
            F.col(id_col).alias("doc"),
            F.expr(
                f"stack({bands}, {', '.join(args)}) as (band, band_key)"
            ),
        )

    cand = (
        bandtab(corpus_df)
        .withColumnRenamed("doc", "doc_a")
        .join(
            bandtab(new_df).withColumnRenamed("doc", "doc_b"),
            ["band", "band_key"],
        )
        .select("doc_a", "doc_b")
        .distinct()
    )
    sh_corpus = shingles(corpus_df, k, text_col, id_col).join(
        cand.select(F.col("doc_a").alias(id_col)).distinct(),
        id_col,
        "left_semi",
    )
    sh_new = shingles(new_df, k, text_col, id_col).join(
        cand.select(F.col("doc_b").alias(id_col)).distinct(),
        id_col,
        "left_semi",
    )
    sizes_a = sh_corpus.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_a"))
    sizes_b = sh_new.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_b"))
    inter = (
        cand.join(
            sh_corpus.select(F.col(id_col).alias("doc_a"), "shingle"),
            "doc_a",
        )
        .join(
            sh_new.select(F.col(id_col).alias("doc_b"), "shingle"),
            ["doc_b", "shingle"],
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return (
        inter.join(
            sizes_a.select(F.col(id_col).alias("doc_a"), "n_a"), "doc_a"
        )
        .join(sizes_b.select(F.col(id_col).alias("doc_b"), "n_b"), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("n_inter")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# ------------------------------------------------------------ simhash


def simhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """64-bit SimHash per doc: sign of the tf-weighted sum per bit.

    100% built-in expressions — ONE hash aggregate with 64
    conditional-sum columns (whole-stage codegen, no Arrow, no
    per-doc Python groups; the earlier applyInPandas version paid one
    Arrow group dispatch per document — millions of tiny groups at
    10^10 docs).

    Term hash = high 8 bytes of md5(term) (== int.from_bytes(
    md5[:8], 'big')), split into two 32-bit halves so ``conv`` never
    overflows a signed long. Bit i of the 64-bit hash:
    i<32 → bit i of the low half; i≥32 → bit i−32 of the high half.
    Bit 63's weight is −2^63 so the final signed sum reproduces the
    two's-complement int64 signature exactly. DuckDB-reproducible
    (see the ``simhash_signatures`` oracle in __spark_entry__.py).
    """
    tf = (
        tokenize(df, text_col, id_col)
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    md5 = F.md5(F.col("term"))
    t = tf.select(
        F.col(id_col),
        "tf",
        F.conv(F.substring(md5, 1, 8), 16, 10).cast("long").alias("h_hi"),
        F.conv(F.substring(md5, 9, 8), 16, 10).cast("long").alias("h_lo"),
    )
    aggs = []
    for i in range(64):
        half, off = ("h_lo", i) if i < 32 else ("h_hi", i - 32)
        bit = F.shiftrightunsigned(F.col(half), off).bitwiseAND(F.lit(1))
        aggs.append(
            F.sum(
                F.when(bit == 1, F.col("tf")).otherwise(-F.col("tf"))
            ).alias(f"acc_{i}")
        )
    accd = t.groupBy(id_col).agg(*aggs)
    total = None
    for i in range(64):
        w = F.lit(-(1 << 63)).cast("long") if i == 63 else F.lit(1 << i).cast("long")
        part = F.when(F.col(f"acc_{i}") > 0, w).otherwise(F.lit(0).cast("long"))
        total = part if total is None else total + part
    return accd.select(
        F.col(id_col).alias("doc_id"), total.alias("simhash")
    )


def simhash_near_duplicates(
    df: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bucket_size: int | None = None,
) -> DataFrame:
    """(doc_a, doc_b, hamming ≤ max_hamming). Candidate generation
    buckets on 4 × 16-bit key segments (two signatures within Hamming
    ≤ 3 of 64 bits must agree on ≥1 of 4 segments — pigeonhole), then
    verifies exact Hamming via bit_count(xor).

    ``max_bucket_size``: same B² skew guard as
    ``minhash_lsh_candidates`` — identical texts share ALL four
    segments, so a duplicate-heavy corpus mega-clusters one segment
    bucket into B² candidate pairs. Over-cap buckets are dropped from
    candidate generation (run ``exact_duplicates`` first — the
    byte-identical mass IS what creates mega-buckets); near-dups of a
    capped bucket's docs still surface via their other segments when
    those stay under the cap."""
    sigs = simhash_signatures(df, text_col, id_col)
    # stack() unpivot: one pass over sigs for all 4 segments (a
    # per-segment union would recompute the signature agg 4×)
    seg_args = ", ".join(
        f"{s}, shiftrightunsigned(simhash, {s * 16}) & 65535"
        for s in range(4)
    )
    seg = sigs.select(
        F.col("doc_id").alias("doc"),
        F.expr(f"stack(4, {seg_args}) as (seg, seg_key)"),
    )
    if max_bucket_size is not None:
        from pyspark.sql.window import Window

        w = Window.partitionBy("seg", "seg_key")
        seg = (
            seg.withColumn("_bsize", F.count(F.lit(1)).over(w))
            .filter(F.col("_bsize") <= max_bucket_size)
            .drop("_bsize")
        )
    a = seg.select(F.col("doc").alias("doc_a"), "seg", "seg_key")
    b = seg.select(F.col("doc").alias("doc_b"), "seg", "seg_key")
    cand = (
        a.join(b, ["seg", "seg_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    sa = sigs.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sig_a"))
    sb = sigs.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sig_b"))
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.bit_count(
                F.col("sig_a").bitwiseXOR(F.col("sig_b"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------- embedding


def cosine_sim_col(a: Column, b: Column) -> Column:
    """Float64 cosine similarity of two array<float/double> columns —
    built-in zip_with/aggregate. SQL-expressible (DuckDB-oracle twin)
    AND the measured-fastest form for single-dot-per-row scoring:
    higher-order lambdas are interpreted per element, but the Arrow
    transfer a pandas UDF pays per vector costs more (see the module
    note below + BENCH/BASELINE.md §7.5). Shapes where one row feeds
    MANY dots (vector × C centroids) belong in a numpy-matmul pandas
    UDF instead — ann.ivf_assign."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )
    nb = F.sqrt(
        F.aggregate(
            b, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )
    return dot / (na * nb)


# NOTE (measured decision, round 3): an Arrow-batched pandas-UDF
# rowwise cosine (numpy einsum per batch) was built and A/B'd against
# cosine_sim_col interleaved per the CLAUDE.md noisy-box protocol —
# and LOST for every single-dot-per-row shape: 1.7s vs 20.8s medians
# on 100k pairs × 768 dims (two vector columns per row through Arrow)
# and 0.76s vs 1.10s query-vs-column at the same dim. The per-row
# vector transfer outweighs the interpreted-lambda tax. The matmul
# form is kept ONLY where one transferred row feeds many dot products
# (ann.ivf_assign: C dots/row → 8-14× faster). Full numbers:
# tools/bench_cosine.py, BENCH/BASELINE.md §7.5.


def duplicate_clusters(pairs: DataFrame, max_iters: int = 20) -> DataFrame:
    """(doc_id, cluster_id) — connected components over near-dup
    pairs; cluster_id = the smallest doc_id reachable through the
    pair graph. The step every dedup pipeline needs after pair
    generation: pairs → clusters → keep min-id representative.

    Iterative min-label propagation WITH pointer-jumping: each round
    every node takes the min of its own label and its neighbors'
    labels, then shortcuts through its label's label (labels are
    always node ids, so the lookup is defined). The shortcut step
    halves remaining path lengths — O(log diameter) rounds instead of
    O(diameter), so versioned-document chains (which upsert/append
    produce, and which exceed plain propagation's 20-round stop-loss
    at corpus scale) converge in ~log2(len) rounds
    (tests/test_dedup.py chain property test). Each round is two
    joins + one groupBy, all Catalyst-planned; labels are
    localCheckpoint-ed per round so lineage stays flat (an iterative
    plan otherwise doubles per round). DuckDB twin: WITH RECURSIVE
    min-reachable-label (gate entry ``dedup_clusters``).

    Raises ``RuntimeError`` if labels still changed after
    ``max_iters`` rounds — an unconverged result is silently WRONG
    cluster ids, never returned (round-4 verdict #3).

    Deterministic: pure min-semilattice fixpoint — iteration order
    can't change the result.
    """
    if max_iters < 1:
        raise ValueError("max_iters must be >= 1")
    edges = pairs.select("doc_a", "doc_b")
    sym = edges.unionByName(
        edges.select(
            F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b")
        )
    )
    labels = (
        sym.select(F.col("doc_a").alias("doc_id"))
        .distinct()
        .withColumn("cluster_id", F.col("doc_id"))
        .localCheckpoint()
    )
    for _ in range(max_iters):
        neighbor_min = (
            sym.join(
                labels.select(
                    F.col("doc_id").alias("doc_b"),
                    F.col("cluster_id").alias("nb_label"),
                ),
                "doc_b",
            )
            .groupBy("doc_a")
            .agg(F.min("nb_label").alias("min_nb"))
            .withColumnRenamed("doc_a", "doc_id")
        )
        propagated = labels.join(neighbor_min, "doc_id", "left").select(
            "doc_id",
            F.least(
                F.col("cluster_id"),
                F.coalesce("min_nb", F.col("cluster_id")),
            ).alias("cluster_id"),
        )
        # Pointer jumping: shortcut each node through its label's own
        # label (label values are node ids by construction). This is
        # the hook that turns O(diameter) into O(log diameter) — a
        # 1000-version chain converges in ~10 rounds, not 1000.
        new_labels = (
            propagated.alias("p")
            .join(
                propagated.select(
                    F.col("doc_id").alias("lbl_key"),
                    F.col("cluster_id").alias("lbl_lbl"),
                ),
                F.col("p.cluster_id") == F.col("lbl_key"),
                "left",
            )
            .select(
                "doc_id",
                F.least(
                    F.col("cluster_id"),
                    F.coalesce("lbl_lbl", F.col("cluster_id")),
                ).alias("cluster_id"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.cluster_id") != F.col("o.cluster_id"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"duplicate_clusters did not converge in {max_iters} rounds "
            f"({changed} labels still changing) — the pair graph has "
            "pathological structure; raise max_iters"
        )
    return labels


def embedding_lsh_candidates(
    emb: DataFrame,
    dim: int,
    n_planes: int = 16,
    bands: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket_size: int | None = None,
    cache: bool = True,
) -> DataFrame:
    """(doc_a, doc_b) candidate pairs from banded sign-LSH: vectors
    sharing at least one band of hyperplane sign bits.

    ``cache``: persist the band table so the self-join's two sides
    share ONE signature pass (plan-audited: uncached, the Arrow
    matmul UDF appears on both sides with no exchange reuse — at
    10^9 vectors that doubles the dominant cost). Same device as
    minhash_near_duplicates' persisted signature table.

    The semantic-dedup mirror of minhash_lsh_candidates: one packed
    signature per vector (ann.lsh_sign_buckets — a single Arrow-batch
    matmul), bands unpivoted via ``stack`` with
    shiftrightunsigned+mask band keys, bucket self-join per band —
    never an all-pairs comparison. A pair with per-bit sign agreement
    q survives with prob 1-(1-q^r)^B (r = n_planes/bands): near-dup
    similarity (cos ≥ 0.9 → q ≥ 0.9) gives ≥98% recall per pair at
    the 16/4 default, measured against the brute ground truth in
    tests/test_dedup.py.

    ``max_bucket_size``: the same B² skew guard as minhash/simhash —
    a degenerate bucket of B identical embeddings yields B² pairs;
    buckets over the cap are dropped from candidate generation (run
    exact/minhash dedup first for byte-identical mass; capped docs
    still surface through their other bands)."""
    from .ann import lsh_sign_buckets

    if n_planes % bands:
        raise ValueError("n_planes must divide evenly into bands")
    r = n_planes // bands
    mask = (1 << r) - 1
    bucketed = lsh_sign_buckets(
        emb, dim, n_planes, id_col=id_col, vec_col=vec_col
    )
    stack_args = ", ".join(
        f"{b}, shiftrightunsigned(bucket, {b * r}) & {mask}"
        for b in range(bands)
    )
    bandtab = bucketed.select(
        F.col(id_col).alias("doc"),
        F.expr(f"stack({bands}, {stack_args}) as (band, band_key)"),
    )
    if max_bucket_size is not None:
        from pyspark.sql.window import Window

        w = Window.partitionBy("band", "band_key")
        bandtab = (
            bandtab.withColumn("_bsize", F.count(F.lit(1)).over(w))
            .filter(F.col("_bsize") <= max_bucket_size)
            .drop("_bsize")
        )
    if cache:
        bandtab = bandtab.persist()
    a = bandtab.select(F.col("doc").alias("doc_a"), "band", "band_key")
    b_ = bandtab.select(F.col("doc").alias("doc_b"), "band", "band_key")
    return (
        a.join(b_, ["band", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def embedding_near_duplicates_lsh(
    emb: DataFrame,
    threshold: float,
    dim: int,
    n_planes: int = 16,
    bands: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket_size: int | None = None,
    cache: bool = True,
) -> DataFrame:
    """(doc_a, doc_b, cos ≥ threshold) — the 100 TB semantic-dedup
    path (round-3 verdict #3): banded sign-LSH candidates, then exact
    cosine verification computed ONLY for candidate pairs, mirroring
    minhash_near_duplicates' candidates-only contract.
    ``embedding_near_duplicates`` (brute O(n²) crossJoin) stays as the
    labeled ground-truth twin; recall vs brute at near-dup
    similarities is pinned in tests/test_dedup.py.

    Verification cosine is the JVM ``cosine_sim_col`` lambda — one
    dot per row, the measured winner for this shape (module note
    above, BENCH/BASELINE.md §7.5)."""
    cand = embedding_lsh_candidates(
        emb, dim, n_planes, bands, id_col, vec_col, max_bucket_size,
        cache=cache,
    )
    va = emb.select(F.col(id_col).alias("doc_a"), F.col(vec_col).alias("va"))
    vb = emb.select(F.col(id_col).alias("doc_b"), F.col(vec_col).alias("vb"))
    return (
        cand.join(va, "doc_a")
        .join(vb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(cosine_sim_col(F.col("va"), F.col("vb")), 6).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )


def embedding_near_duplicates(
    emb: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(doc_a, doc_b, cos ≥ threshold) via brute self-join — the
    small-corpus ground truth (O(n²); use ann.lsh_buckets to
    pre-bucket at scale). Pair scoring is the JVM-lambda cosine by
    measured A/B (see module note above — the pandas rowwise form is
    12× slower at this shape)."""
    a = emb.select(F.col(id_col).alias("doc_a"), F.col(vec_col).alias("va"))
    b = emb.select(F.col(id_col).alias("doc_b"), F.col(vec_col).alias("vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.round(cosine_sim_col(F.col("va"), F.col("vb")), 6).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )


# ------------------------------------------------- sentence dedup (C4)


def drop_duplicate_sentences(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, text_clean, n_sentences, n_dropped) — corpus-wide
    sentence-level deduplication, the C4 cleanup step (Raffel et al.
    2020 §2.2 dedups at occurrence granularity): every occurrence of
    a sentence that already appeared earlier in the corpus is removed
    and the document text is reassembled from what remains.

    Frozen semantics: sentences split on the RE2-safe boundary
    (replace ``([.!?])\\s+`` with the terminator + US control char,
    split — backref-free pattern, replacement-side group only, the
    same idiom as the chunker); trimmed, empties dropped; "first"
    is the global (doc_id ASC, pos ASC) occurrence, so in-document
    repeats drop too; reassembly joins survivors with a single space
    in original position order.

    Plan: one explode → ONE sentence-keyed hash agg whose
    ``min(struct(doc_id, pos))`` IS the kept occurrence — the agg is
    partial+final (map-side combine), so a boilerplate sentence
    repeated a billion times collapses per input partition instead of
    landing on one window task (a sentence-keyed row_number window
    would skew exactly there) → doc-keyed rebuild agg
    (array_sort(collect_list(struct(pos, sentence))) keeps the fold
    deterministic). Documents whose every sentence drops keep a row
    with text_clean = '' (the caller decides whether to cull).
    """
    sep = "\x1e"
    marked = F.regexp_replace(
        F.col(text_col), r"([.!?])\s+", "$1" + sep
    )
    sen = (
        df.select(
            id_col, F.posexplode(F.split(marked, sep)).alias("pos", "_raw")
        )
        .select(id_col, "pos", F.trim(F.col("_raw")).alias("sentence"))
        .where(F.col("sentence") != "")
    )
    kept = (
        sen.groupBy("sentence")
        .agg(F.min(F.struct(id_col, "pos")).alias("_first"))
        .select(
            F.col(f"_first.{id_col}").alias(id_col),
            F.col("_first.pos").alias("pos"),
            "sentence",
        )
    )
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("pos", "sentence"))
                ),
                lambda x: x["sentence"],
            ),
            " ",
        ).alias("text_clean"),
        F.count(F.lit(1)).alias("_kept"),
    )
    totals = sen.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_sentences")
    )
    return (
        df.select(id_col)
        .join(totals, id_col, "left")
        .join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("text_clean"), F.lit("")).alias("text_clean"),
            F.coalesce(F.col("n_sentences"), F.lit(0))
            .cast("long")
            .alias("n_sentences"),
            (
                F.coalesce(F.col("n_sentences"), F.lit(0))
                - F.coalesce(F.col("_kept"), F.lit(0))
            )
            .cast("long")
            .alias("n_dropped"),
        )
    )


# ---------------------------------------------------------- winnowing


def winnow_fingerprints(
    df: DataFrame,
    k: int = 5,
    w: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, fp) — winnowed k-gram fingerprints (Schleimer,
    Wilkerson & Aiken 2003 — the MOSS local fingerprinting scheme):
    hash every k-token gram, slide a w-gram window, keep each
    window's MINIMUM hash; the distinct per-document set of selected
    hashes is the fingerprint.

    Winnowing guarantee: any shared token run of length ≥ w+k-1
    between two documents produces at least one shared fingerprint,
    while only ~2/(w+1) of grams are kept — a bounded-size sketch
    with an exact-match floor, unlike MinHash's probabilistic one.
    Frozen edge semantics: only FULL windows select (documents with
    fewer than k+w-1 tokens yield no fingerprints).

    Hash = first 15 hex chars of md5(gram) as int64 (60-bit) — the
    md5-prefix idiom every oracle-replicated hash in this repo uses
    (minhash, stratified_sample): DuckDB computes identical values.

    Plan: tokenize → ONE exchange per doc (row_number, the gram
    leads, and the trailing-frame min all share the same window
    sort) → distinct hash agg colocated with the window's
    HashPartitioning(doc_id). Positions are deliberately dropped —
    the fingerprint SET is what dedup joins on; join back to the
    gram table when offsets are needed.
    """
    from pyspark.sql.window import Window

    if k < 1 or w < 1:
        raise ValueError(f"winnowing needs k >= 1 and w >= 1, got k={k} w={w}")
    toks = tokenize(df, text_col, id_col)
    w_ord = Window.partitionBy(id_col).orderBy("pos")
    t = toks
    lead_cols = []
    for i in range(1, k):
        name = f"_lead{i}"
        t = t.withColumn(name, F.lead("term", i).over(w_ord))
        lead_cols.append(name)
    if lead_cols:  # k=1: unigram fingerprints, no lead filter needed
        t = t.filter(F.col(lead_cols[-1]).isNotNull())
    gram = F.concat_ws(" ", "term", *lead_cols)
    h = (
        F.conv(F.substring(F.md5(gram), 1, 15), 16, 10)
        .cast("long")
        .alias("h")
    )
    g = t.select(id_col, "pos", h).withColumn(
        "rn", F.row_number().over(w_ord)
    )
    frame = (
        Window.partitionBy(id_col)
        .orderBy("rn")
        .rowsBetween(-(w - 1), 0)
    )
    sel = g.select(
        id_col, F.min("h").over(frame).alias("fp"), "rn"
    ).filter(F.col("rn") >= w)
    return sel.select(id_col, "fp").distinct()


def winnow_similar_pairs(
    df: DataFrame,
    k: int = 5,
    w: int = 4,
    min_shared: int = 2,
    max_fp_df: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_a, doc_b, shared_fps) — document pairs sharing ≥
    min_shared winnowed fingerprints (doc_a < doc_b), the MOSS
    copy-detection join.

    ``max_fp_df``: drop fingerprints present in more than this many
    documents before the self-join — the same B² skew guard as the
    minhash/simhash candidate generators (a boilerplate gram shared
    by B documents alone creates B² candidate rows; dropping it loses
    only matches OF that boilerplate). None = exact.
    """
    fp = winnow_fingerprints(df, k, w, text_col, id_col)
    if max_fp_df is not None:
        dfreq = fp.groupBy("fp").agg(F.count(F.lit(1)).alias("_df"))
        fp = (
            fp.join(dfreq.filter(F.col("_df") <= max_fp_df), "fp")
            .select(id_col, "fp")
        )
    a = fp.select(F.col(id_col).alias("doc_a"), "fp")
    b = fp.select(F.col(id_col).alias("doc_b"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("shared_fps"))
        .filter(F.col("shared_fps") >= min_shared)
    )
