"""Text analysis for training-data pipelines: language-ID, quality
scoring, token counting, document fingerprinting.

All four are 100% built-in Spark expressions (JVM-side, SQL-
expressible → DuckDB-oracled). Deterministic by construction.

Task-brief scope; the reference's nearest analogs are the regex
doc-type detector (/root/reference/src/documentindex/detector.py:
28-190 — pattern-vote classification, same shape as language-ID) and
token estimation (utils.py:227-239).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .tokenize import tokenize

# n-gram/stopword evidence lists per language (tiny, frozen).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "est"],
    "es": ["el", "los", "y", "las", "es"],
    "zh": ["de", "shi", "le", "zai", "he"],
}


def _marker_count(text: Column, words: list[str]) -> Column:
    pat = r"\b(" + "|".join(words) + r")\b"
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(pat), F.lit(0)))


def language_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, score_<lang>..., lang_pred) — pattern-vote
    classification (detector.py:105-190 shape): marker hits per
    language, argmax with deterministic alphabetical tie-break."""
    cols = [df["doc_id"]]
    for lang in sorted(LANG_MARKERS):
        cols.append(
            _marker_count(F.col(text_col), LANG_MARKERS[lang]).alias(
                f"score_{lang}"
            )
        )
    scored = df.select(*cols)
    langs = sorted(LANG_MARKERS)
    best = F.greatest(*[F.col(f"score_{lg}") for lg in langs])
    pred = F.lit(None).cast("string")
    for lg in reversed(langs):  # earlier alphabetical wins ties
        pred = F.when(F.col(f"score_{lg}") == best, F.lit(lg)).otherwise(pred)
    return scored.withColumn("lang_pred", pred)


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_chars, n_tokens, avg_token_len, punct_ratio,
    stopword_ratio, quality_score) — length/punct/stopword heuristics,
    combined into a frozen 0-1 score."""
    c = F.col(text_col)
    n_chars = F.length(c)
    tokens = F.size(F.regexp_extract_all(F.lower(c), F.lit(r"[a-z0-9]+"), F.lit(0)))
    n_punct = F.size(
        F.regexp_extract_all(c, F.lit(r"[^\w\s]"), F.lit(0))
    )
    n_stop = _marker_count(c, LANG_MARKERS["en"])
    avg_tok = F.when(tokens > 0, n_chars / tokens).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(tokens > 0, n_stop / tokens).otherwise(F.lit(0.0))
    # frozen score: length band + sane avg token len + low punct
    score = (
        F.when((tokens >= 10) & (tokens <= 100000), F.lit(0.4)).otherwise(F.lit(0.0))
        + F.when((avg_tok >= 3.0) & (avg_tok <= 12.0), F.lit(0.3)).otherwise(F.lit(0.0))
        + F.when(punct_ratio <= 0.2, F.lit(0.2)).otherwise(F.lit(0.0))
        + F.when(stop_ratio >= 0.01, F.lit(0.1)).otherwise(F.lit(0.0))
    )
    return df.select(
        "doc_id",
        n_chars.cast("long").alias("n_chars"),
        tokens.cast("long").alias("n_tokens"),
        F.round(avg_tok, 6).alias("avg_token_len"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(score, 6).alias("quality_score"),
    )


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, ws_tokens, bpe_ish_tokens) — whitespace split vs a
    BPE-ish regex (word pieces + standalone punctuation), the two
    standard budget estimators."""
    c = F.col(text_col)
    ws = F.size(
        F.regexp_extract_all(c, F.lit(r"\S+"), F.lit(0))
    )
    bpe = F.size(
        F.regexp_extract_all(
            c, F.lit(r"[A-Za-z0-9]{1,8}|[^A-Za-z0-9\s]"), F.lit(0)
        )
    )
    return df.select(
        "doc_id",
        ws.cast("long").alias("ws_tokens"),
        bpe.cast("long").alias("bpe_ish_tokens"),
    )


SAMPLE_BUCKETS = 1_000_000


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    seed: str = "v1",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum sampling — the training-mix operator
    (up/down-weight sources/languages/domains when composing a
    training corpus).

    NOT ``rand()``-based: membership is a pure function of
    (seed, doc_id) — md5(seed|doc_id) mod 1e6 < fraction·1e6 — so the
    sample is reproducible across runs/partitionings/engines (the
    exact property a dataset card needs), strata can be re-weighted
    later without reshuffling membership of untouched strata, and the
    DuckDB oracle reproduces it bit-for-bit (same md5 trick as
    minhash). One narrow stage: no shuffle, no sort, no state; the
    fraction map rides the closure as a literal CASE expression.
    """
    bucket = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(f"{seed}|"), F.col(id_col).cast("string")
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        )
        .cast("long")
        % SAMPLE_BUCKETS
    )
    frac = F.lit(float(default_fraction))
    for key, f in sorted(fractions.items()):
        frac = F.when(
            F.col(strata_col) == F.lit(key), F.lit(float(f))
        ).otherwise(frac)
    return df.filter(
        bucket < (frac * F.lit(SAMPLE_BUCKETS)).cast("long")
    )


def lm_quality_scores(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, n_bigrams, avg_logprob) — corpus-LM fluency score:
    each document's mean token-bigram log-likelihood under the
    corpus's OWN bigram distribution (the CCNet/KenLM perplexity
    quality signal, with the corpus itself as the language model —
    no external model artifact, fully deterministic, SQL-oracled).

    P(w2|w1) = count(w1,w2) / Σ_w count(w1,w); every observed bigram
    has count ≥ 1, so no smoothing is needed and avg_logprob ≤ 0 with
    boilerplate-heavy docs scoring near 0 (their bigrams dominate the
    corpus) and disfluent/rare-junk docs scoring very negative — the
    usual filter keeps a mid-band.

    Plan: tokenize → lead-window bigrams → ONE partial+final hash agg
    for bigram counts; context counts derive from the (much smaller)
    bigram-count table, not a second pass over tokens; probability
    join is shuffle-hash on (w1,w2) then w1; per-doc mean is the
    final agg. Four shuffles total, all key-partitioned, no
    collect — the 100 TB shape.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(id_col).orderBy("pos")
    t = tokenize(df, text_col, id_col).withColumn(
        "w2", F.lead("term", 1).over(w)
    )
    bg = t.filter(F.col("w2").isNotNull()).select(
        id_col, F.col("term").alias("w1"), "w2"
    )
    cb = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    cc = cb.groupBy("w1").agg(F.sum("c2").alias("c1"))
    return (
        bg.join(cb, ["w1", "w2"])
        .join(cc, "w1")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                F.avg(F.log(F.col("c2") / F.col("c1"))), 6
            ).alias("avg_logprob"),
        )
    )


def repetition_features(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, n_tokens, top_word_frac, top_2gram_frac, top_3gram_frac,
    dup_5gram_frac) — the word-level half of the Gopher repetition
    filters (Rae et al. 2021, appendix A1.1): documents dominated by a
    single word/2-gram/3-gram or by repeated 5-grams are boilerplate
    (navigation bars, keyword stuffing, scraped templates) and get
    culled before training.

    Frozen semantics (tokens = the frozen analyzer, tokenize()):
      top_word_frac  = max word count / n_tokens
      top_2gram_frac = 2·(max 2-gram count) / n_tokens
      top_3gram_frac = 3·(max 3-gram count) / n_tokens
      dup_5gram_frac = (n 5-grams − distinct 5-grams) / n 5-grams
    All fractions 0.0 when the denominator is 0; round(6) both sides.

    Plan shape (ONE real shuffle — plan-audited, PLANS.md §7): the
    four gram levels are not four sibling aggregations over four
    copies of the window subtree (the naive form plans 5 exchanges —
    the branches prune different lead columns, so even ReuseExchange
    can't collapse them). Instead one window pass builds every lead,
    ``stack`` unpivots each token row into its (level, gram) rows
    in-stage, and both the (doc, level, gram) count and the per-doc
    conditional rollup colocate with the window's
    HashPartitioning(doc_id) (partition keys ⊆ grouping keys ⇒ no
    further exchange). The 4× row expansion never shuffles.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(id_col).orderBy("pos")
    t = tokenize(df, text_col, id_col).select(
        id_col,
        "term",
        F.lead("term", 1).over(w).alias("_w1"),
        F.lead("term", 2).over(w).alias("_w2"),
        F.lead("term", 3).over(w).alias("_w3"),
        F.lead("term", 4).over(w).alias("_w4"),
    )
    # gram columns are NULL on incomplete tails (concat_ws skips
    # NULLs, so guard explicitly), and stack rows with NULL grams are
    # filtered — exactly the per-level WHERE of the naive form.
    t = t.select(
        id_col,
        "term",
        F.when(
            F.col("_w1").isNotNull(),
            F.concat_ws(" ", "term", "_w1"),
        ).alias("_g2"),
        F.when(
            F.col("_w2").isNotNull(),
            F.concat_ws(" ", "term", "_w1", "_w2"),
        ).alias("_g3"),
        F.when(
            F.col("_w4").isNotNull(),
            F.concat_ws(" ", "term", "_w1", "_w2", "_w3", "_w4"),
        ).alias("_g5"),
    )
    lv = t.select(
        id_col,
        F.expr(
            "stack(4, 'w', term, '2', _g2, '3', _g3, '5', _g5) "
            "AS (lvl, gram)"
        ),
    ).where(F.col("gram").isNotNull())
    counts = lv.groupBy(id_col, "lvl", "gram").agg(
        F.count(F.lit(1)).alias("c")
    )
    lvl = F.col("lvl")
    agg = counts.groupBy(id_col).agg(
        F.sum(F.when(lvl == "w", F.col("c"))).alias("_n"),
        F.max(F.when(lvl == "w", F.col("c"))).alias("_mw"),
        F.max(F.when(lvl == "2", F.col("c"))).alias("_m2"),
        F.max(F.when(lvl == "3", F.col("c"))).alias("_m3"),
        F.sum(F.when(lvl == "5", F.col("c"))).alias("_n5"),
        F.count(F.when(lvl == "5", F.col("c"))).alias("_d5"),
    )
    out = df.select(id_col).join(agg, id_col, "left")
    n = F.coalesce(F.col("_n"), F.lit(0))
    frac = lambda num, den: F.round(  # noqa: E731
        F.when(den > 0, num / den).otherwise(F.lit(0.0)), 6
    )
    return out.select(
        id_col,
        n.cast("long").alias("n_tokens"),
        frac(F.coalesce(F.col("_mw"), F.lit(0)), n).alias("top_word_frac"),
        frac(2 * F.coalesce(F.col("_m2"), F.lit(0)), n).alias(
            "top_2gram_frac"
        ),
        frac(3 * F.coalesce(F.col("_m3"), F.lit(0)), n).alias(
            "top_3gram_frac"
        ),
        frac(
            F.coalesce(F.col("_n5") - F.col("_d5"), F.lit(0)),
            F.coalesce(F.col("_n5"), F.lit(0)),
        ).alias("dup_5gram_frac"),
    )


def line_quality_features(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, n_lines, dup_line_frac, dup_line_char_frac,
    bullet_line_frac, ellipsis_line_frac, terminal_punct_line_frac,
    short_line_frac) — the line-level Gopher/C4 boilerplate filters:
    duplicate lines (nav bars, footers), bullet/ellipsis lines
    (Gopher), lines ending without terminal punctuation and very short
    lines (C4, Raffel et al. 2020 §2.2).

    Frozen semantics: lines = split on '\\n', trimmed, empty lines
    dropped.  dup_line_frac counts occurrences beyond the first;
    dup_line_char_frac is the character-weighted version; bullet =
    trimmed line starts with -, * or U+2022; ellipsis = ends with
    '...' or U+2026; terminal = ends with . ! or ?; short = fewer
    than 5 whitespace-separated words. Fractions are over line
    OCCURRENCES (each repeat counts); 0.0 when a doc has no lines.
    round(6) both sides. All regexes RE2-safe (shared with the DuckDB
    oracle).

    Plan: explode lines → hash agg to (doc, line, count) — the heavy
    dedup happens at the finest key — then a per-doc rollup. With the
    input pre-partitioned by doc_id both aggs run in one exchange
    (same ClusteredDistribution argument as repetition_features);
    unpartitioned input costs one extra doc-keyed exchange of the
    already-deduped line table.
    """
    c = F.col(text_col)
    lines = (
        df.select(id_col, F.explode(F.split(c, "\n")).alias("_raw"))
        .select(id_col, F.trim(F.col("_raw")).alias("line"))
        .where(F.col("line") != "")
    )
    g = lines.groupBy(id_col, "line").agg(F.count(F.lit(1)).alias("c"))
    per = g.select(
        id_col,
        "c",
        F.length("line").alias("_len"),
        F.col("line").rlike("^[-*•]").cast("long").alias("_bul"),
        F.col("line")
        .rlike("(\\.\\.\\.|…)$")
        .cast("long")
        .alias("_ell"),
        F.col("line").rlike("[.!?]$").cast("long").alias("_term"),
        (
            F.regexp_count(F.col("line"), F.lit(r"\S+")) < 5
        )
        .cast("long")
        .alias("_short"),
    )
    agg = per.groupBy(id_col).agg(
        F.sum("c").alias("_n"),
        F.count(F.lit(1)).alias("_d"),
        F.sum(F.col("c") * F.col("_len")).alias("_chars"),
        F.sum("_len").alias("_dchars"),
        F.sum(F.col("c") * F.col("_bul")).alias("_buls"),
        F.sum(F.col("c") * F.col("_ell")).alias("_ells"),
        F.sum(F.col("c") * F.col("_term")).alias("_terms"),
        F.sum(F.col("c") * F.col("_short")).alias("_shorts"),
    )
    out = df.select(id_col).join(agg, id_col, "left")
    n = F.coalesce(F.col("_n"), F.lit(0))
    chars = F.coalesce(F.col("_chars"), F.lit(0))
    frac = lambda num, den: F.round(  # noqa: E731
        F.when(den > 0, num / den).otherwise(F.lit(0.0)), 6
    )
    z = lambda col: F.coalesce(col, F.lit(0))  # noqa: E731
    return out.select(
        id_col,
        n.cast("long").alias("n_lines"),
        frac(n - z(F.col("_d")), n).alias("dup_line_frac"),
        frac(chars - z(F.col("_dchars")), chars).alias(
            "dup_line_char_frac"
        ),
        frac(z(F.col("_buls")), n).alias("bullet_line_frac"),
        frac(z(F.col("_ells")), n).alias("ellipsis_line_frac"),
        frac(z(F.col("_terms")), n).alias("terminal_punct_line_frac"),
        frac(z(F.col("_shorts")), n).alias("short_line_frac"),
    )


def term_cooccurrence_pmi(
    df: DataFrame,
    min_count: int = 5,
    max_df: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(term_a, term_b, n_ab, pmi) — document-level term
    co-occurrence with pointwise mutual information
    ``ln(n_ab·N / (n_a·n_b))`` (N = corpus document count): the
    related-terms / collocation signal behind query suggestion and
    topic drift monitoring.

    Frozen semantics: presence-based (distinct doc-term — tf
    multiplicity is ignored), unordered pairs with term_a < term_b,
    pairs kept when n_ab ≥ min_count; round(6).

    ``max_df``: drop terms present in more than max_df documents
    before pairing — the hot-term guard (a term in B docs joins into
    B·T pair rows; ubiquitous terms also carry no PMI signal, their
    PMI → ln(n_ab·N/(n_a·n_b)) ≈ 0⁻). None = exact.

    Plan (audited, PLANS.md §7): ONE doc-keyed repartition serves the
    distinct (HashPartitioning(doc) satisfies Clustered(doc, term)),
    the self-join (both sides share the partitioning — no join
    exchange; at small scale Catalyst may even broadcast one side),
    and its per-doc T² pair expansion stays in-stage; the only other
    shuffles are the (a,b) pair agg (map-side combined) and the
    marginal term agg — 3 DISTINCT shuffles total (the static plan
    prints the shared dt subtree once per consumer; AQE exchange
    reuse dedupes them at runtime). max_df bounds the per-doc
    expansion at scale.
    """
    spark = df.sparkSession
    n_part = max(
        df.rdd.getNumPartitions(),
        int(spark.conf.get("spark.sql.shuffle.partitions")),
    )
    dt = (
        tokenize(df, text_col, id_col)
        .select(id_col, "term")
        .repartition(n_part, id_col)
        .distinct()
    )
    if max_df is not None:
        hot = (
            dt.groupBy("term")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") <= max_df)
            .select("term")
        )
        # broadcast keeps dt's doc partitioning for the self-join
        dt = dt.join(F.broadcast(hot), "term")
    ca = dt.groupBy("term").agg(F.count(F.lit(1)).alias("n_t"))
    nd = df.agg(F.count(F.lit(1)).alias("n_docs"))
    a = dt.select(F.col(id_col).alias("_d"), F.col("term").alias("term_a"))
    b = dt.select(F.col(id_col).alias("_d"), F.col("term").alias("term_b"))
    pairs = (
        a.join(b, "_d")
        .filter(F.col("term_a") < F.col("term_b"))
        .groupBy("term_a", "term_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= min_count)
    )
    return (
        pairs.join(
            F.broadcast(
                ca.select(
                    F.col("term").alias("term_a"), F.col("n_t").alias("n_a")
                )
            ),
            "term_a",
        )
        .join(
            F.broadcast(
                ca.select(
                    F.col("term").alias("term_b"), F.col("n_t").alias("n_b")
                )
            ),
            "term_b",
        )
        .crossJoin(F.broadcast(nd))
        .select(
            "term_a",
            "term_b",
            F.col("n_ab").cast("long").alias("n_ab"),
            F.round(
                F.log(
                    F.col("n_ab")
                    * F.col("n_docs")
                    / (F.col("n_a") * F.col("n_b"))
                ),
                6,
            ).alias("pmi"),
        )
    )


def doc_fingerprints(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, content_sha, min_token_fp) — exact fingerprint of the
    whitespace-normalized text plus a MinHash-style single-value
    fingerprint (min md5 over distinct tokens; robust to small edits:
    equal fps ⇒ near-identical vocabulary with high probability)."""
    c = F.col(text_col)
    norm = F.regexp_replace(F.lower(c), r"\s+", " ")
    toks = F.array_distinct(
        F.regexp_extract_all(F.lower(c), F.lit(r"[a-z0-9]+"), F.lit(0))
    )
    min_tok_fp = F.array_min(F.transform(toks, lambda t: F.md5(t)))
    return df.select(
        "doc_id",
        F.sha2(norm, 256).alias("content_sha"),
        min_tok_fp.alias("min_token_fp"),
    )


def curate_corpus(
    df: DataFrame,
    min_quality: float = 0.6,
    lang: str = "en",
    text_col: str = "text",
) -> DataFrame:
    """The standard training-data curation pass as ONE plan:
    (doc_id, quality_score, lang_pred, is_exact_dup, keep).

    - exact-dedup keep-first: one hash agg on sha2(text) → min doc_id
      per group, broadcast-sized join back (NOT a window over the
      corpus: the agg side is |distinct texts| and partial-aggregates
      map-side);
    - quality gate: ``quality_features().quality_score ≥ min_quality``;
    - language gate: ``language_scores().lang_pred == lang``.

    keep = not-dup AND quality AND language. All built-ins,
    SQL-expressible (DuckDB-oracled: driver entry
    ``curation_pipeline``). At 100 TB this is two shuffles total (the
    sha agg + the join; quality/language are map-side projections)."""
    q = quality_features(df, text_col).select("doc_id", "quality_score")
    lp = language_scores(df, text_col).select("doc_id", "lang_pred")
    sha = df.select("doc_id", F.sha2(F.col(text_col), 256).alias("_sha"))
    keeper = sha.groupBy("_sha").agg(F.min("doc_id").alias("_keeper"))
    flags = sha.join(keeper, "_sha").select(
        "doc_id", (F.col("doc_id") != F.col("_keeper")).alias("is_exact_dup")
    )
    out = q.join(lp, "doc_id").join(flags, "doc_id")
    return out.select(
        "doc_id",
        "quality_score",
        "lang_pred",
        "is_exact_dup",
        (
            (~F.col("is_exact_dup"))
            & (F.col("quality_score") >= min_quality)
            & (F.col("lang_pred") == lang)
        ).alias("keep"),
    )


def curate_corpus_neardup(
    df: DataFrame,
    pairs: DataFrame | None = None,
    min_quality: float = 0.6,
    lang: str = "en",
    text_col: str = "text",
    threshold: float = 0.25,
) -> DataFrame:
    """curate_corpus with NEAR-duplicate awareness — the Lee et al.
    2022 pipeline shape: pair generation → connected components →
    keep one representative per cluster (the min doc_id), then the
    quality and language gates. Exact duplicates are a special case
    (jaccard 1.0), so this subsumes the exact keep-first pass.

    ``pairs``: any (doc_a, doc_b) near-dup pair table. Default None
    computes MinHash-LSH candidates-verified pairs (the 100 TB path);
    the oracle-gated driver entry passes exact n-gram Jaccard pairs
    instead so the DuckDB twin reproduces the identical pair set.

    Returns (doc_id, quality_score, lang_pred, is_near_dup, keep):
    is_near_dup marks non-representative cluster members; keep =
    representative-or-unique AND quality ≥ min AND language match.
    """
    from ..operators.dedup import (
        duplicate_clusters,
        minhash_near_duplicates,
    )

    if pairs is None:
        pairs = minhash_near_duplicates(
            df, threshold=threshold, text_col=text_col
        ).select("doc_a", "doc_b")
    clusters = duplicate_clusters(pairs)
    q = quality_features(df, text_col).select("doc_id", "quality_score")
    lp = language_scores(df, text_col).select("doc_id", "lang_pred")
    flags = clusters.select(
        "doc_id",
        (F.col("doc_id") != F.col("cluster_id")).alias("is_near_dup"),
    )
    out = (
        q.join(lp, "doc_id")
        .join(flags, "doc_id", "left")
        .withColumn(
            "is_near_dup", F.coalesce("is_near_dup", F.lit(False))
        )
    )
    return out.select(
        "doc_id",
        "quality_score",
        "lang_pred",
        "is_near_dup",
        (
            (~F.col("is_near_dup"))
            & (F.col("quality_score") >= min_quality)
            & (F.col("lang_pred") == lang)
        ).alias("keep"),
    )
