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
