"""Exhaustive BM25 scorer — the permanent rank-identity oracle (M1).

100% built-in Spark expressions (no UDF anywhere): the impact formula
is pure `F.col` arithmetic, the per-doc sum is a deterministic
`sort_array` + `F.aggregate` fold so float64 addition order is fixed
(ascending term), and top-k plans as TakeOrderedAndProject
(distributed partial top-k, no global sort).

Replaces the reference's LLM relevance scan
(/root/reference/src/documentindex/searcher.py:56-247): same logical
plan — scan → score → [filter] → sort desc → limit k — with
deterministic lexical scoring per the north rule.

Frozen semantics (constants.py): Lucene idf
``ln(1 + (N - df + 0.5)/(df + 0.5))``; tf norm
``tf*(k1+1)/(tf + k1*(1 - b + b*dl/avgdl))``; query terms deduped and
summed in ascending term order; ties broken (score DESC, doc_id ASC).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..constants import BM25_B, BM25_K1
from ..functions.tokenize import query_terms
from .stats import CorpusStats


def idf_col(df_col: Column, n_docs: int) -> Column:
    return F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - df_col + F.lit(0.5)) / (df_col + F.lit(0.5))
    )


def tf_norm_col(tf_col: Column, dl_col: Column, avgdl: float) -> Column:
    k1, b = F.lit(BM25_K1), F.lit(BM25_B)
    return (tf_col * (k1 + F.lit(1.0))) / (
        tf_col + k1 * (F.lit(1.0) - b + b * dl_col / F.lit(float(avgdl)))
    )


def impacts(
    tf: DataFrame, doc_lens: DataFrame, dfreq: DataFrame, stats: CorpusStats
) -> DataFrame:
    """(doc_id, term, impact) — the query-independent per-posting
    weight. Precomputing it at build time is what lets the BMW scorer
    skip any doc-length lookup at query time (SURVEY.md §4.2.2/3).

    Join shape: tf ⋈ doc_lens on doc_id (both doc-keyed — co-
    partitioned by the same shuffle key), then ⋈ dfreq on term.
    """
    return (
        tf.join(doc_lens, "doc_id")
        .join(dfreq, "term")
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            (
                idf_col(F.col("df").cast("double"), stats.n_docs)
                * tf_norm_col(
                    F.col("tf").cast("double"),
                    F.col("dl").cast("double"),
                    stats.avgdl,
                )
            ).alias("impact"),
        )
    )
    # tf/df are carried for the posting-list builder (postings.py);
    # query paths select only (doc_id, term, impact) — Catalyst prunes.


def impacts_keyed(
    tf_k: DataFrame, doc_lens: DataFrame, tdict: DataFrame,
    stats: CorpusStats,
) -> DataFrame:
    """impacts() with int64 term keys (round-3 verdict #5): tf_k is
    (doc_id, tkey, tf) and tdict is the vocab dictionary
    (tkey, df, bucket) — the token-mass ⋈ vocab join and every
    downstream encode shuffle move an 8-byte key plus small ints, no
    term strings. Numerically identical to impacts(): same
    idf/tf_norm expressions over the same values."""
    return (
        tf_k.join(doc_lens, "doc_id")
        .join(tdict.select("tkey", "df", "bucket"), "tkey")
        .select(
            "doc_id",
            "tkey",
            "bucket",
            "tf",
            "df",
            (
                idf_col(F.col("df").cast("double"), stats.n_docs)
                * tf_norm_col(
                    F.col("tf").cast("double"),
                    F.col("dl").cast("double"),
                    stats.avgdl,
                )
            ).alias("impact"),
        )
    )


def _ordered_sum(df_grouped_terms: DataFrame) -> DataFrame:
    """Deterministic float64 per-doc sum: collect (term, impact)
    structs, sort_array (ascending term), fold with F.aggregate.
    All JVM-side."""
    return df_grouped_terms.groupBy("doc_id").agg(
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("term", "impact"))),
            F.lit(0.0),
            lambda acc, x: acc + x["impact"],
        ).alias("score")
    )


def score_query(impact_df: DataFrame, query: str) -> DataFrame:
    """(doc_id, score) for every doc matching ≥1 query term.

    The query-term side is a literal isin() filter — Catalyst pushes
    it into the impact scan; no join needed for a handful of terms.
    OOV terms simply match nothing (score contribution 0).
    """
    terms = query_terms(query)
    if not terms:
        return impact_df.select("doc_id", F.lit(0.0).alias("score")).limit(0)
    matched = impact_df.filter(F.col("term").isin(terms))
    return _ordered_sum(matched)


def score_query_boolean(
    impact_df: DataFrame, query: str, min_should_match: int | None = None
) -> DataFrame:
    """Boolean-mode BM25: (doc_id, score, n_matched) for docs
    matching ≥ ``min_should_match`` DISTINCT query terms (default:
    ALL terms — conjunctive AND). Scoring stays the frozen ordered
    float64 sum; the boolean predicate is a HAVING on the distinct
    matched-term count inside the same aggregate (no second pass).

    Lucene's BooleanQuery minimumNumberShouldMatch semantics over
    the same impact table the ranked scorer uses."""
    terms = query_terms(query)
    if not terms:
        return (
            impact_df.select(
                "doc_id",
                F.lit(0.0).alias("score"),
                F.lit(0).alias("n_matched"),
            ).limit(0)
        )
    need = len(terms) if min_should_match is None else min_should_match
    matched = impact_df.filter(F.col("term").isin(terms))
    return (
        matched.groupBy("doc_id")
        .agg(
            F.aggregate(
                F.sort_array(F.collect_list(F.struct("term", "impact"))),
                F.lit(0.0),
                lambda acc, x: acc + x["impact"],
            ).alias("score"),
            F.count_distinct(F.col("term")).cast("int").alias("n_matched"),
        )
        .filter(F.col("n_matched") >= need)
    )


def topk(scored: DataFrame, k: int) -> DataFrame:
    """(doc_id, score, rank) — TakeOrderedAndProject plan."""
    from pyspark.sql.window import Window

    lim = scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return lim.withColumn("rank", F.row_number().over(w))


def score_queries_batch(impact_df: DataFrame, queries: DataFrame) -> DataFrame:
    """Batched scoring: ``queries`` is (query_id, term) — broadcast to
    the impact table (query side is tiny), one shuffle on
    (query_id, doc_id). Used by the bench harness for the full
    reference query set in one job."""
    joined = impact_df.join(F.broadcast(queries), "term")
    return joined.groupBy("query_id", "doc_id").agg(
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("term", "impact"))),
            F.lit(0.0),
            lambda acc, x: acc + x["impact"],
        ).alias("score")
    )


def topk_batch(scored: DataFrame, k: int) -> DataFrame:
    """Per-query top-k via window rank — one shuffle on query_id."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def topk_grouped(
    scored: DataFrame, facet_col: str, k: int, n_shards: int = 32
) -> DataFrame:
    """Per-facet top-k (Lucene grouping-module analog; reference
    serves flat top-k only — this is the faceted variant a search UI
    layers on): rank docs within each ``facet_col`` value, keep k per
    group → (facet, doc_id, score, rank ≤ k).

    Scale shape: a single window partitioned by facet piles a
    corpus-hot facet (half the corpus sharing one ``lang``) onto one
    task — the hot-key window trap (CLAUDE.md). Two stages instead:

    1. rank within (facet, doc_id % n_shards) — a hot facet spreads
       over ``n_shards`` tasks; each shard's top-k under the shared
       total order is a superset filter for the facet's true top-k;
    2. rank the ≤ n_shards·k survivors per facet (tiny by
       construction — bounded rows per facet, never corpus-bounded).

    Ranking orders by (round(score, 6) DESC, doc_id ASC): the rounded
    tie-break makes ranks reproducible across engines whose float
    summation order differs (driver-contract rule: rank ties broken
    deterministically).
    """
    from pyspark.sql.window import Window

    rscore = F.round(F.col("score"), 6)
    shard = F.pmod(F.col("doc_id"), F.lit(n_shards))
    w1 = Window.partitionBy(facet_col, shard).orderBy(
        rscore.desc(), F.asc("doc_id")
    )
    survivors = (
        scored.withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= k)
        .drop("_r1")
    )
    w2 = Window.partitionBy(facet_col).orderBy(rscore.desc(), F.asc("doc_id"))
    return (
        survivors.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
    )


def facet_counts(scored_with_facet: DataFrame, facet_col: str) -> DataFrame:
    """Search-aggregation facet counts (the Elasticsearch terms-agg /
    Lucene faceting-module analog; reference serves flat hits only —
    this is the sidebar a search UI renders next to them): for the
    matched-doc set, per ``facet_col`` value report match count and
    score max/avg.

    Scale shape: one hash aggregate over the scored set — partial
    (map-side) combine collapses each facet to one row per task before
    the exchange, so the shuffle is O(n_facets · n_tasks) regardless
    of corpus size. No window, no hot-key pile-up.
    """
    return (
        scored_with_facet.groupBy(facet_col)
        .agg(
            F.count(F.lit(1)).alias("n_matches"),
            F.round(F.max("score"), 6).alias("max_score"),
            F.round(F.avg("score"), 6).alias("avg_score"),
        )
    )


def search_after(
    scored: DataFrame, cursor_score: float, cursor_doc_id: int, k: int
) -> DataFrame:
    """Cursor pagination (the Lucene ``searchAfter`` / Elasticsearch
    ``search_after`` shape): the next ``k`` results strictly after the
    cursor ``(cursor_score, cursor_doc_id)`` in the rounded total
    order (round(score, 6) DESC, doc_id ASC).

    Deep paging without deep buffering: the strictly-after predicate
    is an ordinary pushed filter, so page N costs the same one
    TakeOrderedAndProject over the survivors as page 1 — never an
    O(page_end) global sort+slice. Rounded comparison on both engines
    makes page boundaries reproducible when float summation order
    differs (driver-contract rule).

    ``rank`` is page-relative (1..k).
    """
    from pyspark.sql.window import Window

    rscore = F.round(F.col("score"), 6)
    # round the cursor INSIDE the plan so both comparands use Spark's
    # HALF_UP — Python round() is banker's rounding, and an unrounded
    # caller cursor landing on a .5 boundary at the 7th digit would
    # mismatch the boundary row across pages (round-5 advice). For
    # cursors taken from returned pages (the documented contract) the
    # two agree.
    cs = F.round(F.lit(float(cursor_score)), 6)
    after = scored.filter(
        (rscore < cs)
        | ((rscore == cs) & (F.col("doc_id") > F.lit(cursor_doc_id)))
    )
    lim = after.orderBy(rscore.desc(), F.asc("doc_id")).limit(k)
    w = Window.orderBy(F.round(F.col("score"), 6).desc(), F.asc("doc_id"))
    return lim.withColumn("rank", F.row_number().over(w))


def expand_query_rm3(
    impact_df: DataFrame,
    query: str,
    fb_k: int = 10,
    n_expand: int = 5,
    expand_weight: float = 0.5,
) -> DataFrame:
    """Pseudo-relevance-feedback query expansion (deterministic RM3
    analog; the classic two-pass retrieval loop the reference's
    agentic multi-probe approximates with an LLM):

    1. feedback set = top ``fb_k`` docs for the original query under
       the rounded total order (round(score,6) DESC, doc_id ASC);
    2. expansion terms = top ``n_expand`` NON-query terms by summed
       impact within the feedback docs (round-6, ties by term ASC —
       reproducible across engines);
    3. rescore the corpus with per-term weights: 1.0 for original
       terms, ``expand_weight`` for expansion terms, using the frozen
       ordered float64 fold (term-ascending) over weighted impacts.

    Returns (doc_id, score) — compose with :func:`topk` for ranked
    output.

    Scale shape: the feedback set is ``fb_k`` ids (driver-small by
    construction — same class as the query-term postings collect in
    BMW); expansion selection is one aggregate over those docs'
    postings rows only (isin-pushed scan); the rescore is the same
    single-pass scorer with a broadcast ≤ (len(query)+n_expand)-row
    weight table. No corpus-sized intermediate at any step.
    """
    terms = query_terms(query)
    if not terms:
        return impact_df.select("doc_id", F.lit(0.0).alias("score")).limit(0)

    scored0 = score_query(impact_df, query)
    fb_rows = (
        scored0.orderBy(F.round("score", 6).desc(), F.asc("doc_id"))
        .limit(fb_k)
        .select("doc_id")
        .collect()
    )
    fb_ids = [r["doc_id"] for r in fb_rows]

    exp_rows = (
        impact_df.filter(
            F.col("doc_id").isin(fb_ids) & ~F.col("term").isin(terms)
        )
        .groupBy("term")
        .agg(F.round(F.sum("impact"), 6).alias("w"))
        .orderBy(F.desc("w"), F.asc("term"))
        .limit(n_expand)
        .collect()
    )
    weights = [(t, 1.0) for t in terms] + [
        (r["term"], float(expand_weight)) for r in exp_rows
    ]
    wdf = impact_df.sparkSession.createDataFrame(weights, ["term", "wt"])

    matched = impact_df.join(F.broadcast(wdf), "term").select(
        "doc_id", "term", (F.col("impact") * F.col("wt")).alias("impact")
    )
    return _ordered_sum(matched)


def more_like_this(
    impact_df: DataFrame,
    src_doc_id: int,
    k: int = 10,
    max_query_terms: int = 10,
) -> DataFrame:
    """(doc_id, score, rank) — document-as-query search (the Lucene
    MoreLikeThis shape): the source document's terms ranked by their
    own BM25 impact become the query, every OTHER document is scored
    with the frozen ordered float64 sum, top-k as usual.

    Term selection is deterministic: round(impact, 6) DESC, term ASC
    (rounded on both engines so last-ulp impact ties cannot reorder
    the selection), LIMIT max_query_terms. The selected-term table is
    tiny by construction — broadcast to the impact scan, no collect.
    Plan: pruned impact scan (doc_id = src) → TakeOrdered(n terms) →
    broadcast join → one (doc_id) hash agg → TakeOrdered(k).
    """
    sel = (
        impact_df.filter(F.col("doc_id") == src_doc_id)
        .orderBy(F.desc(F.round("impact", 6)), F.asc("term"))
        .limit(max_query_terms)
        .select("term")
    )
    matched = impact_df.join(F.broadcast(sel), "term").filter(
        F.col("doc_id") != src_doc_id
    )
    return topk(_ordered_sum(matched), k)


def tfidf_similar_pairs(
    impact_df: DataFrame,
    threshold: float,
    max_df: int | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_a, doc_b, cos) — all-pairs document similarity over
    SPARSE BM25-impact vectors through the inverted index: the
    classic "related documents" join, done the way a term-partitioned
    index makes cheap (posting self-join on term) instead of the
    dense-embedding crossJoin.

    cos(a,b) = Σ_t w_at·w_bt / (‖a‖·‖b‖) with w = the BM25 impact
    (tf-normalized × idf — rare shared terms dominate, ubiquitous
    terms contribute ~nothing). Rounded to 6dp (summation order is
    engine-unspecified; the repo-wide round-both-sides rule).

    ``max_df``: drop terms with document frequency above the cap
    BEFORE the self-join — the hot-term analog of the minhash bucket
    guard (a term in B docs alone contributes B² join rows; idf
    already makes such terms near-zero weight, so the cap changes
    cos by at most the dropped terms' tiny mass). Norms are computed
    over the SAME capped vector so the metric stays a true cosine of
    the vectors actually joined. None = exact. At 100 TB: cap at
    ~corpus-1% df and the join is bounded per term; everything is
    partial-aggregated map-side on (doc_a, doc_b).
    """
    w = impact_df.select(id_col, "term", "impact", "df")
    if max_df is not None:
        w = w.filter(F.col("df") <= max_df)
    norms = w.groupBy(id_col).agg(
        F.sqrt(F.sum(F.col("impact") * F.col("impact"))).alias("norm")
    )
    a = w.select(
        F.col(id_col).alias("doc_a"), "term", F.col("impact").alias("wa")
    )
    b = w.select(
        F.col(id_col).alias("doc_b"), "term", F.col("impact").alias("wb")
    )
    dots = (
        a.join(b, "term")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot"))
    )
    return (
        dots.join(
            norms.select(
                F.col(id_col).alias("doc_a"), F.col("norm").alias("na")
            ),
            "doc_a",
        )
        .join(
            norms.select(
                F.col(id_col).alias("doc_b"), F.col("norm").alias("nb")
            ),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            F.round(F.col("dot") / (F.col("na") * F.col("nb")), 6).alias(
                "cos"
            ),
        )
        .filter(F.col("cos") >= threshold)
    )


def doc_keywords(impact_df: DataFrame, n: int = 5) -> DataFrame:
    """(doc_id, keyword_rank, term, impact) — each document's top-n
    terms by its own BM25 impact: the per-document keyword profile
    (document tagging / faceting; also exactly the term-selection
    stage of more_like_this, exposed as a standalone table).

    Deterministic: rank orders by round(impact, 6) DESC then term ASC
    (the same last-ulp-proof tie-break as more_like_this). One
    doc-keyed window shuffle; emitted impact is the rounded value.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy("doc_id").orderBy(
        F.desc(F.round("impact", 6)), F.asc("term")
    )
    return (
        impact_df.withColumn("keyword_rank", F.row_number().over(w))
        .filter(F.col("keyword_rank") <= n)
        .select(
            "doc_id",
            "keyword_rank",
            "term",
            F.round("impact", 6).alias("impact"),
        )
    )
