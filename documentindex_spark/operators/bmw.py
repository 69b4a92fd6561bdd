"""Block-Max WAND top-k over the compressed term-partitioned index
(Ding & Suel, SIGIR 2011) — SURVEY.md M3, north rule query path.

EXACT: block-max values are true per-block maxima of the precomputed
float64 impacts, skip decisions use ``<= θ`` only when the heap is
full (a doc that can only TIE the k-th score loses the
(score DESC, doc_id ASC) tie-break anyway, because WAND evaluates
candidates in ascending doc_id), and full evaluation sums impacts in
ascending-term order — so results are rank- AND score-identical to
the exhaustive scorer (asserted in tests/test_bmw.py).

Replaces the reference's full LLM scan
(/root/reference/src/documentindex/searcher.py:81-138: score every
node, sort, limit) with sub-linear skipping.

Execution shape: ``queries ⋈ postings on term`` (bucket partition
pruning + term predicate pushed to the parquet scan) →
``groupBy(query_id).applyInPandas(BMW)`` — queries score in parallel
across the cluster; each task touches only its terms' segments.
Per-query work is numpy-over-blocks; the Python loop is over pivots,
not postings.
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..constants import TOPK_DEFAULT
from ..functions.tokenize import query_terms
from .codec import Segment
from .postings import row_to_segment, term_bucket

_INF = np.iinfo(np.int64).max


class _Cursor:
    """Forward-only cursor over one term's segments (min_doc ordered).

    Blocks decode lazily and are cached; ``advance_to`` uses
    searchsorted over block_max_doc, then within the block.
    """

    __slots__ = (
        "term", "segs", "seg_i", "blk_i", "pos", "ub", "boost",
        "_loaded", "_cur_docs", "_cur_imps",
    )

    def __init__(
        self, term: str, segments: list[Segment], boost: float = 1.0
    ):
        # boost scales the term's impacts AND every upper bound the
        # pruning reads (ub, block_ub) — WAND stays exact because the
        # bounds scale linearly with the scores. Must be > 0: a
        # non-positive boost breaks the bound monotonicity (use
        # must_not for exclusion instead).
        if boost <= 0.0:
            raise ValueError(f"boost must be > 0, got {boost}")
        self.term = term
        self.boost = float(boost)
        self.segs = sorted(segments, key=lambda s: s.min_doc_id)
        self.ub = self.boost * max(
            float(s.block_max_impact.max()) for s in self.segs
        )
        self.seg_i = 0
        self.blk_i = 0
        self.pos = 0
        self._loaded: tuple[int, int] | None = None
        self._cur_docs: np.ndarray | None = None
        self._cur_imps: np.ndarray | None = None
        self._load_block()

    def _load_block(self) -> None:
        if self.seg_i >= len(self.segs):
            self._cur_docs = None
            self._loaded = None
            return
        if self._loaded == (self.seg_i, self.blk_i):
            return
        self._cur_docs, self._cur_imps = self.segs[self.seg_i].decode_block(
            self.blk_i
        )
        self._loaded = (self.seg_i, self.blk_i)

    @property
    def exhausted(self) -> bool:
        return self._cur_docs is None

    def cur_doc(self) -> int:
        if self._cur_docs is None:
            return _INF
        return int(self._cur_docs[self.pos])

    def cur_impact(self) -> float:
        return self.boost * float(self._cur_imps[self.pos])

    def block_max_doc(self) -> int:
        """Last doc_id of the current block (skip boundary)."""
        if self._cur_docs is None:
            return _INF
        return int(self.segs[self.seg_i].block_max_doc[self.blk_i])

    def block_ub(self, d: int) -> float:
        """Max impact of the block that would contain the first
        posting ≥ d (shallow move — no decode)."""
        seg_i, blk_i = self.seg_i, self.blk_i
        while seg_i < len(self.segs):
            seg = self.segs[seg_i]
            if d <= seg.max_doc_id:
                if seg_i == self.seg_i:
                    b = blk_i + int(
                        np.searchsorted(seg.block_max_doc[blk_i:], d)
                    )
                else:
                    b = int(np.searchsorted(seg.block_max_doc, d))
                if b < seg.n_blocks:
                    return self.boost * float(seg.block_max_impact[b])
            seg_i += 1
            blk_i = 0
        return 0.0

    def advance_to(self, d: int) -> None:
        """Move to the first posting with doc_id ≥ d."""
        while self.seg_i < len(self.segs):
            seg = self.segs[self.seg_i]
            if d > seg.max_doc_id:
                self.seg_i += 1
                self.blk_i = 0
                self.pos = 0
                continue
            start_blk = self.blk_i if self._loaded and self._loaded[0] == self.seg_i else 0
            b = start_blk + int(
                np.searchsorted(seg.block_max_doc[start_blk:], d)
            )
            self.blk_i = b
            self._load_block()
            # block b has block_max_doc >= d, so the target is inside
            self.pos = int(np.searchsorted(self._cur_docs, d))
            return
        self._cur_docs = None
        self._loaded = None

    def next(self) -> None:
        self.pos += 1
        if self._cur_docs is not None and self.pos >= len(self._cur_docs):
            self.blk_i += 1
            self.pos = 0
            if self.blk_i >= self.segs[self.seg_i].n_blocks:
                self.seg_i += 1
                self.blk_i = 0
            self._load_block()


def bmw_topk_local(
    segments_by_term: dict[str, list[Segment]],
    k: int = TOPK_DEFAULT,
    exclude=None,
    boosts: dict[str, float] | None = None,
    must: set | None = None,
) -> list[tuple[int, float]]:
    """Pure-Python/numpy BMW over in-memory segments → top-k
    [(doc_id, score)] sorted (score DESC, doc_id ASC).

    ``exclude``: optional container of doc_ids to skip (Lucene's
    liveDocs check — tombstoned docs never enter the heap, so θ stays
    a valid lower bound on the k-th best RETAINED score and the
    result equals exhaustive-score-then-filter; plans/delete.py).

    ``boosts``: optional per-term score multipliers (> 0; Lucene's
    ``term^2.5``). Bounds scale with the scores inside ``_Cursor``,
    so the pruning stays exact; the frozen ascending-term summation
    order is unchanged (boosted impacts sum in the same order).

    ``must``: optional set of REQUIRED terms (Lucene MUST clauses;
    each must also be a scoring key of ``segments_by_term``): a doc
    enters the heap only when every must term matched it at full
    evaluation. θ pruning stays conservative — it only ever rises on
    admitted (qualifying) docs."""
    if k <= 0:
        return []
    cursors = [
        _Cursor(t, segs, (boosts or {}).get(t, 1.0))
        for t, segs in segments_by_term.items()
        if segs
    ]
    cursors = [c for c in cursors if not c.exhausted]
    heap: list[tuple[float, int]] = []  # (score, -doc_id): min = worst

    while cursors:
        cursors.sort(key=lambda c: c.cur_doc())
        theta = heap[0][0] if len(heap) >= k else float("-inf")
        # --- pivot selection on GLOBAL term upper bounds
        acc = 0.0
        pivot_i = -1
        for i, c in enumerate(cursors):
            acc += c.ub
            if acc > theta:
                pivot_i = i
                break
        if pivot_i < 0:
            break  # no remaining doc can beat θ
        pivot_doc = cursors[pivot_i].cur_doc()
        if pivot_doc == _INF:
            break
        # EXTEND the pivot over every cursor parked at pivot_doc
        # (Ding & Suel §BMW): they all contribute to the doc's upper
        # bound — without this, the block-max check undercounts and
        # skips multi-term docs (caught by the sf0.01 oracle gate).
        while (
            pivot_i + 1 < len(cursors)
            and cursors[pivot_i + 1].cur_doc() == pivot_doc
        ):
            pivot_i += 1

        if cursors[0].cur_doc() == pivot_doc:
            # --- block-max refinement (shallow, no decode)
            block_acc = sum(
                c.block_ub(pivot_doc) for c in cursors[: pivot_i + 1]
            )
            if block_acc <= theta and len(heap) >= k:
                # skip to just past the nearest block boundary — but
                # never past the next cursor's current doc: docs in
                # the skipped range may live in cursors BEYOND the
                # pivot, whose upper bounds block_acc did not count
                # (Ding & Suel: d' = min(block boundaries, next
                # cursor's docID)).
                d_next = (
                    min(c.block_max_doc() for c in cursors[: pivot_i + 1]) + 1
                )
                if pivot_i + 1 < len(cursors):
                    d_next = min(d_next, cursors[pivot_i + 1].cur_doc())
                cursors[0].advance_to(max(d_next, pivot_doc + 1))
            else:
                # --- full evaluation, ascending-term summation order
                # (tombstoned docs: advance every cursor past the doc
                # but never score it — the liveDocs skip)
                dead = exclude is not None and pivot_doc in exclude
                parts = []
                for c in cursors:
                    if c.cur_doc() > pivot_doc:
                        break
                    c.advance_to(pivot_doc)
                    if not dead and c.cur_doc() == pivot_doc:
                        parts.append((c.term, c.cur_impact()))
                qualified = not dead and (
                    must is None
                    or must <= {t for t, _ in parts}
                )
                if qualified:
                    score = 0.0
                    for _, imp in sorted(parts):
                        score += imp
                    if len(heap) < k:
                        heapq.heappush(heap, (score, -pivot_doc))
                    elif score > heap[0][0]:
                        heapq.heapreplace(heap, (score, -pivot_doc))
                for c in cursors:
                    if c.cur_doc() == pivot_doc:
                        c.next()
        else:
            cursors[0].advance_to(pivot_doc)
        cursors = [c for c in cursors if not c.exhausted]

    out = [(-nd, s) for s, nd in heap]
    out.sort(key=lambda x: (-x[1], x[0]))
    return [(d, s) for d, s in out]


# --------------------------------------------------------- Spark layer

BMW_RESULT_SCHEMA = T.StructType(
    [
        T.StructField("query_id", T.LongType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("score", T.DoubleType()),
        T.StructField("rank", T.IntegerType()),
    ]
)

# Above this many (query, term) pairs the literal-map projection's
# expression tree stops being free to plan; large batches (the 20k+
# query batch-QPS path) take the broadcast-join route instead.
_LITMAP_MAX_PAIRS = 4096


def _attach_query_ids(
    seg_rows: DataFrame,
    terms_by_query: dict[int, list[str]],
    spark: SparkSession,
) -> DataFrame:
    """Tag each pruned segment row with the query_id(s) whose term it
    matches.

    For interactive batch sizes this is a LITERAL term→[query_id] map
    projection (create_map + explode): zero exchanges and no
    createDataFrame round-trip, where the old broadcast-join route
    paid a driver→JVM table ship plus a BroadcastExchange job per
    call — measured ~350 ms of the ~740 ms single-query latency
    (tools/profile_query_r6.py). Row-identical to the join: both emit
    one row per (matching segment, subscribed query)."""
    pairs = [(qid, t) for qid, ts in terms_by_query.items() for t in ts]
    if len(pairs) > _LITMAP_MAX_PAIRS:
        qdf = spark.createDataFrame(pairs, "query_id long, term string")
        return seg_rows.join(F.broadcast(qdf), "term")
    term_to_qids: dict[str, list[int]] = {}
    for qid, t in pairs:
        term_to_qids.setdefault(t, []).append(qid)
    mapping = F.create_map(
        *[
            part
            for t in sorted(term_to_qids)
            for part in (
                F.lit(t),
                F.array(
                    *[F.lit(q).cast("long") for q in term_to_qids[t]]
                ),
            )
        ]
    )
    return seg_rows.withColumn(
        "query_id", F.explode(mapping[F.col("term")])
    )


def load_query_postings(
    spark: SparkSession, index_path: str, terms_by_query: dict[int, list[str]]
) -> DataFrame:
    """Read only the posting rows the query batch needs: bucket
    partition pruning + term predicate, both pushed into the scan."""
    all_terms = sorted({t for ts in terms_by_query.values() for t in ts})
    buckets = sorted({term_bucket(t) for t in all_terms})
    postings = spark.read.parquet(index_path)
    return postings.filter(
        F.col("bucket").isin(buckets) & F.col("term").isin(all_terms)
    )


def bmw_topk(
    spark: SparkSession,
    index: str | DataFrame,
    queries: dict[int, str],
    k: int = TOPK_DEFAULT,
    band_size: int | None = None,
    exclude_ids=None,
) -> DataFrame:
    """Batched BMW: (query_id → query text) → DataFrame
    (query_id, doc_id, score, rank).

    ``exclude_ids``: optional broadcast-sized container of tombstoned
    doc_ids (plans/delete.py) skipped inside the scorer — liveDocs
    semantics: excluded docs never consume heap slots, retained docs
    keep their exact pre-delete scores (stats stay stale until
    compaction, Lucene's contract).

    ``index`` is either the postings path (cold: pruned parquet scan)
    or an already-loaded (usually ``.persist()``-ed) postings
    DataFrame — a resident index, the serving-path configuration.

    Plan: pruned index scan → broadcast-join the tiny (query_id, term)
    table → groupBy(query_id).applyInPandas(BMW). Queries run in
    parallel; every task sees only its own terms' segments.

    ``band_size``: when given (= the index's build-time band width),
    the grouping key becomes (query_id, doc_band): segments never
    cross band boundaries at build time, so every band scores
    EXACTLY and independently — a single heavy query parallelizes
    across the cluster instead of landing on one task. Per-band
    top-k results merge via a global (score DESC, doc ASC) window.
    Per-band θ starts at -inf (less skipping than a shared heap), so
    it trades some decode work for parallelism — results identical.
    """
    terms_by_query = {qid: query_terms(q) for qid, q in queries.items()}
    if not any(terms_by_query.values()):
        return spark.createDataFrame([], BMW_RESULT_SCHEMA)
    if isinstance(index, str):
        seg_rows = load_query_postings(spark, index, terms_by_query)
    else:
        # Same predicates as the path branch: a DataFrame index that
        # is NOT persisted (cold Engine.open) still resolves to a
        # parquet scan, and without the bucket predicate the partition
        # filter is lost — every bucket's row groups get read. Bucket
        # is derivable from the terms, so push both.
        all_terms = sorted({t for ts in terms_by_query.values() for t in ts})
        buckets = sorted({term_bucket(t) for t in all_terms})
        seg_rows = index.filter(
            F.col("bucket").isin(buckets) & F.col("term").isin(all_terms)
        )

    # NOTE (round-6 A/B, tools/profile_query_r6.py): an adaptive
    # "collect-and-score-on-the-driver" route for small queries was
    # measured SLOWER than this distributed plan (~430 ms vs ~250 ms
    # per query at 20k docs): the size-guard aggregate job plus the
    # createDataFrame(result) round-trip cost more than the one tiny
    # exchange they replaced. (At 200k docs a GUARDLESS collect
    # variant measures faster — 167 vs 357 ms — but without the guard
    # job the driver collects before knowing the posting volume,
    # which is exactly the unbounded-driver-materialization this
    # distributed lane exists to avoid; with the guard the win
    # disappears.) Callers who want the driver-local path use
    # bmw_serve / bmw_serve_arrow explicitly — those carry the
    # max_collect_postings cap as their contract.
    joined = _attach_query_ids(seg_rows, terms_by_query, spark)

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        qid = int(pdf["query_id"].iloc[0])
        by_term: dict[str, list[Segment]] = {}
        for _, row in pdf.iterrows():
            by_term.setdefault(row["term"], []).append(row_to_segment(row))
        top = bmw_topk_local(by_term, k, exclude=exclude_ids)
        return pd.DataFrame(
            {
                "query_id": qid,
                "doc_id": [d for d, _ in top],
                "score": [s for _, s in top],
                "rank": np.arange(1, len(top) + 1, dtype=np.int32),
            }
        )

    if band_size is None:
        return joined.groupBy("query_id").applyInPandas(run, BMW_RESULT_SCHEMA)
    return _banded(joined, k, band_size, exclude_ids)


def _banded(
    joined: DataFrame, k: int, band_size: int, exclude_ids=None
) -> DataFrame:
    import pandas as pd  # local alias for closure clarity

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        qid = int(pdf["query_id"].iloc[0])
        by_term: dict[str, list[Segment]] = {}
        for _, row in pdf.iterrows():
            by_term.setdefault(row["term"], []).append(row_to_segment(row))
        top = bmw_topk_local(by_term, k, exclude=exclude_ids)
        return pd.DataFrame(
            {
                "query_id": qid,
                "doc_id": [d for d, _ in top],
                "score": [s for _, s in top],
                "rank": np.arange(1, len(top) + 1, dtype=np.int32),
            }
        )

    from pyspark.sql.window import Window

    banded = joined.withColumn(
        "doc_band", F.floor(F.col("min_doc_id") / F.lit(band_size))
    )
    per_band = banded.groupBy("query_id", "doc_band").applyInPandas(
        lambda pdf: run(pdf), BMW_RESULT_SCHEMA
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        per_band.drop("rank")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


# ------------------------------------------------- boolean queries


def parse_boolean_query(query: str) -> dict:
    """Minimal Lucene-ish query DSL → spec for ``bmw_topk_boolean``:

        "+merge block^2.5 -deprecated"
        → {"should": {"merge": 1.0, "block": 2.5},
           "must": ["merge"], "must_not": ["deprecated"]}

    The Lucene BooleanQuery trio: ``+token`` REQUIRES the term (it
    also scores, so it lands in should too), ``-token`` excludes
    documents containing it, ``token^w`` boosts by w (> 0). Each raw
    token normalizes through the FROZEN tokenizer (a token like
    ``foo.bar`` yields both terms, sharing the token's operators).
    Deterministic on repeats: the max boost wins; must_not beats
    must/should for a term in every clause (its docs are excluded,
    so requiring or scoring it could only empty the result).
    """
    should: dict[str, float] = {}
    must: list[str] = []
    must_not: list[str] = []
    for raw in query.split():
        neg = raw.startswith("-")
        req = raw.startswith("+")
        if neg or req:
            raw = raw[1:]
        boost = 1.0
        if "^" in raw:
            raw, _, bs = raw.rpartition("^")
            try:
                boost = float(bs)
            except ValueError:
                raw = raw + "^" + bs  # not a boost suffix
        for t in query_terms(raw):
            if neg:
                if t not in must_not:
                    must_not.append(t)
            else:
                should[t] = max(boost, should.get(t, 0.0))
                if req and t not in must:
                    must.append(t)
    for t in must_not:
        should.pop(t, None)
        if t in must:
            must.remove(t)
    return {"should": should, "must": must, "must_not": must_not}


def bmw_topk_boolean(
    spark: SparkSession,
    index: str | DataFrame,
    queries: dict[int, dict],
    k: int = TOPK_DEFAULT,
    band_size: int | None = None,
    exclude_ids=None,
    max_neg_postings: int = 2_000_000,
) -> DataFrame:
    """Batched boolean BM25: each query is a spec
    ``{"should": {term: boost}, "must": [terms], "must_not": [terms]}``
    (see ``parse_boolean_query``) → (query_id, doc_id, score, rank).
    ``must`` terms are required AND score (Lucene MUST; each must
    appear in ``should`` — ``parse_boolean_query`` guarantees it);
    the per-group scorer admits a doc only when all of them matched.

    Same plan as ``bmw_topk`` — ONE pruned scan covers the positive
    AND negative terms' segments (they ride the same bucket/term
    pushdown), broadcast (query_id, term, boost, neg) join,
    per-query applyInPandas. Inside the scorer the negative terms'
    postings decode into a liveDocs-style exclusion set (merged with
    the tombstones), and boosts scale cursor impacts and bounds —
    pruning stays exact. Banded mode is safe because segments never
    cross band boundaries: a negative term's postings for band B sit
    in band B's group, so each band's exclusion set is complete.

    ``max_neg_postings``: in NON-banded mode every negative term's
    full postings decode into one task's Python exclusion set, so a
    hot must_not term (stopword) would materialize a corpus-scale set
    in a single task. A per-query pre-check (one agg over the already
    pruned segment scan) raises when a query's negative postings
    exceed the cap — pass ``band_size`` instead, where each band's
    exclusion set is bounded by band_size (round-4 advice).
    """
    pairs = []
    must_by_q: dict[int, frozenset] = {}
    for qid, spec in queries.items():
        should = spec.get("should", {})
        m = frozenset(spec.get("must", []))
        if not m <= set(should):
            raise ValueError(
                f"must terms {sorted(m - set(should))} missing from "
                "'should' — must clauses score, give them a boost entry"
            )
        must_by_q[qid] = m
        for t, b in sorted(should.items()):
            pairs.append((qid, t, float(b), False))
        for t in sorted(set(spec.get("must_not", []))):
            pairs.append((qid, t, 1.0, True))
    if not any(not p[3] for p in pairs):
        return spark.createDataFrame([], BMW_RESULT_SCHEMA)
    all_terms = sorted({p[1] for p in pairs})
    buckets = sorted({term_bucket(t) for t in all_terms})
    if isinstance(index, str):
        postings = spark.read.parquet(index)
    else:
        postings = index
    seg_rows = postings.filter(
        F.col("bucket").isin(buckets) & F.col("term").isin(all_terms)
    )
    if len(pairs) > _LITMAP_MAX_PAIRS:
        qdf = spark.createDataFrame(
            pairs, "query_id long, term string, boost double, neg boolean"
        )
        joined = seg_rows.join(F.broadcast(qdf), "term")
    else:
        # literal term → [(query_id, boost, neg)] projection — same
        # zero-exchange attachment as _attach_query_ids, with the
        # boolean metadata riding in the struct.
        by_term: dict[str, list] = {}
        for qid, t, b, neg in pairs:
            by_term.setdefault(t, []).append(
                F.struct(
                    F.lit(qid).cast("long").alias("query_id"),
                    F.lit(b).alias("boost"),
                    F.lit(neg).alias("neg"),
                )
            )
        mapping = F.create_map(
            *[
                part
                for t in sorted(by_term)
                for part in (F.lit(t), F.array(*by_term[t]))
            ]
        )
        joined = (
            seg_rows.withColumn(
                "_q", F.explode(mapping[F.col("term")])
            )
            .withColumn("query_id", F.col("_q.query_id"))
            .withColumn("boost", F.col("_q.boost"))
            .withColumn("neg", F.col("_q.neg"))
            .drop("_q")
        )

    if band_size is None and any(p[3] for p in pairs):
        neg_hot = (
            joined.filter("neg")
            .groupBy("query_id")
            .agg(F.sum("n_postings").alias("neg_postings"))
            .filter(F.col("neg_postings") > max_neg_postings)
            .orderBy(F.desc("neg_postings"))
            .limit(1)
            .collect()
        )
        if neg_hot:
            r = neg_hot[0]
            raise RuntimeError(
                f"query {r['query_id']}: must_not terms match "
                f"{r['neg_postings']} postings > {max_neg_postings}; a "
                "corpus-hot negative term needs banded mode (band_size) "
                "where each band's exclusion set is bounded"
            )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        qid = int(pdf["query_id"].iloc[0])
        excl = set(int(d) for d in exclude_ids) if exclude_ids else set()
        by_term: dict[str, list[Segment]] = {}
        boosts: dict[str, float] = {}
        for _, row in pdf.iterrows():
            seg = row_to_segment(row)
            if row["neg"]:
                docs, _, _ = seg.decode_all()
                excl.update(int(d) for d in docs)
            else:
                by_term.setdefault(row["term"], []).append(seg)
                boosts[row["term"]] = float(row["boost"])
        top = bmw_topk_local(
            by_term, k, exclude=excl or None, boosts=boosts,
            must=must_by_q.get(qid) or None,
        )
        return pd.DataFrame(
            {
                "query_id": qid,
                "doc_id": [d for d, _ in top],
                "score": [s for _, s in top],
                "rank": np.arange(1, len(top) + 1, dtype=np.int32),
            }
        )

    if band_size is None:
        return joined.groupBy("query_id").applyInPandas(run, BMW_RESULT_SCHEMA)

    from pyspark.sql.window import Window

    banded = joined.withColumn(
        "doc_band", F.floor(F.col("min_doc_id") / F.lit(band_size))
    )
    per_band = banded.groupBy("query_id", "doc_band").applyInPandas(
        run, BMW_RESULT_SCHEMA
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return (
        per_band.drop("rank")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def score_threshold_all(
    spark: SparkSession,
    index: str | DataFrame,
    queries: dict[int, str],
    threshold: float,
    exclude_ids=None,
) -> DataFrame:
    """Provenance-mode scorer: every (query_id, doc_id, score) with
    score ≥ threshold — NO top-k heap, NO global merge window.

    "Find ALL evidence" via ``bmw_topk(k=n_docs)`` is correct but the
    per-band heap degenerates to the whole corpus at 10^10 docs
    (round-2 verdict watch item). The threshold-first plan instead:
    pruned segment scan (bucket partition filter + term predicate at
    parquet) → broadcast (query_id, term) join → mapInPandas decode
    emitting one (query_id, doc_id, impact) row per posting →
    (query_id, doc_id) hash agg (partial map-side + final) → the
    threshold filter sits directly above the agg, below ANY sort.
    Every stage is shuffle-partitions wide; nothing accumulates a
    corpus-sized structure per task.

    Scores reproduce the frozen ascending-term float64 sum
    bit-for-bit (the per-doc term list is sorted before summing —
    same as bmw_topk_local / the DuckDB oracle), so results are
    value-identical to the heap path, not just rank-identical."""
    terms_by_query = {qid: query_terms(q) for qid, q in queries.items()}
    out_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("doc_id", T.LongType()),
            T.StructField("score", T.DoubleType()),
        ]
    )
    if not any(terms_by_query.values()):
        return spark.createDataFrame([], out_schema)
    if isinstance(index, str):
        seg_rows = load_query_postings(spark, index, terms_by_query)
    else:
        all_terms = sorted({t for ts in terms_by_query.values() for t in ts})
        buckets = sorted({term_bucket(t) for t in all_terms})
        seg_rows = index.filter(
            F.col("bucket").isin(buckets) & F.col("term").isin(all_terms)
        )
    joined = _attach_query_ids(seg_rows, terms_by_query, spark)

    post_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("term", T.StringType()),
            T.StructField("doc_id", T.LongType()),
            T.StructField("impact", T.DoubleType()),
        ]
    )

    def decode(batches):
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                seg = row_to_segment(row)
                doc_ids, _, imps = seg.decode_all()
                out.append(
                    pd.DataFrame(
                        {
                            "query_id": row["query_id"],
                            "term": row["term"],
                            "doc_id": doc_ids,
                            "impact": imps,
                        }
                    )
                )
            if out:
                yield pd.concat(out, ignore_index=True)

    postings = joined.mapInPandas(decode, post_schema)
    if exclude_ids:
        # liveDocs filter UNDER the agg: tombstoned postings never
        # shuffle (plans/delete.py). The set is broadcast-sized by the
        # deletion contract, so an isin literal list keeps it in the
        # codegen'd stage; a corpus-fraction exclusion belongs in
        # compaction, not here.
        postings = postings.filter(
            ~F.col("doc_id").isin([int(d) for d in exclude_ids])
        )
    scored = (
        postings.groupBy("query_id", "doc_id")
        .agg(
            F.aggregate(
                F.sort_array(F.collect_list(F.struct("term", "impact"))),
                F.lit(0.0),
                lambda acc, x: acc + x["impact"],
            ).alias("score")
        )
        .filter(F.col("score") >= threshold)
    )
    return scored


def bmw_serve_arrow(
    index_path: str,
    query: str,
    k: int = TOPK_DEFAULT,
    max_collect_postings: int = 2_000_000,
    dataset=None,
    exclude_ids=None,
) -> list[tuple[int, float]]:
    """Spark-FREE point lookup: read only the query's segment rows
    straight from the bucket-partitioned parquet index with pyarrow
    (hive partition pruning on ``bucket=`` dirs + row-group statistics
    skipping on ``term``), then run BMW in-process. No job scheduling,
    no executor round-trip — the serving-tier fast lane under the
    same on-disk index the cluster path reads (results identical,
    asserted in tests/test_index_bmw.py).

    ``dataset``: pass a cached ``pyarrow.dataset.Dataset`` (e.g. from
    ``Engine``) to skip re-listing files per query."""
    import pyarrow.dataset as ds

    terms = query_terms(query)
    if not terms:
        return []
    if dataset is None:
        dataset = ds.dataset(index_path, format="parquet", partitioning="hive")
    buckets = sorted({term_bucket(t) for t in terms})
    tbl = dataset.to_table(
        filter=ds.field("bucket").isin(buckets) & ds.field("term").isin(terms)
    )
    total = sum(tbl.column("n_postings").to_pylist())
    if total > max_collect_postings:
        raise ValueError(
            f"query matches {total} postings > {max_collect_postings}; "
            "use the distributed bmw_topk path"
        )
    by_term: dict[str, list[Segment]] = {}
    for row in tbl.to_pylist():
        by_term.setdefault(row["term"], []).append(row_to_segment(row))
    return bmw_topk_local(by_term, k, exclude=exclude_ids)


def bmw_serve(
    postings: DataFrame,
    query: str,
    k: int = TOPK_DEFAULT,
    max_collect_postings: int = 2_000_000,
    exclude_ids=None,
) -> list[tuple[int, float]]:
    """Low-latency single-query serving: pull the query's (pruned,
    pushed-down) segment rows to the driver and run BMW locally —
    the point-lookup path a serving tier uses, bypassing per-job
    scheduling overhead (~0.5-1s → ~10-100ms).

    Falls back to raising when the matched lists exceed
    ``max_collect_postings`` (hot-stopword queries at cluster scale
    belong on the distributed path, never on the driver)."""
    terms = query_terms(query)
    if not terms:
        return []
    # bucket predicate alongside term: partition pruning on a cold
    # parquet-backed frame, per-batch stats pruning on a persisted one.
    buckets = sorted({term_bucket(t) for t in terms})
    # toArrow() collect: the segment rows are mostly binary blobs, and
    # the Arrow path moves them as columnar buffers where Row collect
    # deserializes each through pickled Rows — measured p50 107 → 89 ms
    # at 20k docs, identical results (tools/profile_serve_r6.py).
    rows = (
        postings.filter(
            F.col("bucket").isin(buckets) & F.col("term").isin(terms)
        )
        .toArrow()
        .to_pylist()
    )
    total = sum(r["n_postings"] for r in rows)
    if total > max_collect_postings:
        raise ValueError(
            f"query matches {total} postings > {max_collect_postings}; "
            "use the distributed bmw_topk path"
        )
    by_term: dict[str, list[Segment]] = {}
    for r in rows:
        by_term.setdefault(r["term"], []).append(row_to_segment(r))
    return bmw_topk_local(by_term, k, exclude=exclude_ids)
