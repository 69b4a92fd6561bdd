"""Cross-reference detection, resolution, and 1-hop search expansion.

Reference analog: /root/reference/src/documentindex/cross_ref.py —
10 regex families over node text → reference edges (detect, :36-112),
deduped per (type, target) (:84-95), resolved against node titles
with exact then fuzzy contains-matching (:204-284), reverse adjacency
(:361-371); searcher.py:249-281 follows resolved edges from matched
nodes and scores the unseen frontier.

Spark mapping (SURVEY.md §2.3/2.4): detection is pure built-ins —
``regexp_extract_all`` + ``explode`` (JVM-side, no UDF); resolution
normalizes both sides to a canonical (type, id) key and equi-joins
(the reference's nested-loop title scan becomes a hash join);
unresolved structural refs fall back to the reference's fuzzy
``_titles_match`` semantics (title contains type AND id) as a
doc-local join with a contains predicate; expansion is
join + left-anti + union.

Edge table: (doc_id, src_node_id, ref_type, ref_id) unresolved;
resolved adds (dst_doc_id, dst_node_id, resolved).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 11 regex families ≥ the reference's 10 (cross_ref.py:36-70):
# 9 structural document families (doc-local resolution) plus the
# code-corpus 'module'/'import' families (corpus-wide resolution).
# Group 1 is always the reference id.
REF_PATTERNS = {
    "appendix": r"(?i)\b(?:see|refer(?:red)?\s+to|described\s+in|set\s+forth\s+in)\s+appendix\s+([A-Za-z](?:\d+)?)\b",
    "note": r"(?i)\b(?:see|refer(?:red)?\s+to)\s+note\s+(\d+(?:\.\d+)?)",
    "item": r"(?i)\b(?:see|refer(?:red)?\s+to|described\s+in)\s+item\s+(\d+[A-Za-z]?)\b",
    "table": r"(?i)\b(?:see|shown\s+in|refer(?:red)?\s+to)\s+table\s+(\d+(?:\.\d+)?)",
    "figure": r"(?i)\b(?:see|shown\s+in)\s+figure\s+(\d+(?:\.\d+)?)",
    "section": r"(?i)\b(?:see|refer(?:red)?\s+to|in)\s+section\s+(\d+(?:\.\d+)*)",
    "exhibit": r"(?i)\b(?:see|refer(?:red)?\s+to)\s+exhibit\s+(\d+(?:\.\d+)?)",
    "part": r"(?i)\b(?:see|in)\s+part\s+([IVXivx]+|\d+)\b",
    "page": r"(?i)\b(?:see\s+)?page\s+(\d+)",
    "module": r"(?i)\bsee\s+module\s+([a-z_][a-z0-9_]*)",
    "import": r"(?m)^import ([a-z_][a-z0-9_]*)",
}

# Families whose targets live in the SAME document (structural refs);
# 'module'/'import' resolve corpus-wide against node titles.
STRUCT_FAMILIES = [
    "appendix", "note", "item", "table", "figure",
    "section", "exhibit", "part", "page",
]

# Canonical (type, id) extracted from a lowered node title, e.g.
# 'section 2.1 details' → ('section', '2.1'); 'appendix a - x' →
# ('appendix', 'a').
_TITLE_KEY_RE = (
    r"(appendix|note|item|table|figure|section|exhibit|part|page)"
    r"\s+([a-z0-9][a-z0-9.]*)"
)


def detect_references(
    nodes: DataFrame, text_col: str = "text"
) -> DataFrame:
    """nodes/chunks with a text column → edge table, deduped per
    (doc_id, src_node_id, ref_type, ref_id) like cross_ref.py:84-95."""
    parts = []
    id_col = "node_id" if "node_id" in nodes.columns else "chunk_index"
    for ref_type, pat in REF_PATTERNS.items():
        parts.append(
            nodes.select(
                "doc_id",
                F.col(id_col).cast("string").alias("src_node_id"),
                F.lit(ref_type).alias("ref_type"),
                F.explode(
                    F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(1))
                ).alias("ref_id"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.dropDuplicates(["doc_id", "src_node_id", "ref_type", "ref_id"])


_EDGE_KEY = ["doc_id", "src_node_id", "ref_type", "ref_id"]


def _pick_min(df: DataFrame, by: list[str]) -> DataFrame:
    """Deterministic target pick when several nodes match one key:
    min (dst_doc_id, dst_node_id). (The reference walks nodes in
    document order and returns the first hit — same determinism
    contract, cross_ref.py:240-250.)"""
    extra = [c for c in ("dst_doc_id", "dst_node_id") if c not in by]
    return (
        df.groupBy(*by)
        .agg(F.min(F.struct("dst_doc_id", "dst_node_id")).alias("_m"))
        .select(*by, *[F.col(f"_m.{c}").alias(c) for c in extra])
    )


def resolve_references(edges: DataFrame, nodes: DataFrame) -> DataFrame:
    """Two-pass resolution (reference cross_ref.py:204-284):

    1. EXACT canonical key: structural refs equi-join doc-locally on
       (type, id) parsed from node titles; module/import refs
       equi-join corpus-wide on the whole lowered title.
    2. FUZZY fallback for still-unresolved structural refs — the
       reference's ``_titles_match``: same doc, title contains the
       type word AND the id (plus the note-id-prefix form
       '15. Revenue Recognition' for Note 15, which the reference
       documents at :265-268). Contains-predicate hash join on
       doc_id, deterministic min-node pick.

    Unresolvable refs keep resolved=false (the reference keeps them
    too)."""
    tgt = nodes.select(
        F.col("doc_id").alias("dst_doc_id"),
        F.col("node_id").alias("dst_node_id"),
        F.lower(F.col("title")).alias("title_key"),
    ).withColumns(
        {
            "t_type": F.regexp_extract("title_key", _TITLE_KEY_RE, 1),
            "t_id": F.regexp_extract("title_key", _TITLE_KEY_RE, 2),
        }
    )

    struct_e = edges.filter(F.col("ref_type").isin(STRUCT_FAMILIES)).withColumn(
        "_rid", F.lower(F.col("ref_id"))
    )
    code_e = edges.filter(~F.col("ref_type").isin(STRUCT_FAMILIES))

    # ---- pass 1a: exact doc-local (type, id) key
    tkeys = _pick_min(
        tgt.filter(F.col("t_type") != "").withColumnsRenamed(
            {"t_type": "k_type", "t_id": "k_id"}
        ).select("dst_doc_id", "dst_node_id", "k_type", "k_id"),
        ["dst_doc_id", "k_type", "k_id"],
    )
    exact = struct_e.join(
        tkeys,
        on=[
            F.col("doc_id") == F.col("dst_doc_id"),
            F.col("ref_type") == F.col("k_type"),
            F.col("_rid") == F.col("k_id"),
        ],
        how="left",
    ).drop("k_type", "k_id")
    hit = exact.filter(F.col("dst_node_id").isNotNull()).drop("_rid")
    miss = exact.filter(F.col("dst_node_id").isNull()).drop(
        "dst_doc_id", "dst_node_id"
    )

    # ---- pass 2: fuzzy contains fallback, doc-local
    fuzzy_cond = (
        F.col("title_key").contains(F.col("ref_type"))
        & F.col("title_key").contains(F.col("_rid"))
    ) | (
        (F.col("ref_type") == "note")
        & F.col("title_key").startswith(F.concat(F.col("_rid"), F.lit(".")))
    )
    fz_hit = _pick_min(
        miss.join(
            tgt.select("dst_doc_id", "dst_node_id", "title_key"),
            on=[F.col("doc_id") == F.col("dst_doc_id"), fuzzy_cond],
            how="inner",
        ),
        _EDGE_KEY,
    )
    fz_miss = (
        miss.drop("_rid")
        .join(fz_hit.select(*_EDGE_KEY), _EDGE_KEY, "left_anti")
        .withColumn("dst_doc_id", F.lit(None).cast("long"))
        .withColumn("dst_node_id", F.lit(None).cast("string"))
    )

    # ---- module/import: corpus-wide exact title match
    mod_t = _pick_min(
        tgt.filter(F.col("title_key") != "").select(
            "dst_doc_id", "dst_node_id", "title_key"
        ),
        ["title_key"],
    )
    mod = code_e.join(
        mod_t, on=[F.lower(F.col("ref_id")) == F.col("title_key")], how="left"
    ).drop("title_key")

    cols = _EDGE_KEY + ["dst_doc_id", "dst_node_id"]
    out = (
        hit.select(*cols)
        .unionByName(fz_hit.select(*cols))
        .unionByName(fz_miss.select(*cols))
        .unionByName(mod.select(*cols))
    )
    return out.withColumn("resolved", F.col("dst_node_id").isNotNull())


def referencing_nodes(edges_resolved: DataFrame) -> DataFrame:
    """Reverse adjacency: who references each target
    (cross_ref.py:361-371) — groupBy dst."""
    return (
        edges_resolved.filter("resolved")
        .groupBy("dst_doc_id", "dst_node_id")
        .agg(
            F.count(F.lit(1)).alias("n_referencing"),
            F.sort_array(
                F.collect_set(F.concat_ws("/", "doc_id", "src_node_id"))
            ).alias("referencing"),
        )
    )


def expand_matches(
    matches: DataFrame, edges_resolved: DataFrame, scored_all: DataFrame,
    threshold: float,
) -> DataFrame:
    """1-hop cross-ref expansion (searcher.py:249-281): follow
    resolved edges out of matched docs, anti-join already-matched
    targets, keep those scoring ≥ threshold, union.

    matches/scored_all: (doc_id, score). Document-level granularity
    (the engine's retrieval unit aggregates nodes per doc)."""
    frontier = (
        matches.select("doc_id")
        .join(edges_resolved.filter("resolved"), "doc_id")
        .select(F.col("dst_doc_id").alias("doc_id"))
        .distinct()
        .join(matches.select("doc_id"), "doc_id", "left_anti")
    )
    expansion = (
        frontier.join(scored_all, "doc_id")
        .filter(F.col("score") >= threshold)
        .select("doc_id", "score")
    )
    return matches.select("doc_id", "score").unionByName(expansion)
