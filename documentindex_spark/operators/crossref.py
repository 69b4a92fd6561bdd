"""Cross-reference detection, resolution, and 1-hop search expansion.

Reference analog: /root/reference/src/documentindex/cross_ref.py —
regex families over node text → reference edges (detect, :36-112),
deduped per (type, target) (:84-95), resolved against node titles
(:204-284), reverse adjacency (:361-371); searcher.py:249-281 follows
resolved edges from matched nodes and scores the unseen frontier.

Spark mapping (SURVEY.md §2.3/2.4): detection is pure built-ins —
``regexp_extract_all`` + ``explode`` (JVM-side, no UDF); resolution
normalizes both sides to a canonical key and equi-joins (the
reference's nested-loop title match becomes a hash join); expansion
is join + left-anti + union.

Edge table: (doc_id, src_node_id, ref_type, ref_id) unresolved;
resolved adds (dst_doc_id, dst_node_id, resolved).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Regex families for code corpora (reference has 10 SEC-flavoured
# families at cross_ref.py:36-70; same operator, different patterns).
REF_PATTERNS = {
    "module": r"see module ([a-z_][a-z0-9_]*)",
    "section": r"refer to section (\d+\.\d+)",
    "import": r"(?m)^import ([a-z_][a-z0-9_]*)",
}


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


def resolve_references(edges: DataFrame, nodes: DataFrame) -> DataFrame:
    """Equi-join resolution (replaces the reference's regex
    theta-join nested loop, cross_ref.py:204-284).

    - 'section' refs resolve within the same document against the
      canonical section number extracted from node titles;
    - 'module'/'import' refs resolve corpus-wide against node titles
      (a def/class named exactly like the ref).
    Unresolvable refs keep resolved=false (reference keeps them too).
    """
    # canonical keys on the node side, computed once
    tgt = nodes.select(
        F.col("doc_id").alias("dst_doc_id"),
        F.col("node_id").alias("dst_node_id"),
        F.regexp_extract(F.col("title"), r"section (\d+\.\d+)", 1).alias(
            "section_key"
        ),
        F.lower(F.col("title")).alias("title_key"),
    )

    sec = (
        edges.filter(F.col("ref_type") == "section")
        .join(
            tgt.filter(F.col("section_key") != "").select(
                "dst_doc_id", "dst_node_id", "section_key"
            ),
            on=[
                F.col("doc_id") == F.col("dst_doc_id"),
                F.col("ref_id") == F.col("section_key"),
            ],
            how="left",
        )
        .drop("section_key")
    )
    mod = (
        edges.filter(F.col("ref_type") != "section")
        .join(
            tgt.filter(F.col("title_key") != "").select(
                "dst_doc_id", "dst_node_id", "title_key"
            ).dropDuplicates(["title_key"]),
            on=[F.col("ref_id") == F.col("title_key")],
            how="left",
        )
        .drop("title_key")
    )
    out = sec.unionByName(mod)
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
