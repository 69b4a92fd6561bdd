"""Hierarchical section-aware chunking — the document → chunks/nodes
flatMap (SURVEY.md §2.3, the reference's core indexing operator).

Reference analog: section finder + paragraph chunker
(/root/reference/src/documentindex/chunker.py:195-344) and the
stack-based hierarchy build (indexer.py:320-358). The reference
detects SEC-filing headers; we detect code/markdown section
boundaries per the `lang` column (def/class/func/headers), same
operator shape: one vectorized pass over `content` emitting
array<struct> rows, exploded into flat tables.

Spark shape: `mapInPandas` (per-batch regex, no per-row Python at the
DataFrame layer) → one row per chunk / per tree node. Hierarchy is a
flat self-referential table (node_id, parent_id) — reconstructable by
self-join, never nested objects (SURVEY.md §1.1 TreeNode mapping).

Invariant (mirrors reference tests/test_chunker.py:80-88):
``content[start_char:end_char] == chunk_text`` for every chunk row —
asserted in tests/test_chunker.py.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_CHUNK_CHARS = 4000
OVERLAP_CHARS = 200

# Section-boundary patterns per language family. Level semantics:
# markdown '#'-count; code: top-level class=1, def/func=2.
_MD_HEADER = re.compile(r"^(#{1,6})\s+(.*)$")
_CODE_PATTERNS = [
    (re.compile(r"^class\s+([A-Za-z_][\w]*)"), 1),
    (re.compile(r"^(?:public|private|protected)?\s*(?:static\s+)?class\s+([A-Za-z_][\w]*)"), 1),
    (re.compile(r"^def\s+([A-Za-z_][\w]*)"), 2),
    (re.compile(r"^func\s+([A-Za-z_][\w]*)"), 2),
    (re.compile(r"^function\s+([A-Za-z_][\w]*)"), 2),
    (re.compile(r"^##+\s*(.*)$"), 1),
]

# Doc-TYPE-aware section patterns — the reference selects its header
# bank by detected document type (detector.py:258-311
# get_section_patterns: PART/ITEM/NOTE for 10-K, PROPOSAL for
# DEF 14A, ...; markdown headers as the common fallback for every
# type). Same design over this corpus's 12 types; group 1 is the
# section title, second tuple item the level. Types with no
# structural headers ([], e.g. json/prose) get the common markdown
# fallback only.
DOC_TYPE_SECTION_PATTERNS: dict[str, list[tuple[re.Pattern, int]]] = {
    "python": [
        (re.compile(r"^class\s+([A-Za-z_]\w*)"), 1),
        (re.compile(r"^(?:async\s+)?def\s+([A-Za-z_]\w*)"), 2),
    ],
    "javascript": [
        (re.compile(r"^(?:export\s+)?class\s+([A-Za-z_]\w*)"), 1),
        (re.compile(
            r"^(?:export\s+)?(?:default\s+)?function\s+([A-Za-z_]\w*)"
        ), 2),
    ],
    "sql": [
        (re.compile(
            r"(?i)^create\s+(?:or\s+replace\s+)?(?:table|view|index)\s+([\w.]+)"
        ), 1),
    ],
    "config": [(re.compile(r"^\[([\w.]+)\]\s*$"), 1)],
    "yaml": [(re.compile(r"^([A-Za-z_][\w-]*):\s*$"), 1)],
    "shell": [
        (re.compile(r"^(?:function\s+)?([A-Za-z_]\w*)\s*\(\)\s*\{?\s*$"), 1)
    ],
    "html": [(re.compile(r"(?i)<h[1-6][^>]*>([^<]*)"), 1)],
    "log": [(re.compile(r"^(\d{4}-\d{2}-\d{2})[T ]"), 1)],
    "rst": [(re.compile(r"^\.\. ([\w-]+)::"), 1)],
    "markdown": [],
    "json": [],
    "prose": [],
}

CHUNKS_SCHEMA = (
    "doc_id long, chunk_index int, start_char long, end_char long, "
    "section_title string, section_level int, text string"
)
NODES_SCHEMA = (
    "doc_id long, node_id string, parent_id string, title string, "
    "level int, start_char long, end_char long, "
    "start_chunk int, end_chunk int"
)


def _find_sections(
    content: str, lang: str, doc_type: str | None = None
) -> list[tuple[int, int, str, int]]:
    """[(start_char, end_char, title, level)] covering the document.

    A preamble section (level 0, title '<preamble>') covers text
    before the first boundary; sections end where the next boundary
    of ANY level starts (leaf spans — parent spans are rebuilt in the
    node pass).

    ``doc_type``: when given, the type's pattern bank
    (DOC_TYPE_SECTION_PATTERNS) is tried first with the markdown
    header as the common fallback — the reference's
    get_section_patterns selection; when None, the legacy per-lang
    behavior applies unchanged.
    """
    type_patterns = (
        DOC_TYPE_SECTION_PATTERNS.get(doc_type)
        if doc_type is not None
        else None
    )
    bounds: list[tuple[int, str, int]] = []
    pos = 0
    for line in content.splitlines(keepends=True):
        stripped = line.rstrip("\n")
        if type_patterns is not None:
            hit = False
            for pat, level in type_patterns:
                m = pat.match(stripped)
                if m:
                    bounds.append((pos, m.group(1).strip(), level))
                    hit = True
                    break
            if not hit:  # common fallback (reference common_patterns)
                m = _MD_HEADER.match(stripped)
                if m:
                    bounds.append(
                        (pos, m.group(2).strip(), len(m.group(1)))
                    )
        elif lang == "md":
            m = _MD_HEADER.match(stripped)
            if m:
                bounds.append((pos, m.group(2).strip(), len(m.group(1))))
        else:
            for pat, level in _CODE_PATTERNS:
                m = pat.match(stripped)
                if m:
                    bounds.append((pos, m.group(1).strip(), level))
                    break
        pos += len(line)
    sections: list[tuple[int, int, str, int]] = []
    if not bounds or bounds[0][0] > 0:
        end = bounds[0][0] if bounds else len(content)
        sections.append((0, end, "<preamble>", 0))
    for i, (start, title, level) in enumerate(bounds):
        end = bounds[i + 1][0] if i + 1 < len(bounds) else len(content)
        sections.append((start, end, title, level))
    return sections


def _chunk_section(
    content: str, start: int, end: int
) -> list[tuple[int, int]]:
    """Split one section span into ≤MAX_CHUNK_CHARS chunks with
    OVERLAP_CHARS overlap, preferring paragraph then newline breaks
    (reference chunker.py:237-421 semantics)."""
    if end - start <= MAX_CHUNK_CHARS:
        return [(start, end)]
    out = []
    pos = start
    while pos < end:
        limit = min(pos + MAX_CHUNK_CHARS, end)
        if limit < end:
            window = content[pos:limit]
            brk = window.rfind("\n\n")
            if brk < MAX_CHUNK_CHARS // 2:
                brk = window.rfind("\n")
            if brk >= MAX_CHUNK_CHARS // 2:
                limit = pos + brk + 1
        out.append((pos, limit))
        if limit >= end:
            break
        pos = max(limit - OVERLAP_CHARS, pos + 1)
    return out


def _chunk_rows(
    doc_id: int, content: str, lang: str, doc_type: str | None = None
) -> list[dict]:
    rows = []
    idx = 0
    for s_start, s_end, title, level in _find_sections(
        content, lang, doc_type
    ):
        for c_start, c_end in _chunk_section(content, s_start, s_end):
            rows.append(
                {
                    "doc_id": doc_id,
                    "chunk_index": idx,
                    "start_char": c_start,
                    "end_char": c_end,
                    "section_title": title,
                    "section_level": level,
                    "text": content[c_start:c_end],
                }
            )
            idx += 1
    return rows


def _node_rows(
    doc_id: int, content: str, lang: str, doc_type: str | None = None
) -> list[dict]:
    """Stack-based hierarchy fold (reference indexer.py:320-358):
    sections sorted by position; each node's parent is the nearest
    preceding section with a smaller level. node_id is '0001'-style
    per document (reference models.py:138-240 id scheme)."""
    sections = _find_sections(content, lang, doc_type)
    chunk_of: list[int] = []
    ci = 0
    for s_start, s_end, _, _ in sections:
        chunk_of.append(ci)
        ci += len(_chunk_section(content, s_start, s_end))
    rows = []
    stack: list[tuple[int, str]] = []  # (level, node_id)
    for i, (start, end, title, level) in enumerate(sections):
        node_id = f"{i:04d}"
        while stack and stack[-1][0] >= level:
            stack.pop()
        parent = stack[-1][1] if stack else None
        end_chunk = (chunk_of[i + 1] - 1) if i + 1 < len(sections) else ci - 1
        rows.append(
            {
                "doc_id": doc_id,
                "node_id": node_id,
                "parent_id": parent,
                "title": title,
                "level": level,
                "start_char": start,
                "end_char": end,
                "start_chunk": chunk_of[i],
                "end_chunk": end_chunk,
            }
        )
        stack.append((level, node_id))
    return rows


def _make_mapper(row_fn, columns, with_doc_type: bool = False):
    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[dict] = []
            if with_doc_type:
                for doc_id, content, lang, dt in zip(
                    pdf["doc_id"], pdf["content"], pdf["lang"],
                    pdf["doc_type"],
                ):
                    out.extend(
                        row_fn(int(doc_id), content or "", lang or "", dt)
                    )
            else:
                for doc_id, content, lang in zip(
                    pdf["doc_id"], pdf["content"], pdf["lang"]
                ):
                    out.extend(
                        row_fn(int(doc_id), content or "", lang or "")
                    )
            yield pd.DataFrame(out, columns=columns)

    return mapper


_CHUNK_COLS = [
    "doc_id", "chunk_index", "start_char", "end_char",
    "section_title", "section_level", "text",
]
_NODE_COLS = [
    "doc_id", "node_id", "parent_id", "title", "level",
    "start_char", "end_char", "start_chunk", "end_chunk",
]


def chunk_documents(
    files: DataFrame,
    text_col: str = "content",
    lang_col: str = "lang",
    doc_type_col: str | None = None,
) -> DataFrame:
    """files(doc_id, content, lang, ...) → chunks table.
    ``doc_type_col``: select section patterns by detected doc type
    (detect_doc_type output) instead of the lang heuristic."""
    cols = ["doc_id", f"{text_col} as content", f"{lang_col} as lang"]
    if doc_type_col:
        cols.append(f"{doc_type_col} as doc_type")
    src = files.selectExpr(*cols)
    return src.mapInPandas(
        _make_mapper(
            _chunk_rows, _CHUNK_COLS, with_doc_type=bool(doc_type_col)
        ),
        schema=CHUNKS_SCHEMA,
    )


def build_nodes(
    files: DataFrame,
    text_col: str = "content",
    lang_col: str = "lang",
    doc_type_col: str | None = None,
) -> DataFrame:
    """files → flat hierarchical node table (TreeNode equivalent).
    ``doc_type_col``: doc-type-aware section patterns (reference
    get_section_patterns selection)."""
    cols = ["doc_id", f"{text_col} as content", f"{lang_col} as lang"]
    if doc_type_col:
        cols.append(f"{doc_type_col} as doc_type")
    src = files.selectExpr(*cols)
    return src.mapInPandas(
        _make_mapper(
            _node_rows, _NODE_COLS, with_doc_type=bool(doc_type_col)
        ),
        schema=NODES_SCHEMA,
    )


def synthesize_node_summaries(
    nodes: DataFrame, max_depth: int = 8
) -> DataFrame:
    """Bottom-up parent synthesis (reference indexer.py:684-770:
    children summarized first, parents from child summaries, deepest
    level first). Deterministic replacement for the LLM step: a
    node's summary = its title + the titles of its direct children in
    document order.

    Iterative per-level groupBy(parent) join loop — tree depth is
    small (reference depth ≤ ~4), so ≤ max_depth joins, all
    Catalyst-planned; no recursion in Python over rows.
    """
    levels = [
        r["level"]
        for r in nodes.select("level").distinct().orderBy(F.desc("level")).collect()
    ]
    out = nodes.withColumn("summary", F.col("title"))
    # deepest level first: a child's summary is final before its
    # parent consumes it; a parent with direct children at several
    # levels receives one append per level (deeper children first).
    for lvl in levels[:max_depth]:
        child_concat = (
            out.filter(
                F.col("parent_id").isNotNull() & (F.col("level") == lvl)
            )
            .groupBy("doc_id", "parent_id")
            .agg(
                F.concat_ws(
                    "; ",
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("node_id", "summary"))
                        ),
                        lambda x: x["summary"],
                    ),
                ).alias("_child_summary")
            )
            .withColumnRenamed("parent_id", "node_id")
        )
        out = (
            out.join(child_concat, ["doc_id", "node_id"], "left")
            .withColumn(
                "summary",
                F.when(
                    F.col("_child_summary").isNotNull(),
                    F.concat_ws(": ", "summary", "_child_summary"),
                ).otherwise(F.col("summary")),
            )
            .drop("_child_summary")
        )
    return out


def leaf_nodes(nodes: DataFrame) -> DataFrame:
    """Nodes with no children — anti-join on parent_id
    (reference models.py:322-324 get_leaf_nodes)."""
    parents = (
        nodes.where("parent_id is not null")
        .select(
            F.col("doc_id").alias("p_doc_id"),
            F.col("parent_id").alias("p_parent_id"),
        )
        .distinct()
    )
    return nodes.join(
        parents,
        on=[
            nodes["doc_id"] == parents["p_doc_id"],
            nodes["node_id"] == parents["p_parent_id"],
        ],
        how="left_anti",
    )
