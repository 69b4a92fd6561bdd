"""Per-stage / per-partition lineage manifests — resumable builds.

North rule: "resumable from checkpoint with per-partition lineage +
metrics" — a killed build must resume without re-tokenizing completed
partitions, and the final index must be byte-identical to an
uninterrupted run.

Reference analog: the sha256-keyed idempotent FileCache
(/root/reference/src/documentindex/cache.py:123-186, 325-328) — the
same memoize-by-fingerprint idea, applied to whole build stages and
bucket groups instead of LLM responses.

Design: each stage writes Parquet under ``<out>/<stage>/`` and a
manifest row in ``<out>/_manifest.json``:

    {stage, fingerprint, status, rows, bytes, wall_ms,
     partitions: [{id, rows, bytes, wall_ms, status}, ...]}

The fingerprint is sha256 over (stage name, upstream fingerprint,
engine config constants, input identifier) — config changes
invalidate checkpoints, not just data changes (SURVEY.md hard-parts
list: "fingerprints must cover config, not just data"). On restart, a
stage whose manifest row matches its recomputed fingerprint AND whose
status is 'complete' is read back instead of recomputed; 'partial'
stages resume at their first incomplete partition group.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from dataclasses import dataclass, field
from typing import Any


def config_fingerprint() -> str:
    from .. import constants as C

    cfg = {
        "k1": C.BM25_K1,
        "b": C.BM25_B,
        "token_re": C.TOKEN_SPLIT_RE,
        "block_size": C.BLOCK_SIZE,
        "postings_per_shard": C.POSTINGS_PER_SHARD,
        "max_segment_postings": C.MAX_SEGMENT_POSTINGS,
        "num_term_buckets": C.NUM_TERM_BUCKETS,
        "engine_build_version": C.ENGINE_BUILD_VERSION,
    }
    return hashlib.sha256(json.dumps(cfg, sort_keys=True).encode()).hexdigest()


def stage_fingerprint(stage: str, upstream_fp: str, input_id: str) -> str:
    payload = json.dumps(
        {
            "stage": stage,
            "upstream": upstream_fp,
            "config": config_fingerprint(),
            "input": input_id,
        },
        sort_keys=True,
    )
    return hashlib.sha256(payload.encode()).hexdigest()


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


@dataclass
class Manifest:
    out_dir: str
    stages: dict[str, dict[str, Any]] = field(default_factory=dict)
    # observability: how many stages were reused vs recomputed this run
    hits: int = 0
    misses: int = 0

    @property
    def path(self) -> str:
        return os.path.join(self.out_dir, "_manifest.json")

    @classmethod
    def load(cls, out_dir: str) -> "Manifest":
        m = cls(out_dir=out_dir)
        if os.path.exists(m.path):
            with open(m.path) as f:
                m.stages = json.load(f)
        return m

    def save(self) -> None:
        os.makedirs(self.out_dir, exist_ok=True)
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.stages, f, indent=1, sort_keys=True)
        os.replace(tmp, self.path)  # atomic: a kill never corrupts it

    # ---- stage lifecycle -------------------------------------------

    def is_complete(self, stage: str, fingerprint: str) -> bool:
        s = self.stages.get(stage)
        return bool(
            s
            and s.get("fingerprint") == fingerprint
            and s.get("status") == "complete"
        )

    def completed_partitions(self, stage: str, fingerprint: str) -> set[int]:
        s = self.stages.get(stage)
        if not s or s.get("fingerprint") != fingerprint:
            return set()
        return {
            p["id"] for p in s.get("partitions", [])
            if p.get("status") == "complete"
        }

    def begin(self, stage: str, fingerprint: str) -> None:
        s = self.stages.get(stage)
        if not s or s.get("fingerprint") != fingerprint:
            self.stages[stage] = {
                "fingerprint": fingerprint,
                "status": "partial",
                "partitions": [],
            }
            self.save()

    def record_partition(
        self, stage: str, pid: int, rows: int, path: str, wall_ms: float
    ) -> None:
        self.stages[stage]["partitions"].append(
            {
                "id": pid,
                "rows": rows,
                "bytes": _dir_bytes(path) if os.path.exists(path) else 0,
                "wall_ms": round(wall_ms, 1),
                "status": "complete",
            }
        )
        self.save()

    def complete(
        self, stage: str, rows: int, path: str, wall_ms: float
    ) -> None:
        s = self.stages[stage]
        s.update(
            {
                "status": "complete",
                "rows": rows,
                "bytes": _dir_bytes(path) if os.path.exists(path) else 0,
                "wall_ms": round(wall_ms, 1),
                "completed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            }
        )
        self.save()
