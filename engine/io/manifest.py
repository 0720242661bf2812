"""Index manifest: the ONLY cross-run mutable state (SURVEY.md §2.1-S7, §3).

The manifest lists live segments (with tier + lineage + metrics), the global
doc stats, the analyzer and the salt map. Commit protocol: write
``manifest.json.tmp-<pid>`` then atomic ``os.replace`` — a crashed build
leaves the previous manifest intact, and its orphan segment directories are
invisible (nothing references them) until a re-run re-commits them
(BASELINE.json:14 "resumable from checkpoint with per-partition lineage").

Resume: each build records its input lineage as the set of parquet fragment
paths (+row counts) it consumed; ``pending_fragments`` diffs a new input list
against all committed builds so a re-run indexes only what's new.
"""

from __future__ import annotations

import json
import os
import time


class Manifest:
    def __init__(self, index_dir: str):
        self.index_dir = index_dir
        self.path = os.path.join(index_dir, "manifest.json")
        self.data: dict = {
            "version": 1,
            "analyzer": "default",
            "num_base_shards": None,
            "salt_map": None,
            "builds": [],
            "stats": {"n_docs": 0, "sum_dl": 0, "avgdl": 0.0},
        }
        if os.path.exists(self.path):
            with open(self.path) as f:
                self.data = json.load(f)

    # -- queries ------------------------------------------------------------
    def live_segments(self) -> list[dict]:
        """All non-tombstoned segments across builds/merges."""
        out = []
        for b in self.data["builds"]:
            out.extend(s for s in b["segments"] if not s.get("tombstone"))
        return out

    def segments_for_shard(self, shard: int) -> list[dict]:
        return [s for s in self.live_segments() if s["shard"] == shard]

    @property
    def stats(self) -> dict:
        return self.data["stats"]

    def indexed_fragments(self) -> set[str]:
        # abspath-normalized: a relative respelling of an already-indexed
        # path must compare equal, or a re-run double-indexes the corpus
        frags: set[str] = set()
        for b in self.data["builds"]:
            frags.update(
                os.path.abspath(f) for f in b.get("lineage", {}).get("fragments", [])
            )
        return frags

    def fragment_stats(self) -> dict[str, list[int]]:
        """abspath → [size, mtime_ns] recorded at commit time (empty for
        fragments committed by pre-stat manifests)."""
        stats: dict[str, list[int]] = {}
        for b in self.data["builds"]:
            for f, st in b.get("lineage", {}).get("fragment_stats", {}).items():
                stats[os.path.abspath(f)] = st
        return stats

    def pending_fragments(self, fragments: list[str]) -> list[str]:
        done = self.indexed_fragments()
        return [f for f in fragments if os.path.abspath(f) not in done]

    # -- mutation -----------------------------------------------------------
    def add_build(
        self,
        build_id: str,
        segments: list[dict],
        n_docs: int,
        sum_dl: int,
        lineage: dict | None = None,
        kind: str = "build",
    ) -> None:
        self.data["builds"].append(
            {
                "build_id": build_id,
                "kind": kind,
                "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
                "lineage": lineage or {},
                "segments": segments,
                "n_docs": int(n_docs),
                "sum_dl": int(sum_dl),
            }
        )
        st = self.data["stats"]
        st["n_docs"] = int(st["n_docs"]) + int(n_docs)
        st["sum_dl"] = int(st["sum_dl"]) + int(sum_dl)
        st["avgdl"] = st["sum_dl"] / st["n_docs"] if st["n_docs"] else 0.0

    def tombstone_segments(self, names: set[str]) -> None:
        for b in self.data["builds"]:
            for s in b["segments"]:
                if s["name"] in names:
                    s["tombstone"] = True

    def commit(self) -> None:
        os.makedirs(self.index_dir, exist_ok=True)
        tmp = f"{self.path}.tmp-{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(self.data, f, indent=1)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self.path)
