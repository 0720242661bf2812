"""Log-structured tiered segment merge — entry point E3 (SURVEY.md §3-E3;
BASELINE.json:6 "segment merge follows a log-structured tiered policy so
partial builds compose deterministically").

Policy: when a shard has >= R live segments in tier t, merge them into ONE
tier-(t+1) segment. Merging is per-shard and embarrassingly parallel — one
Ray task per shard via map_batches over a shard work-list Dataset (no
shuffle: posting lists of one shard never leave their task).

Determinism: the merge concatenates (term, doc_key)-sorted postings from
doc-disjoint segments (different builds index different input fragments) and
re-encodes — an associative+commutative fold, so any merge order yields the
same final segment content (tested in tests/test_merge.py). Queries see
either pre- or post-merge state atomically via the manifest swap; results
are identical because scoring sums df across live segments either way.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from engine.index.postings import METRICS_SCHEMA, assemble_shard_tables
from engine.index.segment import Segment
from engine.io.manifest import Manifest
from engine.io.segment_sink import segment_name, write_segment

DEFAULT_FANIN = 4


def merge_shard_segments(segments_dir: str, seg_names: list[str], shard: int,
                         merge_id: str, tier: int) -> dict:
    """Merge the given segments of one shard into a single segment."""
    import time

    t0 = time.monotonic()
    terms_parts, dk_parts, tf_parts, dl_parts = [], [], [], []
    for name in sorted(seg_names):
        seg = Segment(os.path.join(segments_dir, name))
        for idx in range(len(seg.terms)):
            dk, tf, dl = seg.read_postings(idx)
            terms_parts.append(np.full(dk.size, seg.terms[idx], dtype=object))
            dk_parts.append(dk)
            tf_parts.append(tf)
            dl_parts.append(dl)
        seg.close()
    terms = np.concatenate(terms_parts)
    dks = np.concatenate(dk_parts)
    tfs = np.concatenate(tf_parts)
    dls = np.concatenate(dl_parts)
    order = np.lexsort((dks, terms))
    terms, dks, tfs, dls = terms[order], dks[order], tfs[order], dls[order]
    dict_table, skips_table, blob = assemble_shard_tables(terms, dks, tfs, dls)
    name = segment_name(merge_id, shard, dict_table, len(terms))
    meta = {
        "build_id": merge_id,
        "shard": shard,
        "n_terms": dict_table.num_rows,
        "n_postings": int(len(terms)),
        "sum_cf": int(tfs.sum()),
        "bytes_compressed": len(blob),
        "lineage": {"merged_from": sorted(seg_names)},
        "tier": tier,
        "format_version": 1,
    }
    write_segment(segments_dir, name, dict_table, skips_table, blob, meta)
    return {
        "segment": name,
        "shard": shard,
        "n_terms": dict_table.num_rows,
        "n_postings": int(len(terms)),
        "sum_cf": int(tfs.sum()),
        "bytes_compressed": len(blob),
        "encode_sec": time.monotonic() - t0,
    }


def plan_merges(manifest: Manifest, fanin: int = DEFAULT_FANIN, *, compact: bool = False) -> list[dict]:
    """Log-structured policy: per (shard, tier) with >= fanin live segments,
    merge the oldest ``fanin`` into tier+1. ``compact=True`` instead merges
    ALL live segments of a shard (any tier) into one — full compaction, used
    before query-heavy phases."""
    if compact:
        by_shard: dict[int, list[dict]] = {}
        for s in manifest.live_segments():
            by_shard.setdefault(s["shard"], []).append(s)
        return [
            {
                "shard": shard,
                "tier": max(int(x.get("tier", 0)) for x in segs) + 1,
                "segments": [x["name"] for x in segs],
            }
            for shard, segs in sorted(by_shard.items())
            if len(segs) >= 2
        ]
    by_shard_tier: dict[tuple[int, int], list[dict]] = {}
    for s in manifest.live_segments():
        by_shard_tier.setdefault((s["shard"], int(s.get("tier", 0))), []).append(s)
    plans = []
    for (shard, tier), segs in sorted(by_shard_tier.items()):
        while len(segs) >= fanin:
            batch, segs = segs[:fanin], segs[fanin:]
            plans.append(
                {"shard": shard, "tier": tier + 1, "segments": [b["name"] for b in batch]}
            )
    return plans


def run_merge(index_dir: str, *, fanin: int = DEFAULT_FANIN, merge_id: str | None = None,
              compact: bool = False) -> int:
    """Execute the tiered-merge policy once. Returns #merges performed.

    Ray-Data mapping: the merge work-list becomes a Dataset; each plan runs
    as one task (map_batches with batch_size=1 over plan rows)."""
    import json
    import uuid

    import ray.data as rd

    manifest = Manifest(index_dir)
    plans = plan_merges(manifest, fanin, compact=compact)
    if not plans:
        return 0
    merge_id = merge_id or ("m" + uuid.uuid4().hex[:7])
    segments_dir = os.path.join(index_dir, "segments")

    plan_rows = [
        {"shard": p["shard"], "tier": p["tier"], "segments": json.dumps(p["segments"])}
        for p in plans
    ]

    def do_merge(batch: pa.Table) -> pa.Table:
        out = []
        for shard, tier, seg_json in zip(
            batch["shard"].to_pylist(), batch["tier"].to_pylist(), batch["segments"].to_pylist()
        ):
            m = merge_shard_segments(segments_dir, json.loads(seg_json), int(shard), merge_id, int(tier))
            m["tier"] = int(tier)
            out.append(m)
        schema = METRICS_SCHEMA.append(pa.field("tier", pa.int64()))
        return pa.Table.from_pylist(out, schema=schema)

    results = (
        rd.from_items(plan_rows)
        .map_batches(do_merge, batch_format="pyarrow", batch_size=1)
        .to_pandas()
    )

    # atomic manifest swap: add merged segments, tombstone inputs
    merged_names: set[str] = set()
    new_segments = []
    for p, r in zip(plans, results.itertuples()):
        merged_names.update(p["segments"])
        new_segments.append(
            {
                "name": r.segment,
                "shard": int(r.shard),
                "tier": int(r.tier),
                "n_terms": int(r.n_terms),
                "n_postings": int(r.n_postings),
                "sum_cf": int(r.sum_cf),
                "bytes_compressed": int(r.bytes_compressed),
            }
        )
    manifest.tombstone_segments(merged_names)
    # n_docs/sum_dl unchanged: merge rewrites postings, moves no documents
    manifest.data["builds"].append(
        {
            "build_id": merge_id,
            "kind": "merge",
            "lineage": {"merged": sorted(merged_names)},
            "segments": new_segments,
            "n_docs": 0,
            "sum_dl": 0,
        }
    )
    manifest.commit()
    gc_tombstoned(index_dir)
    return len(plans)


def gc_tombstoned(index_dir: str) -> int:
    """Remove segment directories no longer referenced as live."""
    import shutil

    manifest = Manifest(index_dir)
    live = {s["name"] for s in manifest.live_segments()}
    segments_dir = os.path.join(index_dir, "segments")
    n = 0
    for d in os.listdir(segments_dir):
        if d not in live and not d.endswith(".tmp"):
            shutil.rmtree(os.path.join(segments_dir, d), ignore_errors=True)
            n += 1
    return n
