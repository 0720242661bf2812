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
same final segment content (tested in tests/test_merge_resume.py). Queries see
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
                         merge_id: str, tier: int, *, doc_buckets: int = 1,
                         s_total: int = 0, deletes: np.ndarray | None = None) -> list[dict]:
    """Merge the given segments of one shard → one segment, or — when
    ``doc_buckets=D > 1`` — D doc-bucketed segments (bucket b gets the
    postings with ``doc_key % D == b``, under shard id
    ``shard + s_total * b``). Bucketing at compaction is free of any extra
    shuffle: the task already holds the shard's sorted postings, and a
    mask-split preserves (term, doc_key) order. Returns one metrics row per
    written segment."""
    import time

    t0 = time.monotonic()
    # two passes over the (small) dictionaries to build a sorted vocab union,
    # then all per-posting work is int64 ids — no per-posting Python strings
    opened = [Segment(os.path.join(segments_dir, n)) for n in sorted(seg_names)]
    vocab = np.unique(np.concatenate([s.terms for s in opened])) if opened else np.empty(0, object)
    id_parts, dk_parts, tf_parts, dl_parts = [], [], [], []
    for seg in opened:
        seg_ids = np.searchsorted(vocab, seg.terms)  # exact: subset of union
        # ONE vectorised decode of the whole segment (all terms, all streams)
        dk, tf, dl = seg.read_all_postings()
        id_parts.append(np.repeat(seg_ids, seg.df))
        dk_parts.append(dk)
        tf_parts.append(tf)
        dl_parts.append(dl)
        seg.close()
    ids = np.concatenate(id_parts)
    dks = np.concatenate(dk_parts)
    tfs = np.concatenate(tf_parts)
    dls = np.concatenate(dl_parts)
    if deletes is not None and deletes.size and dks.size:
        # purge path (run_purge): drop deleted docs' postings BEFORE the
        # sort; per-term df/cf recompute naturally in assemble
        from engine.index.deletes import live_mask

        keep = live_mask(dks, deletes)
        ids, dks, tfs, dls = ids[keep], dks[keep], tfs[keep], dls[keep]
    order = np.lexsort((dks, ids))
    ids, dks, tfs, dls = ids[order], dks[order], tfs[order], dls[order]

    out = []
    buckets = (
        [(shard, slice(None))]
        if doc_buckets <= 1
        else [(shard + s_total * b, dks % doc_buckets == b) for b in range(doc_buckets)]
    )
    for out_shard, sel in buckets:
        b_ids, b_dks, b_tfs, b_dls = ids[sel], dks[sel], tfs[sel], dls[sel]
        if b_ids.size == 0 and (doc_buckets > 1 or deletes is not None):
            # a fully-purged shard writes no segment (queries treat a
            # missing shard as "no postings")
            continue
        dict_table, skips_table, blob = assemble_shard_tables(
            b_ids, b_dks, b_tfs, b_dls, vocab=vocab
        )
        name = segment_name(
            merge_id, out_shard, dict_table, len(b_ids),
            doc_lo=int(b_dks.min()) if len(b_ids) else 0,
            doc_hi=int(b_dks.max()) if len(b_ids) else 0,
            sum_cf=int(b_tfs.sum()),
        )
        meta = {
            "build_id": merge_id,
            "shard": out_shard,
            "n_terms": dict_table.num_rows,
            "n_postings": int(len(b_ids)),
            "sum_cf": int(b_tfs.sum()),
            "bytes_compressed": len(blob),
            "lineage": {"merged_from": sorted(seg_names)},
            "tier": tier,
            "format_version": 1,
        }
        write_segment(segments_dir, name, dict_table, skips_table, blob, meta)
        out.append(
            {
                "segment": name,
                "shard": out_shard,
                "n_terms": dict_table.num_rows,
                "n_postings": int(len(b_ids)),
                "sum_cf": int(b_tfs.sum()),
                "bytes_compressed": len(blob),
                "encode_sec": time.monotonic() - t0,
            }
        )
    return out


def plan_merges(manifest: Manifest, fanin: int = DEFAULT_FANIN, *, compact: bool = False,
                rebucket: bool = False) -> list[dict]:
    """Log-structured policy: per (shard, tier) with >= fanin live segments,
    merge the oldest ``fanin`` into tier+1. ``compact=True`` instead merges
    ALL live segments of a shard (any tier) into one — full compaction, used
    before query-heavy phases. ``rebucket=True`` (with compact) includes
    single-segment shards too: every shard must be rewritten into the new
    doc-bucketed layout."""
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
            if len(segs) >= (1 if rebucket else 2)
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
              compact: bool = False, doc_buckets: int | None = None) -> int:
    """Execute the tiered-merge policy once. Returns #merges performed.

    ``doc_buckets=D`` (implies compact): rewrite every shard into the
    doc-bucketed layout (engine/query/bucketed.py) — the log-structured
    build stays cheap and unbucketed; compaction produces the per-server
    1/D partitioning, with no extra shuffle.

    Ray-Data mapping: the merge work-list becomes a Dataset; each plan runs
    as one task (map_batches with batch_size=1 over plan rows)."""
    import json
    import time
    import uuid

    import ray.data as rd

    _t = [time.monotonic()]

    def _phase(name: str) -> None:
        # opt-in serial-section telemetry, same contract as build_index
        now = time.monotonic()
        if os.environ.get("GRAFT_TIMING"):
            import sys

            print(f'{{"merge_phase": "{name}", "sec": {now - _t[0]:.3f}}}',
                  file=sys.stderr, flush=True)
        _t[0] = now

    manifest = Manifest(index_dir)
    rebucket = doc_buckets is not None and doc_buckets > 1
    cur_buckets = int(manifest.data.get("doc_buckets", 1))
    if rebucket and cur_buckets == doc_buckets:
        # already bucketed at D: re-applying the bucket split would ADD the
        # s_total*b offset a second time (out_shard = base + 2*s_total*b),
        # stranding buckets b>0 outside their servers' shard ranges — a
        # re-run is a plain in-layout compaction instead (idempotent).
        rebucket = False
        doc_buckets = None
    elif rebucket and cur_buckets not in (1, doc_buckets):
        raise ValueError(
            f"index is bucketed at D={cur_buckets}; re-bucketing to "
            f"D={doc_buckets} is not supported (rebuild or merge at D={cur_buckets})"
        )
    if rebucket:
        compact = True
        from engine.core.partitioning import SaltMap

        sm = manifest.data.get("salt_map")
        s_total = (SaltMap.from_json(sm) if sm else SaltMap(manifest.data["num_base_shards"])).num_total_shards
    else:
        doc_buckets = 1
        s_total = 0
    plans = plan_merges(manifest, fanin, compact=compact, rebucket=rebucket)
    _phase("plan")
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
            rows = merge_shard_segments(
                segments_dir, json.loads(seg_json), int(shard), merge_id, int(tier),
                doc_buckets=doc_buckets, s_total=s_total,
            )
            for m in rows:
                m["tier"] = int(tier)
                out.append(m)
        schema = METRICS_SCHEMA.append(pa.field("tier", pa.int64()))
        return pa.Table.from_pylist(out, schema=schema)

    results = (
        # one block per plan row → one Ray task per shard merge (from_items'
        # default blocking would otherwise serialize merges inside one task)
        rd.from_items(plan_rows, override_num_blocks=len(plan_rows))
        .map_batches(do_merge, batch_format="pyarrow", batch_size=1)
        .to_pandas()
    )
    _phase("merge_tasks")

    # atomic manifest swap: add merged segments, tombstone inputs
    merged_names: set[str] = set().union(*(p["segments"] for p in plans))
    new_segments = [
        {
            "name": r.segment,
            "shard": int(r.shard),
            "tier": int(r.tier),
            "n_terms": int(r.n_terms),
            "n_postings": int(r.n_postings),
            "sum_cf": int(r.sum_cf),
            "bytes_compressed": int(r.bytes_compressed),
        }
        for r in results.itertuples()
    ]
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
    if rebucket:
        manifest.data["doc_buckets"] = int(doc_buckets)
    manifest.commit()
    _phase("manifest_commit")
    gc_tombstoned(index_dir, only=merged_names)
    _phase("gc_tombstoned")
    if rebucket:
        # bucketed queries need GLOBAL per-term df (a bucket's dict df only
        # counts its own docs) — refresh the term_stats artifact
        from engine.index.build import build_term_stats

        build_term_stats(index_dir)
    return len(plans)


def run_purge(index_dir: str, *, purge_id: str | None = None) -> dict:
    """Fold the committed delete log into the index (phase 2 of
    engine/index/deletes.py): rewrite EVERY live segment without the deleted
    postings, rewrite the docmap, recompute n_docs/sum_dl/avgdl, and clear
    the log — after this the index is bit-identical (scores and artifacts)
    to a fresh build over the filtered corpus.

    Shuffle-free like run_merge: one Ray task per shard (postings never
    leave their shard), one streaming filter pass over the docmap. The
    delete set is ray.put once and read by every task.

    Atomicity: new segments and the new docmap dir are written BEFORE the
    single manifest commit that (a) tombstones the old segments, (b) adds
    the purge build, (c) marks prior builds' docmaps dead
    (``docmap_tombstone``), (d) rewrites stats, (e) drops the delete log.
    A crash before the commit leaves orphans no reader loads; after it,
    stale dirs are garbage a later gc sweeps. term_stats and dense sidecars
    self-invalidate via the (n_docs, sum_dl) fingerprint change.

    Returns {"shards": n, "n_docs": new_n_docs, "purged_docs": removed}.
    """
    import json
    import shutil
    import time
    import uuid

    import ray
    import ray.data as rd

    from engine.index.deletes import live_mask, load_deletes
    from engine.query.hydrate import committed_docmap_dirs

    manifest = Manifest(index_dir)
    deleted = load_deletes(index_dir, manifest=manifest)
    if deleted.size == 0:
        return {"shards": 0, "n_docs": int(manifest.stats["n_docs"]), "purged_docs": 0}
    purge_id = purge_id or ("p" + uuid.uuid4().hex[:7])
    segments_dir = os.path.join(index_dir, "segments")

    # -- pass 1: rewrite every shard's segments without deleted postings ----
    by_shard: dict[int, list[dict]] = {}
    for s in manifest.live_segments():
        by_shard.setdefault(s["shard"], []).append(s)
    plan_rows = [
        {
            "shard": shard,
            "tier": max(int(x.get("tier", 0)) for x in segs) + 1,
            "segments": json.dumps(sorted(x["name"] for x in segs)),
        }
        for shard, segs in sorted(by_shard.items())
    ]
    del_ref = ray.put(deleted)

    def do_purge(batch: pa.Table) -> pa.Table:
        dels = ray.get(del_ref)
        out = []
        for shard, tier, seg_json in zip(
            batch["shard"].to_pylist(), batch["tier"].to_pylist(), batch["segments"].to_pylist()
        ):
            rows = merge_shard_segments(
                segments_dir, json.loads(seg_json), int(shard), purge_id, int(tier),
                deletes=dels,
            )
            for m in rows:
                m["tier"] = int(tier)
                out.append(m)
        schema = METRICS_SCHEMA.append(pa.field("tier", pa.int64()))
        return pa.Table.from_pylist(out, schema=schema)

    results = (
        rd.from_items(plan_rows, override_num_blocks=len(plan_rows))
        .map_batches(do_purge, batch_format="pyarrow", batch_size=1)
        .to_pandas()
    ) if plan_rows else None

    # -- pass 2: filtered docmap → docmap/build-<purge_id>/ -----------------
    old_docmap_dirs = committed_docmap_dirs(index_dir, manifest=manifest)
    docmap_files = []
    for bd in old_docmap_dirs:
        for root, _d, fs in os.walk(bd):
            docmap_files.extend(os.path.join(root, f) for f in sorted(fs) if f.endswith(".parquet"))
    new_docmap = os.path.join(index_dir, "docmap", f"build-{purge_id}")
    num_parts = int(manifest.data.get("docmap_parts") or 0)
    n_docs = 0
    if docmap_files:
        def keep_live(batch: pa.Table) -> pa.Table:
            dels = ray.get(del_ref)
            keys = batch["doc_key"].to_numpy()
            tbl = batch.filter(pa.array(live_mask(keys, dels)))
            if num_parts:
                part = (tbl["doc_key"].to_numpy() % num_parts).astype(np.int32)
                tbl = tbl.append_column("part", pa.array(part, type=pa.int32()))
            return tbl

        ds = rd.read_parquet(
            docmap_files, columns=["doc_key", "conv_id", "turn_idx"]
        ).map_batches(keep_live, batch_format="pyarrow", zero_copy_batch=True)
        if num_parts:
            ds.write_parquet(new_docmap, partition_cols=["part"])
        else:
            ds.write_parquet(new_docmap)
        for root, _dirs, files in os.walk(new_docmap):
            n_docs += sum(
                pa.parquet.ParquetFile(os.path.join(root, f)).metadata.num_rows
                for f in files
                if f.endswith(".parquet")
            )

    # -- single atomic manifest swap -----------------------------------------
    old_names = {s["name"] for segs in by_shard.values() for s in segs}
    new_segments = [
        {
            "name": r.segment,
            "shard": int(r.shard),
            "tier": int(r.tier),
            "n_terms": int(r.n_terms),
            "n_postings": int(r.n_postings),
            "sum_cf": int(r.sum_cf),
            "bytes_compressed": int(r.bytes_compressed),
        }
        for r in (results.itertuples() if results is not None else ())
    ]
    sum_dl = int(sum(s["sum_cf"] for s in new_segments))
    old_n_docs = int(manifest.stats["n_docs"])
    manifest.tombstone_segments(old_names)
    for b in manifest.data["builds"]:
        b["docmap_tombstone"] = True  # superseded by the purge docmap
    manifest.data["builds"].append(
        {
            "build_id": purge_id,
            "kind": "purge",
            "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "lineage": {
                "purged_deletes": [d["id"] for d in manifest.data.get("deletes", [])],
                "merged": sorted(old_names),
            },
            "segments": new_segments,
            "n_docs": n_docs,
            "sum_dl": sum_dl,
        }
    )
    manifest.data["stats"] = {
        "n_docs": n_docs,
        "sum_dl": sum_dl,
        "avgdl": sum_dl / n_docs if n_docs else 0.0,
    }
    delete_entries = manifest.data.pop("deletes", [])  # log cleared in THIS commit
    manifest.commit()
    # payload unlink strictly AFTER the commit: a crash in between leaves
    # orphan .npy files (harmless — nothing references them), never a
    # committed manifest pointing at vanished files
    for d in delete_entries:
        try:
            os.unlink(os.path.join(index_dir, "deletes", d["file"]))
        except OSError:
            pass
    gc_tombstoned(index_dir, only=old_names)
    for bd in old_docmap_dirs:
        if os.path.abspath(bd) != os.path.abspath(new_docmap):
            shutil.rmtree(bd, ignore_errors=True)
    return {
        "shards": len(plan_rows),
        "n_docs": n_docs,
        "purged_docs": old_n_docs - n_docs,
    }


def gc_orphans(index_dir: str) -> int:
    """Remove artifacts left by CRASHED builds: segment dirs never committed
    and docmap build-dirs whose build_id no manifest build references.

    Explicit-only (an operator/cron verb, CLI ``gc``): a concurrently RUNNING
    build's uncommitted artifacts are indistinguishable from crash orphans,
    so this must not run automatically alongside builds (same reasoning as
    gc_tombstoned's tombstone-only policy)."""
    import shutil

    manifest = Manifest(index_dir)
    committed_segments = {
        s["name"] for b in manifest.data["builds"] for s in b["segments"]
    }
    committed_builds = {b["build_id"] for b in manifest.data["builds"]}
    n = 0
    segments_dir = os.path.join(index_dir, "segments")
    if os.path.isdir(segments_dir):
        for d in os.listdir(segments_dir):
            if d not in committed_segments:
                shutil.rmtree(os.path.join(segments_dir, d), ignore_errors=True)
                n += 1
    # dense sidecars (engine/query/densify.py) whose segment is no longer
    # LIVE are unreachable (content-named) — safe to drop here even for
    # tombstoned-but-not-yet-GC'd segments
    live = {s["name"] for s in manifest.live_segments()}
    dense_root = os.path.join(index_dir, "dense")
    if os.path.isdir(dense_root):
        for d in os.listdir(dense_root):
            if d not in live:
                shutil.rmtree(os.path.join(dense_root, d), ignore_errors=True)
                n += 1
    docmap_root = os.path.join(index_dir, "docmap")
    if os.path.isdir(docmap_root):
        for d in os.listdir(docmap_root):
            if d.startswith("build-") and d[len("build-"):] not in committed_builds:
                shutil.rmtree(os.path.join(docmap_root, d), ignore_errors=True)
                n += 1
    return n


def gc_tombstoned(index_dir: str, only: set[str] | None = None) -> int:
    """Remove TOMBSTONED segment directories.

    Deletes only names the manifest explicitly records as tombstoned
    (optionally restricted to ``only``) — never "any directory that isn't
    live": a build writes its segment directories BEFORE its manifest commit,
    so a concurrent merge must not treat those uncommitted directories as
    garbage."""
    import shutil

    manifest = Manifest(index_dir)
    dead = set()
    for b in manifest.data["builds"]:
        dead.update(s["name"] for s in b["segments"] if s.get("tombstone"))
    if only is not None:
        dead &= set(only)
    segments_dir = os.path.join(index_dir, "segments")
    dense_root = os.path.join(index_dir, "dense")

    def _rm(d: str) -> int:
        k = 0
        p = os.path.join(segments_dir, d)
        if os.path.isdir(p):
            shutil.rmtree(p, ignore_errors=True)
            k = 1
        dp = os.path.join(dense_root, d)
        if os.path.isdir(dp):  # the segment's dense sidecar dies with it
            shutil.rmtree(dp, ignore_errors=True)
        return k

    # a compaction tombstones runs×shards directories (measured ~1-1.7s of
    # SERIAL driver unlinking after every merge — pure Amdahl overhead on
    # the scaling legs); unlink is IO-bound, so a thread pool hides it
    from concurrent.futures import ThreadPoolExecutor

    if len(dead) > 8:
        with ThreadPoolExecutor(max_workers=16) as ex:
            return sum(ex.map(_rm, dead))
    return sum(map(_rm, dead))
