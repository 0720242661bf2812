"""Index snapshots: a point-in-time, immutable, QUERYABLE copy of an index
(Elasticsearch snapshot/restore; LSM checkpoint). A snapshot directory has
the exact on-disk contract of a live index (manifest.json + segments/ +
docmap/ + deletes/), so "restore" is simply opening it — every reader
(SegmentServer, hydrate, dense sidecars, term_stats) works unmodified, and
derived artifacts (term_stats/, dense/) rebuild on demand because their
freshness seams fingerprint the manifest stats.

Cost model: segment, docmap and delete-set files are HARDLINKED (copy only
on EXDEV), so a snapshot is O(#files) metadata work, not O(bytes) — the
log-structured layout makes this safe because committed files are immutable
(builds/merges write tmp-then-rename, never in place; gc unlinks, which
leaves the snapshot's links intact).

Consistency: the manifest is read first and re-read after linking — if a
concurrent build/merge/purge committed in between, the attempt is discarded
and retried, so the published snapshot always references a single manifest
version whose files were all present at link time. Tombstoned segment
entries are stripped from the snapshot manifest (a snapshot carries no gc
debt); orphan (uncommitted) docmaps are excluded by the same
committed-builds rule every reader uses (engine/query/hydrate.py::
committed_docmap_dirs)."""

from __future__ import annotations

import json
import os
import shutil


def _link_tree(src: str, dst: str) -> int:
    """Hardlink-copy a directory tree; returns files linked. Falls back to
    byte copy when linking crosses devices."""
    n = 0
    for root, _dirs, files in os.walk(src):
        rel = os.path.relpath(root, src)
        out = os.path.join(dst, rel) if rel != "." else dst
        os.makedirs(out, exist_ok=True)
        for f in files:
            s, d = os.path.join(root, f), os.path.join(out, f)
            try:
                os.link(s, d)
            except OSError:
                shutil.copy2(s, d)
            n += 1
    return n


def create_snapshot(index_dir: str, snap_dir: str, attempts: int = 5) -> dict:
    """Publish a consistent point-in-time snapshot of ``index_dir`` at
    ``snap_dir`` (must not exist). Returns {segments, docmap_dirs, deletes,
    files} counts."""
    from engine.io.manifest import Manifest
    from engine.query.hydrate import committed_docmap_dirs

    if os.path.exists(snap_dir):
        raise FileExistsError(f"snapshot target exists: {snap_dir}")
    if not os.path.exists(os.path.join(index_dir, "manifest.json")):
        raise FileNotFoundError(f"not an index (no manifest.json): {index_dir}")

    last_err: Exception | None = None
    for _ in range(attempts):
        m = Manifest(index_dir)
        before = json.dumps(m.data, sort_keys=True)
        doc = json.loads(before)
        for b in doc["builds"]:
            b["segments"] = [s for s in b["segments"] if not s.get("tombstone")]
        tmp = f"{snap_dir}.tmp-{os.getpid()}"
        if os.path.isdir(tmp):
            shutil.rmtree(tmp)
        os.makedirs(os.path.join(tmp, "segments"), exist_ok=True)
        try:
            files = 0
            seg_names = [s["name"] for b in doc["builds"] for s in b["segments"]]
            for name in seg_names:
                files += _link_tree(os.path.join(index_dir, "segments", name),
                                    os.path.join(tmp, "segments", name))
            dm_dirs = committed_docmap_dirs(index_dir, manifest=m)
            for d in dm_dirs:
                files += _link_tree(
                    d, os.path.join(tmp, "docmap", os.path.basename(d))
                )
            for d in doc.get("deletes", []):
                os.makedirs(os.path.join(tmp, "deletes"), exist_ok=True)
                src = os.path.join(index_dir, "deletes", d["file"])
                dst = os.path.join(tmp, "deletes", d["file"])
                try:
                    os.link(src, dst)
                except OSError:
                    shutil.copy2(src, dst)
                files += 1
        except FileNotFoundError as e:
            # raced a concurrent gc/purge: a file the manifest referenced is
            # gone — discard and retry against the fresh manifest
            shutil.rmtree(tmp, ignore_errors=True)
            last_err = e
            continue
        # consistency check: no commit landed while we were linking
        after = json.dumps(Manifest(index_dir).data, sort_keys=True)
        if after != before:
            shutil.rmtree(tmp, ignore_errors=True)
            last_err = RuntimeError("manifest changed during snapshot")
            continue
        with open(os.path.join(tmp, "manifest.json"), "w") as f:
            json.dump(doc, f)
        os.rename(tmp, snap_dir)
        return {
            "segments": len(seg_names),
            "docmap_dirs": len(dm_dirs),
            "deletes": len(doc.get("deletes", [])),
            "files": files,
        }
    raise RuntimeError(
        f"snapshot of {index_dir} kept racing concurrent commits "
        f"({attempts} attempts): {last_err}"
    )
