"""Doc-level deletes — a log-structured delete set over a committed index.

Two-phase semantics (the Lucene model, re-expressed for this engine):

1. ``delete_doc_keys`` appends a sorted doc_key array under ``deletes/``
   and commits its name in the manifest. Queries EXCLUDE deleted docs
   immediately (every scoring mode — exhaustive, dense, WAND, conjunctive,
   bucketed — filters against the committed delete set), but scores keep
   using the index's committed stats: df/cf/avgdl move only at purge,
   exactly like a deleted-docs bitmap over immutable segments.
2. ``engine.index.merge.run_purge`` rewrites every segment without the
   deleted postings, rewrites the docmap, recomputes n_docs/sum_dl/avgdl
   and per-term df/cf, and clears the delete log — after purge the index
   scores BIT-identically to a fresh build over the filtered corpus
   (tests/test_deletes.py proves it).

Crash safety mirrors the build protocol: the ``.npy`` payload is written
(tmp + atomic rename) BEFORE the manifest commit; a crash in between leaves
an orphan file no reader loads (``load_deletes`` walks the manifest's
committed list, never the directory).

Scale note: the delete set is broadcast whole into every SegmentServer
(sorted int64, 8 B/doc). That is the right trade while deletions ≪ corpus —
the operational regime of takedowns/redactions — and ``run_purge`` is the
pressure valve that folds the log back to zero before it grows large.
"""

from __future__ import annotations

import os
import uuid

import numpy as np

from engine.io.manifest import Manifest


def delete_doc_keys(index_dir: str, keys, delete_id: str | None = None) -> int:
    """Commit a delete set. ``keys``: iterable/array of int64 doc_keys.
    Returns the number of keys recorded (after in-set dedup; keys unknown to
    the index are permitted — deleting an unindexed key is a no-op at query
    time and at purge). Idempotent per delete_id."""
    arr = np.unique(np.asarray(list(keys) if not isinstance(keys, np.ndarray) else keys,
                               dtype=np.int64))
    manifest = Manifest(index_dir)
    delete_id = delete_id or ("d" + uuid.uuid4().hex[:10])
    existing = manifest.data.get("deletes", [])
    if any(d["id"] == delete_id for d in existing):
        return 0
    ddir = os.path.join(index_dir, "deletes")
    os.makedirs(ddir, exist_ok=True)
    fname = f"{delete_id}.npy"
    tmp = os.path.join(ddir, f".tmp-{os.getpid()}-{fname}")
    np.save(tmp, arr)
    os.replace(tmp, os.path.join(ddir, fname))
    manifest.data.setdefault("deletes", []).append(
        {"id": delete_id, "file": fname, "n": int(arr.size)}
    )
    manifest.commit()
    return int(arr.size)


def load_deletes(index_dir: str, manifest: Manifest | None = None) -> np.ndarray:
    """Union of all committed delete sets → sorted unique int64 (possibly
    empty). Pass the caller's manifest snapshot for coherence with its other
    manifest-derived state (same contract as committed_docmap_dirs)."""
    manifest = manifest or Manifest(index_dir)
    entries = manifest.data.get("deletes", [])
    if not entries:
        return np.empty(0, dtype=np.int64)
    parts = [
        np.load(os.path.join(index_dir, "deletes", d["file"]))
        for d in entries
    ]
    return np.unique(np.concatenate(parts)) if parts else np.empty(0, dtype=np.int64)


def live_mask(doc_keys: np.ndarray, deleted: np.ndarray) -> np.ndarray:
    """Boolean mask of ``doc_keys`` NOT present in sorted ``deleted``."""
    if deleted.size == 0 or doc_keys.size == 0:
        return np.ones(doc_keys.size, dtype=bool)
    pos = np.searchsorted(deleted, doc_keys)
    pos[pos >= deleted.size] = 0
    return deleted[pos] != doc_keys


