"""Hydrate top-k results: doc_key → external docID 'conv_id:turn_idx'
(SURVEY.md §2.5-J1).

The result set is tiny (queries × k rows) while the docmap is corpus-sized,
so this is a broadcast-SEMI-join the other way round: collect the candidate
doc_keys (small), broadcast them via ``ray.put``, stream the docmap through a
vectorised isin-filter (no shuffle), and map the surviving rows — instead of
a full docmap shuffle join. The docmap is hive-partitioned by
``part = doc_key % docmap_parts`` at build time (engine/index/build.py), so
``docmap_paths`` touches only the partitions holding candidates."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def committed_docmap_dirs(index_dir: str, manifest=None) -> list[str]:
    """docmap/build-<id> dirs belonging to MANIFEST-COMMITTED builds only.
    A crashed or still-running build writes its docmap BEFORE the manifest
    commit; reading those rows would hydrate (and, worse, dense-scatter —
    engine/query/densify.py) against doc keys the index doesn't serve.

    ``manifest``: pass a caller-held snapshot so the build list is COHERENT
    with the caller's other manifest-derived state (e.g. a SegmentServer's
    construction-time stats — a build committing concurrently must not make
    this function see docmap rows the caller's segment list doesn't serve)."""
    from engine.io.manifest import Manifest

    docmap_root = os.path.join(index_dir, "docmap")
    if not os.path.isdir(docmap_root):
        return []
    committed = {
        f"build-{b['build_id']}"
        for b in (manifest or Manifest(index_dir)).data.get("builds", [])
        # a purge (engine/index/merge.py run_purge) rewrites the docmap into
        # its own build dir and marks every prior build's docmap dead
        if not b.get("docmap_tombstone")
    }
    return [
        os.path.join(docmap_root, d)
        for d in sorted(os.listdir(docmap_root))
        if d in committed and os.path.isdir(os.path.join(docmap_root, d))
    ]


def committed_docmap_files(index_dir: str, manifest=None) -> list[str]:
    """Every parquet file of every committed build's docmap."""
    files: list[str] = []
    for bd in committed_docmap_dirs(index_dir, manifest=manifest):
        for root, _d, fs in os.walk(bd):
            files.extend(os.path.join(root, f) for f in sorted(fs) if f.endswith(".parquet"))
    return files


def docmap_paths(index_dir: str, doc_keys: np.ndarray) -> list[str]:
    """Pruned docmap read-list: only the part=<p> directories whose
    ``doc_key % docmap_parts`` appears in the candidate set (falls back to
    whole build dirs for legacy unpartitioned docmaps)."""
    from engine.io.manifest import Manifest

    num_parts = int(Manifest(index_dir).data.get("docmap_parts") or 0)
    parts = {int(p) for p in np.unique(doc_keys % num_parts)} if num_parts else None
    paths: list[str] = []
    for build_dir in committed_docmap_dirs(index_dir):
        part_dirs = [e for e in sorted(os.listdir(build_dir)) if e.startswith("part=")]
        if parts is not None and part_dirs:
            keep_dirs = [
                os.path.join(build_dir, e)
                for e in part_dirs
                if int(e.split("=", 1)[1]) in parts
            ]
        else:
            keep_dirs = [build_dir]
        # expand to files: a mixed list of directories trips read_parquet's
        # metadata provider on this Ray version
        for kd in keep_dirs:
            for root, _d, files in os.walk(kd):
                paths.extend(
                    os.path.join(root, f) for f in sorted(files) if f.endswith(".parquet")
                )
    return paths


def load_docmap_for_keys(index_dir: str, doc_keys: np.ndarray) -> dict[int, str]:
    """Stream the (pruned) docmap, keep only candidate keys →
    {doc_key: 'conv:turn'}."""
    import ray
    import ray.data as rd

    wanted = np.unique(doc_keys)
    paths = docmap_paths(index_dir, wanted)
    if wanted.size == 0 or not paths:
        return {}
    wanted_ref = ray.put(wanted)

    def keep(batch: pa.Table) -> pa.Table:
        w = ray.get(wanted_ref)
        keys = batch["doc_key"].to_numpy()
        idx = np.searchsorted(w, keys)
        idx[idx >= w.size] = 0
        mask = w[idx] == keys
        return batch.filter(pa.array(mask))

    hits = (
        rd.read_parquet(paths, columns=["doc_key", "conv_id", "turn_idx"])
        .map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
    )
    return {
        int(k): f"{c}:{t}"
        for k, c, t in zip(hits["doc_key"], hits["conv_id"], hits["turn_idx"])
    }


def hydrate_results(index_dir: str, partials):
    """partials: Dataset(qid, rank, doc_key, score) → adds doc_id string."""
    # top-k output is small (queries × k) — pin it so collecting the key set
    # doesn't re-execute the scoring pipeline
    partials = partials.materialize()
    kdf = partials.select_columns(["doc_key"]).to_pandas()
    keys = kdf["doc_key"].to_numpy() if "doc_key" in kdf.columns else np.empty(0, dtype=np.int64)
    mapping = load_docmap_for_keys(index_dir, keys)
    import ray

    map_ref = ray.put(mapping)

    def attach(batch: pa.Table) -> pa.Table:
        m = ray.get(map_ref)
        ids = pa.array([m.get(int(k), "") for k in batch["doc_key"].to_numpy()], type=pa.string())
        return batch.append_column("doc_id", ids)

    return partials.map_batches(attach, batch_format="pyarrow", zero_copy_batch=True)


def hydrate_table(index_dir: str, table: pa.Table) -> pa.Table:
    """Hydrate an in-hand partials Table (the resident-service path —
    engine/query/service.py): same pruned-docmap semi-join, driver-side."""
    keys = table["doc_key"].to_numpy()
    mapping = load_docmap_for_keys(index_dir, keys)
    # same missing-key convention as hydrate_results: empty string, not null
    doc_id = pa.array([mapping.get(int(k), "") for k in keys], type=pa.string())
    return table.append_column("doc_id", doc_id)
