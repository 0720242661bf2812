"""Hydrate top-k results: doc_key → external docID 'conv_id:turn_idx'
(SURVEY.md §2.5-J1).

The result set is tiny (queries × k rows) while the docmap is corpus-sized,
so this is a broadcast-SEMI-join the other way round: collect the candidate
doc_keys (small), broadcast them via ``ray.put``, stream the docmap through a
vectorised isin-filter (no shuffle), and map the surviving rows — instead of
a full docmap shuffle join. At 10^12-doc scale the docmap directory is
additionally partitioned by ``doc_key % 256`` so the scan touches only the
partitions holding candidates (see build.py docmap layout note)."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def load_docmap_for_keys(index_dir: str, doc_keys: np.ndarray) -> dict[int, str]:
    """Stream the docmap, keep only candidate keys → {doc_key: 'conv:turn'}."""
    import ray
    import ray.data as rd

    docmap_root = os.path.join(index_dir, "docmap")
    paths = [
        os.path.join(docmap_root, d)
        for d in sorted(os.listdir(docmap_root))
        if os.path.isdir(os.path.join(docmap_root, d))
    ]
    wanted = np.unique(doc_keys)
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
        rd.read_parquet(paths)
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
