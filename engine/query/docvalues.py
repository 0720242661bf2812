"""DocValues sidecar: a persisted, mmap'd doc_key → field-value column
(Lucene DocValues / columnar sort fields). Field-sorted retrieval and
field aggregations over match sets need each matched doc's attribute;
joining the corpus-sized attribute table is a full keyed exchange PER
QUERY BATCH. This artifact pays one build pass instead, after which a
lookup is a part-routed binary search in an mmap'd sorted array — no
shuffle at query time, page cache shared across every actor on the node
(the engine/query/densify.py economics applied to attribute columns).

Layout (content-keyed, atomic): ``<index>/docvalues/<field>/part=<p>/``
with ``keys.npy`` (sorted int64 doc_keys) + ``vals.npy`` (aligned int64
values), ``p = doc_key % parts`` — the SAME routing the docmap hive uses,
so a lookup touches exactly one part per key. ``_DV.json`` fingerprints
the committed index stats plus the corpus file identity: a rebuilt or
regenerated corpus invalidates the artifact (the IVF/term_stats freshness
rule)."""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa

DV_PARTS = 64


def _corpus_fp(path: str) -> str:
    st = os.stat(path)
    return f"{os.path.abspath(path)}|{st.st_size}|{st.st_mtime_ns}"


def ensure_docvalues(index_dir: str, corpus_path: str, field: str = "ts",
                     parts: int = DV_PARTS, key_col: str = "doc_key") -> str:
    """Build-once (per corpus content + committed stats) the ``field``
    docvalues artifact; returns its directory. Caller may race: the
    check-build-commit runs under a per-artifact flock (the
    pipelines._index_lock pattern)."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from engine.io.manifest import Manifest
    from engine.pipelines import _index_lock

    st = Manifest(index_dir).stats
    fp = {"corpus": _corpus_fp(corpus_path),
          "n_docs": int(st["n_docs"]), "sum_dl": int(st["sum_dl"]),
          "parts": int(parts), "key_col": key_col}
    root = os.path.join(index_dir, "docvalues", field)
    meta_path = os.path.join(root, "_DV.json")
    with _index_lock(root):
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                if json.load(f) == fp:
                    return root
        import shutil

        if os.path.isdir(root):
            shutil.rmtree(root)
        tmp_pq = f"{root}.stage-{os.getpid()}"

        def emit(b: pa.Table) -> pa.Table:
            dk = b[key_col].to_numpy().astype(np.int64)
            val = b[field].cast(pa.int64()).to_numpy(zero_copy_only=False)
            return pa.table({
                "part": pa.array((dk % parts).astype(np.int32)),
                "doc_key": pa.array(dk),
                "val": pa.array(val.astype(np.int64)),
            })

        (rd.read_parquet(corpus_path, columns=[key_col, field])
           .map_batches(emit, batch_format="pyarrow", zero_copy_batch=True)
           .write_parquet(tmp_pq, partition_cols=["part"]))

        # per-part sort + npy publish: one small Ray task per part (a part
        # is corpus/parts rows — the unit a single worker must hold)
        def build_part(row: dict) -> dict:
            p = int(row["p"])
            pdir = os.path.join(tmp_pq, f"part={p}")
            out = os.path.join(root, f"part={p}")
            os.makedirs(out, exist_ok=True)
            if not os.path.isdir(pdir):
                keys = np.empty(0, dtype=np.int64)
                vals = np.empty(0, dtype=np.int64)
            else:
                t = pq.read_table(pdir, columns=["doc_key", "val"])
                keys = t["doc_key"].to_numpy().astype(np.int64)
                vals = t["val"].to_numpy().astype(np.int64)
                o = np.argsort(keys, kind="stable")
                keys, vals = keys[o], vals[o]
            for name, arr in (("keys", keys), ("vals", vals)):
                tmp = os.path.join(out, f".tmp-{os.getpid()}-{name}.npy")
                np.save(tmp, arr)
                os.replace(tmp, os.path.join(out, f"{name}.npy"))
            return {"p": p, "rows": int(keys.size)}

        rows = (rd.from_items([{"p": p} for p in range(parts)])
                  .map(build_part).take_all())
        assert len(rows) == parts
        shutil.rmtree(tmp_pq)
        tmp_meta = f"{meta_path}.tmp-{os.getpid()}"
        with open(tmp_meta, "w") as f:
            json.dump(fp, f)
        os.replace(tmp_meta, meta_path)
    return root


class DocValuesLookup:
    """map_batches callable: attach ``field`` values to a (qid, doc_key)
    match stream via the mmap'd artifact — per-actor lazy part handles,
    data pages shared node-wide through the page cache. Raises on a key
    absent from the artifact (a match the corpus doesn't know = the same
    invariant breach hydrate refuses)."""

    def __init__(self, dv_dir: str, out_col: str = "val"):
        with open(os.path.join(dv_dir, "_DV.json")) as f:
            self.parts = int(json.load(f)["parts"])
        self.dv_dir = dv_dir
        self.out_col = out_col
        self._handles: dict[int, tuple[np.ndarray, np.ndarray]] = {}

    def _part(self, p: int):
        h = self._handles.get(p)
        if h is None:
            d = os.path.join(self.dv_dir, f"part={p}")
            h = (np.load(os.path.join(d, "keys.npy"), mmap_mode="r"),
                 np.load(os.path.join(d, "vals.npy"), mmap_mode="r"))
            self._handles[p] = h
        return h

    def __call__(self, b: pa.Table) -> pa.Table:
        dk = b["doc_key"].to_numpy().astype(np.int64)
        out = np.empty(dk.size, dtype=np.int64)
        for p in np.unique(dk % self.parts):
            keys, vals = self._part(int(p))
            m = (dk % self.parts) == p
            sub = dk[m]
            if keys.size == 0 and sub.size:
                raise RuntimeError(f"doc_keys missing from docvalues part {p}")
            j = np.searchsorted(keys, sub)
            j = np.minimum(j, keys.size - 1)
            if not np.array_equal(np.asarray(keys[j]), sub):
                raise RuntimeError(f"doc_keys missing from docvalues part {p}")
            out[m] = vals[j]
        return b.append_column(self.out_col, pa.array(out))
