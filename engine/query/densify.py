"""Persisted dense query artifacts — the mmap-able fast path for
``mode="dense"`` scoring (engine/query/engine.py::score_query_dense).

Motivation (BASELINE.md scale-frontier note): at the 10M-turn scale the
per-query cost is dominated by re-deriving transient state — posting-stream
decode and doc_key→position searchsorted — because this class of working set
(~GBs for a head-term workload) cannot live in worker heaps: large RSS is
exactly what memory-pressured hosts reclaim, and reclaimed heap must be
RECOMPUTED. The fix is to materialize that state ON DISK once per segment
and serve it via mmap: page-cache pages are reclaim-friendly (dropped pages
re-read at disk speed instead of re-deriving at decode speed).

Artifacts, per live segment, under ``<index>/dense/<segment_name>/``:

  pos.npy   int32   for every posting (dict order, term t owning rows
                    cumsum(df)[t-1]:cumsum(df)[t]): the posting doc's
                    POSITION in its bucket's sorted doc_key array — i.e.
                    a precomputed scatter index into the score buffer
  w.npy     float64 the posting's exact BM25 weight idf·tf_sat(tf,dl,avgdl),
                    with idf from the GLOBAL term df (term_stats artifact) —
                    bit-identical to what SegmentServer computes at query
                    time, so dense scoring stays oracle-bit-identical

  meta.json        {"n_docs", "sum_dl"} — the GLOBAL-stats fingerprint the
                   weights were computed under

Segment names are content-derived (engine/io/segment_sink.py), so a sidecar
can never silently describe different postings: after any merge/compaction
the new segments simply have no sidecar until ``densify_index`` runs again,
and the query path falls back to computing positions/weights on the fly.
Global stats are a different staleness axis: an INCREMENTAL build changes
n_docs/avgdl/df, which are baked into every existing sidecar's weights (and
into pos when new docs land in a bucket). The meta.json fingerprint catches
this — any build that adds documents changes (n_docs, sum_dl), the loader
(engine/query/engine.py::_sidecar) rejects mismatched sidecars, and
``densify_index`` rewrites them instead of skipping.

At 10^12-doc scale both the docmap key arrays and the term_stats dictionary
are themselves sharded; this implementation broadcasts them whole, which is
the right call up to ~10^8 docs per bucket (8 B/doc).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa


def _bucket_keys(index_dir: str, d_buckets: int, manifest=None) -> list[np.ndarray]:
    """Sorted doc_key array per bucket (one array, bucket 0, if unbucketed).

    COMMITTED builds' docmaps only (engine/query/hydrate.py): an in-flight
    or crashed build's docmap rows would shift sorted positions and scatter
    sidecar weights into the wrong doc slots. Callers holding a manifest
    snapshot (SegmentServer) MUST pass it: a build committing between actor
    construction and first dense query would otherwise lengthen these key
    arrays while sidecar freshness still validates against the snapshot's
    stats — silently mis-scattered scores (ADVICE r2)."""
    import pyarrow.dataset as pads

    from engine.query.hydrate import committed_docmap_files

    files = committed_docmap_files(index_dir, manifest=manifest)
    keys = (
        pads.dataset(files, format="parquet").to_table(columns=["doc_key"])["doc_key"]
        .to_numpy()
        if files
        else np.empty(0, dtype=np.int64)
    )
    if d_buckets <= 1:
        return [np.sort(keys)]
    return [np.sort(keys[keys % d_buckets == b]) for b in range(d_buckets)]


def densify_index(index_dir: str) -> dict:
    """Write pos/w sidecars for every live segment lacking one. Idempotent;
    parallelized one Ray task per segment; atomic (tmp dir + rename)."""
    import ray
    import ray.data as rd
    import pyarrow.dataset as pads

    from engine.io.manifest import Manifest

    import json as _json

    manifest = Manifest(index_dir)
    st = manifest.stats
    n_docs, avgdl = int(st["n_docs"]), float(st["avgdl"])
    fingerprint = {"n_docs": n_docs, "sum_dl": int(st["sum_dl"])}
    d_buckets = int(manifest.data.get("doc_buckets", 1))
    from engine.core.partitioning import SaltMap

    sm = manifest.data.get("salt_map")
    s_total = (
        SaltMap.from_json(sm).num_total_shards
        if sm
        else int(manifest.data["num_base_shards"])
    )

    # global df must reflect the CURRENT corpus — a term_stats artifact
    # built before the latest build would bake stale idf into every weight
    from engine.index.build import ensure_term_stats

    stats_dir = ensure_term_stats(index_dir)
    t = pads.dataset(stats_dir, format="parquet").to_table(columns=["term", "df"])
    df_global = dict(zip(t["term"].to_pylist(), t["df"].to_pylist()))

    keys_ref = ray.put(_bucket_keys(index_dir, d_buckets, manifest=manifest))
    df_ref = ray.put(df_global)
    dense_root = os.path.join(index_dir, "dense")
    os.makedirs(dense_root, exist_ok=True)

    def _fresh(name: str) -> bool:
        meta_p = os.path.join(dense_root, name, "meta.json")
        try:
            with open(meta_p) as f:
                return _json.load(f) == fingerprint
        except (OSError, ValueError):
            return False

    todo = [
        {"name": s["name"], "shard": int(s["shard"])}
        for s in manifest.live_segments()
        if not _fresh(s["name"])
    ]
    if not todo:
        return {"densified": 0, "skipped": len(manifest.live_segments())}

    seg_root = os.path.join(index_dir, "segments")

    def densify_one(batch: pa.Table) -> pa.Table:
        from engine.index.segment import Segment
        from engine.oracle.bm25 import idf as bm25_idf
        from engine.oracle.bm25 import tf_sat

        bucket_keys = ray.get(keys_ref)
        dfs = ray.get(df_ref)
        out_names, out_postings = [], []
        for name, shard in zip(batch["name"].to_pylist(), batch["shard"].to_pylist()):
            seg = Segment(os.path.join(seg_root, name))
            dk, tf, dl = seg.read_all_postings()
            bucket = int(shard) // s_total if d_buckets > 1 else 0
            keys = bucket_keys[bucket]
            if keys.size == 0 and dk.size:
                # empty committed docmap but live postings: same error as the
                # populated-mismatch case, not a bare IndexError from the
                # keys[-1] fancy-index below (ADVICE r2)
                raise RuntimeError(f"segment {name}: doc_keys missing from docmap")
            pos = np.searchsorted(keys, dk)
            if dk.size and not (
                (pos < keys.size).all() and (keys[np.minimum(pos, keys.size - 1)] == dk).all()
            ):
                raise RuntimeError(f"segment {name}: doc_keys missing from docmap")
            seg_df = seg.df.astype(np.int64)
            idf_per_term = np.array(
                [float(bm25_idf(n_docs, int(dfs.get(t, 0)))) for t in seg.terms],
                dtype=np.float64,
            )
            w = np.repeat(idf_per_term, seg_df) * tf_sat(tf, dl, avgdl)
            tmp = os.path.join(dense_root, f".tmp-{name}-{os.getpid()}")
            os.makedirs(tmp, exist_ok=True)
            np.save(os.path.join(tmp, "pos.npy"), pos.astype(np.int32))
            np.save(os.path.join(tmp, "w.npy"), w.astype(np.float64))
            with open(os.path.join(tmp, "meta.json"), "w") as f:
                import json

                json.dump(fingerprint, f)
            final = os.path.join(dense_root, name)
            import shutil

            if os.path.isdir(final):  # stale (or racing same-content) sidecar
                shutil.rmtree(final, ignore_errors=True)
            try:
                os.rename(tmp, final)
            except OSError:
                shutil.rmtree(tmp, ignore_errors=True)  # lost a same-content race
            out_names.append(name)
            out_postings.append(int(dk.size))
        return pa.table({"name": pa.array(out_names, type=pa.string()),
                         "n_postings": pa.array(out_postings, type=pa.int64())})

    res = (
        rd.from_items(todo, override_num_blocks=len(todo))
        .map_batches(densify_one, batch_format="pyarrow", batch_size=1)
        .to_pandas()
    )
    return {"densified": len(res), "skipped": len(manifest.live_segments()) - len(todo),
            "n_postings": int(res["n_postings"].sum()) if len(res) else 0}
