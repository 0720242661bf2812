"""Similarity search over the embeddings table (list<float> column).

- ``cosine_topk``: exact brute-force cosine top-k — broadcast query matrix
  (ray.put once), per-batch NumPy matmul, per-batch top-k candidates, exact
  driver-side merge (candidates are queries×k×blocks rows — tiny).
- ``ivf_topk``: IVF-style scale path — k-means-ish coarse centroids (seeded,
  one sample pass), per-batch assignment, probe the nprobe nearest lists
  only. Approximate; returns the same schema. Recall vs brute force is
  measured in tests, not assumed.

Similarity is reported in micro-units (floor(sim*1e6+0.5)) and ranked by
(sim_micro desc, vec_id asc) so ordering is reproducible in SQL
(list_cosine_similarity) despite last-ulp float differences.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _read_embeddings(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])


def _to_matrix(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ids = batch["vec_id"].to_numpy()
    emb = batch["embedding"]
    if isinstance(emb, pa.ChunkedArray):
        emb = emb.combine_chunks()
    flat = emb.values.to_numpy(zero_copy_only=False).astype(np.float64)
    dim = len(flat) // len(ids) if len(ids) else 0
    return ids, flat.reshape(len(ids), dim)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def cosine_topk(sf_dir: str, *, n_queries: int = 5, k: int = 10):
    """Exact top-k cosine neighbours of the first ``n_queries`` vectors
    (excluding self). Output: (qid, rank, vec_id, sim_micro)."""
    import ray

    ds = _read_embeddings(sf_dir)
    qdf = ds.filter(expr=f"vec_id < {n_queries}").to_pandas().sort_values("vec_id")
    q_ids = qdf["vec_id"].to_numpy()
    qm = _normalize(np.stack([np.asarray(v, dtype=np.float64) for v in qdf["embedding"]]))
    q_ref = ray.put((q_ids, qm))

    def partial(batch: pa.Table) -> pa.Table:
        qids, qmat = ray.get(q_ref)
        ids, mat = _to_matrix(batch)
        sims = _normalize(mat) @ qmat.T  # (n, nq)
        sim_micro = np.floor(sims * 1e6 + 0.5).astype(np.int64)
        out_q, out_v, out_s = [], [], []
        for j, qid in enumerate(qids):
            col = sim_micro[:, j]
            mask = ids != qid
            vids, s = ids[mask], col[mask]
            if s.size > k:
                kth = np.partition(-s, k - 1)[k - 1]
                keep = s >= -kth
                vids, s = vids[keep], s[keep]
            order = np.lexsort((vids, -s))[:k]
            out_q.append(np.full(order.size, qid, dtype=np.int64))
            out_v.append(vids[order])
            out_s.append(s[order])
        return pa.table(
            {
                "qid": np.concatenate(out_q),
                "vec_id": np.concatenate(out_v).astype(np.int64),
                "sim_micro": np.concatenate(out_s),
            }
        )

    cand = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    out_rows = []
    for qid, g in cand.groupby("qid"):
        g = g.sort_values(["sim_micro", "vec_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        out_rows.append(g)
    out = pd.concat(out_rows, ignore_index=True)[["qid", "rank", "vec_id", "sim_micro"]]
    return out.sort_values(["qid", "rank"]).reset_index(drop=True).astype("int64")


def ivf_topk(sf_dir: str, *, n_queries: int = 5, k: int = 10, n_lists: int = 16, nprobe: int = 4,
             seed: int = 13):
    """IVF-bucketed ANN: coarse centroids from a seeded sample, candidate
    generation restricted to the nprobe closest lists per query."""
    import ray

    ds = _read_embeddings(sf_dir)
    sample = ds.limit(max(512, n_lists * 8)).to_pandas()
    sm = _normalize(np.stack([np.asarray(v, dtype=np.float64) for v in sample["embedding"]]))
    rng = np.random.default_rng(seed)
    centroids = sm[rng.choice(len(sm), size=min(n_lists, len(sm)), replace=False)]
    for _ in range(5):  # few Lloyd iterations on the sample
        assign = (sm @ centroids.T).argmax(axis=1)
        for c in range(centroids.shape[0]):
            members = sm[assign == c]
            if len(members):
                v = members.mean(axis=0)
                centroids[c] = v / (np.linalg.norm(v) or 1.0)

    qdf = ds.filter(expr=f"vec_id < {n_queries}").to_pandas().sort_values("vec_id")
    q_ids = qdf["vec_id"].to_numpy()
    qm = _normalize(np.stack([np.asarray(v, dtype=np.float64) for v in qdf["embedding"]]))
    probe = np.argsort(-(qm @ centroids.T), axis=1)[:, :nprobe]  # (nq, nprobe)
    ref = ray.put((q_ids, qm, centroids, probe))

    def partial(batch: pa.Table) -> pa.Table:
        qids, qmat, cents, probes = ray.get(ref)
        ids, mat = _to_matrix(batch)
        nm = _normalize(mat)
        assign = (nm @ cents.T).argmax(axis=1)
        out_q, out_v, out_s = [], [], []
        for j, qid in enumerate(qids):
            mask = np.isin(assign, probes[j]) & (ids != qid)
            if not mask.any():
                continue
            sims = nm[mask] @ qmat[j]
            s = np.floor(sims * 1e6 + 0.5).astype(np.int64)
            vids = ids[mask]
            order = np.lexsort((vids, -s))[:k]
            out_q.append(np.full(order.size, qid, dtype=np.int64))
            out_v.append(vids[order])
            out_s.append(s[order])
        if not out_q:
            return pa.table({"qid": pa.array([], type=pa.int64()),
                             "vec_id": pa.array([], type=pa.int64()),
                             "sim_micro": pa.array([], type=pa.int64())})
        return pa.table(
            {
                "qid": np.concatenate(out_q),
                "vec_id": np.concatenate(out_v).astype(np.int64),
                "sim_micro": np.concatenate(out_s),
            }
        )

    cand = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    out_rows = []
    for qid, g in cand.groupby("qid"):
        g = g.sort_values(["sim_micro", "vec_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        out_rows.append(g)
    if not out_rows:
        return pd.DataFrame(columns=["qid", "rank", "vec_id", "sim_micro"], dtype="int64")
    out = pd.concat(out_rows, ignore_index=True)[["qid", "rank", "vec_id", "sim_micro"]]
    return out.sort_values(["qid", "rank"]).reset_index(drop=True).astype("int64")
