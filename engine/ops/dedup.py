"""Deduplication operators — exact, MinHash+LSH, SimHash, n-gram Jaccard
(training-data pipeline ops; ray_guide 'Aggregation at scale' patterns).

Scale shapes:
- exact: content-hash in map_batches → hash-partition groupby → keep min key.
  No full-text shuffle: only (hash, doc_id) rows move.
- MinHash-LSH: per-batch signatures (vectorised) → explode to
  (band, band_hash, doc_id) → groupby buckets → candidate pairs → Jaccard
  verify against broadcast shingle sets (sandbox) / a keyed join (at scale).
- SimHash: 64-bit signature per doc; Hamming-ball blocking on 4×16-bit bands.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from engine.text.analyzer import Analyzer

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


class _Fingerprint:
    def __init__(self) -> None:
        self.an = Analyzer()

    def __call__(self, batch: pa.Table) -> pa.Table:
        fps = [
            hashlib.md5(" ".join(self.an.tokens(t or "")).encode()).hexdigest()
            for t in batch["text"].to_pylist()
        ]
        return pa.table({"doc_id": batch["doc_id"], "fingerprint": pa.array(fps, type=pa.string())})


def dedup_exact(sf_dir: str, table: str = "documents"):
    """Keep the smallest doc_id per canonical-text fingerprint.
    Returns (doc_id, dup_count) for kept docs, sorted by doc_id."""
    import ray.data as rd
    from ray.data.aggregate import Count, Min

    from engine.core.context import ensure_hash_shuffle

    ensure_hash_shuffle()
    ds = rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=["doc_id", "text"])
    out = (
        ds.map_batches(_Fingerprint, batch_format="pyarrow", zero_copy_batch=True, concurrency=(1, 4))
        .groupby("fingerprint")
        .aggregate(Min("doc_id", alias_name="doc_id"), Count(alias_name="dup_count"))
        .to_pandas()[["doc_id", "dup_count"]]
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    out["doc_id"] = out["doc_id"].astype("int64")
    out["dup_count"] = out["dup_count"].astype("int64")
    return out


# ---------------------------------------------------------------------------
# shingles + MinHash
# ---------------------------------------------------------------------------

_MERSENNE = (1 << 61) - 1


def shingle_hashes(tokens: list[str], width: int = 3) -> np.ndarray:
    """Distinct 64-bit hashes of ``width``-token shingles."""
    if len(tokens) < width:
        joined = [" ".join(tokens)] if tokens else []
    else:
        joined = [" ".join(tokens[i : i + width]) for i in range(len(tokens) - width + 1)]
    out = {
        int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "little")
        for s in joined
    }
    return np.fromiter(out, dtype=np.uint64, count=len(out))


class MinHasher:
    """Vectorised universal-hash MinHash: sig_i = min((a_i*x + b_i) mod p).

    Shingle hashes are truncated to 32 bits and a < 2^31 so a*x + b < 2^63
    — no uint64 overflow, fully vectorised (no per-value Python)."""

    def __init__(self, num_perm: int = 64, seed: int = 1):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, 1 << 31, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, 1 << 31, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm

    def signature(self, hashes: np.ndarray) -> np.ndarray:
        if hashes.size == 0:
            return np.full(self.num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        x = hashes.astype(np.uint64) & np.uint64(0xFFFFFFFF)
        vals = (x[:, None] * self.a[None, :] + self.b[None, :]) % np.uint64(_MERSENNE)
        return vals.min(axis=0)


class _MinHashSig:
    def __init__(self, num_perm: int, bands: int, shingle_width: int):
        self.an = Analyzer()
        self.mh = MinHasher(num_perm)
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.shingle_width = shingle_width

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids, band_ids, band_hashes = [], [], []
        for doc_id, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            sh = shingle_hashes(self.an.tokens(text or ""), self.shingle_width)
            sig = self.mh.signature(sh)
            for b in range(self.bands):
                chunk = sig[b * self.rows_per_band : (b + 1) * self.rows_per_band]
                h = hashlib.blake2b(chunk.tobytes(), digest_size=8).hexdigest()
                doc_ids.append(doc_id)
                band_ids.append(b)
                band_hashes.append(h)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, type=pa.int64()),
                "band": pa.array(band_ids, type=pa.int32()),
                "band_hash": pa.array(band_hashes, type=pa.string()),
            }
        )


def minhash_candidates(sf_dir: str, *, num_perm: int = 64, bands: int = 16, shingle_width: int = 3):
    """MinHash+LSH candidate pairs: (doc_a, doc_b, n_bands_shared)."""
    import ray.data as rd

    from engine.core.context import ensure_hash_shuffle

    ensure_hash_shuffle()
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    sigs = ds.map_batches(
        _MinHashSig,
        fn_constructor_kwargs={"num_perm": num_perm, "bands": bands, "shingle_width": shingle_width},
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 4),
    )

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(group["doc_id"].to_numpy())
        if ids.size < 2 or ids.size > 1000:  # guard degenerate buckets
            return pd.DataFrame({"doc_a": [], "doc_b": []})
        a, b = np.triu_indices(ids.size, k=1)
        return pd.DataFrame({"doc_a": ids[a], "doc_b": ids[b]})

    pairs = (
        sigs.groupby(["band", "band_hash"])
        .map_groups(bucket_pairs, batch_format="pandas")
        .to_pandas()
    )
    if len(pairs) == 0:
        return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                             "doc_b": pd.Series([], dtype="int64"),
                             "n_bands_shared": pd.Series([], dtype="int64")})
    out = (
        pairs.groupby(["doc_a", "doc_b"], as_index=False)
        .size()
        .rename(columns={"size": "n_bands_shared"})
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    return out.astype({"doc_a": "int64", "doc_b": "int64", "n_bands_shared": "int64"})


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


class _SimHash:
    def __init__(self) -> None:
        self.an = Analyzer()

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = []
        for text in batch["text"].to_pylist():
            toks = self.an.tokens(text or "")
            if not toks:
                sigs.append(0)
                continue
            uniq, counts = np.unique(np.array(toks, dtype=object), return_counts=True)
            hs = np.fromiter(
                (
                    int.from_bytes(hashlib.blake2b(t.encode(), digest_size=8).digest(), "little")
                    for t in uniq
                ),
                dtype=np.uint64,
                count=len(uniq),
            )
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.int64)
            v = ((bits * 2 - 1) * counts[:, None]).sum(axis=0)
            sig = int(((v > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())
            sigs.append(sig - (1 << 64) if sig >= (1 << 63) else sig)
        return pa.table({"doc_id": batch["doc_id"], "simhash": pa.array(sigs, type=pa.int64())})


def simhash_pairs(sf_dir: str, max_hamming: int = 3):
    """Near-dup pairs by SimHash: block on 4×16-bit bands (any pair within
    Hamming distance 3 shares ≥1 exact band), verify Hamming distance."""
    import ray.data as rd

    from engine.core.context import ensure_hash_shuffle

    ensure_hash_shuffle()
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    sigs = ds.map_batches(_SimHash, batch_format="pyarrow", zero_copy_batch=True, concurrency=(1, 4))

    def explode_bands(batch: pa.Table) -> pa.Table:
        dk = batch["doc_id"].to_numpy()
        sh = batch["simhash"].to_numpy().astype(np.uint64)
        out_id, out_band, out_val, out_sig = [], [], [], []
        for b in range(4):
            out_id.append(dk)
            out_band.append(np.full(dk.size, b, dtype=np.int32))
            out_val.append(((sh >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int64))
            out_sig.append(sh.astype(np.int64))
        return pa.table(
            {
                "doc_id": np.concatenate(out_id),
                "band": np.concatenate(out_band),
                "band_val": np.concatenate(out_val),
                "simhash": np.concatenate(out_sig),
            }
        )

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values("doc_id")
        ids = g["doc_id"].to_numpy()
        sh = g["simhash"].to_numpy().astype(np.uint64)
        if ids.size < 2 or ids.size > 2000:
            return pd.DataFrame({"doc_a": [], "doc_b": [], "hamming": []})
        a, b = np.triu_indices(ids.size, k=1)
        x = sh[a] ^ sh[b]
        ham = np.zeros(x.size, dtype=np.int64)
        while x.any():
            ham += (x & np.uint64(1)).astype(np.int64)
            x >>= np.uint64(1)
        keep = ham <= max_hamming
        return pd.DataFrame({"doc_a": ids[a][keep], "doc_b": ids[b][keep], "hamming": ham[keep]})

    pairs = (
        sigs.map_batches(explode_bands, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["band", "band_val"])
        .map_groups(bucket_pairs, batch_format="pandas")
        .to_pandas()
    )
    if len(pairs) == 0:
        return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                             "doc_b": pd.Series([], dtype="int64"),
                             "hamming": pd.Series([], dtype="int64")})
    out = pairs.drop_duplicates(["doc_a", "doc_b"]).sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    return out.astype({"doc_a": "int64", "doc_b": "int64", "hamming": "int64"})


# ---------------------------------------------------------------------------
# exact token-set Jaccard (the small-scale oracle for the LSH paths)
# ---------------------------------------------------------------------------


def jaccard_pairs(sf_dir: str, threshold_micro: int = 500_000):
    """All-pairs token-SET Jaccard ≥ threshold (micro-units). Exact — the
    SQL-checkable baseline the MinHash path approximates. Distributed as
    row-block × broadcast-matrix: each batch compares its docs against the
    full (broadcast) set-membership matrix; at scale the LSH path replaces
    this O(n²) sweep."""
    import ray
    import ray.data as rd

    an = Analyzer()
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    all_docs = ds.to_pandas().sort_values("doc_id")
    ids = all_docs["doc_id"].to_numpy()
    token_sets = [sorted(set(an.tokens(t or ""))) for t in all_docs["text"]]
    vocab = sorted({t for s in token_sets for t in s})
    v_index = {t: i for i, t in enumerate(vocab)}
    mat = np.zeros((len(ids), len(vocab)), dtype=np.int32)
    for r, s in enumerate(token_sets):
        for t in s:
            mat[r, v_index[t]] = 1
    ref = ray.put((ids, mat))

    def block(batch: pa.Table) -> pa.Table:
        bids, bmat = ray.get(ref)
        my = batch["doc_id"].to_numpy()
        rows = np.searchsorted(bids, my)
        sub = bmat[rows]
        inter = sub @ bmat.T
        sizes = bmat.sum(axis=1)
        union = sizes[rows][:, None] + sizes[None, :] - inter
        with np.errstate(divide="ignore", invalid="ignore"):
            jac = np.where(union > 0, inter / union, 0.0)
        jm = np.floor(jac * 1e6 + 0.5).astype(np.int64)
        a_idx, b_idx = np.nonzero((jm >= threshold_micro) & (my[:, None] < bids[None, :]))
        return pa.table(
            {
                "doc_a": pa.array(my[a_idx], type=pa.int64()),
                "doc_b": pa.array(bids[b_idx], type=pa.int64()),
                "jaccard_micro": pa.array(jm[a_idx, b_idx], type=pa.int64()),
            }
        )

    out = ds.map_batches(block, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
