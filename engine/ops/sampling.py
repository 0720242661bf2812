"""Deterministic sampling / split assignment (training-data pipeline ops).

At 100 TB, train/val/test membership must be a PURE FUNCTION of a stable
key — never RNG state, row order, or partitioning — so any node (or a later
rerun over different shards) assigns every row identically, and a resumed
or incrementally-extended corpus never migrates a document between splits.
The assignment here is the md5 of the key's decimal string: bucket =
first-8-hex-digits mod 100, reproducible byte-for-byte in SQL as
``('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::UBIGINT % 100``.

Single map_batches pass, no shuffle; the md5-per-key loop matches the
fingerprint op's cost profile (engine/ops/textstats.py::DocStats).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa


def split_buckets(keys) -> np.ndarray:
    """key (any int/str) → bucket in [0, 100). Vector over a batch."""
    out = np.empty(len(keys), dtype=np.int64)
    for i, k in enumerate(keys):
        out[i] = int(hashlib.md5(str(k).encode()).hexdigest()[:8], 16) % 100
    return out


def hash_split(sf_dir: str, val_pct: int = 10, test_pct: int = 10) -> pd.DataFrame:
    """Assign every document a deterministic train/val/test split.

    Columns: doc_id, bucket (int64, 0-99), split (string). Buckets
    [0, val_pct) → 'val', [val_pct, val_pct+test_pct) → 'test', rest
    'train'.
    """
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def assign(batch: pa.Table) -> pa.Table:
        b = split_buckets(batch["doc_id"].to_pylist())
        split = np.where(b < val_pct, "val",
                         np.where(b < val_pct + test_pct, "test", "train"))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "bucket": pa.array(b, type=pa.int64()),
                "split": pa.array(split, type=pa.string()),
            }
        )

    out = ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True).astype(
        {"doc_id": "int64", "bucket": "int64"}
    )


def sample_hashes(keys) -> np.ndarray:
    """key → uint64 sample rank (first 16 md5 hex digits). Same pure-function
    property as split_buckets, 64-bit so strata of millions don't tie."""
    out = np.empty(len(keys), dtype=np.uint64)
    for i, k in enumerate(keys):
        out[i] = np.uint64(int(hashlib.md5(str(k).encode()).hexdigest()[:16], 16))
    return out


def stratified_sample(sf_dir: str, k: int = 30, stratum: str = "lang") -> pd.DataFrame:
    """Deterministic k-per-stratum sample: within each stratum keep the k
    docs with the smallest (md5-hash, doc_id) — a distributed 'reservoir'
    that is a pure function of the keys (resumable, shard-order-free, and
    byte-reproducible in SQL via row_number over the same hash).

    Shape: scan with an in-batch combiner (each batch forwards at most k
    rows per stratum it saw) → one stratum-keyed groupby picks the global
    k smallest — the exchange carries ≤ k × strata × batches slim rows,
    never the corpus. Columns: <stratum>, rank, doc_id."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", stratum])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch.copy()
        b["h"] = sample_hashes(b["doc_id"])
        b = b.sort_values(["h", "doc_id"])
        return b.groupby(stratum, as_index=False, sort=False).head(k)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["h", "doc_id"]).head(k).copy()
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[[stratum, "rank", "doc_id"]]

    out = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(stratum)
        .map_groups(final, batch_format="pandas")
        .to_pandas()
    )
    out = out.sort_values([stratum, "rank"]).reset_index(drop=True)
    out[stratum] = out[stratum].astype(str)
    return out.astype({"rank": "int64", "doc_id": "int64"})
