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


# ---------------------------------------------------------------------------
# data mixing + sharded export (the two steps between "clean corpus" and
# "training job": weight sources into an epoch mixture, then write the
# stream as resumable hash-partitioned shards)

MIX_MOD = 1_000_000
CHECK_PRIME = 2_147_483_647  # 2^31 - 1, same family as dedup.SPAN_MOD


def _md5_u32(keys) -> np.ndarray:
    """key → first-8-hex md5 value (the split_buckets draw, un-bucketed)."""
    out = np.empty(len(keys), dtype=np.int64)
    for i, k in enumerate(keys):
        out[i] = int(hashlib.md5(str(k).encode()).hexdigest()[:8], 16)
    return out


def source_weight_micro(sources) -> np.ndarray:
    """source name → mixture weight in micro-epochs: 250_000 +
    (md5 bucket % 30) × 100_000, i.e. 0.25–3.15 epochs. A pure function of
    the source STRING — no weight table to ship or keep in sync — and
    byte-reproducible in SQL. Cached per distinct source (vocab-sized, the
    dedup._TokenHashes discipline), so the per-row cost is a dict lookup."""
    uniq: dict = {}
    out = np.empty(len(sources), dtype=np.int64)
    for i, s in enumerate(sources):
        w = uniq.get(s)
        if w is None:
            w = 250_000 + (
                int(hashlib.md5(str(s).encode()).hexdigest()[:8], 16) % 30
            ) * 100_000
            uniq[s] = w
        out[i] = w
    return out


def _mix_reps(doc_ids, sources) -> tuple[np.ndarray, np.ndarray]:
    """(reps, weight_micro) per row: floor(w) epochs for every doc plus one
    more iff the doc's md5 draw (first-8-hex mod 1e6) falls under frac(w) —
    deterministic fractional upsampling, a pure function of
    (source, doc_id): resumable, shard-order-free, cluster-size-free."""
    w = source_weight_micro(sources)
    draw = _md5_u32(doc_ids) % MIX_MOD
    reps = w // MIX_MOD + (draw < w % MIX_MOD)
    return reps.astype(np.int64), w


def mixture_epochs(sf_dir: str) -> pd.DataFrame:
    """Source-weighted epoch mixing (the Llama/DoReMi-style data-mixture
    step): each source contributes ``source_weight_micro`` epochs of its
    documents. The upsample stage emits the ACTUAL mixed stream — slim
    (source, n_chars) rows repeated per doc via np.repeat — which at
    production scale feeds ``export_shards``' partitioned writer instead of
    an aggregate; here a map-side per-source combine + one ≤|sources|-row
    groupby summarizes it, and a second column-pruned pass counts the input
    docs per source (n_docs).

    Columns: source, weight_micro, n_docs, n_emitted, n_chars_emitted."""
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "n_chars"]
    )

    def upsample(batch: pa.Table) -> pa.Table:
        reps, w = _mix_reps(batch["doc_id"].to_pylist(), batch["source"].to_pylist())
        idx = np.repeat(np.arange(len(reps)), reps)
        return pa.table({
            "source": batch["source"].take(pa.array(idx)),
            "w": pa.array(w[idx], type=pa.int64()),
            "n_chars": pa.array(
                batch["n_chars"].to_numpy().astype(np.int64)[idx], type=pa.int64()
            ),
        })

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby(["source", "w"], as_index=False).agg(
            n_emitted=("n_chars", "size"), n_chars_emitted=("n_chars", "sum")
        )
        return g

    mixed = (
        ds.map_batches(upsample, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(partial, batch_format="pandas")
        .groupby("source")
        .sum(["n_emitted", "n_chars_emitted"])
        .to_pandas()
        .rename(columns={"sum(n_emitted)": "n_emitted",
                         "sum(n_chars_emitted)": "n_chars_emitted"})
    )

    def base_partial(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.groupby("source", as_index=False).agg(n_docs=("source", "size"))

    base = (
        ds.map_batches(base_partial, batch_format="pandas")
        .groupby("source")
        .sum("n_docs")
        .to_pandas()
        .rename(columns={"sum(n_docs)": "n_docs"})
    )
    base["weight_micro"] = source_weight_micro(base["source"].to_list())
    out = base.merge(
        mixed[["source", "n_emitted", "n_chars_emitted"]], on="source", how="left"
    )
    for c in ("n_emitted", "n_chars_emitted"):
        out[c] = out[c].fillna(0).astype(np.int64)
    cols = ["source", "weight_micro", "n_docs", "n_emitted", "n_chars_emitted"]
    out = out[cols].sort_values("source").reset_index(drop=True)
    out["source"] = out["source"].astype(str)
    return out.astype({c: "int64" for c in cols[1:]})


def temperature_mix(sf_dir: str, budget: int | None = None) -> pd.DataFrame:
    """Temperature-based source mixing (the multilingual / GPT-3-style
    ``p_s ∝ n_s^α`` resampling with α = 0.5): small sources upsample,
    head sources downsample, total stays at ``budget`` docs (default: the
    corpus size) in expectation. Integer-exact contract: the α=0.5 weight
    is ``w_s = floor(sqrt(n_s))`` (the SQL-replayable integer surrogate —
    exact for any corpus below 2^52 docs per source) and the per-doc
    expected-epoch rate is ``rate_micro = B·w_s·1e6 // (Z·n_s)`` with
    ``Z = Σ w_s`` — one integer division, byte-reproducible in SQL.
    Per-doc repetitions use the shared md5 lottery (floor(rate) epochs
    plus one iff the doc's draw falls under frac(rate)) — a pure function
    of (source sizes, doc_id): resumable, shard-order-free,
    cluster-size-free.

    Scale shape: pass 1 reduces the corpus to a |sources|-row count table
    (per-batch partials → tiny groupby); rates compute on the driver from
    that sources-sized table and broadcast; pass 2 is the shuffle-free
    upsample emitting slim repeated rows (at production scale it feeds
    export_shards' partitioned writer), summarized by a ≤|sources|-row
    groupby. Columns: source, n_docs, rate_micro, n_emitted,
    n_chars_emitted."""
    import ray
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "n_chars"]
    )

    def base_partial(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.groupby("source", as_index=False).agg(n=("source", "size"))

    base = (
        ds.map_batches(base_partial, batch_format="pandas")
        .groupby("source")
        .sum("n")
        .to_pandas()
        .rename(columns={"sum(n)": "n_docs"})
        .sort_values("source")
        .reset_index(drop=True)
    )
    n_of = dict(zip(base["source"].astype(str), base["n_docs"].astype(int)))
    # floor(sqrt(double)) — the exact expression the SQL oracle evaluates
    w_of = {s: int(np.floor(np.sqrt(float(n)))) for s, n in n_of.items()}
    Z = sum(w_of.values())
    B = int(budget) if budget is not None else int(sum(n_of.values()))
    rate_of = {s: (B * w_of[s] * MIX_MOD) // (Z * n_of[s]) for s in n_of}
    rate_ref = ray.put(rate_of)

    def upsample(batch: pa.Table) -> pa.Table:
        rates = ray.get(rate_ref)
        src = batch["source"].to_pylist()
        r = np.fromiter((rates[s] for s in src), dtype=np.int64, count=len(src))
        draw = _md5_u32(batch["doc_id"].to_pylist()) % MIX_MOD
        reps = r // MIX_MOD + (draw < r % MIX_MOD)
        idx = np.repeat(np.arange(len(reps)), reps)
        return pa.table({
            "source": batch["source"].take(pa.array(idx)),
            "n_chars": pa.array(
                batch["n_chars"].to_numpy().astype(np.int64)[idx], type=pa.int64()
            ),
        })

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.groupby("source", as_index=False).agg(
            n_emitted=("n_chars", "size"), n_chars_emitted=("n_chars", "sum")
        )

    mixed = (
        ds.map_batches(upsample, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(partial, batch_format="pandas")
        .groupby("source")
        .sum(["n_emitted", "n_chars_emitted"])
        .to_pandas()
        .rename(columns={"sum(n_emitted)": "n_emitted",
                         "sum(n_chars_emitted)": "n_chars_emitted"})
    )
    out = base.merge(mixed, on="source", how="left")
    out["rate_micro"] = out["source"].astype(str).map(rate_of)
    for c in ("n_emitted", "n_chars_emitted"):
        out[c] = out[c].fillna(0).astype(np.int64)
    cols = ["source", "n_docs", "rate_micro", "n_emitted", "n_chars_emitted"]
    out = out[cols].sort_values("source").reset_index(drop=True)
    out["source"] = out["source"].astype(str)
    return out.astype({c: "int64" for c in cols[1:]})


def _shards_fingerprint(src: str) -> str:
    """(size, mtime_ns) digest of the source parquet — a regenerated corpus
    at the same path must invalidate a cached shard export (the ann.py
    _source_fingerprint hazard)."""
    import os

    st = os.stat(src)
    return hashlib.md5(f"{os.path.abspath(src)}|{st.st_size}|{st.st_mtime_ns}".encode()).hexdigest()


def export_shards(sf_dir: str, n_shards: int = 8, out_root: str | None = None) -> pd.DataFrame:
    """Deterministic training-shard export: shard_id = md5(doc_id)
    first-8-hex mod n_shards — a pure function of the key, so a re-run (or a
    resumed run on a different cluster size) assigns every doc identically
    and can skip finished partitions. The engine WRITES the corpus as
    hive-partitioned parquet (one directory per shard — never one giant
    file) via Ray's partitioned sink, cached per (source fingerprint,
    n_shards) behind the pipelines flock, then summarizes the WRITTEN
    artifact by reading it back — the returned counts prove the sink
    round-trips, not merely that the plan was computed.

    Columns: shard_id, n_docs, n_chars, key_checksum
    (Σ (md5(doc_id) mod CHECK_PRIME) per shard, exact BIGINT)."""
    import json
    import os

    import ray.data as rd

    from engine.pipelines import _index_lock

    src = f"{sf_dir}/documents.parquet"
    fp = _shards_fingerprint(src)
    root = out_root or os.path.join(
        os.environ.get("GRAFT_TMP", "/tmp"), "graft_shards"
    )
    out_dir = os.path.join(root, f"{fp}_n{n_shards}")
    # sibling, not inside out_dir: the shard tree must stay pure parquet so
    # read_parquet(out_dir) needs no file filtering
    meta_path = f"{out_dir}.meta.json"

    with _index_lock(out_dir):
        ok = False
        try:
            with open(meta_path) as f:
                ok = json.load(f) == {"fingerprint": fp, "n_shards": n_shards}
        except (OSError, ValueError):
            ok = False
        if not ok:
            import shutil

            shutil.rmtree(out_dir, ignore_errors=True)
            ds = rd.read_parquet(src, columns=["doc_id", "source", "n_chars", "text"])

            def assign(batch: pa.Table) -> pa.Table:
                h = _md5_u32(batch["doc_id"].to_pylist())
                return batch.append_column(
                    "shard_id", pa.array(h % n_shards, type=pa.int64())
                )

            ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True
                           ).write_parquet(out_dir, partition_cols=["shard_id"])
            with open(meta_path, "w") as f:
                json.dump({"fingerprint": fp, "n_shards": n_shards}, f)

    back = rd.read_parquet(out_dir, columns=["doc_id", "n_chars", "shard_id"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch.copy()
        b["shard_id"] = b["shard_id"].astype(np.int64)
        b["key_checksum"] = _md5_u32(b["doc_id"]) % CHECK_PRIME
        return b.groupby("shard_id", as_index=False).agg(
            n_docs=("doc_id", "size"),
            n_chars=("n_chars", "sum"),
            key_checksum=("key_checksum", "sum"),
        )

    out = (
        back.map_batches(partial, batch_format="pandas")
        .groupby("shard_id")
        .sum(["n_docs", "n_chars", "key_checksum"])
        .to_pandas()
        .rename(columns={f"sum({c})": c for c in ("n_docs", "n_chars", "key_checksum")})
    )
    cols = ["shard_id", "n_docs", "n_chars", "key_checksum"]
    return (out[cols].sort_values("shard_id").reset_index(drop=True)
            .astype({c: "int64" for c in cols}))
