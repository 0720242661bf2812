"""Multimodal column operators — image/audio/video as opaque ``binary``
columns with typed metadata.

The Ray-side plumbing is REAL and tested: schema conventions, actor-pool
map_batches stages sized for large binary rows (small batch_size so
batch × concurrency fits worker heaps), deterministic partitioned output.
The codec kernels themselves are STUBS: the sandbox image/audio libraries
are not installed, so ``decoder="real"`` raises NotImplementedError at the
decode call and ``decoder="fake"`` substitutes a deterministic
header-parser stand-in (content-hash-derived features) that exercises the
identical dataflow.

Schema convention for a multimodal table:
    id:int64 | payload:binary | mime:string | meta:string (JSON)
"""

from __future__ import annotations

import hashlib
import json

import numpy as np
import pyarrow as pa


def synth_media_table(n: int, seed: int = 0) -> pa.Table:
    """Deterministic fake media corpus: payload = seeded pseudo-random bytes
    with a tiny structured header (width, height, channels)."""
    rng = np.random.default_rng(seed)
    ids, payloads, mimes, metas = [], [], [], []
    for i in range(n):
        w, h = int(rng.integers(16, 512)), int(rng.integers(16, 512))
        body = rng.integers(0, 256, size=int(rng.integers(100, 2000)), dtype=np.uint8)
        header = w.to_bytes(4, "little") + h.to_bytes(4, "little") + b"\x03"
        ids.append(i)
        payloads.append(header + body.tobytes())
        mimes.append("image/fake")
        metas.append(json.dumps({"source": f"synth-{seed}", "idx": i}))
    return pa.table(
        {
            "id": pa.array(ids, type=pa.int64()),
            "payload": pa.array(payloads, type=pa.binary()),
            "mime": pa.array(mimes, type=pa.string()),
            "meta": pa.array(metas, type=pa.string()),
        }
    )


class DecodeFeatures:
    """Actor-pool stage: payload → (width, height, channels, feature vector).

    decoder="real": the integration point for PIL/libav — NOT available in
    this environment; raises NotImplementedError with the exact dependency.
    decoder="fake": deterministic stand-in — parses the synthetic header and
    derives a 16-dim feature vector from a blake2b digest of the payload.
    """

    def __init__(self, decoder: str = "fake", feature_dim: int = 16):
        if decoder not in ("real", "fake"):
            raise ValueError(decoder)
        self.decoder = decoder
        self.feature_dim = feature_dim

    def _decode_real(self, payload: bytes, mime: str):
        raise NotImplementedError(
            "real media decode requires Pillow / pyav, not installed in this "
            "environment; run with decoder='fake' or install the codec libs"
        )

    def _decode_fake(self, payload: bytes, mime: str):
        w = int.from_bytes(payload[0:4], "little")
        h = int.from_bytes(payload[4:8], "little")
        c = payload[8]
        digest = hashlib.blake2b(payload, digest_size=self.feature_dim).digest()
        feat = (np.frombuffer(digest, dtype=np.uint8).astype(np.float32) / 255.0)
        return w, h, c, feat

    def __call__(self, batch: pa.Table) -> pa.Table:
        decode = self._decode_real if self.decoder == "real" else self._decode_fake
        ws, hs, cs, feats = [], [], [], []
        for payload, mime in zip(batch["payload"].to_pylist(), batch["mime"].to_pylist()):
            w, h, c, f = decode(payload, mime)
            ws.append(w)
            hs.append(h)
            cs.append(c)
            feats.append(f)
        return pa.table(
            {
                "id": batch["id"],
                "width": pa.array(ws, type=pa.int32()),
                "height": pa.array(hs, type=pa.int32()),
                "channels": pa.array(cs, type=pa.int32()),
                "features": pa.array(
                    [f.tolist() for f in feats], type=pa.list_(pa.float32())
                ),
            }
        )


def decode_features(ds, *, decoder: str = "fake", concurrency=(1, 4), batch_size: int = 64):
    """The multimodal map stage: SMALL batch_size (binary rows are big; a
    batch × pool must fit worker heaps — SURVEY 'memory-aware')."""
    return ds.map_batches(
        DecodeFeatures,
        fn_constructor_kwargs={"decoder": decoder},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )


def media_pipeline(n: int = 256, seed: int = 0, decoder: str = "fake"):
    """End-to-end demo pipeline: synth media → decode/extract → features."""
    import ray.data as rd

    ds = rd.from_arrow(synth_media_table(n, seed))
    return decode_features(ds, decoder=decoder)


class ByteMeta:
    """Actor-pool metadata extractor over an opaque ``payload:binary``
    column — the SQL-reproducible slice of the decode-stub (byte length +
    fake-decoder dimensions derived from it), vectorized with
    pyarrow.compute so no Python touches individual payloads."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        nb = pc.binary_length(batch["payload"]).to_numpy().astype(np.int64)
        return pa.table(
            {
                "doc_id": batch["id"],
                "n_bytes": pa.array(nb, type=pa.int64()),
                "width": pa.array(nb % 640, type=pa.int64()),
                "height": pa.array(nb % 480, type=pa.int64()),
            }
        )


def media_meta(sf_dir: str):
    """Driver-facing multimodal entry (oracle-checked): treat each
    document's text bytes as an opaque binary payload, run the actor-pool
    metadata/decode stage over the binary column (small batches — the
    memory-aware shape real image/audio payloads need), return per-payload
    metadata that DuckDB reproduces from octet_length. Columns: doc_id,
    n_bytes, width, height."""
    import pandas as pd
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def to_media(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "id": b["doc_id"].cast(pa.int64()),
                "payload": b["text"].cast(pa.binary()),  # zero-copy view
                "mime": pa.array(np.full(b.num_rows, "text/plain"), type=pa.string()),
            }
        )

    media = ds.map_batches(to_media, batch_format="pyarrow", zero_copy_batch=True)
    out = (
        media.map_batches(
            ByteMeta,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=64,
            concurrency=2,
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    return out.astype({c: "int64" for c in out.columns})
