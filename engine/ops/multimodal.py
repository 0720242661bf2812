"""Multimodal column operators — image/audio/video as opaque ``binary``
columns with typed metadata.

The Ray-side plumbing is REAL and tested: schema conventions, actor-pool
map_batches stages sized for large binary rows (small batch_size so
batch × concurrency fits worker heaps), deterministic partitioned output.
Codecs come in three tiers:
  - REAL, pure numpy/stdlib: uncompressed 24-bit BMP (decode → nearest
    resize → grid features; encode_bmp/decode_bmp below) and PCM16 WAV
    (decode → frame-sample → RMS/ZCR features; encode_wav/decode_wav) —
    both lossless-roundtrip tested.
  - ``decoder="fake"``: a deterministic header-parser stand-in
    (content-hash features) exercising the identical dataflow.
  - ``decoder="real"``: the integration point for compressed formats
    (JPEG/PNG/MP3/video) — Pillow/pyav are not installed in this sandbox,
    so it raises NotImplementedError naming the dependency.

Schema convention for a multimodal table:
    id:int64 | payload:binary | mime:string | meta:string (JSON)
"""

from __future__ import annotations

import hashlib
import json

import numpy as np
import pyarrow as pa

from engine.core.pool import default_pool


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


def decode_features(ds, *, decoder: str = "fake", concurrency=None, batch_size: int = 64):
    """The multimodal map stage: SMALL batch_size (binary rows are big; a
    batch × pool must fit worker heaps — SURVEY 'memory-aware')."""
    if concurrency is None:
        concurrency = default_pool()
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
            concurrency=default_pool(),
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    return out.astype({c: "int64" for c in out.columns})


# ---------------------------------------------------------------------------
# REAL codec: uncompressed 24-bit BMP, pure numpy/stdlib (no Pillow needed).
# One genuinely decodable format so the decode → resize → feature-extract
# dataflow runs on real image bytes end-to-end; other formats stay gated
# behind decoder="real" / NotImplementedError.
# ---------------------------------------------------------------------------

def encode_bmp(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → uncompressed 24-bit BMP bytes (bottom-up rows,
    BGR order, 4-byte row padding — the classic BITMAPINFOHEADER layout)."""
    h, w, c = img.shape
    assert c == 3 and img.dtype == np.uint8
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # flip + RGB→BGR
    pixel_bytes = rows.tobytes()
    off = 14 + 40
    import struct

    file_header = struct.pack("<2sIHHI", b"BM", off + len(pixel_bytes), 0, 0, off)
    info_header = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixel_bytes), 2835, 2835, 0, 0
    )
    return file_header + info_header + pixel_bytes


def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP bytes → (h, w, 3) uint8 RGB array."""
    import struct

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (off,) = struct.unpack_from("<I", payload, 10)
    hdr_size, w, h, _planes, bpp, comp = struct.unpack_from("<IiiHHI", payload, 14)
    if bpp != 24 or comp != 0:
        raise NotImplementedError(f"only uncompressed 24-bit BMP (got bpp={bpp}, comp={comp})")
    flip = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(payload, dtype=np.uint8, count=h * stride, offset=off)
    img = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR→RGB
    return img[::-1] if flip else img


def resize_nearest(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbour resize via integer index gather (pure numpy)."""
    h, w = img.shape[:2]
    yi = np.minimum((np.arange(out_h) * h) // out_h, h - 1)
    xi = np.minimum((np.arange(out_w) * w) // out_w, w - 1)
    return img[yi[:, None], xi[None, :]]


def bmp_features(cell: np.ndarray, grid: int = 2) -> np.ndarray:
    """Feature vector over an ALREADY-RESIZED square image whose side is a
    multiple of ``grid``: per-channel means of the grid×grid block partition
    → grid*grid*3 float32 values in [0, 1]. (No internal resize — the caller
    resizes exactly once.)"""
    side = cell.shape[0]
    assert cell.shape[1] == side and side % grid == 0, (cell.shape, grid)
    b = side // grid
    cf = cell.astype(np.float32) / 255.0
    # (grid, b, grid, b, 3) → mean over each block's pixels
    return (
        cf.reshape(grid, b, grid, b, 3).mean(axis=(1, 3)).reshape(-1).astype(np.float32)
    )


def synth_bmp_table(n: int, seed: int = 0) -> pa.Table:
    """Deterministic corpus of REAL BMP images (gradient + seeded noise)."""
    rng = np.random.default_rng(seed)
    ids, payloads, mimes, metas = [], [], [], []
    for i in range(n):
        w, h = int(rng.integers(8, 64)), int(rng.integers(8, 64))
        gx = np.linspace(0, 255, w, dtype=np.float32)[None, :, None]
        gy = np.linspace(0, 255, h, dtype=np.float32)[:, None, None]
        noise = rng.integers(0, 32, size=(h, w, 3)).astype(np.float32)
        img = np.clip(gx * 0.5 + gy * 0.5 + noise, 0, 255).astype(np.uint8)
        ids.append(i)
        payloads.append(encode_bmp(img))
        mimes.append("image/bmp")
        metas.append(json.dumps({"w": w, "h": h}))
    return pa.table(
        {
            "id": pa.array(ids, type=pa.int64()),
            "payload": pa.array(payloads, type=pa.binary()),
            "mime": pa.array(mimes, type=pa.string()),
            "meta": pa.array(metas, type=pa.string()),
        }
    )


class DecodeBMP:
    """Actor-pool stage over real BMP payloads: decode → resize (nearest,
    ``out_size``) → grid feature extraction. The working multimodal decode
    path; small batch_size keeps batch × pool inside worker heaps."""

    def __init__(self, out_size: int = 32, grid: int = 2):
        assert out_size % grid == 0, "out_size must be a multiple of grid"
        self.out_size = out_size
        self.grid = grid

    def __call__(self, batch: pa.Table) -> pa.Table:
        ws, hs, feats = [], [], []
        for payload in batch["payload"].to_pylist():
            img = decode_bmp(payload)
            hs.append(img.shape[0])
            ws.append(img.shape[1])
            # exactly ONE resize: features are block means over this image
            small = resize_nearest(img, self.out_size, self.out_size)
            feats.append(bmp_features(small, grid=self.grid))
        return pa.table(
            {
                "id": batch["id"],
                "width": pa.array(ws, type=pa.int32()),
                "height": pa.array(hs, type=pa.int32()),
                "channels": pa.array(np.full(len(ws), 3, dtype=np.int32)),
                "features": pa.array([f.tolist() for f in feats], type=pa.list_(pa.float32())),
            }
        )


def bmp_pipeline(n: int = 128, seed: int = 0, out_size: int = 32):
    """End-to-end REAL-image pipeline: synth BMPs → actor-pool decode/resize
    → features."""
    import ray.data as rd

    ds = rd.from_arrow(synth_bmp_table(n, seed))
    return ds.map_batches(
        DecodeBMP,
        fn_constructor_kwargs={"out_size": out_size},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=32,
        concurrency=default_pool(),
    )


# ---------------------------------------------------------------------------
# REAL audio codec: RIFF/WAVE PCM16, stdlib struct + numpy. Covers the
# frame-sample / feature-extract half of the multimodal contract with real
# bytes; compressed audio stays gated like the image formats.
# ---------------------------------------------------------------------------

def encode_wav(samples: np.ndarray, rate: int = 16_000) -> bytes:
    """(n,) int16 mono PCM → RIFF/WAVE bytes."""
    import struct

    assert samples.dtype == np.int16 and samples.ndim == 1
    data = samples.tobytes()
    fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 1, rate, rate * 2, 2, 16)
    hdr = struct.pack("<4sI4s", b"RIFF", 4 + len(fmt) + 8 + len(data), b"WAVE")
    return hdr + fmt + struct.pack("<4sI", b"data", len(data)) + data


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM16 mono bytes → (samples int16, sample_rate). Walks the
    chunk list so extra chunks (LIST/fact) don't break parsing."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAVE payload")
    pos, rate, data = 12, None, None
    while pos + 8 <= len(payload):
        cid, size = struct.unpack_from("<4sI", payload, pos)
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, channels, rate = struct.unpack_from("<HHI", body, 0)
            (bits,) = struct.unpack_from("<H", body, 14)
            if audio_fmt != 1 or channels != 1 or bits != 16:
                raise NotImplementedError(
                    f"only PCM16 mono WAV (fmt={audio_fmt}, ch={channels}, bits={bits})"
                )
        elif cid == b"data":
            data = np.frombuffer(body, dtype=np.int16)
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    return data, rate


def frame_sample(samples: np.ndarray, frame_len: int, hop: int) -> np.ndarray:
    """(n,) → (n_frames, frame_len) strided view (no copy): the audio/video
    frame-sampling primitive. The slice of a sliding_window_view is itself a
    view, so downstream reductions (RMS, ZCR) read the original buffer —
    heap cost stays O(input), not O(frames × frame_len)."""
    n = samples.size
    if n < frame_len:
        return samples[np.newaxis, :0].reshape(0, frame_len) if frame_len else samples[np.newaxis]
    return np.lib.stride_tricks.sliding_window_view(samples, frame_len)[::hop]


class DecodeWav:
    """Actor-pool stage over real WAV payloads: decode → frame-sample →
    per-frame RMS + zero-crossing-rate features, padded/truncated to a fixed
    ``n_frames`` so the output column is rectangular."""

    def __init__(self, frame_ms: int = 25, hop_ms: int = 10, n_frames: int = 16):
        self.frame_ms = frame_ms
        self.hop_ms = hop_ms
        self.n_frames = n_frames

    def _features(self, payload: bytes) -> tuple[int, int, np.ndarray]:
        samples, rate = decode_wav(payload)
        fl = max(1, rate * self.frame_ms // 1000)
        hop = max(1, rate * self.hop_ms // 1000)
        frames = frame_sample(samples, fl, hop).astype(np.float32) / 32768.0
        rms = np.sqrt((frames**2).mean(axis=1)) if frames.size else np.zeros(0, np.float32)
        zcr = (
            (np.diff(np.signbit(frames), axis=1) != 0).mean(axis=1).astype(np.float32)
            if frames.size
            else np.zeros(0, np.float32)
        )
        k = self.n_frames
        out = np.zeros(2 * k, dtype=np.float32)
        out[: min(k, rms.size)] = rms[:k]
        out[k : k + min(k, zcr.size)] = zcr[:k]
        return samples.size, rate, out

    def __call__(self, batch: pa.Table) -> pa.Table:
        ns, rates, feats = [], [], []
        for payload in batch["payload"].to_pylist():
            n, r, f = self._features(payload)
            ns.append(n)
            rates.append(r)
            feats.append(f)
        return pa.table(
            {
                "id": batch["id"],
                "n_samples": pa.array(ns, type=pa.int64()),
                "sample_rate": pa.array(rates, type=pa.int32()),
                "features": pa.array([f.tolist() for f in feats], type=pa.list_(pa.float32())),
            }
        )


def synth_wav_table(n: int, seed: int = 0, rate: int = 16_000) -> pa.Table:
    """Deterministic corpus of REAL WAV payloads (seeded sine + noise)."""
    rng = np.random.default_rng(seed)
    ids, payloads, mimes, metas = [], [], [], []
    for i in range(n):
        dur = float(rng.uniform(0.05, 0.4))
        t = np.arange(int(rate * dur)) / rate
        freq = float(rng.uniform(100, 2000))
        sig = 0.5 * np.sin(2 * np.pi * freq * t) + 0.05 * rng.standard_normal(t.size)
        samples = np.clip(sig * 32767, -32768, 32767).astype(np.int16)
        ids.append(i)
        payloads.append(encode_wav(samples, rate))
        mimes.append("audio/wav")
        metas.append(json.dumps({"n": int(samples.size), "rate": rate}))
    return pa.table(
        {
            "id": pa.array(ids, type=pa.int64()),
            "payload": pa.array(payloads, type=pa.binary()),
            "mime": pa.array(mimes, type=pa.string()),
            "meta": pa.array(metas, type=pa.string()),
        }
    )


def wav_pipeline(n: int = 128, seed: int = 0):
    """End-to-end REAL-audio pipeline: synth WAVs → actor-pool decode /
    frame-sample / feature-extract."""
    import ray.data as rd

    ds = rd.from_arrow(synth_wav_table(n, seed))
    return ds.map_batches(
        DecodeWav,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=32,
        concurrency=default_pool(),
    )


# ---------------------------------------------------------------------------
# REAL video codec: Y4M (YUV4MPEG2), uncompressed planar 4:4:4
# ---------------------------------------------------------------------------


def encode_y4m(frames: np.ndarray, fps: tuple[int, int] = (25, 1)) -> bytes:
    """(t, h, w, 3) uint8 YUV frames → YUV4MPEG2 bytes (C444 planar — the
    plain-text-header uncompressed video container mjpegtools defined and
    ffmpeg/mpv read natively)."""
    t, h, w, c = frames.shape
    assert c == 3 and frames.dtype == np.uint8
    head = f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 C444\n".encode()
    parts = [head]
    for i in range(t):
        # planar: full Y plane, then U, then V
        parts.append(b"FRAME\n")
        parts.append(frames[i].transpose(2, 0, 1).tobytes())
    return b"".join(parts)


def decode_y4m(payload: bytes) -> tuple[np.ndarray, tuple[int, int]]:
    """YUV4MPEG2 C444 bytes → ((t, h, w, 3) uint8 frames, (fps_num, den)).
    Parses the parameter header tag-by-tag; only C444 (and the implied
    default) planar layout is implemented — other samplings raise with the
    exact tag, the honest-gate convention of the BMP/WAV codecs."""
    nl = payload.index(b"\n")
    head = payload[:nl].decode()
    if not head.startswith("YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 payload")
    w = h = None
    fps = (25, 1)
    colour = "C444"
    for tag in head.split()[1:]:
        if tag[0] == "W":
            w = int(tag[1:])
        elif tag[0] == "H":
            h = int(tag[1:])
        elif tag[0] == "F":
            a, b = tag[1:].split(":")
            fps = (int(a), int(b))
        elif tag[0] == "C":
            colour = tag
    if w is None or h is None:
        raise ValueError("missing W/H in Y4M header")
    if colour != "C444":
        raise NotImplementedError(f"only C444 planar Y4M (got {colour})")
    frame_bytes = w * h * 3
    frames = []
    pos = nl + 1
    while pos < len(payload):
        fnl = payload.index(b"\n", pos)
        if payload[pos:pos + 5] != b"FRAME":
            raise ValueError("expected FRAME marker")
        body = payload[fnl + 1: fnl + 1 + frame_bytes]
        if len(body) < frame_bytes:
            raise ValueError("truncated frame")
        plane = np.frombuffer(body, dtype=np.uint8).reshape(3, h, w)
        frames.append(plane.transpose(1, 2, 0))
        pos = fnl + 1 + frame_bytes
    return np.stack(frames), fps


def synth_y4m_table(n: int, seed: int = 0) -> pa.Table:
    """Deterministic tiny Y4M corpus: moving-gradient frames so temporal
    motion energy is nonzero and frame-dependent."""
    rng = np.random.default_rng(seed)
    ids, payloads, metas = [], [], []
    for i in range(n):
        t = int(rng.integers(3, 9))
        h = int(rng.integers(8, 24))
        w = int(rng.integers(8, 24))
        base = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        frames = np.stack([np.roll(base, shift=k, axis=1) for k in range(t)])
        ids.append(i)
        payloads.append(encode_y4m(frames))
        metas.append(json.dumps({"t": t, "h": h, "w": w}))
    return pa.table({
        "id": pa.array(ids, type=pa.int64()),
        "payload": pa.array(payloads, type=pa.binary()),
        "mime": pa.array(["video/x-yuv4mpeg"] * n, type=pa.string()),
        "meta": pa.array(metas, type=pa.string()),
    })


class DecodeY4m:
    """Actor-pool stage over real Y4M payloads: decode → sample every
    ``stride``-th frame → per-video features: n_frames, mean luma of the
    sampled frames (micro), and temporal MOTION ENERGY = mean |Y_t − Y_{t-1}|
    over consecutive sampled frames (micro) — the shot-boundary / static-clip
    signal a video-curation pipeline filters on. Small batch_size: payloads
    are frames × h × w × 3 bytes, the batch × concurrency heap rule."""

    def __init__(self, stride: int = 2):
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, n_frames, luma, motion = [], [], [], []
        for i, payload in zip(batch["id"].to_pylist(), batch["payload"].to_pylist()):
            frames, _fps = decode_y4m(payload)
            sampled = frames[::self.stride].astype(np.int64)
            y = sampled[..., 0]
            m = (np.abs(np.diff(y, axis=0)).mean() if len(y) > 1 else 0.0)
            ids.append(i)
            n_frames.append(frames.shape[0])
            luma.append(int(np.floor(y.mean() / 255.0 * 1e6 + 0.5)))
            motion.append(int(np.floor(m / 255.0 * 1e6 + 0.5)))
        return pa.table({
            "id": pa.array(ids, type=pa.int64()),
            "n_frames": pa.array(n_frames, type=pa.int64()),
            "luma_micro": pa.array(luma, type=pa.int64()),
            "motion_micro": pa.array(motion, type=pa.int64()),
        })


def y4m_pipeline(n: int = 64, seed: int = 0):
    """End-to-end REAL-video pipeline: synth Y4M clips → actor-pool decode /
    frame-sample / temporal features."""
    import ray.data as rd

    ds = rd.from_arrow(synth_y4m_table(n, seed))
    return ds.map_batches(
        DecodeY4m,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=16,
        concurrency=default_pool(),
    )


Y4M_ORACLE_N = 64
Y4M_ORACLE_SEED = 5
Y4M_ORACLE_PATH = f"/tmp/engine_oracle/y4m_n{Y4M_ORACLE_N}_s{Y4M_ORACLE_SEED}_v1.parquet"


def y4m_oracle_corpus_path() -> str:
    """Materialize (idempotent, atomic) the deterministic Y4M clip corpus —
    real video bytes in a binary column plus ground-truth meta JSON. Pure
    pyarrow, callable from oracle_sql() without a Ray session."""
    import os

    import pyarrow.parquet as pq

    path = Y4M_ORACLE_PATH
    if not os.path.exists(path):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        t = synth_y4m_table(Y4M_ORACLE_N, seed=Y4M_ORACLE_SEED)
        tmp = f"{path}.tmp-{os.getpid()}"
        pq.write_table(t, tmp)
        os.replace(tmp, path)
    return path


def video_meta(sf_dir: str):
    """Driver-facing REAL-video entry (oracle-checked): decode every Y4M
    payload of the materialized clip corpus in the actor-pool stage and
    report (n_frames, h, w) FROM THE BYTES — DuckDB reproduces the same
    numbers from the ground-truth meta JSON written at synth time, so a
    hash match proves the codec reads real video frames correctly. The
    float-free decode columns only; luma/motion features are pytest-audited
    (no SQL can decode video). Columns: id, n_frames, h, w."""
    import pandas as pd
    import ray.data as rd

    path = y4m_oracle_corpus_path()

    class _Meta:
        def __call__(self, batch: pa.Table) -> pa.Table:
            ids, nf, hs, ws = [], [], [], []
            for i, payload in zip(batch["id"].to_pylist(),
                                  batch["payload"].to_pylist()):
                frames, _fps = decode_y4m(payload)
                ids.append(i)
                nf.append(frames.shape[0])
                hs.append(frames.shape[1])
                ws.append(frames.shape[2])
            return pa.table({
                "id": pa.array(ids, type=pa.int64()),
                "n_frames": pa.array(nf, type=pa.int64()),
                "h": pa.array(hs, type=pa.int64()),
                "w": pa.array(ws, type=pa.int64()),
            })

    out = (
        rd.read_parquet(path, columns=["id", "payload"])
        .map_batches(_Meta, batch_format="pyarrow", zero_copy_batch=True,
                     batch_size=16, concurrency=default_pool())
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    return out.astype("int64")
