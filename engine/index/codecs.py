"""Posting-list compression codecs (SURVEY.md §2.3-F3/F4/F5).

Delta-encoded, varint/PForDelta-compressed posting lists (BASELINE.json:6).
All hot loops are NumPy-vectorised; no per-value Python in encode or decode.

Block format (one term = a sequence of fixed-size blocks of BLOCK_SIZE docs,
last block ragged). Per block, three integer streams are packed:

    gaps[i]  = doc_key[i] - doc_key[i-1]   (gaps[0] = doc_key[0] - base)
    tfm1[i]  = tf[i] - 1                   (tf >= 1 always)
    dl[i]    = document length of doc i    (scoring is segment-local; see
                                            SURVEY §2.4-A1 — no docmap lookup
                                            in the hot path)

Each stream is PForDelta-compressed: a frame width ``b`` covers most values;
values needing more bits are *patched* — their low ``b`` bits stay in the
frame, the exceptions' positions and high bits are varint-appended. The width
is chosen per stream to minimise encoded size. A stream whose values are all
equal (common for tf=1 runs) packs to width 0 + no exceptions = header only.

Wire layout per block:
    u8  n_minus_1        (number of docs in block - 1; 1..=BLOCK_SIZE)
    for each of the 3 streams:
        u8  width        (0..=64)
        u16 n_exceptions
        ceil(n*width/8) bytes of little-endian bit-packed low bits
        varint positions (delta-encoded) then varint high bits for exceptions
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128


# ---------------------------------------------------------------------------
# varint (LEB128) — vectorised
# ---------------------------------------------------------------------------

# value-v needs ceil(bit_length(v)/7) LEB128 bytes; thresholds are 2^7k
_VARINT_THRESH = (np.uint64(1) << (np.uint64(7) * np.arange(1, 10, dtype=np.uint64)))


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode a uint64 array. Vectorised: loops over byte slots (<=10),
    not over values."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    # byte count per value in ONE searchsorted pass (not a 10-iteration loop)
    nbytes = np.searchsorted(_VARINT_THRESH, v, side="right").astype(np.int64) + 1
    total = int(nbytes.sum())
    out = np.zeros(total, dtype=np.uint8)
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    shifted = v.copy()
    max_len = int(nbytes.max())
    for slot in range(max_len):
        active = nbytes > slot
        pos = starts[active] + slot
        byte = (shifted[active] & np.uint64(0x7F)).astype(np.uint8)
        cont = (nbytes[active] - 1 > slot).astype(np.uint8) << 7
        out[pos] = byte | cont
        shifted[active] >>= np.uint64(7)
    return out.tobytes()


def varint_decode(buf: bytes | memoryview, n: int, offset: int = 0) -> tuple[np.ndarray, int]:
    """Decode ``n`` LEB128 values starting at ``offset``. Returns (values,
    next_offset). Vectorised over terminator positions."""
    if n == 0:
        return np.empty(0, dtype=np.uint64), offset
    # a value is <= 10 bytes, so scan at most n*10 bytes — scanning the whole
    # remaining buffer would make per-block decode O(list size) (quadratic)
    raw = np.frombuffer(buf, dtype=np.uint8, offset=offset, count=min(n * 10, len(buf) - offset))
    is_term = raw < 0x80
    term_pos = np.nonzero(is_term)[0]
    if term_pos.size < n:
        raise ValueError("varint stream truncated")
    ends = term_pos[:n]  # inclusive end byte of each value
    starts = np.empty(n, dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lengths = ends - starts + 1
    vals = np.zeros(n, dtype=np.uint64)
    max_len = int(lengths.max())
    for slot in range(max_len):
        active = lengths > slot
        b = raw[starts[active] + slot].astype(np.uint64) & np.uint64(0x7F)
        vals[active] |= b << np.uint64(7 * slot)
    return vals, offset + int(ends[n - 1]) + 1


# ---------------------------------------------------------------------------
# fixed-width bit packing — vectorised via unpackbits/packbits
# ---------------------------------------------------------------------------

def pack_bits(values: np.ndarray, width: int) -> bytes:
    """Pack uint64 values into ``width`` bits each, little-endian bit order."""
    if width == 0 or values.size == 0:
        return b""
    v = np.asarray(values, dtype=np.uint64)
    bits = ((v[:, None] >> np.arange(width, dtype=np.uint64)) & np.uint64(1)).astype(np.uint8)
    return np.packbits(bits.reshape(-1), bitorder="little").tobytes()


def _gather_bits(raw: np.ndarray, n: int, width: int, bit0: int = 0) -> np.ndarray:
    """Decode n fixed-width little-endian bit fields starting at ``bit0``
    via unaligned 8-byte gathers — 3 vector ops, no per-bit matrix.
    Requires width <= 57 (value + 7-bit misalignment fits in one u64)."""
    starts = bit0 + np.arange(n, dtype=np.int64) * width
    byte_idx = starts >> 3
    shift = (starts & 7).astype(np.uint64)
    need = int(byte_idx[-1]) + 8 if n else 0
    if raw.size < need:
        raw = np.concatenate([raw, np.zeros(need - raw.size, dtype=np.uint8)])
    win = np.lib.stride_tricks.sliding_window_view(raw, 8)[byte_idx]
    words = np.ascontiguousarray(win).view("<u8").ravel()
    mask = np.uint64((1 << width) - 1)
    return (words >> shift) & mask


def unpack_bits(buf: bytes | memoryview, n: int, width: int, offset: int = 0) -> tuple[np.ndarray, int]:
    if width == 0 or n == 0:
        return np.zeros(n, dtype=np.uint64), offset
    nbytes = (n * width + 7) // 8
    if width <= 57:
        raw = np.frombuffer(buf, dtype=np.uint8, offset=offset, count=min(nbytes + 8, len(buf) - offset))
        return _gather_bits(raw, n, width), offset + nbytes
    raw = np.frombuffer(buf, dtype=np.uint8, offset=offset)[:nbytes]
    bits = np.unpackbits(raw, count=n * width, bitorder="little").reshape(n, width)
    vals = (bits.astype(np.uint64) << np.arange(width, dtype=np.uint64)).sum(axis=1, dtype=np.uint64)
    return vals, offset + nbytes


# ---------------------------------------------------------------------------
# PForDelta stream codec
# ---------------------------------------------------------------------------

_POW2 = np.uint64(1) << np.arange(64, dtype=np.uint64)


def _bit_width(x: np.ndarray) -> np.ndarray:
    """bits needed per value (0 for value 0) — one searchsorted against the
    64 powers of two (the former shift-until-zero loop was 64 full-array
    passes and dominated encode time)."""
    return np.searchsorted(_POW2, np.asarray(x, dtype=np.uint64), side="right").astype(np.int64)


def _choose_frame(values: np.ndarray) -> tuple[int, int, bytes, bytes]:
    """Shared PFor frame selection: pick the width b minimising
    frame + exception cost (argmin takes the first/smallest b at equal
    cost), then split into packed low bits and varint exception bytes.
    Returns (b, n_exc, frame, exc_bytes) — the single copy of the cost
    model both the per-block and whole-stream codecs encode with."""
    v = np.asarray(values, dtype=np.uint64)
    n = v.size
    widths = _bit_width(v)
    max_w = int(widths.max()) if n else 0
    hist = np.bincount(widths, minlength=max_w + 1)
    n_above = n - np.cumsum(hist)  # n_above[b] = #values needing > b bits
    bs = np.arange(max_w + 1)
    b = int(np.argmin(n * bs + n_above[bs] * 16))
    mask = np.uint64((1 << b) - 1) if b else np.uint64(0)
    low = v & mask if b else np.zeros(n, dtype=np.uint64)
    exc_idx = np.nonzero(widths > b)[0]
    frame = pack_bits(low, b)
    if exc_idx.size:
        pos_delta = np.diff(exc_idx, prepend=0).astype(np.uint64)
        high = v[exc_idx] >> np.uint64(b)
        exc_bytes = varint_encode(pos_delta) + varint_encode(high)
    else:
        exc_bytes = b""
    return b, int(exc_idx.size), frame, exc_bytes


def pfor_encode(values: np.ndarray) -> bytes:
    """Patched frame-of-reference encode of one stream (<= 2^16 values)."""
    b, n_exc, frame, exc_bytes = _choose_frame(values)
    return bytes([b]) + n_exc.to_bytes(2, "little") + frame + exc_bytes


def pfor_decode(buf: bytes | memoryview, n: int, offset: int = 0) -> tuple[np.ndarray, int]:
    mv = memoryview(buf)
    b = mv[offset]
    n_exc = int.from_bytes(mv[offset + 1 : offset + 3], "little")
    offset += 3
    vals, offset = unpack_bits(mv, n, b, offset)
    if n_exc:
        pos_delta, offset = varint_decode(mv, n_exc, offset)
        high, offset = varint_decode(mv, n_exc, offset)
        pos = np.cumsum(pos_delta).astype(np.int64)  # uint64 cumsum: fast path
        vals[pos] |= high << np.uint64(b)
    return vals, offset


# ---------------------------------------------------------------------------
# stream codec with u32 exception count (whole-term streams)
# ---------------------------------------------------------------------------


def pfor_stream_encode(values: np.ndarray) -> bytes:
    """PFor a whole stream: u8 width, u32 n_exc, u32 exc_nbytes, frame,
    exception position-deltas (varint), exception high bits (varint).

    ONE width per stream (not per 128-block): decode is a single
    unpack_bits + one varint pass, and block b's frame bits live at the
    fixed offset b*BLOCK_SIZE*width — O(1) random access for WAND skipping.
    """
    b, n_exc, frame, exc_bytes = _choose_frame(values)
    header = bytes([b]) + n_exc.to_bytes(4, "little") + len(exc_bytes).to_bytes(4, "little")
    return header + frame + exc_bytes


class StreamReader:
    """Parsed stream header + lazy frame/exception access (shared by full
    decode and per-block WAND access)."""

    __slots__ = ("buf", "n", "width", "n_exc", "frame_off", "exc_off", "end", "_exc")

    def __init__(self, buf, n: int, offset: int):
        mv = memoryview(buf)
        self.buf = mv
        self.n = n
        self.width = mv[offset]
        self.n_exc = int.from_bytes(mv[offset + 1 : offset + 5], "little")
        exc_nbytes = int.from_bytes(mv[offset + 5 : offset + 9], "little")
        self.frame_off = offset + 9
        self.exc_off = self.frame_off + (n * self.width + 7) // 8
        self.end = self.exc_off + exc_nbytes
        self._exc = None

    def exceptions(self):
        if self._exc is None:
            if self.n_exc:
                pos_delta, off = varint_decode(self.buf, self.n_exc, self.exc_off)
                high, _ = varint_decode(self.buf, self.n_exc, off)
                self._exc = (np.cumsum(pos_delta).astype(np.int64), high)
            else:
                self._exc = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.uint64))
        return self._exc

    def decode_all(self) -> np.ndarray:
        vals, _ = unpack_bits(self.buf, self.n, self.width, self.frame_off)
        pos, high = self.exceptions()
        if pos.size:
            vals[pos] |= high << np.uint64(self.width)
        return vals

    def decode_positions(self, pos: np.ndarray) -> np.ndarray:
        """Decode the values at SORTED positions ``pos`` in one vectorised
        gather (the bulk multi-block path: per-128-block decode_range loops
        cost ~150us of NumPy call overhead per block; this is one gather for
        ALL of a query's admitted blocks)."""
        n = pos.size
        if n == 0:
            return np.empty(0, dtype=np.uint64)
        w = self.width
        if w == 0:
            vals = np.zeros(n, dtype=np.uint64)
        elif w <= 57:
            bit_starts = (self.frame_off << 3) + pos.astype(np.int64) * w
            byte_idx = bit_starts >> 3
            shift = (bit_starts & 7).astype(np.uint64)
            need = int(byte_idx[-1]) + 8
            raw = np.frombuffer(self.buf, dtype=np.uint8, count=min(need, len(self.buf)))
            if raw.size < need:
                raw = np.concatenate([raw, np.zeros(need - raw.size, dtype=np.uint8)])
            win = np.lib.stride_tricks.sliding_window_view(raw, 8)[byte_idx]
            words = np.ascontiguousarray(win).view("<u8").ravel()
            vals = (words >> shift) & np.uint64((1 << w) - 1)
        else:  # rare wide frames: contiguous-run fallback
            vals = np.empty(n, dtype=np.uint64)
            runs = np.nonzero(np.diff(pos) != 1)[0] + 1
            for s, e in zip(np.concatenate(([0], runs)), np.concatenate((runs, [n]))):
                vals[s:e] = self.decode_range(int(pos[s]), int(pos[e - 1]) + 1)
            return vals
        epos, high = self.exceptions()
        if epos.size:
            ii = np.searchsorted(pos, epos)
            ok = ii < n
            ok[ok] = pos[ii[ok]] == epos[ok]
            if ok.any():
                vals[ii[ok]] |= high[ok] << np.uint64(w)
        return vals

    def decode_range(self, start: int, stop: int) -> np.ndarray:
        """Decode values [start, stop) — used for per-block WAND access.
        Frame bits for position p start at bit p*width; we byte-align by
        over-reading up to 7 bits."""
        stop = min(stop, self.n)
        count = stop - start
        if count <= 0:
            return np.empty(0, dtype=np.uint64)
        w = self.width
        if w == 0:
            vals = np.zeros(count, dtype=np.uint64)
        elif w <= 57:
            bit0 = start * w
            byte0 = self.frame_off + bit0 // 8
            nbytes = (bit0 % 8 + count * w + 7) // 8
            raw = np.frombuffer(
                self.buf, dtype=np.uint8, offset=byte0,
                count=min(nbytes + 8, len(self.buf) - byte0),
            )
            vals = _gather_bits(raw, count, w, bit0 % 8)
        else:
            bit0 = start * w
            byte0 = self.frame_off + bit0 // 8
            shift = bit0 % 8
            nbytes = (shift + count * w + 7) // 8
            raw = np.frombuffer(self.buf, dtype=np.uint8, offset=byte0, count=nbytes)
            bits = np.unpackbits(raw, bitorder="little")[shift : shift + count * w].reshape(count, w)
            vals = (bits.astype(np.uint64) << np.arange(w, dtype=np.uint64)).sum(axis=1, dtype=np.uint64)
        pos, high = self.exceptions()
        if pos.size:
            lo = int(np.searchsorted(pos, start))
            hi = int(np.searchsorted(pos, stop))
            if hi > lo:
                vals[pos[lo:hi] - start] |= high[lo:hi] << np.uint64(w)
        return vals


# ---------------------------------------------------------------------------
# term postings: stream-major (gaps | tf-1 | dl), one PFor stream each
# ---------------------------------------------------------------------------


SKIP_DTYPE = np.dtype(
    [
        ("block_idx", "<i4"),
        ("last_doc_key", "<i8"),
        ("n_docs", "<i4"),
        ("block_max_tf", "<i4"),
        ("block_min_dl", "<i4"),
    ]
)


def encode_term_postings(doc_keys: np.ndarray, tfs: np.ndarray, dls: np.ndarray, base: int = -1):
    """Whole-term encode → (bytes, skips). Skips: structured array, one row
    per BLOCK_SIZE docs: (block_idx, last_doc_key, n_docs, max_tf, min_dl) —
    block-max metadata for WAND; frame offsets are implicit (fixed width per
    stream). Rows unpack like tuples. Built with reduceat, not a per-block
    Python loop."""
    doc_keys = np.asarray(doc_keys, dtype=np.int64)
    n = doc_keys.size
    gaps = np.diff(doc_keys, prepend=base).astype(np.uint64)
    blob = (
        pfor_stream_encode(gaps)
        + pfor_stream_encode(np.asarray(tfs, dtype=np.uint64) - np.uint64(1))
        + pfor_stream_encode(np.asarray(dls, dtype=np.uint64))
    )
    tfs = np.asarray(tfs)
    dls = np.asarray(dls)
    n_blocks = (n + BLOCK_SIZE - 1) // BLOCK_SIZE
    starts = np.arange(n_blocks, dtype=np.int64) * BLOCK_SIZE
    last_idx = np.minimum(starts + BLOCK_SIZE, n) - 1
    skips = np.empty(n_blocks, dtype=SKIP_DTYPE)
    skips["block_idx"] = np.arange(n_blocks, dtype=np.int32)
    skips["last_doc_key"] = doc_keys[last_idx]
    skips["n_docs"] = (last_idx - starts + 1).astype(np.int32)
    skips["block_max_tf"] = np.maximum.reduceat(tfs, starts)
    skips["block_min_dl"] = np.minimum.reduceat(dls, starts)
    return blob, skips


class TermPostings:
    """Lazy reader over one term's encoded postings."""

    def __init__(self, buf, n_docs: int, base: int = -1):
        self.n = n_docs
        self.base = base
        self.gaps = StreamReader(buf, n_docs, 0)
        self.tfm1 = StreamReader(buf, n_docs, self.gaps.end)
        self.dls = StreamReader(buf, n_docs, self.tfm1.end)

    def decode_all(self):
        dk = np.cumsum(self.gaps.decode_all()).astype(np.int64) + self.base
        tf = (self.tfm1.decode_all() + np.uint64(1)).astype(np.int32)
        dl = self.dls.decode_all().astype(np.int32)
        return dk, tf, dl

    def decode_tfdl(self):
        """tf+dl streams only — enough to compute BM25 weights without the
        gap decode + cumsum (used for the sortless θ bootstrap)."""
        tf = (self.tfm1.decode_all() + np.uint64(1)).astype(np.int32)
        dl = self.dls.decode_all().astype(np.int32)
        return tf, dl

    def decode_keys(self):
        return np.cumsum(self.gaps.decode_all()).astype(np.int64) + self.base

    def decode_block(self, block_idx: int, block_base: int):
        """Decode one BLOCK_SIZE block given the previous block's last
        doc_key (from the skip table)."""
        s = block_idx * BLOCK_SIZE
        e = min(s + BLOCK_SIZE, self.n)
        dk = np.cumsum(self.gaps.decode_range(s, e)).astype(np.int64) + block_base
        tf = (self.tfm1.decode_range(s, e) + np.uint64(1)).astype(np.int32)
        dl = self.dls.decode_range(s, e).astype(np.int32)
        return dk, tf, dl

    def decode_blocks(self, blocks: np.ndarray, bases: np.ndarray):
        """Decode MANY blocks in one vectorised pass → (doc_keys, tfs, dls)
        concatenated in block order, plus the flat posting positions.
        ``blocks`` sorted unique block indices; ``bases[i]`` = previous
        block's last doc_key (-1 for block 0). One bit-gather per stream for
        ALL blocks — the per-block loop was the query-path hot spot."""
        blocks = np.asarray(blocks, dtype=np.int64)
        starts = blocks * BLOCK_SIZE
        ends = np.minimum(starts + BLOCK_SIZE, self.n)
        counts = ends - starts
        total = int(counts.sum())
        cend = np.cumsum(counts)
        cstart = cend - counts
        pos = (
            np.arange(total, dtype=np.int64)
            - np.repeat(cstart, counts)
            + np.repeat(starts, counts)
        )
        g = self.gaps.decode_positions(pos)
        cs = np.cumsum(g.astype(np.int64))
        pre = np.zeros(blocks.size, dtype=np.int64)
        pre[1:] = cs[cstart[1:] - 1]
        dk = cs - np.repeat(pre, counts) + np.repeat(np.asarray(bases, dtype=np.int64), counts)
        tf = (self.tfm1.decode_positions(pos) + np.uint64(1)).astype(np.int32)
        dl = self.dls.decode_positions(pos).astype(np.int32)
        return dk, tf, dl, pos


def decode_term_postings(buf, n_docs: int, base: int = -1):
    return TermPostings(buf, n_docs, base).decode_all()


# ---------------------------------------------------------------------------
# whole-segment bulk decode — vectorised ACROSS terms (the merge hot path)
# ---------------------------------------------------------------------------


def _read_u32_gather(raw: np.ndarray, offs: np.ndarray) -> np.ndarray:
    """Little-endian u32 at each offset, via 4 byte gathers."""
    return (
        raw[offs].astype(np.int64)
        | (raw[offs + 1].astype(np.int64) << 8)
        | (raw[offs + 2].astype(np.int64) << 16)
        | (raw[offs + 3].astype(np.int64) << 24)
    )


def _decode_streams_multi(raw: np.ndarray, offs: np.ndarray, ns: np.ndarray):
    """Decode ONE logical stream (gaps | tfm1 | dls) for MANY terms at once.

    ``offs[t]`` is term t's stream-header offset, ``ns[t]`` its value count.
    Returns (values concatenated in term order, next-stream offsets).
    Per-term decode cost collapses from ~10 NumPy calls to one bit-gather
    per DISTINCT frame width (<=64) over all terms — this is what makes the
    tiered merge scale (engine/index/merge.py; the per-term path was 54 us
    per varint_decode call on tiny run-segment lists)."""
    widths = raw[offs].astype(np.int64)
    n_exc = _read_u32_gather(raw, offs + 1)
    exc_nb = _read_u32_gather(raw, offs + 5)
    frame_off = offs + 9
    frame_nbytes = (ns * widths + 7) >> 3
    next_off = frame_off + frame_nbytes + exc_nb
    total = int(ns.sum())
    out = np.zeros(total, dtype=np.uint64)
    ends = np.cumsum(ns)
    starts = ends - ns
    within = np.arange(total, dtype=np.int64) - np.repeat(starts, ns)
    w_per_val = np.repeat(widths, ns)
    bit_starts = np.repeat(frame_off << 3, ns) + within * w_per_val
    for w in np.unique(widths):
        w = int(w)
        if w == 0:
            continue
        sel = np.nonzero(w_per_val == w)[0]
        bs = bit_starts[sel]
        if w <= 57:
            byte_idx = bs >> 3
            shift = (bs & 7).astype(np.uint64)
            win = np.lib.stride_tricks.sliding_window_view(raw, 8)[byte_idx]
            words = np.ascontiguousarray(win).view("<u8").ravel()
            out[sel] = (words >> shift) & np.uint64((1 << w) - 1)
        else:  # rare wide frames: per-term fallback
            for t in np.nonzero(widths == w)[0]:
                vals, _ = unpack_bits(raw, int(ns[t]), w, int(frame_off[t]))
                out[starts[t] : ends[t]] = vals
    for t in np.nonzero(n_exc > 0)[0]:
        o = int(frame_off[t] + frame_nbytes[t])
        pos_delta, o = varint_decode(raw, int(n_exc[t]), o)
        high, _ = varint_decode(raw, int(n_exc[t]), o)
        pos = np.cumsum(pos_delta).astype(np.int64) + starts[t]
        out[pos] |= high << np.uint64(widths[t])
    return out, next_off


def decode_segment_postings(
    buf, offsets: np.ndarray, dfs: np.ndarray, base: int = -1, *, padded: bool = False
):
    """Bulk-decode EVERY term's postings of a segment blob in one vectorised
    pass → (doc_keys:int64, tfs:int32, dls:int32), concatenated in dict/term
    order (term t owns rows [cumsum(dfs)[t-1] : cumsum(dfs)[t]]).

    ``padded=True`` promises ≥8 slack bytes after the last stream (segments
    written with the postings.bin tail pad, engine/io/segment_sink.py):
    the bit-unpack gather then runs zero-copy over the mmap. Unpadded
    buffers (legacy segments, raw codec tests) pay one blob copy to append
    the pad — on the merge hot path that copy doubled per-task RSS.

    Bit-identical to per-term ``decode_term_postings`` (tests/test_codecs.py).
    """
    offsets = np.asarray(offsets, dtype=np.int64)
    dfs = np.asarray(dfs, dtype=np.int64)
    keep = dfs > 0
    if not keep.all():
        offsets, dfs = offsets[keep], dfs[keep]
    if dfs.size == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z.astype(np.int32), z.astype(np.int32)
    raw = np.frombuffer(buf, dtype=np.uint8)
    if not padded:
        raw = np.concatenate([raw, np.zeros(8, dtype=np.uint8)])  # gather overrun pad
    gaps, off2 = _decode_streams_multi(raw, offsets, dfs)
    tfm1, off3 = _decode_streams_multi(raw, off2, dfs)
    dls, _ = _decode_streams_multi(raw, off3, dfs)
    ends = np.cumsum(dfs)
    starts = ends - dfs
    cs = np.cumsum(gaps.astype(np.int64))
    term_base = np.zeros(dfs.size, dtype=np.int64)
    term_base[1:] = cs[starts[1:] - 1]
    dk = cs - np.repeat(term_base, dfs) + base
    return dk, (tfm1 + np.uint64(1)).astype(np.int32), dls.astype(np.int32)


# ---------------------------------------------------------------------------
# legacy per-block format (kept for the codec test-bed; the index uses the
# stream-major format above)
# ---------------------------------------------------------------------------

def encode_block(doc_keys: np.ndarray, tfs: np.ndarray, dls: np.ndarray, base: int) -> bytes:
    """Encode one block of <= BLOCK_SIZE postings. ``doc_keys`` must be
    strictly increasing; ``base`` is the previous block's last doc_key (or
    the term's base for the first block)."""
    n = doc_keys.size
    assert 1 <= n <= BLOCK_SIZE
    gaps = np.diff(np.asarray(doc_keys, dtype=np.int64), prepend=base).astype(np.uint64)
    body = (
        pfor_encode(gaps)
        + pfor_encode(np.asarray(tfs, dtype=np.uint64) - np.uint64(1))
        + pfor_encode(np.asarray(dls, dtype=np.uint64))
    )
    return bytes([n - 1]) + body


def decode_block(buf: bytes | memoryview, base: int, offset: int = 0):
    """Returns (doc_keys:int64, tfs:int32, dls:int32, next_offset)."""
    mv = memoryview(buf)
    n = mv[offset] + 1
    offset += 1
    gaps, offset = pfor_decode(mv, n, offset)
    tfm1, offset = pfor_decode(mv, n, offset)
    dls, offset = pfor_decode(mv, n, offset)
    doc_keys = np.cumsum(gaps).astype(np.int64) + base  # uint64 cumsum: fast path
    return doc_keys, (tfm1 + np.uint64(1)).astype(np.int32), dls.astype(np.int32), offset


def encode_posting_list(doc_keys: np.ndarray, tfs: np.ndarray, dls: np.ndarray, base: int = -1):
    """Full term encode → (bytes, skip rows). Skip row per block:
    (block_idx, last_doc_key, rel_offset, nbytes, n_docs, max_tf, min_dl)."""
    out = []
    skips = []
    off = 0
    prev = base
    n = doc_keys.size
    for s in range(0, n, BLOCK_SIZE):
        e = min(s + BLOCK_SIZE, n)
        blk = encode_block(doc_keys[s:e], tfs[s:e], dls[s:e], prev)
        skips.append(
            (
                s // BLOCK_SIZE,
                int(doc_keys[e - 1]),
                off,
                len(blk),
                e - s,
                int(tfs[s:e].max()),
                int(dls[s:e].min()),
            )
        )
        out.append(blk)
        off += len(blk)
        prev = int(doc_keys[e - 1])
    return b"".join(out), skips


def decode_posting_list(buf: bytes | memoryview, n_docs: int, base: int = -1):
    """Decode a whole term's posting list."""
    keys, tfs, dls = [], [], []
    offset = 0
    prev = base
    remaining = n_docs
    while remaining > 0:
        k, t, d, offset = decode_block(buf, prev, offset)
        keys.append(k)
        tfs.append(t)
        dls.append(d)
        prev = int(k[-1])
        remaining -= k.size
    return np.concatenate(keys), np.concatenate(tfs), np.concatenate(dls)
