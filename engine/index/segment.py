"""Segment reader (SURVEY.md §2.1-S6): open a persisted segment — dict +
skips as Arrow/NumPy, postings.bin memory-mapped. Used inside SegmentServer
actors (state loaded once per actor, SURVEY.md §2.4-A1)."""

from __future__ import annotations

import json
import mmap
import os

import numpy as np
import pyarrow.parquet as pq

from engine.index import codecs


class PostingLRU:
    """Value-count-budgeted LRU for decoded postings / weights. One per
    SegmentServer actor, shared across its segments: Zipfian query streams
    re-hit the same head terms constantly, and re-decoding a multi-million
    posting list per query dominates query cost without it."""

    def __init__(self, max_values: int):
        from collections import OrderedDict

        self.od: "OrderedDict[tuple, tuple]" = OrderedDict()
        self.nvals = 0
        self.max = max_values

    def get(self, key):
        v = self.od.get(key)
        if v is not None:
            self.od.move_to_end(key)
            return v[0]
        return None

    def put(self, key, value, nvals: int):
        if key in self.od:
            self.nvals -= self.od[key][1]
        self.od[key] = (value, nvals)
        self.nvals += nvals
        while self.nvals > self.max and len(self.od) > 1:
            _, (_, n) = self.od.popitem(last=False)
            self.nvals -= n


class Segment:
    def __init__(self, path: str):
        # caches are attached by the owning SegmentServer (shared, budgeted)
        self.pcache: PostingLRU | None = None
        self.wcache: PostingLRU | None = None
        self._kth_cache: dict[tuple, float] = {}
        self.path = path
        d = pq.read_table(os.path.join(path, "dict.parquet"))
        # terms are written sorted ascending → binary search lookup
        self.terms = np.asarray(d["term"].to_pandas(), dtype=object)
        self.df = d["df"].to_numpy()
        self.cf = d["cf"].to_numpy()
        self.n_blocks = d["n_blocks"].to_numpy()
        self.offsets = d["offset"].to_numpy()
        self.nbytes = d["nbytes"].to_numpy()
        self.max_tf = d["max_tf"].to_numpy()
        with open(os.path.join(path, "meta.json")) as f:
            self.meta = json.load(f)
        f = open(os.path.join(path, "postings.bin"), "rb")
        self._file = f
        size = os.fstat(f.fileno()).st_size
        self._mm = mmap.mmap(f.fileno(), size, access=mmap.ACCESS_READ) if size else b""
        self._skips = None  # lazy

    @property
    def skips(self):
        if self._skips is None:
            t = pq.read_table(os.path.join(self.path, "skips.parquet"))
            # materialise columns to NumPy ONCE — term_skips is on the
            # per-query hot path and slices these as views
            self._skips = {c: t[c].to_numpy() for c in t.column_names}
        return self._skips

    def lookup(self, term: str) -> int:
        """Index into the dict arrays, or -1."""
        i = int(np.searchsorted(self.terms, term))
        if i < len(self.terms) and self.terms[i] == term:
            return i
        return -1

    def _term_blob(self, idx: int) -> memoryview:
        off = int(self.offsets[idx])
        return memoryview(self._mm)[off : off + int(self.nbytes[idx])]

    def read_postings(self, idx: int):
        """Decode the full posting list for dict entry ``idx`` →
        (doc_keys:int64, tfs:int32, dls:int32). LRU-cached when owned by a
        server."""
        if self.pcache is not None:
            key = (self.path, idx)
            hit = self.pcache.get(key)
            if hit is not None:
                return hit
        out = codecs.decode_term_postings(self._term_blob(idx), int(self.df[idx]))
        if self.pcache is not None:
            self.pcache.put(key, out, 2 * out[0].size)  # ~16B/posting
        return out

    def weights(self, idx: int, idf: float, avgdl: float) -> np.ndarray:
        """BM25 per-posting weights idf*tf_sat(tf, dl) — cached (idf and
        avgdl are constants for a server's lifetime).

        Decodes ONLY the tf/dl streams (via decode_tfdl) unless the full
        postings are already cached: the WAND θ-bootstrap and admission
        masks need weights for every list but doc keys only for survivors,
        so weights must never trigger the gap decode + cumsum."""
        if self.wcache is not None:
            key = (self.path, idx)
            hit = self.wcache.get(key)
            if hit is not None:
                return hit
        from engine.oracle.bm25 import tf_sat

        if self.pcache is not None and self.pcache.get((self.path, idx)) is not None:
            _, tf, dl = self.read_postings(idx)
        else:
            tf, dl = self.term_postings(idx).decode_tfdl()
        w = idf * tf_sat(tf, dl, avgdl)
        if self.wcache is not None:
            self.wcache.put(key, w, w.size)
        return w

    def read_all_postings(self):
        """Bulk-decode EVERY term's postings in one vectorised pass →
        (doc_keys, tfs, dls) concatenated in dict order; term t owns rows
        [cumsum(df)[t-1] : cumsum(df)[t]]. The merge path: per-term decode
        overhead dominated shard compaction (engine/index/merge.py)."""
        return codecs.decode_segment_postings(
            self._mm, self.offsets, self.df,
            padded=int(self.meta.get("pad_bytes", 0)) >= 8,
        )

    def term_postings(self, idx: int) -> codecs.TermPostings:
        """Lazy per-block reader (WAND path). Cached so the stream-exception
        tables decode once per (segment, term), not once per query."""
        if self.pcache is not None:
            key = (self.path, idx, "tp")
            hit = self.pcache.get(key)
            if hit is not None:
                return hit
        tp = codecs.TermPostings(self._term_blob(idx), int(self.df[idx]))
        if self.pcache is not None:
            # exceptions + header state only; frames stay in the mmap
            self.pcache.put(key, tp, max(64, int(self.df[idx]) // 16))
        return tp

    def kth_weight(self, idx: int, k: int, idf: float, avgdl: float) -> float:
        """k-th largest BM25 weight within this list — the sortless θ
        bootstrap value (engine/query/wand.py). Cached: it is a constant of
        (segment, term, k) for a server's lifetime."""
        key = (idx, k)
        hit = self._kth_cache.get(key)
        if hit is None:
            w = self.weights(idx, idf, avgdl)
            if w.size < k or k <= 0:
                hit = -np.inf
            else:
                hit = float(np.partition(w, w.size - k)[w.size - k])
            self._kth_cache[key] = hit
        return hit

    def term_skips(self, idx: int):
        """Skip rows (NumPy dict) for dict entry ``idx`` — block-max WAND
        metadata per 128-doc block."""
        sk = self.skips
        ti = sk["term_idx"]
        lo = int(np.searchsorted(ti, idx, side="left"))
        hi = int(np.searchsorted(ti, idx, side="right"))
        return {
            "last_doc_key": sk["last_doc_key"][lo:hi],
            "n_docs": sk["n_docs"][lo:hi],
            "block_max_tf": sk["block_max_tf"][lo:hi],
            "block_min_dl": sk["block_min_dl"][lo:hi],
        }

    def close(self):
        if getattr(self, "_mm", None) and not isinstance(self._mm, bytes):
            self._mm.close()
        if getattr(self, "_file", None):
            self._file.close()
