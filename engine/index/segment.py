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


class Segment:
    def __init__(self, path: str, *, preload_skips: bool = False):
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
        (doc_keys:int64, tfs:int32, dls:int32)."""
        return codecs.decode_term_postings(self._term_blob(idx), int(self.df[idx]))

    def term_postings(self, idx: int) -> codecs.TermPostings:
        """Lazy per-block reader (WAND path)."""
        return codecs.TermPostings(self._term_blob(idx), int(self.df[idx]))

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
