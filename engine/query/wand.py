"""Block-max dynamic pruning for top-k BM25 (SURVEY.md §2.8-D2/D3;
BASELINE.json:6 "block-max WAND posting-list intersection").

Term-at-a-time member of the block-max WAND family (Block-Max MaxScore),
shaped for a vectorised NumPy engine where a full-stream decode is a few
vector ops — pruning is about WHICH STREAMS and WHICH BLOCKS decode:

  1. WEIGHTS WITHOUT KEYS: every list's per-posting BM25 weights come from
     its tf/dl streams only (Segment.weights → decode_tfdl) — the gap
     stream (doc keys) of a list is NEVER fully decoded on this path.
  2. θ bootstrap: the k-th largest single-list weight is a valid lower
     bound on the final k-th score; a PROBE then exact-scores each list's k
     weight-heaviest docs (their keys block-decoded via positions_keys, the
     cross-list lookups candidate-restricted) to lift θ with cross-term
     mass.
  3. ADMISSION: list i can contribute a top-k doc only where
     w_i ≥ θ − Σ_{j≠i} max_w_j; only the admitted positions' doc keys are
     decoded — for the Zipf head (high df ⇒ low idf ⇒ low weights) that is
     typically nothing or a handful of 128-doc blocks.
  4. RE-SCORE: admitted candidates are exact-scored with per-list
     candidate-restricted lookups (skip-table searchsorted → O(1) block
     frame access), in sorted-term order (the oracle's float op sequence).
  5. Single-term queries: weights + per-list top-k positions (ties kept),
     block-decode only those keys.

Per-block bound: idf * tf_sat(block_max_tf, block_min_dl, avgdl) — sound
(tf_sat increasing in tf, decreasing in dl).

EXACTNESS: every bound comparison carries an EPS=1e-9 slack so last-ulp
float noise can never drop a true top-k member (ties included), and final
scores of survivors are recomputed in sorted-term order with the oracle's
float op sequence — wand_topk is bit-identical to the exhaustive path and
the oracle (tests/test_wand.py, every query shape, k=10/100).
"""

from __future__ import annotations

import numpy as np

from engine.oracle.bm25 import idf as bm25_idf
from engine.oracle.bm25 import tf_sat
from engine.query.topk import topk_postings

EPS = 1e-9


class _TermList:
    """One (segment, term) posting list + block-max metadata, with
    lazily-cached decodes (weights first; doc keys only when needed)."""

    __slots__ = ("seg", "idx", "idf", "last_doc", "_tp", "_w", "_keys", "_blocks")

    def __init__(self, seg, idx: int, idf: float, avgdl: float):
        self.seg = seg
        self.idx = idx
        self.idf = idf
        sk = seg.term_skips(idx)
        self.last_doc = sk["last_doc_key"]
        self._tp = None
        self._w = None
        self._keys = None
        self._blocks = {}

    @property
    def tp(self):
        if self._tp is None:
            self._tp = self.seg.term_postings(self.idx)
        return self._tp

    def weights(self, avgdl: float) -> np.ndarray:
        if self._w is None:
            self._w = self.seg.weights(self.idx, self.idf, avgdl)
        return self._w

    def keys(self) -> np.ndarray:
        if self._keys is None:
            self._keys = self.seg.read_postings(self.idx)[0]
        return self._keys

    def full(self, avgdl: float):
        return self.keys(), self.weights(avgdl)

    def positions_keys(self, pos: np.ndarray, avgdl: float) -> np.ndarray:
        """Doc keys at ascending posting positions — bulk-decodes ONLY the
        128-doc blocks containing them (one vectorised gather for ALL
        blocks), falling back to one full decode when the positions are
        dense enough that block decode would touch most of the list anyway."""
        if pos.size == 0:
            return np.empty(0, np.int64)
        if self._keys is not None:
            return self._keys[pos]
        from engine.index.codecs import BLOCK_SIZE

        blocks = np.unique(pos // BLOCK_SIZE)
        if blocks.size >= max(4, self.last_doc.size // 2):
            return self.keys()[pos]
        dk, _w, flat_pos = self._decode_blocks(blocks, avgdl)
        return dk[np.searchsorted(flat_pos, pos)]

    def _decode_blocks(self, blocks: np.ndarray, avgdl: float):
        """(doc_keys, weights, flat posting positions) for the given sorted
        block indices — ONE vectorised multi-block decode."""
        bases = np.where(blocks > 0, self.last_doc[blocks - 1], -1)
        dk, tf, dl, flat_pos = self.tp.decode_blocks(blocks, bases)
        return dk, self.idf * tf_sat(tf, dl, avgdl), flat_pos

    def block(self, b: int, avgdl: float):
        out = self._blocks.get(b)
        if out is None:
            base = -1 if b == 0 else int(self.last_doc[b - 1])
            dk, tf, dl = self.tp.decode_block(b, base)
            out = (dk, self.idf * tf_sat(tf, dl, avgdl))
            self._blocks[b] = out
        return out

    def lookup(self, cand: np.ndarray, avgdl: float):
        """Contributions restricted to candidate doc_keys, decoding only the
        blocks that can contain them (falls back to one vectorised full
        decode when candidates touch much of the list)."""
        if self._keys is not None:
            dk, w = self._keys, self.weights(avgdl)
        else:
            blocks = np.unique(np.searchsorted(self.last_doc, cand, side="left"))
            blocks = blocks[blocks < self.last_doc.size]
            if blocks.size == 0:
                return np.empty(0, np.int64), np.empty(0, np.float64)
            if blocks.size >= max(4, self.last_doc.size // 2):
                dk, w = self.full(avgdl)
            else:
                dk, w, _ = self._decode_blocks(blocks, avgdl)
        pos = np.searchsorted(cand, dk)
        pos[pos >= cand.size] = 0
        mask = cand[pos] == dk
        return dk[mask], w[mask]


def _kth_largest(x: np.ndarray, k: int) -> float:
    if x.size < k or k <= 0:
        return -np.inf
    return float(np.partition(x, x.size - k)[x.size - k])


def wand_topk(server, text: str, k: int):
    terms = sorted(set(server.analyzer.tokens(text)))
    avgdl = server.avgdl
    deleted = getattr(server, "deleted", None)  # committed delete set
    infos = []
    for t in terms:
        hits, df = server._term_hits(t)
        if not hits:
            continue
        idf = float(bm25_idf(server.n_docs, df))
        lists = [_TermList(seg, idx, idf, avgdl) for seg, idx in hits]
        infos.append({"term": t, "lists": lists})
    if not infos:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)

    if len(infos) == 1:
        # single term: scores ARE the weights (tf/dl streams only — no gap
        # decode); per-list top-k positions (ties at the k-th weight kept)
        # are a superset of the global top-k, and only THEIR doc keys are
        # block-decoded. With deletes, a list's weight-heaviest docs may be
        # dead — escalate the per-list cut (k → 4k → all) until it holds k
        # LIVE docs or the list is exhausted (lists are doc-disjoint within
        # a term, so per-list live top-k still covers the global top-k).
        from engine.index.deletes import live_mask

        parts_k, parts_w = [], []
        for tl in infos[0]["lists"]:
            w = tl.weights(avgdl)
            m = k
            while True:
                if w.size > m:
                    kth = np.partition(w, w.size - m)[w.size - m]
                    pos = np.nonzero(w >= kth)[0]
                else:
                    pos = np.arange(w.size)
                dk = tl.positions_keys(pos, avgdl)
                if deleted is not None:
                    live = live_mask(dk, deleted)
                    dk, wk = dk[live], w[pos][live]
                else:
                    wk = w[pos]
                if dk.size >= k or pos.size >= w.size:
                    break
                m *= 4
            parts_k.append(dk)
            parts_w.append(wk)
        return topk_postings(np.concatenate(parts_k), np.concatenate(parts_w), k)

    cand, scores = _multi_term(infos, k, avgdl, deleted)
    if scores is None:
        # exact scoring of admitted candidates in sorted-term order (oracle
        # op order); cand is sorted unique; each list contributes via a
        # candidate-restricted lookup (block decode), never a full gap scan
        scores = np.zeros(cand.size, dtype=np.float64)
        for info in sorted(infos, key=lambda d: d["term"]):
            for tl in info["lists"]:
                if cand.size == 0:
                    continue
                dk_m, w_m = tl.lookup(cand, avgdl)
                if dk_m.size:
                    pos = np.searchsorted(cand, dk_m)
                    scores[pos] += w_m
    return topk_postings(cand, scores, k)


def _multi_term(infos, k: int, avgdl: float, deleted=None):
    """→ (cand_keys sorted unique, None) — candidate ADMISSION by per-list
    exact-max thresholds (TAAT MaxScore with exact maxima).

    θ = max over lists of the list's k-th largest weight (a valid lower
    bound on the final k-th score). A doc reachable only from list i can
    beat θ only if w_i(doc) ≥ θ − Σ_{j≠i} max_w_j: taking i* = the doc's
    strongest term, failing the test for EVERY list it appears in implies
    total = w_{i*} + Σ_{j≠i*} w_j ≤ w_{i*} + Σ_{j≠i*} max_w_j < θ. So the
    union of per-list threshold masks (vectorised, no sort) is a superset of
    the true top-k. Exact maxima come from the cached weights (tighter than
    block bounds); the block-max skip metadata remains the cold-path/
    streaming traversal story (_TermList.block / lookup).

    When θ is unbounded (every list shorter than k — tiny corpora) the masks
    keep everything and this degenerates to the exhaustive union.
    """
    max_w = []  # exact per-TERM max weight
    theta = -np.inf
    for info in infos:
        m = 0.0
        for tl in info["lists"]:
            if deleted is None:
                # single-list k-th weight is a valid θ lower bound only
                # when those docs are guaranteed live — with deletes the
                # probe (live-filtered below) is the sole θ source
                theta = max(theta, tl.seg.kth_weight(tl.idx, k, tl.idf, avgdl))
            # per-list MAX over any doc (deleted included) stays a valid
            # upper bound on live weights — admission remains sound
            m = max(m, tl.seg.kth_weight(tl.idx, 1, tl.idf, avgdl))
        max_w.append(m)
    sum_ub = float(np.sum(max_w))

    # PROBE: exact-score each list's k weight-heaviest docs (any k docs give
    # a valid lower bound — tie exactness not needed for a bound). Their
    # exact sums include cross-term mass, lifting θ far above the
    # single-list bootstrap for multi-term queries. Only the probe docs'
    # blocks are gap-decoded (positions_keys / lookup) — head lists never
    # decode their full doc-key stream here.
    probe_keys = []
    for info in infos:
        for tl in info["lists"]:
            w = tl.weights(avgdl)
            if w.size > k:
                pos = np.sort(np.argpartition(w, w.size - k)[w.size - k :])
            else:
                pos = np.arange(w.size)
            probe_keys.append(tl.positions_keys(pos, avgdl))
    probe = np.unique(np.concatenate(probe_keys))
    if deleted is not None and probe.size:
        from engine.index.deletes import live_mask

        probe = probe[live_mask(probe, deleted)]
    psc = np.zeros(probe.size, dtype=np.float64)
    for info in infos:
        for tl in info["lists"]:
            dk_m, w_m = tl.lookup(probe, avgdl)
            if dk_m.size:
                pos = np.searchsorted(probe, dk_m)
                psc[pos] += w_m
    theta = max(theta, _kth_largest(psc, k))

    # The probe's surviving docs are always candidates. Under the valid data
    # model they would be re-admitted by the masks below anyway (≤ k·lists
    # keys, dedup'd by the final union — free); on an index whose per-doc
    # uniqueness invariant is broken (e.g. the same corpus committed twice,
    # see build_index's replaced-corpus guard) per-doc totals can exceed
    # sum_ub, θ then exceeds every admission threshold and the masks go
    # empty — this keeps the result non-empty instead of silently dropping
    # every match.
    parts = [probe[psc >= theta - EPS]]
    for i, info in enumerate(infos):
        thr = theta - (sum_ub - max_w[i]) - EPS
        for tl in info["lists"]:
            w = tl.weights(avgdl)
            if not np.isfinite(theta) or thr <= 0:
                parts.append(tl.keys())
                continue
            mask = w >= thr
            if mask.any():
                parts.append(tl.positions_keys(np.nonzero(mask)[0], avgdl))
    # candidate set only — scores are recomputed exactly (oracle op order) by
    # the caller, so a plain sorted-unique union suffices; the weight-merging
    # accumulate_sorted_lists here was 1/3 of query wall time
    cand = np.unique(np.concatenate(parts))
    if deleted is not None and cand.size:
        from engine.index.deletes import live_mask

        cand = cand[live_mask(cand, deleted)]
    return cand, None
