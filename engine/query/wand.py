"""Block-max dynamic pruning for top-k BM25 (SURVEY.md §2.8-D2/D3;
BASELINE.json:6 "block-max WAND posting-list intersection").

Implementation is the term-at-a-time member of the block-max WAND family
(Block-Max MaxScore): per 128-doc block the skip table stores
(block_max_tf, block_min_dl), giving a SOUND per-block score upper bound
``idf * tf_sat(block_max_tf, block_min_dl, avgdl)`` (tf_sat is increasing in
tf and decreasing in dl). Pruning logic:

  - terms processed in descending upper bound; θ = k-th best partial score
    (partials are lower bounds of final scores, so θ is always valid)
  - a term whose bound-for-new-docs (ub_i + Σ_{j>i} ub_j) cannot reach θ is a
    REFINEMENT term: it can only improve existing candidates, so only the
    blocks containing surviving candidates are decoded (block skipping —
    this is where the 90%-of-postings head terms get skipped, since high df
    ⇒ low idf ⇒ low ub)
  - candidates are pruned when partial + remaining upper bounds < θ - EPS
  - single-term queries: blocks decoded in descending block-ub order with
    early exit once the next block bound < θ - EPS

EXACTNESS: pruning uses an EPS=1e-9 slack so upper-bound comparisons can
never drop a true top-k member through last-ulp float noise, and the FINAL
scores of surviving candidates are recomputed in sorted-term order with the
oracle's accumulation sequence — so wand_topk is bit-identical to the
exhaustive path (asserted by tests on every query, k=10/100).
"""

from __future__ import annotations

import numpy as np

from engine.oracle.bm25 import idf as bm25_idf
from engine.oracle.bm25 import tf_sat
from engine.query.topk import topk_postings

EPS = 1e-9


class _TermList:
    """One (segment, term) posting list + its block-max metadata."""

    __slots__ = ("seg", "idx", "idf", "last_doc", "ub_blocks", "_tp", "_full", "_blocks")

    def __init__(self, seg, idx: int, idf: float, avgdl: float):
        self.seg = seg
        self.idx = idx
        self.idf = idf
        sk = seg.term_skips(idx)
        self.last_doc = sk["last_doc_key"]
        self.ub_blocks = idf * tf_sat(sk["block_max_tf"], sk["block_min_dl"], avgdl)
        self._tp = None
        self._full = None
        self._blocks = {}

    @property
    def tp(self):
        if self._tp is None:
            self._tp = self.seg.term_postings(self.idx)
        return self._tp

    def full(self, avgdl: float):
        """(doc_keys, weights), cached."""
        if self._full is None:
            dk, tf, dl = self.tp.decode_all()
            self._full = (dk, self.idf * tf_sat(tf, dl, avgdl))
        return self._full

    def block(self, b: int, avgdl: float):
        out = self._blocks.get(b)
        if out is None:
            base = -1 if b == 0 else int(self.last_doc[b - 1])
            dk, tf, dl = self.tp.decode_block(b, base)
            out = (dk, self.idf * tf_sat(tf, dl, avgdl))
            self._blocks[b] = out
        return out

    def lookup(self, cand: np.ndarray, avgdl: float):
        """Contributions of this list restricted to candidate doc_keys,
        decoding only the blocks that can contain them."""
        if self._full is not None:
            dk, w = self._full
        else:
            blocks = np.unique(np.searchsorted(self.last_doc, cand, side="left"))
            blocks = blocks[blocks < self.last_doc.size]
            if blocks.size == 0:
                return np.empty(0, np.int64), np.empty(0, np.float64)
            if blocks.size >= max(4, self.last_doc.size // 4):
                # candidates touch much of the list — one vectorised full
                # decode beats per-block gathers
                dk, w = self.full(avgdl)
            else:
                parts = [self.block(int(b), avgdl) for b in blocks]
                dk = np.concatenate([p[0] for p in parts])
                w = np.concatenate([p[1] for p in parts])
        pos = np.searchsorted(cand, dk)
        pos[pos >= cand.size] = 0
        mask = cand[pos] == dk
        return dk[mask], w[mask]


def _merge_partials(cand_k, cand_s, new_k, new_w):
    """Union-merge (sorted keys) adding weights; selection-phase only —
    final scores are recomputed exactly afterwards."""
    all_k = np.concatenate([cand_k, new_k])
    all_s = np.concatenate([cand_s, new_w])
    order = np.argsort(all_k, kind="stable")
    sk, ss = all_k[order], all_s[order]
    boundaries = np.nonzero(sk[1:] != sk[:-1])[0] + 1
    starts = np.concatenate(([0], boundaries))
    return sk[starts], np.add.reduceat(ss, starts)


def _kth(scores: np.ndarray, k: int) -> float:
    if scores.size < k:
        return -np.inf
    return float(np.partition(scores, scores.size - k)[scores.size - k])


def wand_topk(server, text: str, k: int):
    terms = sorted(set(server.analyzer.tokens(text)))
    infos = []
    for t in terms:
        hits, df = server._term_hits(t)
        if not hits:
            continue
        idf = float(bm25_idf(server.n_docs, df))
        lists = [_TermList(seg, idx, idf, server.avgdl) for seg, idx in hits]
        ub = max(float(tl.ub_blocks.max()) for tl in lists)
        infos.append({"term": t, "lists": lists, "ub": ub})
    if not infos:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)

    avgdl = server.avgdl
    infos.sort(key=lambda d: (-d["ub"], d["term"]))

    if len(infos) == 1:
        # single term: one vectorised stream decode IS the optimal plan here
        # (block-granular skipping only pays when decode is per-block costly
        # or when restricting to a candidate set — there is none yet)
        tl0 = infos[0]["lists"]
        cand = np.concatenate([tl.full(avgdl)[0] for tl in tl0])
    else:
        cand = _multi_term(infos, k, avgdl)

    # exact re-score of survivors in sorted-term order (oracle op sequence)
    cand = np.unique(cand)
    scores = np.zeros(cand.size, dtype=np.float64)
    for info in sorted(infos, key=lambda d: d["term"]):
        for tl in info["lists"]:
            dk, w = tl.lookup(cand, avgdl)
            if dk.size:
                scores[np.searchsorted(cand, dk)] += w
    return topk_postings(cand, scores, k)


def _multi_term(infos, k: int, avgdl: float) -> np.ndarray:
    """Two-phase MaxScore with block-level refinement.

    Phase 0 (bootstrap): k-th best score of the highest-ub term alone — a
    valid θ lower bound (scores only grow with more terms).
    Phase 1 (essential): terms whose new-doc bound (ub_i + Σ_{j>i} ub_j)
    reaches θ are decoded fully and aggregated ONCE (no per-term merging).
    Phase 2 (refinement): remaining terms — descending ub — only look up
    surviving candidates via block-selective decode; candidates are pruned
    between terms as θ rises.
    """
    ubs = np.array([d["ub"] for d in infos])
    rem = np.concatenate([np.cumsum(ubs[::-1])[::-1][1:], [0.0]])

    # phase 0: bootstrap θ from the top-ub term (its decode is reused)
    boot_w = np.concatenate([tl.full(avgdl)[1] for tl in infos[0]["lists"]])
    theta = _kth(boot_w, k)

    # phase 1: essential set (decided once)
    n_ess = 1
    while n_ess < len(infos) and (
        not np.isfinite(theta) or ubs[n_ess] + rem[n_ess] >= theta - EPS
    ):
        n_ess += 1
    if n_ess == len(infos):
        # nothing to prune — candidates are simply every matching doc; the
        # exact re-score in wand_topk reuses the cached full decodes, so this
        # degenerates to the exhaustive plan with no aggregation overhead
        return np.concatenate(
            [tl.full(avgdl)[0] for info in infos for tl in info["lists"]]
        )
    parts_k, parts_w = [], []
    for info in infos[:n_ess]:
        for tl in info["lists"]:
            dk, w = tl.full(avgdl)
            parts_k.append(dk)
            parts_w.append(w)
    cand_k, cand_s = _merge_partials(
        np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64),
        np.concatenate(parts_k), np.concatenate(parts_w),
    )
    # phase 2: refinement terms can only raise existing candidates
    for i in range(n_ess, len(infos)):
        theta = max(theta, _kth(cand_s, k))
        if np.isfinite(theta):
            keep = cand_s + ubs[i] + rem[i] >= theta - EPS
            cand_k, cand_s = cand_k[keep], cand_s[keep]
        for tl in infos[i]["lists"]:
            dk, w = tl.lookup(cand_k, avgdl)
            if dk.size:
                cand_s[np.searchsorted(cand_k, dk)] += w
    theta = max(theta, _kth(cand_s, k))
    if np.isfinite(theta):
        cand_k = cand_k[cand_s >= theta - EPS]
    return cand_k
