"""Top-k selection with the documented total tie-break (SURVEY.md §2.3-F9):
score descending, then doc_key ascending. Shared by every scoring path and
mirrored in the oracle — rank-identity depends on this being the ONLY
ordering rule anywhere."""

from __future__ import annotations

import numpy as np


def topk_postings(doc_keys: np.ndarray, scores: np.ndarray, k: int, keep_zero: bool = False):
    """Return (doc_keys, scores) of the top-k. Excludes zero scores unless
    ``keep_zero`` (score_micro mode: a matched doc whose positive BM25 score
    floors to micro==0 must stay rankable, matching the SQL oracle's
    row_number over ALL matched docs).

    One O(N) partition + tie-safe threshold mask before the exact (small)
    lexsort — no negation/nonzero copies of the full array."""
    n = scores.size
    if k > 0 and n > 4 * k:
        kth = np.partition(scores, n - k)[n - k]  # k-th largest
        mask = scores >= kth if (kth > 0 or keep_zero) else scores > 0
        doc_keys, scores = doc_keys[mask], scores[mask]
    elif not keep_zero:
        mask = scores > 0
        if not mask.all():
            doc_keys, scores = doc_keys[mask], scores[mask]
    order = np.lexsort((doc_keys, -scores))[:k]
    return doc_keys[order], scores[order]


def accumulate_sorted_lists(parts):
    """Merge per-(term,segment) contribution lists — each (sorted doc_keys,
    weights), given in ORACLE ORDER (sorted term, then segment order) — into
    (sorted unique doc_keys, scores).

    Bit-identical to the oracle's dense ``scores[idx] += w`` accumulation:
    every doc's contributions are added in the same order, and each addition
    is the same IEEE op. Cost is O(m·N) searchsorted+insert with NO
    O(N log N) sort of the union (the lists are already sorted) — the reason
    this replaces a unique/argsort-based merge on multi-million-row lists.
    """
    if not parts:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    base_k = parts[0][0].astype(np.int64, copy=False)
    base_s = parts[0][1].astype(np.float64, copy=True)  # 0 + w  (oracle op)
    for add_k, add_w in parts[1:]:
        pos = np.searchsorted(base_k, add_k)
        safe = np.minimum(pos, base_k.size - 1) if base_k.size else pos * 0
        match = (
            (pos < base_k.size) & (base_k[safe] == add_k)
            if base_k.size
            else np.zeros(add_k.size, dtype=bool)
        )
        if match.any():
            base_s[pos[match]] += add_w[match]
        if not match.all():
            nk = add_k[~match]
            nw = add_w[~match]
            ins = np.searchsorted(base_k, nk)
            # manual O(N) two-way merge scatter (np.insert is ~20x slower)
            total = base_k.size + nk.size
            nk_pos = ins + np.arange(nk.size)
            shift = np.cumsum(
                np.bincount(ins, minlength=base_k.size + 1).astype(np.uint64)
            )[: base_k.size].astype(np.int64)  # uint64 cumsum: fast path
            base_pos = np.arange(base_k.size) + shift
            out_k = np.empty(total, dtype=np.int64)
            out_s = np.empty(total, dtype=np.float64)
            out_k[base_pos] = base_k
            out_s[base_pos] = base_s
            out_k[nk_pos] = nk
            out_s[nk_pos] = nw  # == 0.0 + nw bit-exactly (oracle op)
            base_k, base_s = out_k, out_s
    return base_k, base_s


