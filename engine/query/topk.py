"""Top-k selection with the documented total tie-break (SURVEY.md §2.3-F9):
score descending, then doc_key ascending. Shared by every scoring path and
mirrored in the oracle — rank-identity depends on this being the ONLY
ordering rule anywhere."""

from __future__ import annotations

import numpy as np


def topk_postings(doc_keys: np.ndarray, scores: np.ndarray, k: int):
    """Return (doc_keys, scores) of the top-k. Excludes zero scores."""
    nz = np.nonzero(scores)[0]
    if k > 0 and nz.size > 4 * k:
        # pre-cut before the exact sort: keep everything scoring >= the k-th
        # score (tie-safe — a plain argpartition cut could split a tie group)
        kth = np.partition(-scores[nz], k - 1)[k - 1]
        nz = nz[scores[nz] >= -kth]
    order = nz[np.lexsort((doc_keys[nz], -scores[nz]))][:k]
    return doc_keys[order], scores[order]


def sum_by_doc(doc_keys: np.ndarray, weights: np.ndarray):
    """Aggregate per-term contributions per doc, preserving the order in
    which contributions appear (stable sort → reduceat) so float summation
    order equals the oracle's sorted-term accumulation order."""
    order = np.argsort(doc_keys, kind="stable")
    dk = doc_keys[order]
    w = weights[order]
    boundaries = np.nonzero(dk[1:] != dk[:-1])[0] + 1
    starts = np.concatenate(([0], boundaries))
    return dk[starts], np.add.reduceat(w, starts)
