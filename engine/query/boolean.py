"""Boolean structured queries — Lucene-style must/should/must_not clauses
over the BM25 index (beyond-blueprint: SURVEY.md §2.0 X3).

Syntax (``parse_boolean``): whitespace-separated clauses; a ``+`` prefix
makes the clause REQUIRED (must), ``-`` makes it FORBIDDEN (must_not), no
prefix is OPTIONAL (should). Each clause runs through the index analyzer,
so ``+Hash-Join`` contributes the must terms {hash, join}.

Semantics (BooleanQuery model):
  candidates = docs containing ALL must terms
               (if no must clause: docs containing >= 1 should term)
  excluded   = docs containing ANY must_not term
  score      = full BM25 sum over every matching must+should term, in the
               oracle's sorted-term float op order (bit-identical to the
               exhaustive scorer restricted to the candidate set)
A must term absent from the index matches nothing; an absent should or
must_not term is a no-op. A query with no positive clause returns empty
(must_not alone cannot match, same as Lucene).
"""

from __future__ import annotations

import numpy as np

from engine.oracle.bm25 import idf as bm25_idf
from engine.query.topk import accumulate_sorted_lists, topk_postings


def parse_boolean(text: str) -> tuple[str, str, str]:
    """Raw query string → (must, should, must_not) clause texts."""
    must, should, must_not = [], [], []
    for clause in text.split():
        if clause.startswith("+"):
            must.append(clause[1:])
        elif clause.startswith("-"):
            must_not.append(clause[1:])
        else:
            should.append(clause)
    return " ".join(must), " ".join(should), " ".join(must_not)


def boolean_topk(server, must: str, should: str, must_not: str, k: int):
    """Evaluate one boolean query on a SegmentServer. Returns (doc_keys,
    scores) ranked (score desc, doc_key asc); scores are micro-ints when the
    server was built with score_micro (keep_zero semantics, matching the
    conjunctive path)."""

    def empty():
        e = np.empty(0, dtype=np.int64)
        return e, (e if server.score_micro else e.astype(np.float64))

    must_terms = set(server.analyzer.tokens(must))
    should_terms = set(server.analyzer.tokens(should))
    all_terms = sorted(must_terms | should_terms)
    if not all_terms:
        return empty()

    parts = []           # (doc_keys, weights) in ORACLE (sorted-term) order
    per_must_keys = []   # one sorted doc_key union per MUST term
    for t in all_terms:
        hits, df = server._term_hits(t)
        if not hits:
            if t in must_terms:
                return empty()  # a missing required term matches nothing
            continue
        w_idf = float(bm25_idf(server.n_docs, df))
        t_keys = []
        for seg, idx in hits:
            dk_arr = seg.read_postings(idx)[0]
            parts.append((dk_arr, seg.weights(idx, w_idf, server.avgdl)))
            if t in must_terms:
                t_keys.append(dk_arr)
        if t in must_terms:
            per_must_keys.append(
                np.unique(np.concatenate(t_keys)) if len(t_keys) > 1 else t_keys[0]
            )
    if not parts:
        return empty()
    dk, sc = accumulate_sorted_lists(parts)
    if per_must_keys:
        per_must_keys.sort(key=len)
        inter = per_must_keys[0]
        for keys in per_must_keys[1:]:
            inter = np.intersect1d(inter, keys, assume_unique=True)
            if inter.size == 0:
                return empty()
        keep = np.isin(dk, inter, assume_unique=True)
        dk, sc = dk[keep], sc[keep]
    dk, sc = server._filter_deleted(dk, sc)
    if must_not:
        ex = server._exclusion_keys(must_not)
        if ex.size and dk.size:
            pos = np.searchsorted(ex, dk)
            pos[pos >= ex.size] = 0
            m = ex[pos] != dk
            dk, sc = dk[m], sc[m]
    if server.score_micro:
        sc = np.floor(sc * 1e6 + 0.5).astype(np.int64)
        return topk_postings(dk, sc, k, keep_zero=True)
    return topk_postings(dk, sc, k)
