"""Percolator: reverse search — a REGISTERED query set is the index, and
documents stream through it (Elasticsearch's `percolate` query; Lucene
MemoryIndex percolation). The engine answers "which stored queries does
this document match?" for every document in one pass.

Ray-Data shape: stored queries are the SMALL side, so they are compiled
ONCE into a CSR term → (qid, clause) mini-index carried in the batch fn's
closure (bytes ~ query-term count, never corpus-sized). Documents stream
through ONE ``map_batches`` — the shared vectorized analyzer token stream
is dictionary-encoded, only batch-UNIQUE tokens touch Python (the
hash-once-per-distinct-term pattern, engine/index/positions.py:80), and
occurrence → clause expansion is a CSR gather + packed-key bincount. Each
batch emits its own final (qid, doc_id) match rows: a map-side broadcast
join with NO shuffle — the 100-TB path, since percolation cost is
corpus-scan-bounded and embarrassingly parallel.

Clause semantics per stored query: ALL must terms present, NO not terms
present (the boolean +must/-not subset — engine/query/boolean.py — which
is what percolation is typically used for: alert/routing rules)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def compile_queries(queries: list[tuple[int, list[str], list[str]]]):
    """(qid, must_terms, not_terms) → CSR mini-index over the query
    vocabulary: (vocab dict term→vid, indptr, qid_arr, isnot_arr, need)
    where need[qid] = number of DISTINCT must terms (match threshold)."""
    n_q = max(q for q, _, _ in queries) + 1
    need = np.zeros(n_q, dtype=np.int64)
    per_term: dict[str, list[tuple[int, int]]] = {}
    for qid, must, nots in queries:
        mu, no = sorted(set(must)), sorted(set(nots))
        if not mu:
            raise ValueError(f"percolate query {qid}: at least one must term required")
        need[qid] = len(mu)
        for t in mu:
            per_term.setdefault(t, []).append((qid, 0))
        for t in no:
            per_term.setdefault(t, []).append((qid, 1))
    vocab = {t: i for i, t in enumerate(sorted(per_term))}
    counts = np.array([len(per_term[t]) for t in sorted(per_term)], dtype=np.int64)
    indptr = np.concatenate(([0], np.cumsum(counts)))
    qid_arr = np.array([q for t in sorted(per_term) for q, _ in per_term[t]], dtype=np.int64)
    isnot_arr = np.array([i for t in sorted(per_term) for _, i in per_term[t]], dtype=np.int64)
    return vocab, indptr, qid_arr, isnot_arr, need


def percolate_fn(queries: list[tuple[int, list[str], list[str]]]):
    """Batch fn factory: document batch (doc_id, text) → (qid, doc_id)
    match rows, fully vectorized per batch."""
    import pyarrow.compute as pc

    from engine.text.analyzer import Analyzer

    vocab, indptr, qid_arr, isnot_arr, need = compile_queries(queries)
    n_q = need.size
    an = Analyzer()
    empty = pa.table({"qid": pa.array([], pa.int64()), "doc_id": pa.array([], pa.int64())})

    def match(b: pa.Table) -> pa.Table:
        flat, dl = an.tokenize_arrow(b["text"])
        doc = np.repeat(b["doc_id"].to_numpy().astype(np.int64), dl.astype(np.int64))
        enc = pc.dictionary_encode(flat)
        # Python touches batch-UNIQUE tokens only (vocab-sized)
        sel = np.array([vocab.get(t, -1) for t in enc.dictionary.to_pylist()],
                       dtype=np.int64)
        if sel.size == 0 or (sel < 0).all():
            return empty
        tok = sel[enc.indices.to_numpy(zero_copy_only=False)]
        hitm = tok >= 0
        if not hitm.any():
            return empty
        # distinct (doc, query-vocab term): presence semantics
        nv = len(vocab)
        uk = np.unique(doc[hitm] * np.int64(nv) + tok[hitm])
        ud, uv = uk // nv, uk % nv
        # CSR gather: each present (doc, term) expands to its clause rows
        reps = indptr[uv + 1] - indptr[uv]
        tot = int(reps.sum())
        offs = np.arange(tot, dtype=np.int64) - np.repeat(np.cumsum(reps) - reps, reps)
        j = np.repeat(indptr[uv], reps) + offs
        d = np.repeat(ud, reps)
        q = qid_arr[j]
        isn = isnot_arr[j]
        # per (doc, qid): must-hit count == arity AND zero not-hits
        key = d * np.int64(n_q) + q
        k2, inv = np.unique(key, return_inverse=True)
        musts = np.bincount(inv, weights=1 - isn, minlength=k2.size)
        nots = np.bincount(inv, weights=isn, minlength=k2.size)
        uq = (k2 % n_q).astype(np.int64)
        hit = (musts.astype(np.int64) == need[uq]) & (nots == 0)
        return pa.table({
            "qid": pa.array(uq[hit]),
            "doc_id": pa.array((k2[hit] // n_q).astype(np.int64)),
        })

    return match
