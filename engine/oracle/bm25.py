"""The reference oracle: exhaustive single-process BM25 (SURVEY.md §0.2).

The reference snapshot is empty, so the "reference engine" whose top-k the
distributed engine must match rank-identically (BASELINE.json:14) is shipped
here: an obviously-correct pure-NumPy BM25 — no compression, no pruning, no
parallelism. Every invariant test compares the Ray engine's top-k against
this oracle: doc IDs identical, scores equal to 1e-6, tie-break (score desc,
doc_key asc) (BASELINE.md:13).

Determinism: per-document scores are accumulated over query terms in SORTED
term order (the engine does the same), making Python-oracle and engine sums
bit-identical, not merely close (SURVEY.md §7 hard part 1).

BM25 constants and formula (SURVEY.md §2.3-F6):
    idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))
    w(t, d) = idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl/avgdl))
    k1 = 1.2, b = 0.75; duplicate query terms count once (set semantics).
"""

from __future__ import annotations

import numpy as np

from engine.text.analyzer import Analyzer

K1 = 1.2
B = 0.75


def idf(n_docs: int, df: np.ndarray | int) -> np.ndarray | float:
    return np.log(1.0 + (n_docs - np.asarray(df, dtype=np.float64) + 0.5) / (np.asarray(df, dtype=np.float64) + 0.5))


def tf_sat(tf, dl, avgdl: float):
    tf = np.asarray(tf, dtype=np.float64)
    dl = np.asarray(dl, dtype=np.float64)
    return tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl / avgdl))


class BM25Oracle:
    """Exhaustive in-memory index over (doc_key, text) pairs."""

    def __init__(self, doc_keys: list[int], texts: list[str], analyzer: Analyzer | None = None):
        an = analyzer or Analyzer()
        self.doc_keys = np.asarray(doc_keys, dtype=np.int64)
        order = np.argsort(self.doc_keys, kind="stable")
        self.doc_keys = self.doc_keys[order]
        texts = [texts[i] for i in order]
        if len(np.unique(self.doc_keys)) != len(self.doc_keys):
            raise ValueError("doc_keys must be unique")
        self.n_docs = len(texts)
        self.postings: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        self.dl = np.zeros(self.n_docs, dtype=np.int64)
        tmp: dict[str, dict[int, int]] = {}
        for i, text in enumerate(texts):
            toks = an.tokens(text)
            self.dl[i] = len(toks)
            counts: dict[str, int] = {}
            for t in toks:
                counts[t] = counts.get(t, 0) + 1
            for t, c in counts.items():
                tmp.setdefault(t, {})[i] = c
        for t, docs in tmp.items():
            idx = np.fromiter(docs.keys(), dtype=np.int64, count=len(docs))
            tf = np.fromiter(docs.values(), dtype=np.int64, count=len(docs))
            o = np.argsort(idx)
            self.postings[t] = (idx[o], tf[o])
        self.avgdl = float(self.dl.mean()) if self.n_docs else 0.0
        self.analyzer = an

    def score_query(self, query_text: str) -> np.ndarray:
        """Dense score vector over all docs (doc order = sorted doc_key)."""
        terms = sorted(set(self.analyzer.tokens(query_text)))
        scores = np.zeros(self.n_docs, dtype=np.float64)
        for t in terms:
            if t not in self.postings:
                continue
            idx, tf = self.postings[t]
            w = idf(self.n_docs, len(idx)) * tf_sat(tf, self.dl[idx], self.avgdl)
            scores[idx] += w
        return scores

    def topk(self, query_text: str, k: int, exclude_text: str | None = None):
        """(doc_keys, scores) of the top-k with tie-break score desc, doc_key asc.

        Docs with score 0 (no query term matches) are excluded; docs matching
        any term of ``exclude_text`` are removed (NOT semantics, D4).
        """
        scores = self.score_query(query_text)
        if exclude_text:
            for t in sorted(set(self.analyzer.tokens(exclude_text))):
                if t in self.postings:
                    scores[self.postings[t][0]] = 0.0
        nz = np.nonzero(scores)[0]
        # lexsort: last key is primary → (-score, doc_key)
        order = nz[np.lexsort((self.doc_keys[nz], -scores[nz]))][:k]
        return self.doc_keys[order], scores[order]


def seeded_query_set(n_queries: int = 50, seed: int = 7, vocab: np.ndarray | None = None):
    """The deterministic 'reference query set' (SURVEY.md §0.2): 1-4 term
    queries drawn Zipf-style from the synth vocabulary."""
    from engine.io.synth import _VOCAB, _ZIPF_CDF

    v = vocab if vocab is not None else _VOCAB
    if len(v) > len(_ZIPF_CDF):
        raise ValueError(
            f"vocab of {len(v)} exceeds the {len(_ZIPF_CDF)}-entry Zipf CDF; "
            f"a larger vocab needs its own weight distribution"
        )
    rng = np.random.default_rng(seed)
    out = []
    for qid in range(n_queries):
        n_terms = int(rng.integers(1, 5))
        idx = np.searchsorted(_ZIPF_CDF[: len(v)] / _ZIPF_CDF[len(v) - 1], rng.random(n_terms))
        out.append((qid, " ".join(v[np.minimum(idx, len(v) - 1)])))
    return out
