"""Composable query DSL — ONE query tree combining the engine's existing
gates (VERDICT r4 "what's missing" #1: the ES/Lucene reality is a single
``bool`` query with nested match / match_phrase / range / boost / fuzzy /
minimum_should_match children, not one pipeline per feature).

Syntax (whitespace-separated clauses over the standard analyzer):

- ``+tok``        required term (every analyzed term of the token is MUST)
- ``-tok``        forbidden term (any analyzed term excludes the doc)
- ``tok``         optional (SHOULD) term
- ``tok^B``       boost: the term's BM25 contribution scales by B (powers
                  of two keep the scaling IEEE-lossless, the X29 contract);
                  composes with +/-less should and ``+`` must
- ``tok~``        fuzzy: expands to the ``max_expand`` highest-df dictionary
                  terms within Levenshtein distance 1 (df desc, term asc —
                  the X25 rewrite, resolved by the shared distributed
                  expansion pass). ``+tok~`` makes the expansion GROUP
                  required (>= 1 member must match).
- ``"a b c"``     phrase: the analyzed token sequence must occur adjacent,
                  proven by X40 positional window votes; constituent terms
                  are also required terms and score as plain BM25
- ``len:[lo,hi)`` numeric range filter on n_chars, served from the X68
                  DocValues sidecar inside the match stream (filter
                  context: gates, never scores)
- ``msm=N``       minimum_should_match: candidates must match >= N distinct
                  SHOULD terms (fuzzy-should expansion members count
                  individually). Default 0 when the query has any required
                  clause, else 1.

Semantics (BooleanQuery model, SQL-replayable):
  candidates = docs satisfying ALL must terms, ALL fuzzy-must groups, ALL
               phrases (adjacency), the range window, matching no must_not
               term, and matching >= msm distinct should terms
  score      = sum over DISTINCT positive terms (must + should + phrase +
               fuzzy expansions; a term reached twice takes its MAX boost)
               of boost * BM25(term, doc), in the oracle's sorted-term op
               order; micro-floored after the sum
  tie-break  = score desc, doc asc.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

from engine.oracle.bm25 import idf as bm25_idf
from engine.query.engine import SegmentServer
from engine.query.topk import accumulate_sorted_lists

_PHRASE_RE = re.compile(r'"([^"]*)"')
_RANGE_RE = re.compile(r"len:\[(\d+),(\d+)\)")
_MSM_RE = re.compile(r"msm=(\d+)")


@dataclass
class DslQuery:
    """Raw parsed clause structure (pre-analysis, pre-expansion)."""

    must_tokens: list[str] = field(default_factory=list)
    should_tokens: list[tuple[str, float]] = field(default_factory=list)  # (token, boost)
    not_tokens: list[str] = field(default_factory=list)
    fuzzy_must: list[str] = field(default_factory=list)
    fuzzy_should: list[str] = field(default_factory=list)
    phrases: list[str] = field(default_factory=list)
    range: tuple[int, int] | None = None
    msm: int | None = None
    must_boosts: list[tuple[str, float]] = field(default_factory=list)

    @property
    def has_required(self) -> bool:
        return bool(self.must_tokens or self.must_boosts
                    or self.fuzzy_must or self.phrases)


def parse_dsl(text: str) -> DslQuery:
    """Parse one DSL query string. Precedence: quoted phrases first, then
    the ``len:[..)`` / ``msm=`` directives, then token-level +/-/~/^."""
    q = DslQuery()

    def take_phrase(m: re.Match) -> str:
        q.phrases.append(m.group(1))
        return " "

    text = _PHRASE_RE.sub(take_phrase, text)
    m = _RANGE_RE.search(text)
    if m:
        q.range = (int(m.group(1)), int(m.group(2)))
        text = _RANGE_RE.sub(" ", text)
    m = _MSM_RE.search(text)
    if m:
        q.msm = int(m.group(1))
        text = _MSM_RE.sub(" ", text)

    for tok in text.split():
        kind = "should"
        if tok.startswith("+"):
            kind, tok = "must", tok[1:]
        elif tok.startswith("-"):
            kind, tok = "not", tok[1:]
        boost = 1.0
        if "^" in tok:
            tok, _, b = tok.rpartition("^")
            boost = float(b)
            if boost <= 0 or (np.log2(boost) != np.floor(np.log2(boost))):
                raise ValueError(f"boost must be a positive power of two: {b}")
        if tok.endswith("~"):
            tok = tok.rstrip("~")
            if boost != 1.0 or kind == "not":
                raise ValueError("fuzzy composes with +/should only, unboosted")
            (q.fuzzy_must if kind == "must" else q.fuzzy_should).append(tok)
            continue
        if not tok:
            continue
        if kind == "must":
            (q.must_boosts if boost != 1.0 else q.must_tokens).append(
                (tok, boost) if boost != 1.0 else tok
            )
        elif kind == "not":
            q.not_tokens.append(tok)
        else:
            q.should_tokens.append((tok, boost))
    return q


def resolve_specs(
    queries: list[tuple[int, str]],
    index_dir: str,
    analyzer,
    max_expand: int,
) -> dict[int, dict]:
    """Parse + analyze every query and resolve ALL fuzzy expansions in one
    shared distributed dictionary pass (engine/query/expand.py). Returns
    {qid: exec spec} for DslServer."""
    from engine.query.expand import expand_terms

    parsed = {qid: parse_dsl(text) for qid, text in queries}

    fuzzy_slots: list[tuple[int, bool, str]] = []  # (qid, is_must, term)
    for qid, p in parsed.items():
        for tok in p.fuzzy_must:
            for t in analyzer.tokens(tok):
                fuzzy_slots.append((qid, True, t))
        for tok in p.fuzzy_should:
            for t in analyzer.tokens(tok):
                fuzzy_slots.append((qid, False, t))
    expanded: list[list[str]] = []
    if fuzzy_slots:
        res = expand_terms(
            index_dir, [("edit1", t, max_expand) for _q, _m, t in fuzzy_slots]
        )
        expanded = [[str(t) for t in r["term"]] for r in res]

    specs: dict[int, dict] = {}
    for qid, p in parsed.items():
        boost: dict[str, float] = {}
        must_all: list[str] = []
        must_any: list[list[str]] = []
        should: set[str] = set()
        must_not: set[str] = set()
        phrases: list[list[str]] = []

        def bump(term: str, b: float) -> None:
            boost[term] = max(boost.get(term, 1.0), b) if term in boost else b

        for tok in p.must_tokens:
            for t in analyzer.tokens(tok):
                must_all.append(t)
                bump(t, 1.0)
        for tok, b in p.must_boosts:
            for t in analyzer.tokens(tok):
                must_all.append(t)
                bump(t, b)
        for tok, b in p.should_tokens:
            for t in analyzer.tokens(tok):
                should.add(t)
                bump(t, b)
        for tok in p.not_tokens:
            for t in analyzer.tokens(tok):
                must_not.add(t)
        for ph in p.phrases:
            toks = analyzer.tokens(ph)
            if not toks:
                continue
            phrases.append(toks)
            for t in toks:
                must_all.append(t)
                bump(t, 1.0)
        for (fq, is_must, _t), exp in zip(fuzzy_slots, expanded):
            if fq != qid:
                continue
            for t in exp:
                bump(t, 1.0)
                if not is_must:
                    should.add(t)
            if is_must:
                must_any.append(exp)  # empty expansion -> unsatisfiable

        msm = p.msm if p.msm is not None else (0 if p.has_required else 1)
        specs[qid] = {
            "boost": boost,
            "must_all": sorted(set(must_all)),
            "must_any": must_any,
            "must_not": sorted(must_not),
            "should": sorted(should),
            "msm": int(msm),
            "phrases": phrases,
            "range": p.range,
            "has_required": p.has_required,
        }
    return specs


class DslServer(SegmentServer):
    """Match stage for the DSL: emits EVERY candidate (qid, doc_key, score)
    passing the term-level gates — must terms, fuzzy-must groups, must_not,
    minimum_should_match. Phrase adjacency and range windows gate
    DOWNSTREAM (positional votes / DocValues sidecar stages in
    ft_bm25_dsl); phrase constituent terms are already in must_all, so
    phrase pruning here is containment-tight. No top-k: selectivity of the
    later gates is unknown, so no over-fetch factor would be safe (the
    ScoredMatchServer argument). Scores follow the oracle op order:
    sorted-term parts, boost applied per part (power-of-two, lossless),
    micro-floored after accumulation."""

    def __init__(self, *args, specs: dict[int, dict], **kwargs):
        super().__init__(*args, **kwargs)
        self.specs = specs

    def _matches(self, spec: dict):
        e = np.empty(0, dtype=np.int64)
        pos_terms = sorted(spec["boost"])
        if not pos_terms:
            return e, e  # no positive clause can match (Lucene model)
        parts = []
        keys_of: dict[str, list[np.ndarray]] = {}
        for t in pos_terms:
            hits, df = self._term_hits(t)
            if not hits:
                if t in spec["must_all"]:
                    return e, e  # required term absent from the index
                continue
            w_idf = float(bm25_idf(self.n_docs, df))
            b = spec["boost"].get(t, 1.0)
            t_keys = []
            for seg, idx in hits:
                dk = seg.read_postings(idx)[0]
                w = seg.weights(idx, w_idf, self.avgdl)
                parts.append((dk, w * b if b != 1.0 else w))
                t_keys.append(dk)
            keys_of[t] = t_keys
        if not parts:
            return e, e
        dk, sc = accumulate_sorted_lists(parts)

        def union(terms) -> np.ndarray:
            arrs = [a for t in terms for a in keys_of.get(t, ())]
            if not arrs:
                return e
            return np.unique(np.concatenate(arrs)) if len(arrs) > 1 else arrs[0]

        # must: intersect with every required term's postings
        for t in spec["must_all"]:
            u = union([t])
            keep = np.isin(dk, u, assume_unique=True)
            dk, sc = dk[keep], sc[keep]
            if not dk.size:
                return e, e
        # fuzzy-must groups: >= 1 member must match
        for grp in spec["must_any"]:
            u = union(grp)
            keep = np.isin(dk, u, assume_unique=True)
            dk, sc = dk[keep], sc[keep]
            if not dk.size:
                return e, e
        # minimum_should_match over distinct should terms
        msm = spec["msm"]
        if msm > 0:
            cparts = [(a, np.ones(a.size, dtype=np.float64))
                      for t in spec["should"] for a in keys_of.get(t, ())]
            if not cparts:
                return e, e
            cdk, cnt = accumulate_sorted_lists(cparts)
            ok = cdk[cnt >= msm]
            keep = np.isin(dk, ok, assume_unique=True)
            dk, sc = dk[keep], sc[keep]
            if not dk.size:
                return e, e
        dk, sc = self._filter_deleted(dk, sc)
        if spec["must_not"]:
            ex = self._exclusion_keys(" ".join(spec["must_not"]))
            if ex.size and dk.size:
                pos = np.searchsorted(ex, dk)
                pos[pos >= ex.size] = 0
                m = ex[pos] != dk
                dk, sc = dk[m], sc[m]
        return dk, sc

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids = batch["qid"].to_numpy()
        out_qid, out_key, out_sc = [], [], []
        for qid in qids:
            spec = self.specs[int(qid)]
            dk, sc = self._matches(spec)
            sc = np.floor(np.asarray(sc, dtype=np.float64) * 1e6 + 0.5).astype(np.int64)
            out_qid.append(np.full(dk.size, qid, dtype=np.int64))
            out_key.append(dk.astype(np.int64))
            out_sc.append(sc)
        if not out_qid:
            return pa.table({"qid": pa.array([], pa.int64()),
                             "doc_key": pa.array([], pa.int64()),
                             "score": pa.array([], pa.int64())})
        return pa.table({"qid": np.concatenate(out_qid),
                         "doc_key": np.concatenate(out_key),
                         "score": np.concatenate(out_sc)})
