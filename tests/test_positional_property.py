"""Property tests for the positional-query verification kernels
(engine/index/positions.py): the window-vote formulations and the greedy
ordered chain, each checked against an itertools brute force over random
occurrence tables — no Ray, no index builds, pure math.

Why these exist: the vote formulations are the load-bearing CLAIMS behind
ft_bm25_phrase_pos / ft_bm25_proximity_pos / ft_span_near /
ft_span_near_ordered — e.g. "(qid, doc, base) groups voted by both sides
⟺ min-gap ≤ slop+1" and "greedy minimal chain ⟺ ∃ any chain". The
pipelines' own tests prove plumbing and SQL parity at fixed query sets;
these prove the equivalences on thousands of adversarial inputs."""

import itertools

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from engine.index.positions import ordered_chain_match, phrase_votes_fn

WORD = st.sampled_from(["a", "b", "c", "d"])
DOC = st.lists(WORD, min_size=0, max_size=10)
CORPUS = st.lists(DOC, min_size=1, max_size=8)


def _occurrences(corpus):
    rows = {"term": [], "doc_key": [], "pos": []}
    for d, toks in enumerate(corpus):
        for p, t in enumerate(toks):
            rows["term"].append(t)
            rows["doc_key"].append(d)
            rows["pos"].append(p)
    return pa.table({
        "term": pa.array(rows["term"], pa.string()),
        "doc_key": pa.array(rows["doc_key"], pa.int64()),
        "pos": pa.array(rows["pos"], pa.int32()),
    })


def _run_votes(slot_rows, corpus, sides=False):
    n_docs = len(corpus)
    cand_q = np.repeat(
        np.array(sorted({q for q, *_ in slot_rows}), dtype=np.int64), n_docs
    )
    cand_d = np.tile(np.arange(n_docs, dtype=np.int64), cand_q.size // n_docs)
    fn = phrase_votes_fn(slot_rows, cand_q, cand_d, sides=sides)
    return fn(_occurrences(corpus)).to_pandas()


@settings(max_examples=200, deadline=None)
@given(CORPUS, st.lists(WORD, min_size=1, max_size=3))
def test_phrase_votes_equal_subsequence_search(corpus, phrase):
    """slot-count == n_slots ⟺ the phrase occurs contiguously."""
    slot_rows = [(0, t, off) for off, t in enumerate(phrase)]
    votes = _run_votes(slot_rows, corpus)
    if len(votes):
        got = set(
            votes.groupby(["doc_key", "base"]).size()
            .reset_index(name="n").query(f"n == {len(phrase)}")["doc_key"]
        )
    else:
        got = set()
    exp = {
        d for d, toks in enumerate(corpus)
        if any(toks[i:i + len(phrase)] == phrase
               for i in range(len(toks) - len(phrase) + 1))
    }
    assert got == exp


@settings(max_examples=200, deadline=None)
@given(CORPUS, st.tuples(WORD, WORD), st.integers(min_value=0, max_value=4))
def test_proximity_votes_equal_min_gap(corpus, terms, slop):
    """both-sides-voted window ⟺ ∃ pa, pb with |pa − pb| ≤ slop + 1."""
    a, b = terms
    slot_rows = [(0, b, 0, 0)]
    slot_rows += [(0, a, off, 1) for off in range(-(slop + 1), slop + 2)]
    votes = _run_votes(slot_rows, corpus, sides=True)
    if len(votes):
        g = votes.groupby(["doc_key", "base"])["side"].agg(["min", "max"])
        got = set(g[(g["min"] == 0) & (g["max"] == 1)]
                  .reset_index()["doc_key"])
    else:
        got = set()
    exp = set()
    for d, toks in enumerate(corpus):
        pa_ = [i for i, t in enumerate(toks) if t == a]
        pb_ = [i for i, t in enumerate(toks) if t == b]
        if any(abs(x - y) <= slop + 1 for x in pa_ for y in pb_):
            exp.add(d)
    assert got == exp


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.lists(st.integers(min_value=0, max_value=12),
                      min_size=0, max_size=4), min_size=1, max_size=4),
    st.integers(min_value=0, max_value=12),
)
def test_ordered_chain_matches_brute_force(sides_raw, bound):
    """greedy-chain existence == brute force over ALL position choices."""
    sides = [np.unique(np.array(s, dtype=np.int64)) for s in sides_raw]
    got = ordered_chain_match(sides, bound)
    exp = any(
        all(c[i] < c[i + 1] for i in range(len(c) - 1)) and c[-1] - c[0] <= bound
        for c in itertools.product(*[list(s) for s in sides])
    ) if all(s.size for s in sides) else False
    assert got == exp


@settings(max_examples=200, deadline=None)
@given(CORPUS, st.sets(WORD, min_size=1, max_size=3),
       st.integers(min_value=0, max_value=4))
def test_span_window_votes_equal_containment(corpus, terms_set, slop):
    """distinct-side window count == n ⟺ all terms within extent n−1+slop."""
    terms = sorted(terms_set)
    n = len(terms)
    w = n + slop
    slot_rows = []
    for side, t in enumerate(terms):
        slot_rows.extend((0, t, off, side) for off in range(w))
    votes = _run_votes(slot_rows, corpus, sides=True)
    if len(votes):
        dedup = votes.drop_duplicates(["doc_key", "base", "side"])
        cnt = dedup.groupby(["doc_key", "base"]).size()
        got = set(cnt[cnt == n].reset_index()["doc_key"])
    else:
        got = set()
    exp = set()
    for d, toks in enumerate(corpus):
        poss = [[i for i, t in enumerate(toks) if t == q] for q in terms]
        if all(poss) and any(
            max(c) - min(c) <= n - 1 + slop for c in itertools.product(*poss)
        ):
            exp.add(d)
    assert got == exp
