"""Boolean structured queries (engine/query/boolean.py): must/should/
must_not semantics vs a pure-Python reference over the BM25 oracle."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from engine.core.dockey import doc_key_batch
from engine.index.build import build_index
from engine.io.synth import synth_transcripts_table
from engine.oracle.bm25 import BM25Oracle
from engine.query.boolean import parse_boolean
from engine.query.engine import SegmentServer
from engine.query.topk import topk_postings

K = 10


def test_parse_boolean():
    assert parse_boolean("+hash -join batch") == ("hash", "batch", "join")
    assert parse_boolean("a b c") == ("", "a b c", "")
    assert parse_boolean("+a +b -c -d") == ("a b", "", "c d")
    assert parse_boolean("") == ("", "", "")


@pytest.fixture(scope="module")
def env(tmp_path_factory, ray_session):
    tmp = tmp_path_factory.mktemp("bool")
    t = synth_transcripts_table(40, seed=23)
    corpus = str(tmp / "c.parquet")
    pq.write_table(t, corpus)
    idx = str(tmp / "idx")
    build_index(corpus, idx, num_shards=4, build_id="bq")
    keys = doc_key_batch(t["conv_id"], t["turn_idx"].to_numpy())
    oracle = BM25Oracle(list(keys), t["text"].to_pylist())
    return idx, oracle


def _expected(oracle, must, should, must_not, k):
    """Reference boolean evaluation on the dense oracle scores."""
    an = oracle.analyzer
    m_terms = sorted(set(an.tokens(must)))
    pos_text = f"{must} {should}"
    scores = oracle.score_query(pos_text)
    mask = np.ones(oracle.n_docs, dtype=bool)
    for t in m_terms:
        tmask = np.zeros(oracle.n_docs, dtype=bool)
        if t in oracle.postings:
            tmask[oracle.postings[t][0]] = True
        mask &= tmask
    if not m_terms:
        mask = scores > 0
    for t in sorted(set(an.tokens(must_not))):
        if t in oracle.postings:
            mask[oracle.postings[t][0]] = False
    return topk_postings(oracle.doc_keys[mask], scores[mask], k)


# a vocab word that actually occurs in the synth corpus is needed; synth text
# is gibberish, so pick terms from the oracle's own posting dict at runtime
def _vocab(oracle, n):
    return sorted(oracle.postings, key=lambda t: -len(oracle.postings[t][0]))[:n]


def test_boolean_matches_reference(env):
    idx, oracle = env
    a, b, c, d = _vocab(oracle, 4)
    srv = SegmentServer(idx, k=K, boolean=True)
    cases = [
        f"+{a} {b} {c}",          # must + should
        f"+{a} +{b}",             # pure conjunction
        f"{a} {b} -{c}",          # should + not
        f"+{a} -{b} {d}",         # all three
        f"+{a} +nosuchtermzz",    # missing must term → empty
        f"{a} -nosuchtermzz",     # missing not term → no-op
    ]
    for text in cases:
        m, s, n = parse_boolean(text)
        wk, ws = _expected(oracle, m, s, n, K)
        gk, gs = srv.topk(text, K)
        np.testing.assert_array_equal(gk, wk, err_msg=text)
        np.testing.assert_array_equal(gs, ws, err_msg=text)


def test_boolean_edge_semantics(env):
    idx, oracle = env
    a = _vocab(oracle, 1)[0]
    srv = SegmentServer(idx, k=K, boolean=True)
    # must_not alone matches nothing (Lucene semantics)
    gk, _ = srv.topk(f"-{a}", K)
    assert gk.size == 0
    # empty query matches nothing
    gk, _ = srv.topk("", K)
    assert gk.size == 0


def test_boolean_respects_deletes(env):
    from engine.index.deletes import delete_doc_keys

    idx, oracle = env
    a, b = _vocab(oracle, 2)
    srv0 = SegmentServer(idx, k=K, boolean=True)
    gk0, _ = srv0.topk(f"+{a} {b}", K)
    assert gk0.size
    delete_doc_keys(idx, gk0[:2], delete_id="bool-del")
    srv = SegmentServer(idx, k=K, boolean=True)  # fresh manifest snapshot
    gk, _ = srv.topk(f"+{a} {b}", K)
    assert not np.isin(gk, gk0[:2]).any()
