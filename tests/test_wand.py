"""Block-max pruning must NEVER change top-k: wand == exhaustive == oracle,
bit-identical (SURVEY.md §7 M3 'pruning must never change top-k')."""

import numpy as np
import pytest

from engine.core.dockey import doc_key_batch
from engine.index.build import build_index
from engine.io.synth import synth_transcripts_table
from engine.oracle.bm25 import BM25Oracle, seeded_query_set
from engine.query.engine import SegmentServer


@pytest.fixture(scope="module")
def setup(tmp_path_factory, ray_session):
    import ray.data as rd

    t = synth_transcripts_table(80, seed=21)
    keys = doc_key_batch(t["conv_id"], t["turn_idx"].to_numpy())
    oracle = BM25Oracle(list(keys), t["text"].to_pylist())
    d = str(tmp_path_factory.mktemp("widx"))
    build_index(rd.from_arrow(t), d, num_shards=8, build_id="w1")
    return d, oracle


@pytest.mark.parametrize("k", [10, 100])
def test_wand_equals_exhaustive_and_oracle(setup, k):
    d, oracle = setup
    ex = SegmentServer(d, k=k, mode="exhaustive")
    wd = SegmentServer(d, k=k, mode="wand")
    queries = [q for _, q in seeded_query_set(60, seed=3)]
    # plus hand-picked shapes: head term alone, rare+head, no-match, dups
    queries += ["sa", "sa sa sa", "zzznotfound", "ka ro mi ten sol ar ve lun"]
    for q in queries:
        wk, ws = oracle.topk(q, k)
        gk, gs = wd.topk(q, k)
        ek, es = ex.topk(q, k)
        np.testing.assert_array_equal(gk, ek, err_msg=f"wand != exhaustive: {q}")
        np.testing.assert_array_equal(gs, es, err_msg=f"wand scores != exhaustive: {q}")
        np.testing.assert_array_equal(gk, wk, err_msg=f"wand != oracle: {q}")
        np.testing.assert_array_equal(gs, ws, err_msg=f"wand scores != oracle (bit): {q}")


def test_wand_prunes_head_term_blocks(setup):
    """The pruning must actually skip work: a rare+head query should not
    fully decode the head term's list."""
    d, _ = setup
    srv = SegmentServer(d, k=10, mode="wand")
    from engine.query import wand as W

    # find a head term (max df) and a rare term
    stats = {}
    for t in ["sa", "ro", "ka", "mi"]:
        _, df = srv._term_hits(t)
        stats[t] = df
    head = max(stats, key=stats.get)
    # rare term: pick from vocabulary tail via a query term with small df
    from engine.io.synth import _VOCAB

    rare = None
    for cand in _VOCAB[::-1]:
        _, df = srv._term_hits(cand)
        if 0 < df <= 5:
            rare = cand
            break
    assert rare is not None
    calls = {"full": 0}
    orig = W._TermList.full

    def counting_full(self, avgdl):
        calls["full"] += 1
        return orig(self, avgdl)

    W._TermList.full = counting_full
    try:
        srv.topk(f"{rare} {head}")
    finally:
        W._TermList.full = orig
    # the head term list must not be fully decoded (refinement via blocks)
    # full() may be called for the rare term's lists only
    assert calls["full"] <= 2, f"head list fully decoded ({calls} full decodes)"
