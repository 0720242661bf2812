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
    # instrument the REAL decode seams (VERDICT r01 "what's wrong" #2): a
    # full gap decode happens in Segment.read_postings (decode_all of all 3
    # streams) — counting _TermList.full alone misses decodes reached via
    # seg.weights / tl.keys()
    from engine.index.segment import Segment

    head_idxs = set()
    for seg, idx in srv._term_hits(head)[0]:
        head_idxs.add((seg.path, idx))
    calls = {"full_head": 0, "full_any": 0}
    orig_rp = Segment.read_postings

    def counting_rp(self, idx):
        calls["full_any"] += 1
        if (self.path, idx) in head_idxs:
            calls["full_head"] += 1
        return orig_rp(self, idx)

    Segment.read_postings = counting_rp
    try:
        srv.topk(f"{rare} {head}")
    finally:
        Segment.read_postings = orig_rp
    # the head term's gap stream must never be fully decoded: weights come
    # from decode_tfdl, candidate keys from per-block decode_range
    assert calls["full_head"] == 0, f"head list fully decoded ({calls})"
