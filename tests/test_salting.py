"""Salting invariance (SURVEY.md §5.2d): salted and unsalted builds produce
identical query results; the sketch actually targets the head terms; salted
postings really scatter across the dedicated shard range."""

import numpy as np
import pytest

from engine.core.dockey import doc_key_batch
from engine.core.partitioning import SaltMap
from engine.index.build import build_index
from engine.index.skew import sketch_salt_map
from engine.io.manifest import Manifest
from engine.io.synth import synth_transcripts_table
from engine.oracle.bm25 import BM25Oracle, seeded_query_set
from engine.query.engine import SegmentServer


@pytest.fixture(scope="module")
def corpus(ray_session):
    t = synth_transcripts_table(80, seed=42)
    keys = doc_key_batch(t["conv_id"], t["turn_idx"].to_numpy())
    return t, BM25Oracle(list(keys), t["text"].to_pylist())


def test_sketch_finds_head_terms(corpus, tmp_path):
    import ray.data as rd

    t, oracle = corpus
    sm = sketch_salt_map(rd.from_arrow(t), num_shards=16, sample_docs=10_000)
    assert sm.ranges, "zipf corpus must trigger salting"
    # the salted terms should be the highest-cf terms
    cf = {term: int(tf.sum()) for term, (idx, tf) in oracle.postings.items()}
    top = sorted(cf, key=cf.get, reverse=True)[: max(3, len(sm.ranges))]
    assert set(sm.ranges) <= set(sorted(cf, key=cf.get, reverse=True)[: 5 * len(sm.ranges)])
    assert top[0] in sm.ranges
    # dedicated ranges are disjoint and above the base shard space
    spans = sorted(sm.ranges.values())
    cur = 16
    for start, fanout in spans:
        assert start >= cur
        cur = start + fanout


def test_salted_build_rank_identical_and_scattered(corpus, tmp_path, ray_session):
    import ray.data as rd

    t, oracle = corpus
    cf = {term: len(idx) for term, (idx, tf) in oracle.postings.items()}
    head = max(cf, key=cf.get)
    salt = SaltMap.allocate(4, {head: 3})
    idx_dir = str(tmp_path / "salted")
    build_index(rd.from_arrow(t), idx_dir, num_shards=4, salt_map=salt, build_id="s1")
    m = Manifest(idx_dir)
    # the head term's postings live in >1 segment of its dedicated range
    srv = SegmentServer(idx_dir, k=10)
    hits, df = srv._term_hits(head)
    assert df == cf[head]
    shards_with_head = {seg.meta["shard"] for seg, _ in hits}
    start, fanout = salt.ranges[head]
    assert shards_with_head <= set(range(start, start + fanout))
    assert len(shards_with_head) >= 2, "salting must actually scatter"
    # rank-identical to the oracle (de-salting correct), both modes
    for mode in ("exhaustive", "wand"):
        s = SegmentServer(idx_dir, k=10, mode=mode)
        for qid, q in seeded_query_set(20, seed=5):
            wk, ws = oracle.topk(q, 10)
            gk, gs = s.topk(q, 10)
            np.testing.assert_array_equal(gk, wk, err_msg=f"{mode}: {q}")
            np.testing.assert_array_equal(gs, ws, err_msg=f"{mode}: {q}")
        # the head term alone (pure salted path)
        wk, ws = oracle.topk(head, 10)
        gk, gs = s.topk(head, 10)
        np.testing.assert_array_equal(gk, wk)


def test_auto_salt_end_to_end(corpus, tmp_path, ray_session):
    import ray.data as rd

    t, oracle = corpus
    idx_dir = str(tmp_path / "auto")
    build_index(rd.from_arrow(t), idx_dir, num_shards=16, salt_map="auto", build_id="a1")
    m = Manifest(idx_dir)
    assert m.data["salt_map"]["ranges"], "auto sketch should salt the zipf heads"
    srv = SegmentServer(idx_dir, k=10)
    for qid, q in seeded_query_set(10, seed=6):
        wk, ws = oracle.topk(q, 10)
        gk, gs = srv.topk(q, 10)
        np.testing.assert_array_equal(gk, wk)
        np.testing.assert_array_equal(gs, ws)
