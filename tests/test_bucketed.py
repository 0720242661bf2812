"""Doc-bucketed build + per-bucket-heap query == oracle, bit-identical
(the 'merging per-shard heaps' scale path; SURVEY.md §2.7-P3/P4)."""

import numpy as np
import pytest

from engine.core.dockey import doc_key_batch
from engine.index.build import build_index
from engine.io.manifest import Manifest
from engine.io.synth import synth_transcripts_table
from engine.oracle.bm25 import BM25Oracle, seeded_query_set
from engine.query.bucketed import query_bucketed
from engine.query.engine import SegmentServer


@pytest.fixture(scope="module")
def env(tmp_path_factory, ray_session):
    import ray.data as rd

    t = synth_transcripts_table(60, seed=17)
    keys = doc_key_batch(t["conv_id"], t["turn_idx"].to_numpy())
    oracle = BM25Oracle(list(keys), t["text"].to_pylist())
    idx = str(tmp_path_factory.mktemp("bidx"))
    build_index(rd.from_arrow(t), idx, num_shards=4, build_id="bk", doc_buckets=3)
    return idx, oracle


def test_layout_and_term_stats(env):
    import os

    idx, oracle = env
    m = Manifest(idx)
    assert m.data["doc_buckets"] == 3
    shards = {s["shard"] for s in m.live_segments()}
    assert max(shards) >= 4  # bucket offsets present
    assert os.path.isdir(os.path.join(idx, "term_stats"))
    # term_stats df == oracle df
    import pyarrow.dataset as pads

    tbl = pads.dataset(os.path.join(idx, "term_stats")).to_table().to_pandas()
    for term, (docs, tf) in list(oracle.postings.items())[::29]:
        row = tbl[tbl.term == term]
        assert len(row) == 1 and int(row["df"].iloc[0]) == len(docs)


def test_bucket_server_local_view(env):
    idx, oracle = env
    # each bucket server sees only its doc slice; dfs come from overrides
    import ray

    term = max(oracle.postings, key=lambda t: len(oracle.postings[t][0]))
    want_df = len(oracle.postings[term][0])
    ref = ray.put({term: want_df})
    total_local = 0
    for b in range(3):
        srv = SegmentServer(idx, k=10, bucket=b, df_overrides_ref=ref)
        hits, df = srv._term_hits(term)
        assert df == want_df  # global df via override
        for seg, i in hits:
            dk, tf, dl = seg.read_postings(i)
            assert (dk % 3 == b).all(), "bucket leakage"
            total_local += dk.size
    assert total_local == want_df


@pytest.mark.parametrize("mode", ["exhaustive", "wand", "dense"])
def test_bucketed_rank_identical(env, mode):
    idx, oracle = env
    queries = seeded_query_set(25, seed=9)
    res = query_bucketed(idx, queries, k=10, mode=mode).to_pandas()
    for qid, q in queries:
        want_k, want_s = oracle.topk(q, 10)
        sub = res[res.qid == qid].sort_values("rank")
        np.testing.assert_array_equal(sub["doc_key"].to_numpy(), want_k, err_msg=f"{mode}:{q}")
        np.testing.assert_array_equal(sub["score"].to_numpy(), want_s, err_msg=f"{mode}:{q}")


def test_expensive_analyzer_bucketed_build(tmp_path_factory, ray_session):
    """The actor-pool (expensive-analyzer) build path must thread doc_buckets
    through to the emit stage: ADVICE r01 found it silently produced an
    unbucketed layout. Build with a registered expensive analyzer +
    doc_buckets=2 and check the layout + bucketed-query rank identity."""
    import ray.data as rd

    from engine.text.analyzer import Analyzer, register_analyzer

    class SlowAnalyzer(Analyzer):
        name = "slow_test"
        # tokens() inherited → identical tokens, but the override-detection
        # in tokenize_arrow must still route through the plugin path

        def tokens(self, text):
            return super().tokens(text)

    register_analyzer("slow_test", SlowAnalyzer, expensive=True)
    t = synth_transcripts_table(40, seed=23)
    keys = doc_key_batch(t["conv_id"], t["turn_idx"].to_numpy())
    oracle = BM25Oracle(list(keys), t["text"].to_pylist())
    idx = str(tmp_path_factory.mktemp("expidx"))
    build_index(
        rd.from_arrow(t), idx, num_shards=4, build_id="exp",
        analyzer="slow_test", doc_buckets=2,
    )
    m = Manifest(idx)
    assert m.data["doc_buckets"] == 2
    # bucketed layout really materialised: shards beyond the base space
    shards = {s["shard"] for s in m.live_segments()}
    assert max(shards) >= 4, f"unbucketed layout: {sorted(shards)}"
    res = query_bucketed(idx, seeded_query_set(10, seed=3), k=10).to_pandas()
    for qid, q in seeded_query_set(10, seed=3):
        want_k, want_s = oracle.topk(q, 10)
        got = res[res.qid == qid].sort_values("rank")
        np.testing.assert_array_equal(got["doc_key"].to_numpy(), want_k, err_msg=q)


@pytest.mark.parametrize("mode", ["exhaustive", "wand", "dense"])
def test_rebucket_at_compaction_rank_identical(tmp_path_factory, ray_session, mode):
    """Unbucketed runs build → run_merge(doc_buckets=D) rewrites every shard
    into the doc-bucketed layout with NO extra shuffle; bucketed queries are
    then rank/score-identical to the oracle."""
    import os

    import ray.data as rd

    from engine.index.merge import run_merge

    t = synth_transcripts_table(60, seed=23)
    keys = doc_key_batch(t["conv_id"], t["turn_idx"].to_numpy())
    oracle = BM25Oracle(list(keys), t["text"].to_pylist())
    idx = str(tmp_path_factory.mktemp(f"rbidx_{mode}"))
    build_index(rd.from_arrow(t), idx, num_shards=4, build_id="rb")  # unbucketed
    assert Manifest(idx).data["doc_buckets"] == 1
    run_merge(idx, doc_buckets=3)
    m = Manifest(idx)
    assert m.data["doc_buckets"] == 3
    assert os.path.isdir(os.path.join(idx, "term_stats"))
    # every live segment belongs to a bucketed shard id and holds only its docs
    from engine.core.partitioning import SaltMap

    s_total = SaltMap.from_json(m.data["salt_map"]).num_total_shards
    for s in m.live_segments():
        assert 0 <= s["shard"] < 3 * s_total
    if mode == "dense":
        # bucketed + persisted sidecars: positions are bucket-relative
        from engine.query.densify import densify_index

        assert densify_index(idx)["densified"] > 0
    queries = seeded_query_set(25, seed=11)
    res = query_bucketed(idx, queries, k=10, mode=mode).to_pandas()
    for qid, q in queries:
        want_k, want_s = oracle.topk(q, 10)
        sub = res[res.qid == qid].sort_values("rank")
        np.testing.assert_array_equal(sub["doc_key"].to_numpy(), want_k, err_msg=f"{mode}:{q}")
        np.testing.assert_array_equal(sub["score"].to_numpy(), want_s, err_msg=f"{mode}:{q}")
    # a FULL-VIEW server on the bucketed index must see every bucket (not
    # silently only bucket 0) and stay oracle-identical
    srv = SegmentServer(idx, k=10, mode=mode)
    for qid, q in queries[:8]:
        want_k, want_s = oracle.topk(q, 10)
        got_k, got_s = srv.topk(q)
        np.testing.assert_array_equal(got_k, want_k, err_msg=f"fullview {mode}:{q}")
        np.testing.assert_array_equal(got_s, want_s, err_msg=f"fullview {mode}:{q}")
