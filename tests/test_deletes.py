"""Doc-level deletes + purge (engine/index/deletes.py, merge.run_purge).

Semantics under test (the Lucene two-phase model):
  phase 1 — committed deletes take effect at QUERY time immediately in every
  scoring mode, while scores keep the index's committed stats (df/avgdl/
  n_docs move only at purge);
  phase 2 — run_purge rewrites segments + docmap + stats, after which the
  index is result-identical to a fresh build over the filtered corpus.
"""

import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from engine.core.dockey import doc_key_batch
from engine.index.build import build_index
from engine.index.deletes import delete_doc_keys, live_mask, load_deletes
from engine.index.merge import run_purge
from engine.io.manifest import Manifest
from engine.io.synth import synth_transcripts_table
from engine.oracle.bm25 import BM25Oracle, seeded_query_set
from engine.query.engine import SegmentServer
from engine.query.topk import topk_postings

N_CONVS = 50
K = 10
N_QUERIES = 12


@pytest.fixture(scope="module")
def env(tmp_path_factory, ray_session):
    tmp = tmp_path_factory.mktemp("deletes")
    t = synth_transcripts_table(N_CONVS, seed=11)
    corpus = str(tmp / "corpus.parquet")
    pq.write_table(t, corpus)
    idx = str(tmp / "idx")
    build_index(corpus, idx, num_shards=4, build_id="b0")
    keys = doc_key_batch(t["conv_id"], t["turn_idx"].to_numpy())
    texts = t["text"].to_pylist()
    # delete every turn of 5 convs + 3 scattered single turns
    convs = sorted(set(t["conv_id"].to_pylist()))
    dead_convs = set(convs[::11][:5])
    conv_col = np.asarray(t["conv_id"].to_pylist(), dtype=object)
    dead_mask = np.isin(conv_col, list(dead_convs))
    dead_mask[np.nonzero(~dead_mask)[0][[3, 17, 41]]] = True
    dead_keys = np.unique(keys[dead_mask])
    assert 0 < dead_keys.size < keys.size
    return tmp, idx, keys, texts, dead_mask, dead_keys


class TestLiveDeletes:
    def test_delete_commit_idempotent(self, env):
        tmp, idx, keys, texts, dead_mask, dead_keys = env
        n = delete_doc_keys(idx, dead_keys, delete_id="takedown1")
        assert n == dead_keys.size
        # same delete_id re-applied is a no-op
        assert delete_doc_keys(idx, dead_keys, delete_id="takedown1") == 0
        got = load_deletes(idx)
        np.testing.assert_array_equal(got, np.sort(dead_keys))

    @pytest.mark.parametrize("mode", ["wand", "exhaustive", "dense"])
    def test_all_modes_exclude_deleted_with_committed_stats(self, env, mode):
        """Expected top-k = full-corpus oracle scores (committed stats!)
        with deleted docs masked out — the deleted-docs-bitmap semantics."""
        tmp, idx, keys, texts, dead_mask, dead_keys = env
        oracle = BM25Oracle(list(keys), texts)
        srv = SegmentServer(idx, k=K, mode=mode)
        live = live_mask(oracle.doc_keys, np.sort(dead_keys))
        for qid, q in seeded_query_set(N_QUERIES, seed=3):
            sc = oracle.score_query(q)
            wk, ws = topk_postings(oracle.doc_keys[live], sc[live], K)
            gk, gs = srv.topk(q, K)
            np.testing.assert_array_equal(gk, wk, err_msg=f"mode={mode} q={q!r}")
            np.testing.assert_array_equal(gs, ws, err_msg=f"mode={mode} q={q!r}")
            assert not np.isin(gk, dead_keys).any()

    def test_conjunctive_and_not_exclude_deleted(self, env):
        tmp, idx, keys, texts, dead_mask, dead_keys = env
        csrv = SegmentServer(idx, k=K, conjunctive=True)
        srv = SegmentServer(idx, k=K)
        for qid, q in seeded_query_set(6, seed=4):
            gk, _ = csrv.topk(q, K)
            assert not np.isin(gk, dead_keys).any()
            gk2, _ = srv.topk(q, K, exclude=q.split()[0])
            assert not np.isin(gk2, dead_keys).any()

    def test_unknown_keys_are_harmless(self, env):
        tmp, idx, keys, texts, dead_mask, dead_keys = env
        # deleting keys the index never had changes nothing
        bogus = np.array([1, 2, 3], dtype=np.int64)
        assert delete_doc_keys(idx, bogus, delete_id="bogus") == 3

    def test_dsl_server_excludes_deleted(self, env):
        """The composable-DSL match stage honors the committed delete set
        (it inherits SegmentServer's _filter_deleted) — a deleted doc can
        never surface through any DSL gate combination."""
        from engine.query.dsl import DslServer

        tmp, idx, keys, texts, dead_mask, dead_keys = env
        srv = DslServer(idx, score_micro=True, specs={})
        for _qid, q in seeded_query_set(6, seed=9):
            toks = q.split()
            spec = {
                "boost": {t: 1.0 for t in toks},
                "must_all": sorted(set(toks[:1])), "must_any": [],
                "must_not": [], "should": sorted(set(toks[1:])),
                "msm": 0, "phrases": [], "range": None,
                "has_required": True,
            }
            dk, _sc = srv._matches(spec)
            assert not np.isin(dk, dead_keys).any(), q


class TestPurge:
    @pytest.fixture(scope="class")
    def purged(self, env):
        tmp, idx, keys, texts, dead_mask, dead_keys = env
        res = run_purge(idx)
        return res

    def test_purge_result_counts(self, env, purged):
        tmp, idx, keys, texts, dead_mask, dead_keys = env
        n_dead = len(np.unique(keys[dead_mask]))
        assert purged["purged_docs"] == n_dead
        assert purged["n_docs"] == len(np.unique(keys)) - n_dead
        assert load_deletes(idx).size == 0  # log cleared
        # stats rewritten to the filtered corpus
        m = Manifest(idx)
        assert m.stats["n_docs"] == purged["n_docs"]

    def test_purged_index_matches_fresh_build_bit_identical(
        self, env, purged, tmp_path_factory
    ):
        """The headline invariant: post-purge the index scores BIT-identically
        (keys and float64 scores) to a fresh build over the filtered corpus —
        df/cf/avgdl/n_docs all moved."""
        import pyarrow as pa

        tmp, idx, keys, texts, dead_mask, dead_keys = env
        t = synth_transcripts_table(N_CONVS, seed=11)
        filtered = t.filter(pa.array(~dead_mask))
        fresh_dir = tmp_path_factory.mktemp("fresh")
        fcorpus = str(fresh_dir / "filtered.parquet")
        pq.write_table(filtered, fcorpus)
        fresh_idx = str(fresh_dir / "idx")
        build_index(fcorpus, fresh_idx, num_shards=4, build_id="f0")
        assert Manifest(fresh_idx).stats == Manifest(idx).stats
        purged_srv = SegmentServer(idx, k=K)
        fresh_srv = SegmentServer(fresh_idx, k=K)
        for qid, q in seeded_query_set(N_QUERIES, seed=3):
            pk, ps = purged_srv.topk(q, K)
            fk, fs = fresh_srv.topk(q, K)
            np.testing.assert_array_equal(pk, fk, err_msg=f"q={q!r}")
            np.testing.assert_array_equal(ps, fs, err_msg=f"q={q!r}")

    def test_docmap_rewritten_and_audit_green(self, env, purged):
        from engine.index.build import audit_doc_keys
        from engine.query.hydrate import load_docmap_for_keys

        tmp, idx, keys, texts, dead_mask, dead_keys = env
        res = audit_doc_keys(idx)
        assert res["collisions"] == 0
        assert res["n_docs"] == purged["n_docs"]
        # hydrate: deleted keys are gone, surviving keys resolve
        alive = np.unique(keys[~dead_mask])[:5]
        mapping = load_docmap_for_keys(idx, np.concatenate([alive, dead_keys[:3]]))
        assert all(int(k) in mapping for k in alive)
        assert not any(int(k) in mapping for k in dead_keys[:3])

    def test_purge_empty_log_noop(self, env, purged):
        tmp, idx, keys, texts, dead_mask, dead_keys = env
        m_before = Manifest(idx).data
        res = run_purge(idx)
        assert res["purged_docs"] == 0 and res["shards"] == 0
        assert Manifest(idx).data == m_before

    def test_purge_on_bucketed_index(self, env, tmp_path_factory):
        """Purge must preserve a doc-bucketed layout: shard ids already
        encode the bucket offsets, so the per-shard rewrite is in-place and
        bucketed dense queries stay oracle-identical."""
        import pyarrow as pa
        import ray.data as rd

        tmp, idx, keys, texts, dead_mask, dead_keys = env
        t = synth_transcripts_table(N_CONVS, seed=11)
        bidx = str(tmp_path_factory.mktemp("bk") / "idx")
        build_index(rd.from_arrow(t), bidx, num_shards=4, build_id="bk", doc_buckets=2)
        assert Manifest(bidx).data["doc_buckets"] == 2
        delete_doc_keys(bidx, dead_keys, delete_id="bk-del")
        res = run_purge(bidx)
        assert res["purged_docs"] == len(np.unique(keys[dead_mask]))
        assert Manifest(bidx).data["doc_buckets"] == 2  # layout survives
        oracle = BM25Oracle(
            list(keys[~dead_mask]),
            [x for x, d in zip(texts, dead_mask) if not d],
        )
        for mode in ("exhaustive", "dense"):
            srv = SegmentServer(bidx, k=K, mode=mode)
            for qid, q in seeded_query_set(8, seed=5):
                wk, ws = oracle.topk(q, K)
                gk, gs = srv.topk(q, K)
                np.testing.assert_array_equal(gk, wk, err_msg=f"mode={mode}")
                np.testing.assert_array_equal(gs, ws, err_msg=f"mode={mode}")

    def test_incremental_build_after_purge(self, env, purged, tmp_path_factory):
        """A later build composes with a purge: stats accumulate on top of
        the purge's rewritten absolutes, both docmaps are live, and queries
        match an oracle over (filtered ∪ new) — the log-structured lifecycle
        end to end."""
        import pyarrow as pa

        tmp, idx, keys, texts, dead_mask, dead_keys = env
        extra = synth_transcripts_table(8, seed=77)
        # synth conv ids collide across seeds at the same index — remap to a
        # disjoint id range so (conv, turn) keys are unique across the union
        import pyarrow.compute as pc

        conv2 = pc.binary_join_element_wise(
            pa.scalar("x"), extra["conv_id"].combine_chunks().cast(pa.string()), ""
        )
        extra = extra.set_column(
            extra.column_names.index("conv_id"), "conv_id", conv2
        )
        d2 = tmp_path_factory.mktemp("inc")
        p2 = str(d2 / "extra.parquet")
        pq.write_table(extra, p2)
        build_index(p2, idx, num_shards=4, build_id="b1")
        ek = doc_key_batch(extra["conv_id"], extra["turn_idx"].to_numpy())
        all_keys = np.concatenate([keys[~dead_mask], ek])
        all_texts = [x for x, d in zip(texts, dead_mask) if not d] + extra["text"].to_pylist()
        assert Manifest(idx).stats["n_docs"] == len(np.unique(all_keys))
        oracle = BM25Oracle(list(all_keys), all_texts)
        srv = SegmentServer(idx, k=K)
        for qid, q in seeded_query_set(8, seed=6):
            wk, ws = oracle.topk(q, K)
            gk, gs = srv.topk(q, K)
            np.testing.assert_array_equal(gk, wk)
            np.testing.assert_array_equal(gs, ws)

    def test_dense_mode_after_purge(self, env, purged):
        """Stats fingerprint changed → stale sidecars must not poison dense
        scoring; dense == wand on the purged index."""
        tmp, idx, keys, texts, dead_mask, dead_keys = env
        dsrv = SegmentServer(idx, k=K, mode="dense")
        wsrv = SegmentServer(idx, k=K, mode="wand")
        for qid, q in seeded_query_set(6, seed=9):
            dk, ds = dsrv.topk(q, K)
            wk, ws = wsrv.topk(q, K)
            np.testing.assert_array_equal(dk, wk)
            np.testing.assert_array_equal(ds, ws)
