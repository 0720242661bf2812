"""Persistent QueryService (engine/query/service.py): resident actor pool,
rank/score-identical to the oracle in both full-view and doc-bucketed modes,
and warm across calls (the LRU survives between batches)."""

import numpy as np
import pytest

from engine.core.dockey import doc_key_batch
from engine.index.build import build_index
from engine.io.synth import synth_transcripts_table
from engine.oracle.bm25 import BM25Oracle, seeded_query_set


@pytest.fixture(scope="module")
def env(tmp_path_factory, ray_session):
    import ray.data as rd

    t = synth_transcripts_table(60, seed=23)
    keys = doc_key_batch(t["conv_id"], t["turn_idx"].to_numpy())
    oracle = BM25Oracle(list(keys), t["text"].to_pylist())
    full_idx = str(tmp_path_factory.mktemp("svc_full"))
    build_index(rd.from_arrow(t), full_idx, num_shards=4, build_id="sv")
    bkt_idx = str(tmp_path_factory.mktemp("svc_bkt"))
    build_index(rd.from_arrow(t), bkt_idx, num_shards=4, build_id="sb", doc_buckets=3)
    return full_idx, bkt_idx, oracle


def _assert_oracle_identical(res, oracle, queries, k=10):
    df = res.to_pandas()
    for qid, q in queries:
        want_k, want_s = oracle.topk(q, k)
        sub = df[df.qid == qid].sort_values("rank")
        np.testing.assert_array_equal(sub["doc_key"].to_numpy(), want_k, err_msg=q)
        np.testing.assert_array_equal(sub["score"].to_numpy(), want_s, err_msg=q)


def test_service_full_view_rank_identical(env):
    from engine.query.service import QueryService

    full_idx, _, oracle = env
    svc = QueryService(full_idx, n_servers=3, k=10, mode="wand")
    try:
        queries = seeded_query_set(20, seed=3)
        _assert_oracle_identical(svc.topk_batch(queries), oracle, queries)
        # second call on the SAME resident pool (warm LRUs), different
        # round-robin offset — still exact
        queries2 = seeded_query_set(20, seed=4)
        _assert_oracle_identical(svc.topk_batch(queries2), oracle, queries2)
    finally:
        svc.close()


def test_service_dense_sidecars_rank_identical(env):
    """The production fast path: resident pool in mode='dense' over persisted
    sidecars — exact across calls, on both flat and bucketed layouts."""
    from engine.query.densify import densify_index
    from engine.query.service import QueryService

    full_idx, bkt_idx, oracle = env
    for idx in (full_idx, bkt_idx):
        assert densify_index(idx)["densified"] > 0
        svc = QueryService(idx, n_servers=2, k=10, mode="dense")
        try:
            for seed in (6, 7):  # second batch = warm buffers, still exact
                queries = seeded_query_set(15, seed=seed)
                _assert_oracle_identical(svc.topk_batch(queries), oracle, queries)
        finally:
            svc.close()


def test_service_bucketed_rank_identical(env):
    from engine.query.service import QueryService

    _, bkt_idx, oracle = env
    svc = QueryService(bkt_idx, k=10, doc_bucket_mode=True)
    try:
        assert len(svc._actors) == 3  # one per doc bucket
        queries = seeded_query_set(20, seed=5)
        _assert_oracle_identical(svc.topk_batch(queries), oracle, queries)
    finally:
        svc.close()


def test_service_survives_actor_death(env):
    """Scoring is idempotent → a killed actor restarts transparently
    (max_restarts) and the next batch still returns oracle-exact results."""
    import ray

    from engine.query.service import QueryService

    full_idx, _, oracle = env
    svc = QueryService(full_idx, n_servers=2, k=10, mode="wand")
    try:
        queries = seeded_query_set(10, seed=6)
        _assert_oracle_identical(svc.topk_batch(queries), oracle, queries)
        ray.kill(svc._actors[0], no_restart=False)
        _assert_oracle_identical(svc.topk_batch(queries), oracle, queries)
    finally:
        svc.close()


def test_service_bucketed_requires_bucketed_index(env):
    from engine.query.service import QueryService

    full_idx, _, _ = env
    with pytest.raises(ValueError, match="doc_buckets"):
        QueryService(full_idx, doc_bucket_mode=True)


def test_service_bucketed_heals_stale_or_missing_term_stats(tmp_path, ray_session):
    """A stale or missing term_stats artifact must be REBUILT by the bucketed
    service, not broadcast as-is (stale df silently mis-scores every query)
    or crashed on (FileNotFoundError). The build normally refreshes it after
    every bucketed commit, but a crash in the window between manifest.commit
    and build_term_stats — or an operator rm — leaves exactly this state."""
    import json
    import os
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from engine.query.service import QueryService

    t = synth_transcripts_table(40, seed=31)
    idx = str(tmp_path / "stale_ts_idx")
    build_index(rd.from_arrow(t), idx, num_shards=4, build_id="a", doc_buckets=3)
    keys = doc_key_batch(t["conv_id"], t["turn_idx"].to_numpy())
    oracle = BM25Oracle(list(keys), t["text"].to_pylist())
    queries = seeded_query_set(15, seed=8)
    ts_dir = os.path.join(idx, "term_stats")

    # 1) STALE: poison the artifact with wrong df + a mismatched fingerprint
    #    (what a crash between commit and build_term_stats leaves behind)
    tbl = pq.read_table(os.path.join(ts_dir, [f for f in os.listdir(ts_dir) if f.endswith(".parquet")][0]))
    poisoned = tbl.set_column(tbl.column_names.index("df"),
                              "df", pa.array([1] * tbl.num_rows, type=tbl["df"].type))
    shutil.rmtree(ts_dir)
    os.makedirs(ts_dir)
    pq.write_table(poisoned, os.path.join(ts_dir, "poisoned.parquet"))
    with open(os.path.join(ts_dir, "_STATS.json"), "w") as f:
        json.dump({"n_docs": 1, "sum_dl": 1}, f)
    svc = QueryService(idx, k=10, doc_bucket_mode=True)
    try:
        _assert_oracle_identical(svc.topk_batch(queries), oracle, queries)
    finally:
        svc.close()

    # 2) MISSING: no artifact at all — must rebuild, not raise
    shutil.rmtree(ts_dir)
    svc = QueryService(idx, k=10, doc_bucket_mode=True)
    try:
        _assert_oracle_identical(svc.topk_batch(queries), oracle, queries)
    finally:
        svc.close()


def test_service_empty_batch_and_cache_zero(env):
    """Review regressions: topk_batch([]) must return an empty table (it
    raised ArrowInvalid), and cache_postings=0 must reach the actors (the
    truthiness test silently restored the default)."""
    from engine.query.service import QueryService

    full_idx, _, _ = env
    svc = QueryService(full_idx, n_servers=2, k=5, cache_postings=0)
    try:
        out = svc.topk_batch([])
        assert out.num_rows == 0
        assert set(out.column_names) == {"qid", "rank", "doc_key", "score"}
        res = svc.topk_batch([(0, "hash")])
        assert res.num_rows >= 0  # runs with LRU disabled
    finally:
        svc.close()
