"""Index snapshot/restore (engine/index/snapshot.py).

Contract: a snapshot is a point-in-time, immutable, QUERYABLE index
directory — opening it with any reader is the restore. Mutations to the
original after the snapshot (deletes, purge, gc) must never leak into it,
and deletes committed BEFORE the snapshot must be carried."""

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from engine.core.dockey import doc_key_batch
from engine.index.build import build_index
from engine.index.deletes import delete_doc_keys
from engine.index.merge import gc_tombstoned, run_purge
from engine.index.snapshot import create_snapshot
from engine.io.synth import synth_transcripts_table
from engine.oracle.bm25 import seeded_query_set
from engine.query.engine import SegmentServer


def _topk(idx: str, k: int = 10):
    srv = SegmentServer(idx, k=k, score_micro=True)
    qs = seeded_query_set(8, seed=13)
    t = pa.table({
        "qid": pa.array([q for q, _ in qs], pa.int64()),
        "text": pa.array([t for _, t in qs], pa.string()),
    })
    out = srv(t).to_pandas()
    return out.sort_values(["qid", "rank"]).reset_index(drop=True)


@pytest.fixture(scope="module")
def env(tmp_path_factory, ray_session):
    tmp = tmp_path_factory.mktemp("snap")
    t = synth_transcripts_table(40, seed=23)
    corpus = str(tmp / "corpus.parquet")
    pq.write_table(t, corpus)
    idx = str(tmp / "idx")
    build_index(corpus, idx, num_shards=4, build_id="s0")
    keys = doc_key_batch(t["conv_id"], t["turn_idx"].to_numpy())
    return tmp, idx, np.asarray(keys)


def test_snapshot_is_immutable_under_purge(env, ray_session):
    """Delete + purge + gc on the ORIGINAL must not change the snapshot's
    rankings; the original must change."""
    tmp, idx, keys = env
    before = _topk(idx)
    snap = str(tmp / "snap1")
    info = create_snapshot(idx, snap)
    assert info["segments"] > 0 and info["files"] > 0

    # mutate the original: kill the top hit of every query, fold, gc
    dead = np.unique(before.groupby("qid").head(1)["doc_key"].to_numpy())
    delete_doc_keys(idx, dead, delete_id="snaptest")
    run_purge(idx)
    gc_tombstoned(idx)

    after_orig = _topk(idx)
    assert set(after_orig["doc_key"]) .isdisjoint(set(dead))
    after_snap = _topk(snap)
    import pandas as pd

    pd.testing.assert_frame_equal(after_snap, before)


def test_snapshot_carries_prior_deletes(env, ray_session):
    """A delete committed BEFORE the snapshot is honoured by it."""
    tmp, idx, keys = env
    cur = _topk(idx)
    dead = np.unique(cur.groupby("qid").head(1)["doc_key"].to_numpy())
    delete_doc_keys(idx, dead, delete_id="pre-snap")
    snap = str(tmp / "snap2")
    create_snapshot(idx, snap)
    got = _topk(snap)
    assert set(got["doc_key"]).isdisjoint(set(dead))
    # and the snapshot dir carries the delete-set file itself
    m = json.load(open(os.path.join(snap, "manifest.json")))
    assert any(d["id"] == "pre-snap" for d in m.get("deletes", []))


def test_snapshot_refuses_existing_target(env):
    tmp, idx, _keys = env
    snap = str(tmp / "snap3")
    create_snapshot(idx, snap)
    with pytest.raises(FileExistsError):
        create_snapshot(idx, snap)


def test_snapshot_manifest_has_no_tombstones(env):
    tmp, idx, _keys = env
    snap = str(tmp / "snap4")
    create_snapshot(idx, snap)
    m = json.load(open(os.path.join(snap, "manifest.json")))
    for b in m["builds"]:
        assert all(not s.get("tombstone") for s in b["segments"])
    # every referenced segment dir exists in the snapshot
    for b in m["builds"]:
        for s in b["segments"]:
            assert os.path.isdir(os.path.join(snap, "segments", s["name"]))
