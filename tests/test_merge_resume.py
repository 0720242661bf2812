"""Tiered merge determinism + checkpoint/resume (SURVEY.md §5.2b, §5.4;
BASELINE.json:14 'resumable from checkpoint with per-partition lineage',
BASELINE.json:6 'partial builds compose deterministically')."""

import os
import shutil

import numpy as np
import pyarrow.parquet as pq
import pytest

from engine.core.dockey import doc_key_batch
from engine.index.build import build_index
from engine.index.merge import gc_tombstoned, plan_merges, run_merge
from engine.io.manifest import Manifest
from engine.io.synth import synth_transcripts_table
from engine.oracle.bm25 import BM25Oracle, seeded_query_set
from engine.query.engine import SegmentServer


def _write_fragments(tmp_path, n_convs=60, n_frags=4, seed=5):
    """Corpus split into parquet fragments (simulating arriving batches)."""
    t = synth_transcripts_table(n_convs, seed=seed)
    d = str(tmp_path / "frags")
    os.makedirs(d, exist_ok=True)
    convs = t["conv_id"].to_pandas().unique()
    bounds = np.array_split(np.arange(len(convs)), n_frags)
    import pyarrow.compute as pc

    for i, idxs in enumerate(bounds):
        sel = t.filter(pc.is_in(t["conv_id"], value_set=__import__("pyarrow").array(convs[idxs])))
        pq.write_table(sel, os.path.join(d, f"frag-{i:03d}.parquet"))
    return d, t


class TestIncrementalAndMerge:
    @pytest.fixture(scope="class")
    def env(self, tmp_path_factory, ray_session):
        tmp = tmp_path_factory.mktemp("mr")
        frag_dir, t = _write_fragments(tmp)
        keys = doc_key_batch(t["conv_id"], t["turn_idx"].to_numpy())
        oracle = BM25Oracle(list(keys), t["text"].to_pylist())
        return tmp, frag_dir, oracle

    def test_incremental_builds_then_merge_rank_identical(self, env):
        tmp, frag_dir, oracle = env
        idx = str(tmp / "idx_inc")
        frags = sorted(os.listdir(frag_dir))
        # four partial builds (one fragment each) — tier-0 segments pile up
        for i, f in enumerate(frags):
            build_index(os.path.join(frag_dir, f), idx, num_shards=4, build_id=f"b{i}")
        m = Manifest(idx)
        assert len(m.live_segments()) >= 4
        srv = SegmentServer(idx, k=10)
        for qid, q in seeded_query_set(15, seed=2):
            wk, ws = oracle.topk(q, 10)
            gk, gs = srv.topk(q, 10)
            np.testing.assert_array_equal(gk, wk)
            np.testing.assert_array_equal(gs, ws)
        # tiered merge: fanin 4 → one tier-1 segment per shard
        n = run_merge(idx, fanin=4)
        assert n >= 1
        m2 = Manifest(idx)
        live = m2.live_segments()
        assert all(s["tier"] == 1 for s in live if s["shard"] in {p["shard"] for p in []} or True)
        # post-merge: still rank-identical, same stats
        assert m2.stats == m.stats
        srv2 = SegmentServer(idx, k=10)
        for qid, q in seeded_query_set(15, seed=2):
            wk, ws = oracle.topk(q, 10)
            gk, gs = srv2.topk(q, 10)
            np.testing.assert_array_equal(gk, wk)
            np.testing.assert_array_equal(gs, ws)
        # tombstoned segments GC'd from disk
        on_disk = set(os.listdir(os.path.join(idx, "segments")))
        assert on_disk == {s["name"] for s in live}

    def test_sidecar_lifecycle_across_merge(self, env, tmp_path):
        """Dense sidecars die with their segment at merge-time GC; a
        re-densify covers the new segments; dense queries stay
        rank-identical through the whole cycle."""
        from engine.index.merge import gc_orphans
        from engine.query.densify import densify_index

        tmp, frag_dir, oracle = env
        idx = str(tmp_path / "idx_sc")
        for i, f in enumerate(sorted(os.listdir(frag_dir))):
            build_index(os.path.join(frag_dir, f), idx, num_shards=4, build_id=f"s{i}")
        assert densify_index(idx)["densified"] > 0
        pre = set(os.listdir(os.path.join(idx, "dense")))
        assert run_merge(idx, fanin=4) >= 1
        # merged-away segments' sidecars were removed with their segments
        live = {s["name"] for s in Manifest(idx).live_segments()}
        assert set(os.listdir(os.path.join(idx, "dense"))) == (pre & live)
        # refresh (the CLI `merge --densify` path) covers the new segments
        res = densify_index(idx)
        assert res["densified"] > 0
        assert set(os.listdir(os.path.join(idx, "dense"))) == live
        gc_orphans(idx)  # no live sidecar may be GC'd
        assert set(os.listdir(os.path.join(idx, "dense"))) == live
        srv = SegmentServer(idx, k=10, mode="dense")
        for qid, q in seeded_query_set(10, seed=3):
            wk, ws = oracle.topk(q, 10)
            gk, gs = srv.topk(q, 10)
            np.testing.assert_array_equal(gk, wk)
            np.testing.assert_array_equal(gs, ws)

    def test_sidecar_stale_after_incremental_build(self, env, tmp_path):
        """Sidecar weights bake in global stats (n_docs/avgdl/df); an
        incremental build changes them. The loader must REJECT the stale
        sidecars (fingerprint mismatch) and fall back to live computation —
        still oracle-exact — and densify_index must rewrite, not skip."""
        from engine.query.densify import densify_index

        tmp, frag_dir, oracle = env
        idx = str(tmp_path / "idx_stale")
        frags = sorted(os.listdir(frag_dir))
        for i, f in enumerate(frags[:-1]):
            build_index(os.path.join(frag_dir, f), idx, num_shards=4, build_id=f"p{i}")
        first = densify_index(idx)
        assert first["densified"] > 0
        # incremental build: global n_docs/sum_dl change under the sidecars
        build_index(os.path.join(frag_dir, frags[-1]), idx, num_shards=4,
                    build_id="plast")
        srv = SegmentServer(idx, k=10, mode="dense")
        srv._ensure_dense()
        assert all(
            srv._sidecar(srv._segment(p)) is None
            for paths in srv._by_shard.values()
            for p in paths
        ), "stale sidecar accepted despite changed global stats"
        for qid, q in seeded_query_set(10, seed=4):
            wk, ws = oracle.topk(q, 10)
            gk, gs = srv.topk(q, 10)
            np.testing.assert_array_equal(gk, wk)
            np.testing.assert_array_equal(gs, ws)
        # re-densify REWRITES every live sidecar under the new stats
        res = densify_index(idx)
        assert res["densified"] == len(Manifest(idx).live_segments())
        srv2 = SegmentServer(idx, k=10, mode="dense")
        srv2._ensure_dense()
        assert all(
            srv2._sidecar(srv2._segment(p)) is not None
            for paths in srv2._by_shard.values()
            for p in paths
        )
        for qid, q in seeded_query_set(10, seed=4):
            wk, ws = oracle.topk(q, 10)
            gk, gs = srv2.topk(q, 10)
            np.testing.assert_array_equal(gk, wk)
            np.testing.assert_array_equal(gs, ws)

    def test_merge_deterministic_any_order(self, env, tmp_path):
        """Merging [A,B] then with [C,D] == one merge of [A,B,C,D] contents:
        dict tables and postings bytes identical (associative fold)."""
        tmp, frag_dir, oracle = env
        import pyarrow.parquet as pqq

        idx_a = str(tmp_path / "a")
        idx_b = str(tmp_path / "b")
        frags = sorted(os.listdir(frag_dir))
        for tgt in (idx_a, idx_b):
            for i, f in enumerate(frags):
                build_index(os.path.join(frag_dir, f), tgt, num_shards=4, build_id=f"b{i}")
        run_merge(idx_a, fanin=4, merge_id="mA")          # one merge of 4
        run_merge(idx_b, fanin=2, merge_id="mB1")          # pairwise...
        run_merge(idx_b, fanin=2, merge_id="mB2")          # ...then again
        sa = sorted(Manifest(idx_a).live_segments(), key=lambda s: s["shard"])
        sb = sorted(Manifest(idx_b).live_segments(), key=lambda s: s["shard"])
        assert [s["shard"] for s in sa] == [s["shard"] for s in sb]
        for x, y in zip(sa, sb):
            da = pqq.read_table(os.path.join(idx_a, "segments", x["name"], "dict.parquet"))
            db = pqq.read_table(os.path.join(idx_b, "segments", y["name"], "dict.parquet"))
            assert da.equals(db), f"shard {x['shard']} dicts differ"
            ba = open(os.path.join(idx_a, "segments", x["name"], "postings.bin"), "rb").read()
            bb = open(os.path.join(idx_b, "segments", y["name"], "postings.bin"), "rb").read()
            assert ba == bb, f"shard {x['shard']} postings differ"


class TestResume:
    def test_resume_skips_indexed_fragments(self, tmp_path, ray_session):
        frag_dir, t = _write_fragments(tmp_path, n_convs=40, n_frags=4, seed=9)
        idx = str(tmp_path / "idx")
        frags = [os.path.join(frag_dir, f) for f in sorted(os.listdir(frag_dir))]
        # "crash" after indexing only the first two fragments
        build_index(frags[:2], idx, num_shards=4, build_id="part1")
        m1 = Manifest(idx)
        n_docs_1 = m1.stats["n_docs"]
        assert set(m1.indexed_fragments()) == set(frags[:2])
        # resume over the FULL input list: only pending fragments are read
        build_index(frags, idx, num_shards=4, build_id="part2")
        m2 = Manifest(idx)
        assert set(m2.indexed_fragments()) == set(frags)
        assert m2.stats["n_docs"] == t.num_rows > n_docs_1
        # a third run is a no-op (nothing pending)
        before = open(os.path.join(idx, "manifest.json")).read()
        build_index(frags, idx, num_shards=4, build_id="part3")
        assert open(os.path.join(idx, "manifest.json")).read() == before
        # and the resumed index is rank-identical to a fresh full build
        keys = doc_key_batch(t["conv_id"], t["turn_idx"].to_numpy())
        oracle = BM25Oracle(list(keys), t["text"].to_pylist())
        srv = SegmentServer(idx, k=10)
        for qid, q in seeded_query_set(10, seed=4):
            wk, ws = oracle.topk(q, 10)
            gk, gs = srv.topk(q, 10)
            np.testing.assert_array_equal(gk, wk)
            np.testing.assert_array_equal(gs, ws)


class TestReplacedCorpusGuard:
    """A resumed build against a REGENERATED input directory (new fragment
    names, committed ones deleted — e.g. a synth re-run over the same path)
    must refuse: it would index every document a second time, breaking the
    per-doc_key uniqueness invariant (doubled n_docs/df, duplicate-key
    postings that defeat the MaxScore admission bound)."""

    def test_resume_on_replaced_corpus_raises(self, tmp_path, ray_session):
        frag_dir, _t = _write_fragments(tmp_path, n_convs=20, n_frags=2, seed=3)
        idx = str(tmp_path / "idx")
        build_index(frag_dir, idx, num_shards=4, build_id="b1")
        # regenerate the corpus in place: new fragment names, old ones gone
        for f in os.listdir(frag_dir):
            os.rename(os.path.join(frag_dir, f), os.path.join(frag_dir, "new-" + f))
        with pytest.raises(ValueError, match="replaced"):
            build_index(frag_dir, idx, num_shards=4, build_id="b2")
        # committed fragments ARCHIVED elsewhere + a genuinely-new input dir
        # stays a legal incremental build (guard keys on the directory)
        frag_dir2, _ = _write_fragments(tmp_path / "more", n_convs=10, n_frags=1, seed=7)
        build_index(frag_dir2, idx, num_shards=4, build_id="b3")
        assert any(b["build_id"] == "b3" for b in Manifest(idx).data["builds"])

    def test_resume_on_same_name_regeneration_raises(self, tmp_path, ray_session):
        """Regeneration that REUSES fragment filenames (deterministic names
        like frag-000.parquet) changes no path, so pending_fragments sees
        nothing new — without the size/mtime lineage check the build would
        silently no-op and keep serving the OLD corpus."""
        frag_dir, _t = _write_fragments(tmp_path, n_convs=20, n_frags=2, seed=3)
        idx = str(tmp_path / "idx")
        build_index(frag_dir, idx, num_shards=4, build_id="b1")
        # rewrite one fragment in place: same name, different content
        f0 = os.path.join(frag_dir, sorted(os.listdir(frag_dir))[0])
        t_new = synth_transcripts_table(5, seed=99)
        pq.write_table(t_new, f0)
        with pytest.raises(ValueError, match="replaced"):
            build_index(frag_dir, idx, num_shards=4, build_id="b2")

    def test_relative_path_respelling_is_not_new_input(self, tmp_path, ray_session):
        """The same corpus addressed relative vs absolute must resume as a
        no-op, not double-index (lineage paths are abspath-normalized)."""
        frag_dir, _t = _write_fragments(tmp_path, n_convs=15, n_frags=2, seed=4)
        idx = str(tmp_path / "idx")
        rel = os.path.relpath(frag_dir)
        build_index(rel, idx, num_shards=4, build_id="b1")
        n1 = Manifest(idx).stats["n_docs"]
        build_index(frag_dir, idx, num_shards=4, build_id="b2")  # absolute
        m = Manifest(idx)
        assert m.stats["n_docs"] == n1  # no silent doubling
        assert not any(b["build_id"] == "b2" for b in m.data["builds"])

    def test_wand_never_silently_empty_on_duplicate_keys(self, tmp_path, ray_session):
        """Safety net below the guard: on an index whose uniqueness invariant
        is already broken (same corpus force-committed twice), WAND must
        return exact-scored matches, not an empty result."""
        frag_dir, _t = _write_fragments(tmp_path, n_convs=20, n_frags=2, seed=3)
        idx = str(tmp_path / "idx2")
        build_index(frag_dir, idx, num_shards=4, build_id="d1")
        build_index(frag_dir, idx, num_shards=4, build_id="d2", resume=False)
        srv_ex = SegmentServer(idx, k=5)  # exhaustive (default mode)
        srv_w = SegmentServer(idx, k=5, mode="wand")
        for qid, q in seeded_query_set(5, seed=8):
            ek, _es = srv_ex.topk(q, 5)
            wk, _ws = srv_w.topk(q, 5)
            assert len(wk) > 0 and len(ek) > 0
            # every WAND hit is a real match (scores on invariant-violating
            # indexes are undefined — the guard above is the real contract;
            # this only pins "non-empty, no phantom docs")
            all_matches = set(srv_ex.topk(q, 10_000)[0])
            assert set(wk) <= all_matches


class TestCrashResume:
    """SURVEY §5.4: crash AFTER segments are written but BEFORE the manifest
    commit → re-run → same query results as an uninterrupted build; orphan
    segments stay invisible (VERDICT r01 missing #4)."""

    def test_crash_before_commit_then_rerun(self, tmp_path, ray_session, monkeypatch):
        frag_dir, t = _write_fragments(tmp_path, n_convs=40, seed=11)
        keys = doc_key_batch(t["conv_id"], t["turn_idx"].to_numpy())
        oracle = BM25Oracle(list(keys), t["text"].to_pylist())

        crash_dir = str(tmp_path / "crash_idx")
        orig_commit = Manifest.commit

        def exploding_commit(self):
            raise RuntimeError("simulated crash before manifest commit")

        monkeypatch.setattr(Manifest, "commit", exploding_commit)
        with pytest.raises(RuntimeError, match="simulated crash"):
            build_index(frag_dir, crash_dir, num_shards=4, build_id="crash1")
        monkeypatch.setattr(Manifest, "commit", orig_commit)

        # crashed attempt: segments on disk, but NOTHING committed
        seg_dir = os.path.join(crash_dir, "segments")
        orphans = set(os.listdir(seg_dir))
        assert orphans, "crash simulation must happen after segment writes"
        assert not os.path.exists(os.path.join(crash_dir, "manifest.json"))

        # re-run from scratch state → full build (nothing was committed)
        m = build_index(frag_dir, crash_dir, num_shards=4, build_id="crash2")
        assert m.stats["n_docs"] == t.num_rows
        live = {s["name"] for s in m.live_segments()}
        assert live.isdisjoint(orphans - live), "orphans must not be referenced"

        # results identical to a clean, uninterrupted build
        clean_dir = str(tmp_path / "clean_idx")
        build_index(frag_dir, clean_dir, num_shards=4, build_id="clean")
        # explicit orphan GC removes the crashed attempt's artifacts and
        # leaves the committed index intact
        from engine.index.merge import gc_orphans

        removed = gc_orphans(crash_dir)
        assert removed > 0
        assert {s["name"] for s in Manifest(crash_dir).live_segments()} <= set(
            os.listdir(seg_dir)
        )

        a = SegmentServer(crash_dir, k=10)
        b = SegmentServer(clean_dir, k=10)
        for qid, q in seeded_query_set(20, seed=9):
            ka, sa = a.topk(q)
            kb, sb = b.topk(q)
            np.testing.assert_array_equal(ka, kb, err_msg=q)
            np.testing.assert_array_equal(sa, sb, err_msg=q)
            ok, os_ = oracle.topk(q, 10)
            np.testing.assert_array_equal(ka, ok, err_msg=f"vs oracle: {q}")

    def test_resumed_build_antijoins_committed_keys(self, tmp_path, ray_session):
        """dedup_input=True on a resumed build must not re-index keys that an
        earlier build committed, even when new fragments repeat them
        (ADVICE r01: cross-build duplicate survival)."""
        frag_dir, t = _write_fragments(tmp_path, n_convs=30, n_frags=2, seed=13)
        idx = str(tmp_path / "aj_idx")
        frags = sorted(
            os.path.join(frag_dir, f) for f in os.listdir(frag_dir) if f.endswith(".parquet")
        )
        build_index([frags[0]], idx, num_shards=4, build_id="b1", dedup_input=True)
        n1 = Manifest(idx).stats["n_docs"]
        # second build sees BOTH fragments: frag 0's rows are already
        # committed and must be dropped by the anti-join
        build_index(frags, idx, num_shards=4, build_id="b2", dedup_input=True, resume=False)
        m = Manifest(idx)
        t1 = pq.read_table(frags[0]).num_rows
        t2 = pq.read_table(frags[1]).num_rows
        assert n1 == t1
        assert m.stats["n_docs"] == t1 + t2  # no double count
        from engine.index.build import audit_doc_keys

        assert audit_doc_keys(idx)["collisions"] == 0

    def test_antijoin_ignores_orphan_docmap_of_crashed_build(self, tmp_path, ray_session):
        """An ORPHAN docmap dir (crashed build: docmap on disk, manifest never
        committed) must not be treated as committed keys — its rows are
        re-presented to the resumed build and dropping them would leave those
        documents permanently missing from the index with no error."""
        frag_dir, t = _write_fragments(tmp_path, n_convs=30, n_frags=2, seed=17)
        idx = str(tmp_path / "orph_idx")
        frags = sorted(
            os.path.join(frag_dir, f) for f in os.listdir(frag_dir) if f.endswith(".parquet")
        )
        build_index([frags[0]], idx, num_shards=4, build_id="b1", dedup_input=True)
        # fabricate the crash artifact: frag 1's doc_keys in an uncommitted
        # docmap dir, exactly what a build killed before manifest commit leaves
        f1 = pq.read_table(frags[1])
        orphan_keys = doc_key_batch(f1["conv_id"], f1["turn_idx"].to_numpy())
        orphan_dir = os.path.join(idx, "docmap", "build-crashed")
        os.makedirs(orphan_dir, exist_ok=True)
        import pyarrow as pa

        pq.write_table(
            pa.table({"doc_key": pa.array(orphan_keys, type=pa.int64())}),
            os.path.join(orphan_dir, "part-0.parquet"),
        )
        build_index(frags, idx, num_shards=4, build_id="b2", dedup_input=True, resume=False)
        t1 = pq.read_table(frags[0]).num_rows
        t2 = f1.num_rows
        # frag 1's rows MUST be indexed despite the orphan keys
        assert Manifest(idx).stats["n_docs"] == t1 + t2


class TestCrashMidMerge:
    def test_crash_between_segment_write_and_commit_then_rerun(
        self, tmp_path, ray_session, monkeypatch
    ):
        """Crash AFTER merged segments hit disk but BEFORE the manifest swap:
        the index stays on the pre-merge manifest (queries unaffected), a
        re-run merges cleanly under a new merge_id, the crashed attempt's
        outputs are orphans that gc_orphans removes, and ranking is
        identical before/after the whole episode."""
        import engine.index.merge as merge_mod
        from engine.index.merge import gc_orphans

        frag_dir, t = _write_fragments(tmp_path, n_convs=40, n_frags=4, seed=9)
        idx = str(tmp_path / "idx")
        for i, f in enumerate(sorted(os.listdir(frag_dir))):
            build_index(os.path.join(frag_dir, f), idx, num_shards=4, build_id=f"b{i}")
        keys = doc_key_batch(t["conv_id"], t["turn_idx"].to_numpy())
        oracle = BM25Oracle(list(keys), t["text"].to_pylist())
        queries = seeded_query_set(8, seed=3)

        def topk_all(server):
            return [server.topk(q) for _qid, q in queries]

        before = topk_all(SegmentServer(idx, k=10))
        seg_dir = os.path.join(idx, "segments")
        n_before = len(os.listdir(seg_dir))

        orig = Manifest.tombstone_segments

        def boom(self, names):
            raise RuntimeError("simulated crash before merge commit")

        monkeypatch.setattr(Manifest, "tombstone_segments", boom)
        with pytest.raises(RuntimeError, match="simulated crash"):
            run_merge(idx, compact=True)
        monkeypatch.setattr(Manifest, "tombstone_segments", orig)

        # merged segments were written, but the manifest never swapped
        assert len(os.listdir(seg_dir)) > n_before
        live = {s["name"] for s in Manifest(idx).live_segments()}
        assert len(live) == n_before
        mid = topk_all(SegmentServer(idx, k=10))
        for (dk_a, sc_a), (dk_b, sc_b) in zip(before, mid):
            np.testing.assert_array_equal(dk_a, dk_b)
            np.testing.assert_array_equal(sc_a, sc_b)

        # re-run completes; crashed attempt's outputs become orphans
        assert run_merge(idx, compact=True) > 0
        removed = gc_orphans(idx)
        assert removed > 0
        on_disk = set(os.listdir(seg_dir))
        assert on_disk == {s["name"] for s in Manifest(idx).live_segments()}
        after = topk_all(SegmentServer(idx, k=10))
        for (dk_a, sc_a), (dk_b, sc_b) in zip(before, after):
            np.testing.assert_array_equal(dk_a, dk_b)
            np.testing.assert_array_equal(sc_a, sc_b)


class TestReviewRegressions:
    """Round-2 review findings: silent-wrong-results hazards."""

    def _corpus_idx(self, tmp_path, n_convs=40, seed=11, shards=4):
        import ray.data as rd

        t = synth_transcripts_table(n_convs, seed=seed)
        idx = str(tmp_path / "idx")
        build_index(rd.from_arrow(t), idx, num_shards=shards, build_id="b0")
        keys = doc_key_batch(t["conv_id"], t["turn_idx"].to_numpy())
        return idx, t, BM25Oracle(list(keys), t["text"].to_pylist())

    def test_rerun_rebucket_is_idempotent(self, tmp_path, ray_session):
        """run_merge(doc_buckets=D) twice must NOT re-apply the bucket shard
        offset (which stranded buckets b>0 outside their servers' ranges)."""
        from engine.core.partitioning import SaltMap

        idx, t, oracle = self._corpus_idx(tmp_path)
        run_merge(idx, doc_buckets=2)
        m = Manifest(idx)
        s_total = SaltMap.from_json(m.data["salt_map"]).num_total_shards
        before = [SegmentServer(idx, k=10).topk(q) for _q, q in seeded_query_set(6, seed=2)]
        run_merge(idx, doc_buckets=2)  # re-run: plain in-layout compaction
        m2 = Manifest(idx)
        assert int(m2.data["doc_buckets"]) == 2
        assert all(s["shard"] < 2 * s_total for s in m2.live_segments())
        after = [SegmentServer(idx, k=10).topk(q) for _q, q in seeded_query_set(6, seed=2)]
        for (dk_a, sc_a), (dk_b, sc_b) in zip(before, after):
            np.testing.assert_array_equal(dk_a, dk_b)
            np.testing.assert_array_equal(sc_a, sc_b)
        with pytest.raises(ValueError, match="bucketed at D=2"):
            run_merge(idx, doc_buckets=4)

    def test_incremental_build_keeps_committed_salt_map(self, tmp_path, ray_session):
        """A salt map passed to an incremental build must be IGNORED: the
        committed map is the routing contract for existing segments."""
        import ray.data as rd

        from engine.core.partitioning import SaltMap

        t = synth_transcripts_table(30, seed=4)
        head = t["text"][0].as_py().split()[0]
        idx = str(tmp_path / "idx")
        sm_a = SaltMap(4, {head: (4, 2)})
        half = t.num_rows // 2
        build_index(rd.from_arrow(t.slice(0, half)), idx, num_shards=4,
                    build_id="b1", salt_map=sm_a)
        sm_b = SaltMap(4, {head: (6, 3)})  # a different range: must not stick
        build_index(rd.from_arrow(t.slice(half)), idx, num_shards=4,
                    build_id="b2", salt_map=sm_b)
        committed = SaltMap.from_json(Manifest(idx).data["salt_map"])
        assert committed.ranges == sm_a.ranges
        # docs holding the head term from BOTH builds are reachable
        keys = doc_key_batch(t["conv_id"], t["turn_idx"].to_numpy())
        oracle = BM25Oracle(list(keys), t["text"].to_pylist())
        dk, sc = SegmentServer(idx, k=10).topk(head)
        odk, osc = oracle.topk(head, 10)
        np.testing.assert_array_equal(dk, odk)
        np.testing.assert_array_equal(sc, osc)

    def test_term_stats_ignores_uncommitted_segments(self, tmp_path, ray_session):
        """build_term_stats must aggregate MANIFEST segments, not every
        directory on disk (crashed-build orphans inflated df)."""
        import pyarrow.dataset as pads

        from engine.index.build import build_term_stats

        idx, t, _ = self._corpus_idx(tmp_path)
        ts1 = pads.dataset(build_term_stats(idx), format="parquet").to_table()
        ref = {t_: (d, c) for t_, d, c in zip(ts1["term"].to_pylist(),
                                              ts1["df"].to_pylist(), ts1["cf"].to_pylist())}
        # plant an orphan segment dir with a dict.parquet full of fake df
        live0 = Manifest(idx).live_segments()[0]["name"]
        src = os.path.join(idx, "segments", live0)
        orphan = os.path.join(idx, "segments", "seg-orphan-fake")
        shutil.copytree(src, orphan)
        ts2 = pads.dataset(build_term_stats(idx), format="parquet").to_table()
        got = {t_: (d, c) for t_, d, c in zip(ts2["term"].to_pylist(),
                                              ts2["df"].to_pylist(), ts2["cf"].to_pylist())}
        assert got == ref  # orphan contributed nothing

    def test_docmap_readers_ignore_uncommitted_builds(self, tmp_path, ray_session):
        """Hydration, dense bucket keys and the dense server must only read
        docmaps of manifest-committed builds (an in-flight build's docmap
        would shift dense scatter positions)."""
        import pyarrow.parquet as pq2

        from engine.query.densify import _bucket_keys
        from engine.query.hydrate import load_docmap_for_keys

        idx, t, oracle = self._corpus_idx(tmp_path)
        keys_before = _bucket_keys(idx, 1)[0]
        # plant an uncommitted build's docmap with alien keys
        alien_dir = os.path.join(idx, "docmap", "build-inflight")
        os.makedirs(alien_dir)
        pq2.write_table(
            __import__("pyarrow").table(
                {
                    "doc_key": __import__("pyarrow").array([999_999_001, 999_999_002], type=__import__("pyarrow").int64()),
                    "conv_id": ["ghost", "ghost"],
                    "turn_idx": __import__("pyarrow").array([0, 1], type=__import__("pyarrow").int32()),
                }
            ),
            os.path.join(alien_dir, "part0.parquet"),
        )
        np.testing.assert_array_equal(_bucket_keys(idx, 1)[0], keys_before)
        assert load_docmap_for_keys(idx, np.array([999_999_001])) == {}
        # dense-mode query still bit-identical to the oracle
        srv = SegmentServer(idx, k=10, mode="dense")
        for _qid, q in seeded_query_set(5, seed=6):
            dk, sc = srv.topk(q)
            odk, osc = oracle.topk(q, 10)
            np.testing.assert_array_equal(dk, odk)
            np.testing.assert_allclose(sc, osc, rtol=0, atol=1e-12)


def test_tr_incremental_entry_two_committed_passes(ray_session):
    """The driver-facing incremental entry really is two-pass: the manifest
    records both build commits, pass 1's lineage covers ONLY part 1, pass
    2's ONLY part 2, and stats count the union corpus."""
    import json
    import os

    import pyarrow.parquet as pq

    from engine.pipelines import tr_incremental_index

    d, idx = tr_incremental_index()
    m = json.load(open(os.path.join(idx, "manifest.json")))
    by_id = {b["build_id"]: b for b in m["builds"] if b["kind"] == "build"}
    assert {"trincr-1", "trincr-2"} <= set(by_id)
    f1 = by_id["trincr-1"]["lineage"]["fragments"]
    f2 = by_id["trincr-2"]["lineage"]["fragments"]
    assert [os.path.basename(p) for p in f1] == ["part1.parquet"]
    assert [os.path.basename(p) for p in f2] == ["part2.parquet"]
    total = sum(pq.read_metadata(f"{d}/part{i}.parquet").num_rows for i in (1, 2))
    assert m["stats"]["n_docs"] == total
