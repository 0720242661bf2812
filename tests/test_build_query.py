"""End-to-end: Ray build → segment query == pure-NumPy oracle, rank-identical
(SURVEY.md §5.3; BASELINE.json:14). The invariant gate for everything."""

import numpy as np
import pytest

from engine.core.dockey import doc_key_batch
from engine.index.build import build_index
from engine.io.synth import synth_transcripts_table
from engine.oracle.bm25 import BM25Oracle, seeded_query_set
from engine.query.engine import SegmentServer, query_index

N_CONVS = 60
SEED = 42


@pytest.fixture(scope="module")
def corpus():
    t = synth_transcripts_table(N_CONVS, seed=SEED)
    keys = doc_key_batch(t["conv_id"], t["turn_idx"].to_numpy())
    return t, keys


@pytest.fixture(scope="module")
def oracle(corpus):
    t, keys = corpus
    return BM25Oracle(list(keys), t["text"].to_pylist())


@pytest.fixture(scope="module")
def index_dir(tmp_path_factory, corpus, ray_session):
    import ray.data as rd

    t, _ = corpus
    d = str(tmp_path_factory.mktemp("idx"))
    ds = rd.from_arrow(t)
    m = build_index(ds, d, num_shards=8, build_id="t1")
    assert m.stats["n_docs"] == t.num_rows
    return d


class TestBuild:
    def test_stats_match_oracle(self, index_dir, oracle):
        from engine.io.manifest import Manifest

        m = Manifest(index_dir)
        assert m.stats["n_docs"] == oracle.n_docs
        assert abs(m.stats["avgdl"] - oracle.avgdl) < 1e-9

    def test_df_cf_match_oracle(self, index_dir, oracle):
        srv = SegmentServer(index_dir, k=10)
        for term in ["kona", "rokona", "notaterm_xyz"]:
            hits, df = srv._term_hits(term)
            want = len(oracle.postings.get(term, ([], []))[0])
            assert df == want, term

    def test_postings_roundtrip_vs_oracle(self, index_dir, oracle):
        srv = SegmentServer(index_dir, k=10)
        # check a handful of terms end-to-end through the compressed format
        terms = sorted(oracle.postings)[::37]
        for t in terms:
            hits, df = srv._term_hits(t)
            got_keys, got_tf = [], []
            for seg, idx in hits:
                dk, tf, dl = seg.read_postings(idx)
                got_keys.append(dk)
                got_tf.append(tf)
                # dl in the posting equals oracle's dl for those docs
                pos = np.searchsorted(oracle.doc_keys, dk)
                np.testing.assert_array_equal(oracle.dl[pos], dl)
            got_keys = np.concatenate(got_keys)
            order = np.argsort(got_keys)
            odk, otf = oracle.postings[t]
            np.testing.assert_array_equal(np.sort(got_keys), oracle.doc_keys[odk])
            np.testing.assert_array_equal(np.concatenate(got_tf)[order], otf)


class TestRankIdentity:
    @pytest.mark.parametrize("k", [10, 100])
    def test_topk_rank_identical(self, index_dir, oracle, k):
        srv = SegmentServer(index_dir, k=k)
        for qid, qtext in seeded_query_set(40, seed=7):
            want_keys, want_scores = oracle.topk(qtext, k)
            got_keys, got_scores = srv.topk(qtext, k)
            np.testing.assert_array_equal(got_keys, want_keys, err_msg=f"q{qid}: {qtext}")
            np.testing.assert_allclose(got_scores, want_scores, rtol=0, atol=1e-6)

    def test_random_query_rank_identity_all_modes(self, index_dir, oracle, corpus):
        """Hypothesis: ARBITRARY query text — corpus vocab mixed with random
        unicode junk, hit/miss blends, duplicate terms, no-token queries —
        is bit-identical to the oracle in every scoring mode. The seeded
        query sets above only sample corpus vocab; this pins the contract on
        unseen input."""
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from engine.text.analyzer import Analyzer

        t, _ = corpus
        an = Analyzer()
        vocab = sorted({w for text in t["text"].to_pylist()[:50] for w in an.tokens(text)})[:100]
        servers = {m: SegmentServer(index_dir, k=10, mode=m)
                   for m in ("wand", "exhaustive", "dense")}
        token = st.one_of(st.sampled_from(vocab), st.text(min_size=1, max_size=8))
        qstrat = st.lists(token, min_size=1, max_size=5).map(" ".join)

        @settings(max_examples=100, deadline=None)
        @given(qstrat)
        def check(qtext):
            wk, ws = oracle.topk(qtext, 10)
            for mode, srv in servers.items():
                gk, gs = srv.topk(qtext, 10)
                np.testing.assert_array_equal(gk, wk, err_msg=f"{mode}: {qtext!r}")
                np.testing.assert_array_equal(gs, ws, err_msg=f"{mode}: {qtext!r}")

        check()

    def test_not_queries(self, index_dir, oracle):
        """D4: exclusion removes docs matching any excluded term."""
        srv = SegmentServer(index_dir, k=10)
        for qtext, excl in [("sa ro", "mi"), ("kona", "sa"), ("sa", "sa")]:
            wk, ws = oracle.topk(qtext, 10, exclude_text=excl)
            gk, gs = srv.topk(qtext, exclude=excl)
            np.testing.assert_array_equal(gk, wk, err_msg=f"{qtext} NOT {excl}")
            np.testing.assert_array_equal(gs, ws)
            # excluded docs truly absent
            ex = srv._exclusion_keys(excl)
            assert not np.isin(gk, ex).any()

    def test_scores_bit_identical(self, index_dir, oracle):
        """Fixed summation order → engine == oracle exactly, not just 1e-6."""
        srv = SegmentServer(index_dir, k=10)
        for qid, qtext in seeded_query_set(10, seed=11):
            want_keys, want_scores = oracle.topk(qtext, 10)
            got_keys, got_scores = srv.topk(qtext, 10)
            np.testing.assert_array_equal(got_scores, want_scores)

    def test_dense_mode_bit_identical(self, index_dir, oracle):
        """mode='dense' (term-at-a-time scores[pos]+=w, no union merge) is
        the oracle's own accumulation → bit-identical, and the reusable
        score buffer resets cleanly BETWEEN queries."""
        srv = SegmentServer(index_dir, k=10, mode="dense")
        for qid, qtext in seeded_query_set(25, seed=7):
            want_keys, want_scores = oracle.topk(qtext, 10)
            got_keys, got_scores = srv.topk(qtext, 10)
            np.testing.assert_array_equal(got_keys, want_keys, err_msg=qtext)
            np.testing.assert_array_equal(got_scores, want_scores, err_msg=qtext)
        # buffers fully reset after the query stream
        assert all(not scores.any() for _k, scores in srv._dense.values())
        # exclude falls back to the sparse exhaustive path, still exact
        wk, ws = oracle.topk("sa ro", 10, exclude_text="mi")
        gk, gs = srv.topk("sa ro", exclude="mi")
        np.testing.assert_array_equal(gk, wk)
        np.testing.assert_array_equal(gs, ws)

    def test_densify_sidecars_bit_identical_and_used(self, index_dir, oracle,
                                                     ray_session, monkeypatch):
        """densify_index writes per-segment pos/w sidecars; dense scoring
        then reads ONLY the mmap'd sidecars (postings decode + weights
        poisoned to prove it) and stays bit-identical to the oracle."""
        from engine.index.segment import Segment
        from engine.query.densify import densify_index

        res = densify_index(index_dir)
        assert res["densified"] > 0 or res["skipped"] > 0
        # second call is a no-op (idempotent)
        res2 = densify_index(index_dir)
        assert res2["densified"] == 0

        srv = SegmentServer(index_dir, k=10, mode="dense")
        srv._ensure_dense()
        assert all(srv._sidecar(srv._segment(p)) is not None
                   for paths in srv._by_shard.values() for p in paths)

        def boom(*a, **k):
            raise AssertionError("dense path touched postings/weights despite sidecar")

        monkeypatch.setattr(Segment, "read_postings", boom)
        monkeypatch.setattr(Segment, "weights", boom)
        for qid, qtext in seeded_query_set(25, seed=7):
            want_keys, want_scores = oracle.topk(qtext, 10)
            got_keys, got_scores = srv.topk(qtext, 10)
            np.testing.assert_array_equal(got_keys, want_keys, err_msg=qtext)
            np.testing.assert_array_equal(got_scores, want_scores, err_msg=qtext)


class TestDistributedQuery:
    def test_query_pipeline(self, index_dir, oracle, corpus, ray_session):
        t, keys = corpus
        queries = seeded_query_set(12, seed=5)
        res = query_index(index_dir, queries, k=10, concurrency=2).to_pandas()
        assert set(res.columns) >= {"qid", "rank", "doc_key", "score", "doc_id"}
        # doc_id hydration correct: matches conv:turn of the doc_key
        id_map = {
            int(k): f"{c}:{x}"
            for k, c, x in zip(keys, t["conv_id"].to_pylist(), t["turn_idx"].to_pylist())
        }
        for r in res.itertuples():
            assert id_map[int(r.doc_key)] == r.doc_id
        # every query rank-identical to oracle
        for qid, qtext in queries:
            sub = res[res.qid == qid].sort_values("rank")
            want_keys, want_scores = oracle.topk(qtext, 10)
            np.testing.assert_array_equal(sub["doc_key"].to_numpy(), want_keys)
            np.testing.assert_allclose(sub["score"].to_numpy(), want_scores, atol=1e-9)

    def test_parallelism_invariance(self, index_dir, oracle, ray_session, tmp_path):
        """Same top-k regardless of build parallelism (SURVEY §5.2c)."""
        import ray.data as rd

        t = synth_transcripts_table(N_CONVS, seed=SEED)
        d2 = str(tmp_path / "idx2")
        build_index(rd.from_arrow(t).repartition(7), d2, num_shards=3, build_id="t2")
        srv = SegmentServer(d2, k=10)
        for qid, qtext in seeded_query_set(15, seed=13):
            want_keys, want_scores = oracle.topk(qtext, 10)
            got_keys, got_scores = srv.topk(qtext, 10)
            np.testing.assert_array_equal(got_keys, want_keys)
            np.testing.assert_array_equal(got_scores, want_scores)


class TestDocmapPartitioning:
    """Hydration must read ONLY the docmap partitions holding candidate keys
    (hive layout part = doc_key % docmap_parts; VERDICT r01 missing #3)."""

    def test_docmap_is_partitioned_and_pruned(self, index_dir, corpus):
        import os

        from engine.io.manifest import Manifest
        from engine.query.hydrate import docmap_paths

        _, keys = corpus
        num_parts = int(Manifest(index_dir).data["docmap_parts"])
        assert num_parts > 1
        build_dirs = [
            os.path.join(index_dir, "docmap", d)
            for d in os.listdir(os.path.join(index_dir, "docmap"))
        ]
        all_parts = {
            e for b in build_dirs for e in os.listdir(b) if e.startswith("part=")
        }
        assert len(all_parts) > 1  # layout really is hive-partitioned
        cand = keys[:3]
        paths = docmap_paths(index_dir, np.asarray(cand))
        want_parts = {f"part={int(k) % num_parts}" for k in cand}
        got_parts = {
            seg for p in paths for seg in p.split(os.sep) if seg.startswith("part=")
        }
        assert got_parts == {p for p in want_parts if p in all_parts}
        assert len(got_parts) < len(all_parts)  # pruning actually pruned

    def test_hydrate_resolves_after_pruning(self, index_dir, corpus):
        from engine.query.hydrate import load_docmap_for_keys

        t, keys = corpus
        some = np.asarray(keys[:5])
        mapping = load_docmap_for_keys(index_dir, some)
        conv = t["conv_id"].to_pylist()
        turn = t["turn_idx"].to_pylist()
        for i, k in enumerate(some):
            assert mapping[int(k)] == f"{conv[i]}:{turn[i]}"


class TestDocKeyAudit:
    """audit_doc_keys: n_distinct == n_docs on a clean build; a corpus with
    duplicate (conv_id, turn_idx) rows must be flagged (VERDICT r01 #7)."""

    def test_clean_build_passes(self, index_dir):
        from engine.index.build import audit_doc_keys

        out = audit_doc_keys(index_dir)
        assert out["collisions"] == 0
        assert out["n_docs"] == out["n_distinct"] > 0
        from engine.io.manifest import Manifest

        assert Manifest(index_dir).data["doc_key_audit"] == out

    def test_duplicate_keys_flagged(self, tmp_path, corpus, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from engine.index.build import audit_doc_keys

        t, _ = corpus
        dup = pa.concat_tables([t, t.slice(0, 50)])  # 50 duplicated turns
        d = str(tmp_path / "dupidx")
        build_index(rd.from_arrow(dup), d, num_shards=4, build_id="dup")
        out = audit_doc_keys(d)
        assert out["collisions"] == 50

    def test_orphan_docmap_ignored(self, tmp_path, corpus, ray_session):
        """An UNCOMMITTED (crashed / in-flight) build's docmap dir must not
        feed the audit: its rows duplicate committed keys and would report
        false collisions (ADVICE r2). The audit must walk
        committed_docmap_dirs, not os.listdir(docmap/)."""
        import os
        import shutil

        import pyarrow as pa
        import ray.data as rd

        from engine.index.build import audit_doc_keys

        t, _ = corpus
        d = str(tmp_path / "orphidx")
        build_index(rd.from_arrow(t), d, num_shards=4, build_id="real")
        # simulate a crashed second build: docmap written, manifest NOT
        # committed — exact duplicate of the committed docmap
        src = os.path.join(d, "docmap", "build-real")
        shutil.copytree(src, os.path.join(d, "docmap", "build-crashed"))
        out = audit_doc_keys(d)
        assert out["collisions"] == 0
        assert out["n_docs"] == t.num_rows


class TestNFKCAnalyzer:
    def test_nfkc_unicode_build_query_rank_identical(self, tmp_path, ray_session):
        """F1: the opt-in NFKC analyzer normalizes full-width/compatibility
        forms, the build threads it through (manifest name → workers → query
        servers), and results stay rank-identical to the pure-Python oracle
        under the same analyzer."""
        import pyarrow as pa
        import ray.data as rd

        from engine.text.analyzer import NFKCAnalyzer

        an = NFKCAnalyzer()
        assert an.tokens("ＨＡＳＨ ｊｏｉｎ ﬁle Straße") == ["hash", "join", "file", "strasse"]

        texts = [
            "hash join batch over arrow",          # plain ascii
            "ＨＡＳＨ ＪＯＩＮ stream",              # full-width forms of the same terms
            "merge sort key value",
            "ﬁle ﬁlter scan",                       # ligatures
            "file filter merge",
            "straße öffnen großes",                 # casefold ß→ss
        ]
        t = pa.table(
            {
                "conv_id": pa.array([f"c{i}" for i in range(len(texts))]),
                "turn_idx": pa.array([0] * len(texts), type=pa.int32()),
                "text": pa.array(texts),
            }
        )
        d = str(tmp_path / "idx")
        build_index(rd.from_arrow(t), d, num_shards=4, build_id="u", analyzer="nfkc")

        keys = doc_key_batch(t["conv_id"], t["turn_idx"].to_numpy())
        oracle = BM25Oracle(list(keys), texts, analyzer=an)
        srv = SegmentServer(d, k=10)
        for q in ["hash join", "ｈａｓｈ", "file", "ﬁle", "strasse"]:
            dk, sc = srv.topk(q)
            odk, osc = oracle.topk(q, 10)
            np.testing.assert_array_equal(dk, odk)
            np.testing.assert_allclose(sc, osc, rtol=0, atol=0)
        # full-width query matches the ascii doc and vice versa
        dk, _ = srv.topk("ｈａｓｈ ｊｏｉｎ")
        assert set(dk) == {int(keys[0]), int(keys[1])}


class TestPorterAnalyzer:
    def test_published_vectors(self):
        """Porter 1980's own step examples must stem exactly."""
        from engine.text.analyzer import PorterAnalyzer

        st = PorterAnalyzer._stem_one
        vectors = {
            # step 1a
            "caresses": "caress", "ponies": "poni", "ties": "ti",
            "caress": "caress", "cats": "cat",
            # step 1b (+ cleanup)
            "feed": "feed", "agreed": "agre", "plastered": "plaster",
            "bled": "bled", "motoring": "motor", "sing": "sing",
            "conflated": "conflat", "troubled": "troubl", "sized": "size",
            "hopping": "hop", "tanned": "tan", "falling": "fall",
            "hissing": "hiss", "fizzed": "fizz", "failing": "fail",
            "filing": "file",
            # step 1c
            "happy": "happi", "sky": "sky",
            # derivational cascade
            "relational": "relat", "conditional": "condit",
            "rational": "ration", "digitizer": "digit",
            "operator": "oper", "feudalism": "feudal",
            "decisiveness": "decis", "hopefulness": "hope",
            "callousness": "callous", "formaliti": "formal",
            "sensitiviti": "sensit", "sensibiliti": "sensibl",
            # step 3
            "triplicate": "triplic", "formative": "form",
            "formalize": "formal", "electriciti": "electr",
            "electrical": "electr", "hopeful": "hope", "goodness": "good",
            # step 4
            "revival": "reviv", "allowance": "allow", "inference": "infer",
            "airliner": "airlin", "gyroscopic": "gyroscop",
            "adjustable": "adjust", "defensible": "defens",
            "irritant": "irrit", "replacement": "replac",
            "adjustment": "adjust", "dependent": "depend",
            "adoption": "adopt", "homologou": "homolog",
            "communism": "commun", "activate": "activ",
            "angulariti": "angular", "homologous": "homolog",
            "effective": "effect", "bowdlerize": "bowdler",
            # step 5
            "probate": "probat", "rate": "rate", "cease": "ceas",
            "controll": "control", "roll": "roll",
        }
        bad = {w: (st(w), want) for w, want in vectors.items() if st(w) != want}
        assert not bad, bad
        # the canonical conflation class
        for w in ("connect", "connected", "connecting", "connection",
                  "connections"):
            assert st(w) == "connect", (w, st(w))

    def test_porter_build_query_rank_identical(self, tmp_path, ray_session):
        """An index built with the porter plugin threads the analyzer
        through build -> manifest -> query servers and stays rank-identical
        to the pure-Python oracle under the same analyzer (the NFKC
        contract); derived forms conflate."""
        import pyarrow as pa
        import ray.data as rd

        from engine.text.analyzer import PorterAnalyzer

        an = PorterAnalyzer()
        texts = [
            "connection failed while connecting the stream",
            "connected streams merge quickly",
            "relational operators join batches",
            "the operator relation joins a batch",
            "sort keys and sorted runs",
            "zzz filler row",
        ]
        t = pa.table({
            "conv_id": pa.array([f"c{i}" for i in range(len(texts))]),
            "turn_idx": pa.array([0] * len(texts), type=pa.int32()),
            "text": pa.array(texts),
        })
        d = str(tmp_path / "pidx")
        build_index(rd.from_arrow(t), d, num_shards=4, build_id="p",
                    analyzer="porter")
        keys = doc_key_batch(t["conv_id"], t["turn_idx"].to_numpy())
        oracle = BM25Oracle(list(keys), texts, analyzer=an)
        srv = SegmentServer(d, k=10)
        for q in ["connect", "connections", "relate streams", "sorting"]:
            dk, sc = srv.topk(q)
            odk, osc = oracle.topk(q, 10)
            np.testing.assert_array_equal(dk, odk)
            np.testing.assert_allclose(sc, osc, rtol=0, atol=0)
        # derivational conflation: 'connections' finds both connect-docs
        dk, _ = srv.topk("connections")
        assert {int(keys[0]), int(keys[1])} <= set(dk)


class TestStopwordAnalyzer:
    def test_stopwords_vanish_both_sides(self, ray_session):
        from engine.text.analyzer import StopwordAnalyzer

        an = StopwordAnalyzer()
        assert an.tokens("the hash of a join") == ["hash", "join"]
        flat, dl = an.tokenize_arrow(
            ["the hash of a join", "and or not", "scan"])
        assert flat.to_pylist() == ["hash", "join", "scan"]
        assert dl.tolist() == [2, 0, 1]


class TestSearchAfter:
    def test_random_cursor_walk_property(self, index_dir, oracle, corpus):
        """Hypothesis: for random queries and page sizes, walking pages via
        search_after cursors reproduces the full micro-ranked ordering as
        one contiguous sequence — no doc skipped, none repeated."""
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from engine.text.analyzer import Analyzer

        t, _ = corpus
        an = Analyzer()
        vocab = sorted({w for text in t["text"].to_pylist()[:50]
                        for w in an.tokens(text)})[:100]
        srv = SegmentServer(index_dir, k=10, score_micro=True)

        @settings(max_examples=50, deadline=None)
        @given(st.lists(st.sampled_from(vocab), min_size=1, max_size=4).map(" ".join),
               st.integers(min_value=1, max_value=7))
        def check(qtext, page):
            # full micro ranking (big k)
            fk, fs = srv.topk(qtext, k=10_000)
            walked_k, walked_s, cursor = [], [], None
            while True:
                dk, sc = srv.topk(qtext, k=page, after=cursor)
                if not len(dk):
                    break
                walked_k.append(dk)
                walked_s.append(sc)
                cursor = (int(sc[-1]), int(dk[-1]))
                if len(dk) < page:
                    break
            gk = np.concatenate(walked_k) if walked_k else np.empty(0, dtype=np.int64)
            gs = np.concatenate(walked_s) if walked_s else np.empty(0, dtype=np.int64)
            np.testing.assert_array_equal(gk, fk, err_msg=f"{qtext!r} page={page}")
            np.testing.assert_array_equal(gs, fs)

        check()
