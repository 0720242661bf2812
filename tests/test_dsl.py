"""Composable query DSL (engine/query/dsl.py + ft_bm25_dsl).

Parse precedence / validation, spec resolution (boost dedup, msm
defaults, fuzzy groups), and end-to-end gate semantics checked against a
direct pandas recomputation of the corpus at sf0.001.
"""

import re

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


class TestParse:
    def test_phrases_extracted_before_token_ops(self):
        from engine.query.dsl import parse_dsl

        q = parse_dsl('+alpha "slow query" -beta gamma^2 len:[10,20) msm=1')
        assert q.phrases == ["slow query"]
        assert q.must_tokens == ["alpha"]
        assert q.not_tokens == ["beta"]
        assert q.should_tokens == [("gamma", 2.0)]
        assert q.range == (10, 20)
        assert q.msm == 1

    def test_fuzzy_and_boosted_must(self):
        from engine.query.dsl import parse_dsl

        q = parse_dsl("+tok~ other~ +boosted^4")
        assert q.fuzzy_must == ["tok"]
        assert q.fuzzy_should == ["other"]
        assert q.must_boosts == [("boosted", 4.0)]
        assert q.has_required

    def test_boost_must_be_power_of_two(self):
        from engine.query.dsl import parse_dsl

        for bad in ("t^3", "t^0", "t^-2"):
            with pytest.raises(ValueError):
                parse_dsl(bad)
        assert parse_dsl("t^0.5").should_tokens == [("t", 0.5)]

    def test_fuzzy_composition_rules(self):
        from engine.query.dsl import parse_dsl

        with pytest.raises(ValueError):
            parse_dsl("-t~")
        with pytest.raises(ValueError):
            parse_dsl("t~^2")

    def test_msm_defaults(self):
        from engine.query.dsl import parse_dsl

        assert parse_dsl("+a b").msm is None and parse_dsl("+a b").has_required
        assert not parse_dsl("a b").has_required


class TestResolve:
    def test_boost_dedup_takes_max_and_phrase_terms_are_must(self, ray_session):
        from engine.pipelines import documents_index
        from engine.query.dsl import resolve_specs
        from engine.text.analyzer import Analyzer

        idx = documents_index(SF)
        specs = resolve_specs(
            [(0, '+hash "hash join" hash^4 join^2')], idx, Analyzer(), 5
        )
        s = specs[0]
        # hash appears as must (1.0), phrase member (1.0), should^4 -> max 4
        assert s["boost"]["hash"] == 4.0
        assert s["boost"]["join"] == 2.0
        assert set(s["must_all"]) == {"hash", "join"}
        assert s["phrases"] == [["hash", "join"]]
        assert s["msm"] == 0  # required clauses exist

    def test_fuzzy_must_group_resolved_distributed(self, ray_session):
        from engine.pipelines import documents_index
        from engine.query.dsl import resolve_specs
        from engine.text.analyzer import Analyzer

        idx = documents_index(SF)
        specs = resolve_specs([(0, "+stram~ x"), (1, "+qqqzzz~ x")],
                              idx, Analyzer(), 5)
        grp = specs[0]["must_any"]
        assert len(grp) == 1 and "stream" in grp[0]
        # unexpandable fuzzy-must -> empty group -> unsatisfiable
        assert specs[1]["must_any"] == [[]]


def _corpus_tokens():
    import pyarrow.parquet as pq

    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text", "n_chars"]).to_pandas()
    docs["toks"] = [
        [t for t in re.split(r"[^a-z0-9]+", str(s).lower()) if t]
        for s in docs["text"]
    ]
    return docs


class TestEndToEnd:
    @pytest.fixture(scope="class")
    def result(self, ray_session):
        from engine.pipelines import ft_bm25_dsl

        return ft_bm25_dsl(SF)

    @pytest.fixture(scope="class")
    def docs(self):
        return _corpus_tokens()

    def test_gates_hold_on_every_hit(self, result, docs):
        from engine.pipelines import DSL_QUERIES
        from engine.pipelines import documents_index
        from engine.query.dsl import resolve_specs
        from engine.text.analyzer import Analyzer

        specs = resolve_specs(DSL_QUERIES, documents_index(SF), Analyzer(), 5)
        bydoc = docs.set_index("doc_id")
        for r in result.itertuples():
            s = specs[int(r.qid)]
            toks = set(bydoc.loc[int(r.doc_id), "toks"])
            for t in s["must_all"]:
                assert t in toks, (r.qid, r.doc_id, t)
            for grp in s["must_any"]:
                assert toks & set(grp), (r.qid, r.doc_id, grp)
            assert not (toks & set(s["must_not"])), (r.qid, r.doc_id)
            if s["msm"]:
                assert len(toks & set(s["should"])) >= s["msm"]
            if s["range"]:
                lo, hi = s["range"]
                nc = int(bydoc.loc[int(r.doc_id), "n_chars"])
                assert lo <= nc < hi
            for ph in s["phrases"]:
                canon = " " + " ".join(bydoc.loc[int(r.doc_id), "toks"]) + " "
                assert (" " + " ".join(ph) + " ") in canon

    def test_missing_must_term_query_is_empty(self, result):
        assert (result["qid"] == 5).sum() == 0

    def test_nonempty_and_ranked(self, result):
        for qid in (0, 1, 2, 3, 4):
            sub = result[result["qid"] == qid]
            assert len(sub) > 0, qid
            assert list(sub["rank"]) == list(range(1, len(sub) + 1))
            assert (np.diff(sub["score_micro"].to_numpy()) <= 0).all()


class TestFieldScopedDsl:
    def test_tool_filters_gate_without_scoring(self, ray_session):
        """tr_dsl (X135): tool: filters gate in filter context — every hit
        satisfies its query's include/exclude tool clauses (audited from
        the raw corpus), and the no-such-tool include returns nothing."""
        import pyarrow.parquet as pq

        from engine.pipelines import (_tr_dsl_query_set, tr_dsl,
                                      tr_oracle_corpus_path)

        out = tr_dsl("/root/testdata/sf0.001")
        corpus = pq.read_table(tr_oracle_corpus_path(),
                               columns=["doc_key", "tool"]).to_pandas()
        tool_of = dict(zip(corpus["doc_key"].astype("int64"),
                           corpus["tool"].astype(str)))
        gates = {}
        for qid, qtext in _tr_dsl_query_set():
            inc = [t[len("tool:"):] for t in qtext.split() if t.startswith("tool:")]
            exc = [t[len("-tool:"):] for t in qtext.split() if t.startswith("-tool:")]
            gates[qid] = (inc, exc)
        assert len(out) > 0
        for r in out.itertuples():
            inc, exc = gates[int(r.qid)]
            tool = tool_of[int(r.doc_key)].lower()
            if inc:
                assert tool in inc, (r.qid, tool, inc)
            assert tool not in exc, (r.qid, tool, exc)
        # the no-such-tool include produced zero rows
        dead = [q for q, (inc, _e) in gates.items() if "zznosuchtool" in inc]
        assert dead and (out["qid"].isin(dead)).sum() == 0


class TestDslProperty:
    """Hypothesis: random boolean trees (must / should / must_not, boosts,
    msm — the gates DslServer evaluates itself) against a pure-Python
    reference over a small built index. Fuzzy / phrase / range have their
    own targeted tests + the SQL oracle; this suite hunts gate-interaction
    bugs the fixtures can't reach."""

    @pytest.fixture(scope="class")
    def world(self, tmp_path_factory, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from engine.core.dockey import doc_key_batch
        from engine.index.build import build_index
        from engine.query.dsl import DslServer

        rng = np.random.default_rng(11)
        vocab = [f"w{i}" for i in range(12)]
        texts = [
            " ".join(rng.choice(vocab, size=rng.integers(3, 12)))
            for _ in range(60)
        ]
        t = pa.table({
            "conv_id": pa.array([f"c{i}" for i in range(len(texts))]),
            "turn_idx": pa.array([0] * len(texts), type=pa.int32()),
            "text": pa.array(texts),
        })
        d = str(tmp_path_factory.mktemp("dslprop") / "idx")
        build_index(rd.from_arrow(t), d, num_shards=4, build_id="dslprop")
        keys = np.asarray(doc_key_batch(t["conv_id"], t["turn_idx"].to_numpy()),
                          dtype=np.int64)
        server = DslServer(d, score_micro=True, specs={})
        return server, vocab, texts, keys

    def _reference(self, spec, texts, keys):
        """Direct per-doc evaluation of the documented DSL semantics."""
        from collections import Counter

        from engine.oracle.bm25 import idf, tf_sat

        toks = [t.split() for t in texts]
        n = len(texts)
        dls = np.array([len(t) for t in toks], dtype=np.float64)
        avgdl = float(dls.mean())
        df = Counter()
        for ts in toks:
            df.update(set(ts))
        out = {}
        for i, ts in enumerate(toks):
            tset = set(ts)
            if any(t not in df for t in spec["must_all"]):
                return {}
            if not all(t in tset for t in spec["must_all"]):
                continue
            if not all(tset & set(g) for g in spec["must_any"]):
                continue
            if tset & set(spec["must_not"]):
                continue
            if spec["msm"] and len(tset & set(spec["should"])) < spec["msm"]:
                continue
            cnt = Counter(ts)
            if not any(t in cnt for t in spec["boost"]):
                continue  # engine candidates come from positive-term postings
            s = 0.0
            for t in sorted(spec["boost"]):
                if t not in cnt:
                    continue
                w = idf(n, df[t]) * tf_sat(np.array([cnt[t]]),
                                           np.array([float(len(ts))]), avgdl)
                s += float(w[0]) * spec["boost"][t]
            out[int(keys[i])] = int(np.floor(s * 1e6 + 0.5))
        return out

    def test_random_trees_match_reference(self, world):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        server, vocab, texts, keys = world
        clause = st.tuples(
            st.sampled_from(vocab + ["zzznope"]),
            st.sampled_from(["must", "should", "not"]),
            st.sampled_from([1.0, 1.0, 2.0, 4.0]),
        )

        @settings(max_examples=60, deadline=None)
        @given(st.lists(clause, min_size=1, max_size=6),
               st.integers(min_value=0, max_value=3))
        def check(clauses, msm):
            boost, must_all, must_not, should = {}, set(), set(), set()
            for term, kind, b in clauses:
                if kind == "not":
                    must_not.add(term)
                    continue
                boost[term] = max(boost.get(term, 0.0), b)
                if kind == "must":
                    must_all.add(term)
                else:
                    should.add(term)
            spec = {
                "boost": boost, "must_all": sorted(must_all),
                "must_any": [], "must_not": sorted(must_not),
                "should": sorted(should), "msm": msm,
                "phrases": [], "range": None,
                "has_required": bool(must_all),
            }
            dk, sc = server._matches(spec)
            sc = np.floor(np.asarray(sc, dtype=np.float64) * 1e6 + 0.5).astype(np.int64)
            got = dict(zip(dk.tolist(), sc.tolist()))
            want = self._reference(spec, texts, keys)
            assert got == want, (clauses, msm)

        check()
