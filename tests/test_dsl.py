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
