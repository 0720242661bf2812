"""Unit tests: analyzer, doc keys, synth determinism, BM25 oracle sanity."""

import numpy as np
import pyarrow as pa

from engine.core import dockey, schemas
from engine.io.synth import synth_transcripts_table
from engine.oracle.bm25 import BM25Oracle, seeded_query_set
from engine.text.analyzer import Analyzer


class TestAnalyzer:
    def test_golden(self):
        an = Analyzer()
        assert an.tokens("Hello, World! 42-foo_bar") == ["hello", "world", "42", "foo", "bar"]
        assert an.tokens("") == []
        assert an.tokens("   ,.;") == []
        # non-ASCII is never a token character (SQL-parity contract)
        assert an.tokens("café naïve") == ["caf", "na", "ve"]

    def test_matches_duckdb(self):
        import duckdb

        from engine.text.analyzer import SQL_TOKENS

        texts = ["Hello, World!", "a1 B2 c-3", "", "ümlaut ÉTÉ straße", "x" * 100]
        an = Analyzer()
        con = duckdb.connect()
        sql = f"select {SQL_TOKENS.format(col='t')} from (select unnest($1::varchar[]) as t)"
        rows = con.execute(sql, [texts]).fetchall()
        for text, (sql_toks,) in zip(texts, rows):
            assert an.tokens(text) == list(sql_toks), text

    def test_batch_matches_scalar(self):
        an = Analyzer()
        texts = ["a b c", "", "Hello hello HELLO", "1 2 3 4"]
        flat, dl = an.tokenize_batch(texts)
        assert list(dl) == [3, 0, 3, 4]
        expected = [t for x in texts for t in an.tokens(x)]
        assert list(flat) == expected

    def test_u0130_build_query_sql_agree(self):
        """Regression: Python full-lowercasing of U+0130 ('İ' → 'i' +
        combining dot) used to SPLIT tokens on the query path while the
        Arrow build path and DuckDB (utf8proc simple lowercase) kept them
        whole — an indexed 'İstanbul' was unreachable by the query
        'İstanbul'. All three must tokenize identically now."""
        import duckdb

        from engine.text.analyzer import SQL_TOKENS

        an = Analyzer()
        texts = ["İstanbul", "xİy", "İİ 0130İmid", "ΑΣ sigma İ"]
        con = duckdb.connect()
        sql = f"select {SQL_TOKENS.format(col='t')} from (select unnest($1::varchar[]) as t)"
        rows = con.execute(sql, [texts]).fetchall()
        for text, (sql_toks,) in zip(texts, rows):
            assert an.tokens(text) == list(sql_toks), text
        flat, dl = an.tokenize_batch(texts)
        assert list(flat) == [t for x in texts for t in an.tokens(x)]

    def test_property_random_unicode_three_way_parity(self):
        """Hypothesis: on arbitrary text, Python tokens == Arrow build-path
        tokens == DuckDB SQL tokens (the rank-identity precondition)."""
        import duckdb
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from engine.text.analyzer import SQL_TOKENS

        an = Analyzer()
        con = duckdb.connect()
        sql = f"select {SQL_TOKENS.format(col='t')} from (select ?::varchar as t)"

        @settings(max_examples=200, deadline=None)
        @given(st.text(max_size=60))
        def check(text):
            py = an.tokens(text)
            flat, dl = an.tokenize_batch([text])
            assert list(flat) == py
            assert int(dl[0]) == len(py)
            (sql_toks,) = con.execute(sql, [text]).fetchone()
            assert py == list(sql_toks)

        check()


class TestDocKey:
    def test_stable_and_unique(self):
        conv = ["a", "b", "a", "c"]
        turn = np.array([0, 0, 1, 5])
        k1 = dockey.doc_key_batch(conv, turn)
        k2 = dockey.doc_key_batch(conv, turn)
        np.testing.assert_array_equal(k1, k2)
        assert len(set(k1)) == 4
        # same conv → same high bits, turn in low bits
        assert k1[2] - k1[0] == 1
        assert (k1 >= 0).all()

    def test_order_invariance(self):
        conv = ["x", "y", "z"]
        turn = np.array([1, 2, 3])
        k = dockey.doc_key_batch(conv, turn)
        k_rev = dockey.doc_key_batch(conv[::-1], turn[::-1])
        np.testing.assert_array_equal(k, k_rev[::-1])

    def test_doc_id_strings(self):
        ids = dockey.doc_id_strings(["c1", "c2"], np.array([0, 12], dtype=np.int32))
        assert ids.to_pylist() == ["c1:0", "c2:12"]


class TestSynth:
    def test_schema_and_determinism(self):
        t1 = synth_transcripts_table(20, seed=42)
        t2 = synth_transcripts_table(20, seed=42)
        schemas.validate_table(t1, schemas.TRANSCRIPTS)
        assert t1.equals(t2)
        assert t1.num_rows > 20  # multiple turns per conv

    def test_block_invariance(self):
        """Content of a conversation is independent of which task generates it."""
        full = synth_transcripts_table(10, seed=1)
        from engine.io.synth import _gen_convs

        part = _gen_convs(np.array([7]), seed=1)
        sub = full.filter(pa.compute.equal(full["conv_id"], "conv00000007"))
        assert sub.to_pydict() == part.to_pydict()

    def test_distributed_equals_local(self, ray_session):
        from engine.io.synth import synth_transcripts

        ds = synth_transcripts(12, seed=3, parallelism=4)
        got = ds.to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
        want = synth_transcripts_table(12, seed=3).to_pandas()
        want = want.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
        assert got.equals(want)


class TestOracle:
    def test_tiny_by_hand(self):
        # 3 docs; query 'apple': df=2, N=3
        docs = {1: "apple banana apple", 2: "banana cherry", 3: "apple"}
        o = BM25Oracle(list(docs), list(docs.values()))
        keys, scores = o.topk("apple", 10)
        assert set(keys) == {1, 3}
        n, df = 3, 2
        idf = np.log(1 + (n - df + 0.5) / (df + 0.5))
        avgdl = (3 + 2 + 1) / 3
        def w(tf, dl):
            return idf * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
        expected = sorted([(1, w(2, 3)), (3, w(1, 1))], key=lambda x: -x[1])
        np.testing.assert_allclose(scores, [s for _, s in expected], rtol=1e-12)
        np.testing.assert_array_equal(keys, [k for k, _ in expected])

    def test_tie_break_doc_key_asc(self):
        docs = {5: "zz yy", 3: "zz yy", 9: "zz yy"}
        o = BM25Oracle(list(docs), list(docs.values()))
        keys, scores = o.topk("zz", 10)
        np.testing.assert_array_equal(keys, [3, 5, 9])
        assert scores[0] == scores[1] == scores[2]

    def test_query_set_deterministic(self):
        assert seeded_query_set(5, seed=7) == seeded_query_set(5, seed=7)
        qs = seeded_query_set(50)
        assert len({q for _, q in qs}) > 30


class TestDefaultPool:
    def test_pool_bounds_derive_from_cluster(self, ray_session):
        """Stage pools must size from ray.cluster_resources(), not fixture
        literals (VERDICT r3 #1): hi == all cluster CPUs (≥2), lo
        respected, cap clamps."""
        import ray

        from engine.core.pool import cluster_cpus, default_pool

        cpus = int(ray.cluster_resources().get("CPU", 0))
        assert cpus >= 1
        assert cluster_cpus() == cpus
        lo, hi = default_pool()
        assert lo == 1 and hi == max(2, cpus)
        assert default_pool(cap=2) == (1, 2)
        assert default_pool(lo=3, cap=1) == (3, 3)  # cap never undercuts lo
