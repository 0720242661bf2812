"""Safe expression evaluator for scripted fields (engine/query/scripting.py):
parser edges, compile-time validation, and DuckDB '//' / '%' semantics
parity including negatives."""

import duckdb
import numpy as np
import pytest

from engine.query.scripting import Script

F = {"a", "b", "n_chars", "score_micro"}


class TestParse:
    def test_precedence_and_parens(self):
        env = {"a": np.array([7]), "b": np.array([3])}
        assert Script("a + b * 2", F)(env)[0] == 13
        assert Script("(a + b) * 2", F)(env)[0] == 20
        assert Script("a - b - 1", F)(env)[0] == 3      # left assoc
        assert Script("-a + 10", F)(env)[0] == 3
        assert Script("a // b % 2", F)(env)[0] == 0     # (7//3)%2

    def test_compile_time_validation(self):
        for bad in ("a +", "(a", "a b", "unknown + 1", "a ** 2", "a @ b"):
            with pytest.raises(ValueError):
                Script(bad, F)

    def test_zero_division_raises(self):
        with pytest.raises(ZeroDivisionError):
            Script("a // (b - b)", F)({"a": np.array([1]), "b": np.array([2])})


class TestDuckDBParity:
    def test_div_mod_match_duckdb_including_negatives(self):
        """'//' and '%' must follow DuckDB truncation semantics so the
        same expression string is oracle-replayable for ANY operand sign
        (Python floors; DuckDB truncates — the evaluator sides with SQL)."""
        con = duckdb.connect()
        rng = np.random.default_rng(5)
        a = rng.integers(-50, 50, size=200).astype(np.int64)
        b = rng.integers(1, 9, size=200).astype(np.int64) * rng.choice(
            [-1, 1], size=200)
        env = {"a": a, "b": b}
        got_div = Script("a // b", F)(env)
        got_mod = Script("a % b", F)(env)
        for i in range(200):
            ref = con.execute(
                f"SELECT {a[i]} // ({b[i]}), {a[i]} % ({b[i]})").fetchone()
            assert got_div[i] == ref[0], (a[i], b[i])
            assert got_mod[i] == ref[1], (a[i], b[i])

    def test_fixture_scripts_vectorized(self):
        from engine.pipelines import SCRIPT_FIELDS

        env = {
            "doc_id": np.arange(5, dtype=np.int64),
            "score_micro": np.array([10, 200, 3000, 0, 55], dtype=np.int64),
            "n_chars": np.array([100, 250, 999, 1, 40], dtype=np.int64),
        }
        for _name, src in SCRIPT_FIELDS:
            out = Script(src, set(env)) (env)
            assert out.dtype == np.int64 and out.shape == (5,)
