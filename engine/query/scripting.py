"""Scripted / runtime fields (ES ``script_fields`` — VERDICT r4 missing
#6): a tiny, SAFE integer-expression evaluator over per-hit numeric
columns (DocValues sidecar fields + score_micro + doc_id), evaluated
VECTORIZED over numpy arrays — never ``eval`` of Python source, never a
Python loop over rows.

Grammar (int64 arithmetic)::

    expr   := term (('+' | '-') term)*
    term   := factor (('*' | '//' | '%') factor)*
    factor := INT | NAME | '-' factor | '(' expr ')'

``//`` and ``%`` follow DuckDB semantics (truncation toward zero;
remainder carries the dividend's sign), so the SAME expression string is
valid in both this evaluator and the SQL oracle — the parity contract
that makes scripted fields oracle-checkable. For non-negative operands
(every fixture field) this coincides with Python semantics.
"""

from __future__ import annotations

import re

import numpy as np

_TOKEN = re.compile(r"\s*(\d+|[A-Za-z_][A-Za-z0-9_]*|//|[+\-*%()])")


def _tokenize(src: str) -> list[str]:
    out, i = [], 0
    while i < len(src):
        m = _TOKEN.match(src, i)
        if not m:
            raise ValueError(f"bad script at {src[i:]!r}")
        out.append(m.group(1))
        i = m.end()
    return out


def _trunc_div(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    if np.any(b == 0):
        raise ZeroDivisionError("script division by zero")
    q = np.abs(a) // np.abs(b)
    return np.where((a < 0) != (b < 0), -q, q)


def _trunc_mod(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return a - _trunc_div(a, b) * b


class Script:
    """Compiled expression: ``Script(src, fields)(env)`` → int64 array.
    ``fields`` is the allowed identifier set; unknown names fail at
    COMPILE time (a typo'd field must not crash per batch)."""

    def __init__(self, src: str, fields: set[str]):
        self.src = src
        self.fields = set(fields)
        toks = _tokenize(src)
        self._ast, rest = self._expr(toks)
        if rest:
            raise ValueError(f"trailing tokens {rest!r} in script {src!r}")

    # recursive-descent parser → nested tuples
    def _expr(self, t):
        node, t = self._term(t)
        while t and t[0] in "+-":
            op, (rhs, t) = t[0], self._term(t[1:])
            node = (op, node, rhs)
        return node, t

    def _term(self, t):
        node, t = self._factor(t)
        while t and t[0] in ("*", "//", "%"):
            op, (rhs, t) = t[0], self._factor(t[1:])
            node = (op, node, rhs)
        return node, t

    def _factor(self, t):
        if not t:
            raise ValueError(f"unexpected end of script {self.src!r}")
        head = t[0]
        if head == "(":
            node, t = self._expr(t[1:])
            if not t or t[0] != ")":
                raise ValueError(f"unbalanced parens in {self.src!r}")
            return node, t[1:]
        if head == "-":
            node, t = self._factor(t[1:])
            return ("neg", node), t
        if head.isdigit():
            return ("int", np.int64(head)), t[1:]
        if re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", head):
            if head not in self.fields:
                raise ValueError(f"unknown field {head!r} in script {self.src!r}")
            return ("var", head), t[1:]
        raise ValueError(f"unexpected token {head!r} in {self.src!r}")

    def __call__(self, env: dict) -> np.ndarray:
        return self._eval(self._ast, env)

    def _eval(self, node, env):
        op = node[0]
        if op == "int":
            return node[1]
        if op == "var":
            return np.asarray(env[node[1]], dtype=np.int64)
        if op == "neg":
            return -self._eval(node[1], env)
        a, b = self._eval(node[1], env), self._eval(node[2], env)
        if op == "+":
            return a + b
        if op == "-":
            return a - b
        if op == "*":
            return a * b
        if op == "//":
            return _trunc_div(np.asarray(a), np.asarray(b))
        if op == "%":
            return _trunc_mod(np.asarray(a), np.asarray(b))
        raise AssertionError(op)
