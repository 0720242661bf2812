"""The analyzer: normalise + tokenize turn text (SURVEY.md §2.2-M1/M2).

RANK-IDENTITY PRECONDITION: the engine, the pure-Python oracle
(engine/oracle/bm25.py) and the DuckDB SQL oracle (__ray_entry__.oracle_sql)
must tokenize IDENTICALLY, or BM25 scores cannot be rank-identical
(BASELINE.json:14). The shared definition is:

    tokens(text) = [t for t in split(lower(text), NON_ALNUM) if t != ""]

i.e. casefold via simple lowercasing, then maximal runs of ``[a-z0-9]`` —
exactly ``regexp_split_to_array(lower(text), '[^a-z0-9]+')`` minus empty
strings in DuckDB. Unicode NFKC normalisation is deliberately NOT applied:
DuckDB's lower() and Python's str.lower() agree on the ASCII range, and
non-ASCII codepoints are never token characters under this grammar, so the
three implementations agree byte-for-byte on arbitrary UTF-8 input.

Analyzers are pluggable (SURVEY.md §2.10): register a named Analyzer class;
expensive analyzers run as actor pools via map_batches(cls, concurrency=N).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

TOKEN_RE = re.compile(r"[a-z0-9]+")
# SQL fragment producing the identical token list for a text column `t`:
SQL_TOKENS = "list_filter(regexp_split_to_array(lower({col}), '[^a-z0-9]+'), x -> x <> '')"


class Analyzer:
    """Default analyzer. Stateless; regex precompiled at import.

    Plugin contract (SURVEY.md §2.10): subclass and override ``tokens``;
    register with ``register_analyzer(name, cls, expensive=False)``.
    """

    name = "default"

    def tokens(self, text: str) -> list[str]:
        return TOKEN_RE.findall(text.lower())

    # -- vectorised batch path ------------------------------------------------
    def tokenize_batch(self, texts: pa.ChunkedArray | pa.Array | list[str]):
        """texts → (flat_tokens: np.ndarray[object], doc_lengths: np.ndarray[int32]).

        Returns a flattened token stream plus per-document counts so callers
        can build either list<string> columns or exploded triples without a
        second pass.
        """
        if isinstance(texts, (pa.Array, pa.ChunkedArray)):
            texts = texts.to_pylist()
        findall = TOKEN_RE.findall
        per_doc = [findall(t.lower()) if t is not None else [] for t in texts]
        dl = np.fromiter((len(p) for p in per_doc), dtype=np.int32, count=len(per_doc))
        total = int(dl.sum())
        flat = np.empty(total, dtype=object)
        pos = 0
        for p in per_doc:
            n = len(p)
            flat[pos : pos + n] = p
            pos += n
        return flat, dl


_REGISTRY: dict[str, tuple[type, bool]] = {"default": (Analyzer, False)}


def register_analyzer(name: str, cls: type, *, expensive: bool = False) -> None:
    _REGISTRY[name] = (cls, expensive)


def get_analyzer(name: str = "default") -> Analyzer:
    cls, _ = _REGISTRY[name]
    return cls()


def analyzer_is_expensive(name: str) -> bool:
    return _REGISTRY[name][1]
