"""Distributed term-dictionary expansion (the shared rewrite resolver).

Every dictionary-expansion pipeline — trailing/leading wildcard, regexp,
fuzzy, did-you-mean, prefix suggest, match_phrase_prefix, and the exact
df lookups in explain / more-like-this / query-profile / PMI — resolves
its predicates HERE: one Ray Data pass over the vocab-sized ``term_stats``
artifact, every block filtered vectorized, each block reduced to a
per-predicate partial top-``cap`` before anything reaches the driver.

Scale shape: on a web crawl the term dictionary is 10^8–10^9 rows, so a
driver-side ``pq.read_table(term_stats).to_pandas()`` is a multi-GB load
re-paid per query entry. Here the driver only ever merges
``n_blocks x n_slots x cap`` candidate rows (tens, not billions); the
dictionary scan itself is an embarrassingly parallel map over the
artifact's blocks with no shuffle. Exact-term lookups additionally push an
``isin`` predicate into the parquet read so only matching row groups are
scanned at all (the artifact is written term-clustered by the groupby that
builds it, so row-group pruning is real).
"""

from __future__ import annotations

import re
from typing import Optional, Sequence

import numpy as np
import pandas as pd

#: kinds understood by :func:`expand_terms`
KINDS = ("prefix", "suffix", "regex", "edit1", "isin", "top")


def _edit1_mask(arg: str, terms: pd.Series) -> np.ndarray:
    """Vectorized-prefiltered Levenshtein<=1 mask: a |len - len(arg)| <= 1
    length mask first, the per-term check only on the survivors."""
    from engine.pipelines import _within_edit1

    lens = terms.str.len().to_numpy()
    cand = np.abs(lens - len(arg)) <= 1
    out = np.zeros(len(terms), dtype=bool)
    if cand.any():
        idx = np.flatnonzero(cand)
        vals = terms.to_numpy()
        out[idx] = [_within_edit1(arg, vals[i]) for i in idx]
    return out


import pyarrow as pa

_SCHEMA = pa.schema([("slot", pa.int64()), ("term", pa.string()),
                     ("df", pa.int64())])


def _empty_partial() -> pa.Table:
    return _SCHEMA.empty_table()


class _MatchSpecs:
    """Per-block predicate evaluator. Regexes compile once per construction
    (once per actor/task, not once per batch when used via map_batches on a
    long block stream)."""

    def __init__(self, specs: Sequence[tuple[str, object, Optional[int]]]):
        self.specs = list(specs)
        self.compiled = [
            re.compile(arg) if kind == "regex" else None
            for kind, arg, _cap in self.specs
        ]
        self.isin_sets = [
            frozenset(arg) if kind == "isin" else None
            for kind, arg, _cap in self.specs
        ]

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        terms = df["term"].astype(str)
        parts: list[pd.DataFrame] = []
        for slot, (kind, arg, cap) in enumerate(self.specs):
            if kind == "prefix":
                m = terms.str.startswith(arg).to_numpy()
            elif kind == "suffix":
                m = terms.str.endswith(arg).to_numpy()
            elif kind == "regex":
                pat = self.compiled[slot]
                m = np.fromiter(
                    (bool(pat.fullmatch(t)) for t in terms),
                    dtype=bool, count=len(terms),
                )
            elif kind == "edit1":
                m = _edit1_mask(arg, terms)
            elif kind == "isin":
                m = terms.isin(self.isin_sets[slot]).to_numpy()
            elif kind == "top":
                m = np.ones(len(terms), dtype=bool)
            else:  # pragma: no cover - caller bug
                raise ValueError(f"unknown expand kind {kind!r}")
            if not m.any():
                continue
            hit = pd.DataFrame({
                "slot": np.int64(slot),
                "term": terms.to_numpy()[m],
                "df": df["df"].to_numpy()[m].astype(np.int64),
            })
            if cap is not None and len(hit) > cap:
                hit = hit.sort_values(
                    ["df", "term"], ascending=[False, True], kind="stable"
                ).head(cap)
            parts.append(hit)
        if not parts:
            return _empty_partial()
        # Arrow out: typed blocks even when empty (pandas object columns
        # trip Ray's block-size estimator and drop schema on empty)
        return pa.Table.from_pandas(
            pd.concat(parts, ignore_index=True), schema=_SCHEMA,
            preserve_index=False,
        )


def expand_terms(
    index_dir: str,
    specs: Sequence[tuple[str, object, Optional[int]]],
    default_cap: Optional[int] = None,
) -> list[pd.DataFrame]:
    """Resolve dictionary predicates distributedly; return one
    ``DataFrame[term, df]`` per spec, stable-sorted df desc / term asc and
    capped at the spec's cap.

    ``specs`` is a sequence of ``(kind, arg, cap)``:

    - ``("prefix", p, cap)``  — terms starting with ``p``
    - ``("suffix", s, cap)``  — terms ending with ``s``
    - ``("regex", pat, cap)`` — FULL-match against ``pat`` (re / RE2 subset)
    - ``("edit1", t, cap)``   — Levenshtein distance <= 1 from ``t``
    - ``("isin", terms, None)`` — exact membership (df lookups); the match
      count is bounded by ``len(terms)`` so cap is optional, and the union
      of all isin sets is pushed into the parquet read as a row-group
      pruning predicate.
    - ``("top", None, cap)`` — the global ``cap`` highest-df terms
      (df desc, term asc): per-block partial top-cap, tiny driver merge —
      never a full-dictionary sort or collect.

    ``cap=None`` falls back to ``default_cap`` (unlimited only for isin).
    The driver never holds more than ``n_blocks x len(specs) x cap`` rows.
    """
    import ray.data as rd

    from engine.index.build import ensure_term_stats

    specs = [
        (kind, arg, (cap if cap is not None else default_cap))
        for kind, arg, cap in specs
    ]
    for kind, _arg, cap in specs:
        if cap is None and kind != "isin":
            raise ValueError(f"kind {kind!r} requires a cap")

    stats_dir = ensure_term_stats(index_dir)
    read_kw = {}
    if all(kind == "isin" for kind, _a, _c in specs) and specs:
        # pure point-lookup batch: prune row groups at the read
        import pyarrow.dataset as pads

        wanted = sorted({t for _k, arg, _c in specs for t in arg})
        read_kw["filter"] = pads.field("term").isin(wanted)

    ds = rd.read_parquet(stats_dir, columns=["term", "df"], **read_kw)
    parts = ds.map_batches(
        _MatchSpecs(specs), batch_format="pandas"
    ).to_pandas()
    if len(parts) == 0 or "slot" not in parts.columns:
        parts = _empty_partial().to_pandas()

    out: list[pd.DataFrame] = []
    for slot, (_kind, _arg, cap) in enumerate(specs):
        hit = parts[parts["slot"] == slot][["term", "df"]]
        hit = hit.sort_values(
            ["df", "term"], ascending=[False, True], kind="stable"
        )
        if cap is not None:
            hit = hit.head(cap)
        out.append(hit.reset_index(drop=True).astype({"df": "int64"}))
    return out
