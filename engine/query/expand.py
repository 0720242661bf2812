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

import os
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


def ensure_rev_stats(index_dir: str) -> str:
    """Build-once (per committed stats) the REVERSED dictionary sidecar —
    Lucene's reverse-token field for leading wildcards: (rterm, term, df)
    sorted by ``rterm`` (each term written backwards), so a ``*suffix``
    predicate becomes a PREFIX lookup whose [p, p+sentinel) bound pushes
    into the parquet read and prunes row groups — the dictionary is never
    fully scanned even once per query at web scale. Freshness-sealed
    against the manifest exactly like term_stats (same fingerprint file),
    rebuilt under the same flock discipline."""
    import fcntl
    import json
    import shutil

    from engine.index.build import ensure_term_stats
    from engine.io.manifest import Manifest

    stats_dir = ensure_term_stats(index_dir)
    rev_dir = os.path.join(index_dir, "term_stats_rev")

    def _fresh() -> bool:
        st = Manifest(index_dir).stats
        fingerprint = {"n_docs": int(st["n_docs"]), "sum_dl": int(st["sum_dl"])}
        try:
            with open(os.path.join(rev_dir, "_STATS.json")) as f:
                return json.load(f) == fingerprint
        except (OSError, ValueError):
            return False

    if _fresh():
        return rev_dir
    with open(f"{rev_dir}.lock", "w") as lk:
        fcntl.flock(lk, fcntl.LOCK_EX)
        try:
            if _fresh():
                return rev_dir
            import ray.data as rd

            shutil.rmtree(rev_dir, ignore_errors=True)

            def rev(df: pd.DataFrame) -> pd.DataFrame:
                t = df["term"].astype(str)
                return pd.DataFrame({
                    "rterm": t.str[::-1],
                    "term": t,
                    "df": df["df"].astype("int64"),
                })

            (rd.read_parquet(stats_dir, columns=["term", "df"])
             .map_batches(rev, batch_format="pandas")
             .sort("rterm")
             .write_parquet(rev_dir))
            st = Manifest(index_dir).stats
            with open(os.path.join(rev_dir, "_STATS.json"), "w") as f:
                json.dump({"n_docs": int(st["n_docs"]),
                           "sum_dl": int(st["sum_dl"])}, f)
        finally:
            fcntl.flock(lk, fcntl.LOCK_UN)
    return rev_dir


_PREFIX_SENTINEL = chr(0x10FFFF)


def _expand_suffix_rev(
    index_dir: str,
    specs: list[tuple[str, object, Optional[int]]],
) -> list[pd.DataFrame]:
    """Resolve suffix predicates against the reversed-dictionary sidecar:
    each ``*suffix`` becomes a prefix match on ``rterm`` whose
    [p, p + sentinel) window is pushed into the parquet read (row-group
    pruning on the rterm-sorted artifact)."""
    import pyarrow.dataset as pads
    import ray.data as rd

    rev_dir = ensure_rev_stats(index_dir)
    prefixes = [str(arg)[::-1] for _k, arg, _c in specs]
    flt = None
    for p in prefixes:
        leg = (pads.field("rterm") >= p) & (pads.field("rterm") < p + _PREFIX_SENTINEL)
        flt = leg if flt is None else (flt | leg)

    class _RevMatch:
        def __call__(self, df: pd.DataFrame) -> pa.Table:
            r = df["rterm"].astype(str)
            parts = []
            for slot, p in enumerate(prefixes):
                m = r.str.startswith(p)
                if not m.any():
                    continue
                hit = pd.DataFrame({
                    "slot": np.int64(slot),
                    "term": df["term"].astype(str).to_numpy()[m.to_numpy()],
                    "df": df["df"].to_numpy()[m.to_numpy()].astype(np.int64),
                })
                cap = specs[slot][2]
                if cap is not None and len(hit) > cap:
                    hit = hit.sort_values(["df", "term"],
                                          ascending=[False, True],
                                          kind="stable").head(cap)
                parts.append(hit)
            if not parts:
                return _empty_partial()
            return pa.Table.from_pandas(pd.concat(parts, ignore_index=True),
                                        schema=_SCHEMA, preserve_index=False)

    ds = rd.read_parquet(rev_dir, columns=["rterm", "term", "df"], filter=flt)
    parts = ds.map_batches(_RevMatch(), batch_format="pandas").to_pandas()
    if len(parts) == 0 or "slot" not in parts.columns:
        parts = _empty_partial().to_pandas()
    out = []
    for slot, (_k, _a, cap) in enumerate(specs):
        hit = parts[parts["slot"] == slot][["term", "df"]]
        hit = hit.sort_values(["df", "term"], ascending=[False, True],
                              kind="stable")
        if cap is not None:
            hit = hit.head(cap)
        out.append(hit.reset_index(drop=True).astype({"df": "int64"}))
    return out


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
    - ``("suffix", s, cap)``  — terms ending with ``s``: served from the
      REVERSED-dictionary sidecar (:func:`ensure_rev_stats`) as a prefix
      window pushed into the parquet read — Lucene's reverse-token field,
      so leading wildcards never scan the dictionary
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

    # suffix predicates route to the reversed-dictionary sidecar (prefix
    # pushdown); everything else scans the forward artifact once
    sfx_idx = [i for i, (k, _a, _c) in enumerate(specs) if k == "suffix"]
    if sfx_idx:
        sfx_res = _expand_suffix_rev(index_dir, [specs[i] for i in sfx_idx])
        rest_idx = [i for i in range(len(specs)) if specs[i][0] != "suffix"]
        if not rest_idx:
            return sfx_res
        rest_res = expand_terms(index_dir, [specs[i] for i in rest_idx])
        merged: list[Optional[pd.DataFrame]] = [None] * len(specs)
        for j, i in enumerate(sfx_idx):
            merged[i] = sfx_res[j]
        for j, i in enumerate(rest_idx):
            merged[i] = rest_res[j]
        return merged  # type: ignore[return-value]

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
