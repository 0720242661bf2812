"""Partition-key choices in one place (SURVEY.md §4).

Build shuffle key: ``term_shard = h64(term) % num_shards`` — a stable,
process-independent hash (blake2b-64), NOT Python's randomized ``hash``.
Query routing recomputes the same function, so routing needs no lookup table
for unsalted terms.

Head-term salting (BASELINE.json:6 "explicit salting of head-term skew"):
a head term receives a DEDICATED contiguous shard range [start, start+fanout)
above the base shard space, and its postings scatter over that range by
``doc_key % fanout``. Dedicated ranges keep de-salting local: all sub-lists
of a head term live in a known shard range → one server group owns them all
and unions them before scoring (SURVEY.md §7 hard part 2). The salt map is
built from a frequency sketch (engine/index/skew.py), broadcast via
``ray.put`` during the build, and persisted in the manifest for query-time
routing.
"""

from __future__ import annotations

import hashlib

import numpy as np

DEFAULT_NUM_SHARDS = 32


def term_hash64(term: str) -> int:
    h = hashlib.blake2b(term.encode("utf-8"), digest_size=8).digest()
    return int.from_bytes(h, "little") & 0x7FFFFFFFFFFFFFFF


class TermHasher:
    """Caches per-term hashes; vocabulary is small relative to token stream."""

    def __init__(self) -> None:
        self._cache: dict[str, int] = {}

    def hash_unique(self, uniq_terms: np.ndarray) -> np.ndarray:
        cache = self._cache
        out = np.empty(len(uniq_terms), dtype=np.int64)
        for i, t in enumerate(uniq_terms):
            h = cache.get(t)
            if h is None:
                h = term_hash64(t)
                cache[t] = h
            out[i] = h
        return out


class SaltMap:
    """term → dedicated shard range. Empty by default (no salting)."""

    def __init__(self, num_base_shards: int, ranges: dict[str, tuple[int, int]] | None = None):
        self.num_base_shards = num_base_shards
        self.ranges = dict(ranges or {})  # term -> (start_shard, fanout)

    @property
    def num_total_shards(self) -> int:
        if not self.ranges:
            return self.num_base_shards
        return max(s + f for s, f in self.ranges.values())

    def shards_for_term(self, term: str) -> list[int]:
        r = self.ranges.get(term)
        if r is None:
            return [term_hash64(term) % self.num_base_shards]
        start, fanout = r
        return list(range(start, start + fanout))

    def to_json(self) -> dict:
        return {
            "num_base_shards": self.num_base_shards,
            "ranges": {t: list(r) for t, r in self.ranges.items()},
        }

    @classmethod
    def from_json(cls, d: dict) -> "SaltMap":
        return cls(d["num_base_shards"], {t: (r[0], r[1]) for t, r in d["ranges"].items()})

    @classmethod
    def allocate(cls, num_base_shards: int, head_terms: dict[str, int]) -> "SaltMap":
        """Give each head term a dedicated range of ``fanout`` shards above
        the base space, in sorted-term order (deterministic)."""
        ranges: dict[str, tuple[int, int]] = {}
        nxt = num_base_shards
        for term in sorted(head_terms):
            fanout = max(2, int(head_terms[term]))
            ranges[term] = (nxt, fanout)
            nxt += fanout
        return cls(num_base_shards, ranges)


def assign_shards(
    uniq_terms: np.ndarray,
    term_idx: np.ndarray,
    doc_keys: np.ndarray,
    hasher: TermHasher,
    salt: SaltMap,
) -> np.ndarray:
    """Vectorised shard id per (term, doc) row.

    ``uniq_terms[term_idx[i]]`` is row i's term; salted terms route by
    ``doc_key % fanout`` within their dedicated range.
    """
    hashes = hasher.hash_unique(uniq_terms)
    base = (hashes % salt.num_base_shards).astype(np.int32)
    shards = base[term_idx]
    if salt.ranges:
        starts = np.full(len(uniq_terms), -1, dtype=np.int64)
        fanouts = np.ones(len(uniq_terms), dtype=np.int64)
        for i, t in enumerate(uniq_terms):
            r = salt.ranges.get(t)
            if r is not None:
                starts[i], fanouts[i] = r
        salted = starts[term_idx] >= 0
        if salted.any():
            shards = shards.astype(np.int64)
            shards[salted] = starts[term_idx][salted] + (
                doc_keys[salted] % fanouts[term_idx][salted]
            )
    return shards.astype(np.int32)


def group_of_shard(shard: int | np.ndarray, num_groups: int):
    """Server-group assignment: all tiers/segments of a shard share a group."""
    return shard % num_groups
