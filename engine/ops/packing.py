"""Sequence packing (training-data pipeline op): turn a document corpus
into fixed-token-budget training sequences.

Two industry-standard strategies, both deterministic pure functions of
(doc_id, text) so any rerun / resume / re-partitioning reproduces the same
packs:

- ``seq_pack`` — concat-and-chunk (GPT-style pretraining): documents are
  concatenated in doc_id order within P hash partitions and cut every
  BUDGET tokens; documents may straddle chunk boundaries.
- ``pack_greedy`` — greedy first-fit-in-order (SFT-style, no splitting):
  a pack closes when the next document would overflow BUDGET; an oversized
  document gets a pack of its own.

Scale shape (both): pass 1 is a shuffle-free ``map_batches`` that reduces
each document to a slim (doc_id, part, n_tokens) row — text never enters
the exchange; the ONE shuffle is a hash groupby on ``part`` whose groups
hold ints only; per-group work is vectorized (cumsum / searchsorted jump
loop, O(#packs log n) — never per-row Python). At 10^12 turns the exchange
carries ~16 bytes/doc.

Partition hash = Knuth multiplicative ``(doc_id * 2654435761) % 2^32 % P``
— vectorizable in uint64 and exactly reproducible in BIGINT SQL (products
stay far below 2^63).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from engine.core.context import ensure_hash_shuffle

PACK_BUDGET = 512  # tokens per training sequence
PACK_PARTS = 8  # parallel packing streams (per-node at scale)
KNUTH = 2654435761  # 2^32 / golden ratio (public constant)


def _slim(batch: pa.Table) -> pa.Table:
    """(doc_id, part, n_tokens) — whitespace-token count, the same
    NON_WS_PATTERN RE2 count ta_token_count already proved SQL-exact."""
    import pyarrow.compute as pc

    from engine.ops.textstats import TokenCounter

    texts = batch["text"]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    texts = pc.coalesce(texts, "")
    n = pc.count_substring_regex(texts, TokenCounter.NON_WS_PATTERN)
    did = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
    part = ((did * np.uint64(KNUTH)) % np.uint64(2**32)) % np.uint64(PACK_PARTS)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "part": pa.array(part.astype(np.int64)),
            "n_tokens": pc.cast(n, pa.int64()),
        }
    )


def _slim_ds(sf_dir: str):
    import ray.data as rd

    ensure_hash_shuffle()
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(_slim, batch_format="pyarrow", zero_copy_batch=True)


def seq_pack(sf_dir: str, budget: int = PACK_BUDGET) -> pd.DataFrame:
    """Concat-and-chunk assignment. Columns: doc_id, part, n_tokens,
    start_chunk, end_chunk, n_chunks (chunk ids are per-part, 0-based;
    an empty document spans no chunk: n_chunks=0, end=start)."""

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id").reset_index(drop=True)
        n = g["n_tokens"].to_numpy()
        before = np.concatenate(([0], np.cumsum(n)[:-1]))
        start = before // budget
        end = np.where(n > 0, (before + n - 1) // budget, start)
        g["start_chunk"] = start
        g["end_chunk"] = end
        g["n_chunks"] = np.where(n > 0, end - start + 1, 0)
        return g

    out = (
        _slim_ds(sf_dir)
        .groupby("part")
        .map_groups(per_part, batch_format="pandas")
        .to_pandas()
    )
    cols = ["doc_id", "part", "n_tokens", "start_chunk", "end_chunk", "n_chunks"]
    return (
        out[cols]
        .sort_values("doc_id")
        .reset_index(drop=True)
        .astype({c: "int64" for c in cols})
    )


def greedy_pack_ids(cum: np.ndarray, budget: int) -> np.ndarray:
    """pack_id per row from the ordered cumulative token sums: jump to the
    furthest row fitting base+budget via searchsorted; oversized rows get
    their own pack. O(#packs · log n)."""
    n = cum.size
    pack = np.empty(n, dtype=np.int64)
    start, base, pid = 0, 0, 0
    while start < n:
        j = int(np.searchsorted(cum, base + budget, side="right")) - 1
        if j < start:  # single doc overflows the budget alone
            j = start
        pack[start : j + 1] = pid
        base = int(cum[j])
        pid += 1
        start = j + 1
    return pack


def pack_greedy(sf_dir: str, budget: int = PACK_BUDGET) -> pd.DataFrame:
    """Greedy first-fit-in-order packs. Columns: doc_id, part, n_tokens,
    pack_id (per-part, 0-based), pack_pos (1-based within pack)."""

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id").reset_index(drop=True)
        cum = np.cumsum(g["n_tokens"].to_numpy())
        pid = greedy_pack_ids(cum, budget)
        # position within pack: running index minus first index of the pack
        first = np.concatenate(([0], np.flatnonzero(np.diff(pid)) + 1))
        g["pack_id"] = pid
        g["pack_pos"] = np.arange(len(g)) - first[pid] + 1
        return g

    out = (
        _slim_ds(sf_dir)
        .groupby("part")
        .map_groups(per_part, batch_format="pandas")
        .to_pandas()
    )
    cols = ["doc_id", "part", "n_tokens", "pack_id", "pack_pos"]
    return (
        out[cols]
        .sort_values("doc_id")
        .reset_index(drop=True)
        .astype({c: "int64" for c in cols})
    )
