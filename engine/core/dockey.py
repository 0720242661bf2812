"""Stable dense int64 document keys (SURVEY.md §1.1, §2.2-M4).

``doc_key`` is the engine-internal sort/delta-encoding key; the external
``docID`` string is ``conv_id ":" turn_idx`` (BASELINE.json:6). The key must
be (a) deterministic under any row ordering / partitioning, (b) int64 so
posting lists can be delta-encoded, (c) reconstructible to docID via the
docmap (T3) — it does NOT need to be arithmetically invertible.

Layout: ``doc_key = (h43(conv_id) << TURN_BITS) | turn_idx`` where ``h43`` is
the top 43 bits of blake2b-64 of the conv_id bytes. turn_idx gets 20 bits
(max ~1M turns per conversation). Conversations colliding in h43 silently
merge two turns' keys — likely at large scale (birthday bound: ~3M
conversations ⇒ ~40% chance of a collision in 2^43), so
``engine.index.build.audit_doc_keys`` runs a shuffle-free distinct-count
audit over the part-partitioned docmap (n_distinct(doc_key) == n_docs);
result recorded in the manifest (tested in tests/test_build_query.py).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

TURN_BITS = 20
TURN_MASK = (1 << TURN_BITS) - 1
_HASH_MASK = (1 << (63 - TURN_BITS)) - 1  # 43 bits → doc_key stays positive


def hash_conv_id(conv_id: str) -> int:
    """43-bit stable hash of a conversation id (blake2b, seedless)."""
    h = hashlib.blake2b(conv_id.encode("utf-8"), digest_size=8).digest()
    return int.from_bytes(h, "little") & _HASH_MASK


def doc_key_batch(conv_ids: pa.Array | list[str], turn_idx: np.ndarray) -> np.ndarray:
    """Vectorised doc_key for a batch.

    Hashes each *unique* conv_id once (batches are conversation-clustered in
    practice, so uniques << rows), then gathers — no per-row Python in the
    common case.
    """
    if isinstance(conv_ids, (pa.Array, pa.ChunkedArray)):
        if conv_ids.null_count:
            raise ValueError(
                f"conv_id contains {conv_ids.null_count} null(s); every "
                f"transcript row needs a non-null conv_id to form a doc_key"
            )
        conv_np = np.asarray(conv_ids.to_pandas(), dtype=object)
    else:
        conv_np = np.asarray(conv_ids, dtype=object)
        if any(c is None for c in conv_np):
            raise ValueError("conv_id contains null(s)")
    uniq, inverse = np.unique(conv_np, return_inverse=True)
    hashes = np.fromiter(
        (hash_conv_id(c) for c in uniq), dtype=np.int64, count=len(uniq)
    )
    turn = np.asarray(turn_idx, dtype=np.int64)
    if (turn > TURN_MASK).any() or (turn < 0).any():
        raise ValueError(f"turn_idx out of range [0, {TURN_MASK}]")
    return (hashes[inverse] << TURN_BITS) | turn


def doc_id_strings(conv_ids, turn_idx) -> pa.Array:
    """External docID = conv_id ':' turn_idx (BASELINE.json:6)."""
    import pyarrow.compute as pc

    conv = pa.array(conv_ids, type=pa.string()) if not isinstance(conv_ids, (pa.Array, pa.ChunkedArray)) else conv_ids
    turn = pa.array(np.asarray(turn_idx), type=pa.int32()) if not isinstance(turn_idx, (pa.Array, pa.ChunkedArray)) else turn_idx
    return pc.binary_join_element_wise(conv, pc.cast(turn, pa.string()), ":")
