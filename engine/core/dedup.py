"""Exact input dedup of duplicate (conv_id, turn_idx) rows — keep first by
ts (SURVEY.md §2.8-D1; per-row invariant BASELINE.json:15).

Scale shape: hash shuffle on the composite key via repartition(keys=...) —
only needed when the input does NOT guarantee key uniqueness, so the build
exposes it as an opt-in stage (``build_index(dedup_input=True)``): an
avoidable all-to-all is off by default (SURVEY.md §4 'minimize shuffles').

SCOPE: ``dedup_turns`` dedups within ONE build invocation's input. On a
manifest-resumed build, keys that were already committed by a previous build
survive in the new fragments — ``anti_join_committed`` (applied by
build_index when dedup_input=True and prior builds exist) filters them
against the committed docmap. Sandbox realization: committed doc_keys are
broadcast as one sorted array; at 10^12-doc scale this becomes a per-part
lookup against the part-partitioned docmap (same pruning layout hydration
uses, engine/query/hydrate.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def anti_join_committed(ds, index_dir: str):
    """Drop rows whose doc_key is already committed in the index's docmap.

    Broadcast anti-join: committed keys are read once from the docmap
    (column-pruned to doc_key), sorted, ``ray.put`` once, and each batch
    filters via searchsorted — no shuffle."""
    import ray
    import ray.data as rd

    from engine.core.dockey import doc_key_batch
    from engine.query.hydrate import committed_docmap_files

    # Only manifest-COMMITTED builds' docmap files: a crashed build writes
    # its docmap before the manifest commit, and treating those orphan keys
    # as committed would drop the re-presented rows from the resumed build —
    # documents permanently missing from the index with no error.
    files = committed_docmap_files(index_dir)
    if not files:
        return ds
    committed = np.unique(
        rd.read_parquet(files, columns=["doc_key"]).to_pandas()["doc_key"].to_numpy()
    )
    ref = ray.put(committed)

    def drop_committed(batch: pa.Table) -> pa.Table:
        keys = ray.get(ref)
        if "doc_key" in batch.column_names:
            dk = batch["doc_key"].to_numpy()
        else:
            dk = doc_key_batch(batch["conv_id"], batch["turn_idx"].to_numpy())
        pos = np.searchsorted(keys, dk)
        pos[pos >= keys.size] = 0
        dup = keys[pos] == dk if keys.size else np.zeros(dk.size, dtype=bool)
        return batch.filter(pa.array(~dup))

    return ds.map_batches(drop_committed, batch_format="pyarrow", zero_copy_batch=True)


def dedup_turns(ds):
    from engine.core.context import hash_strategy

    def keep_first(batch: pa.Table) -> pa.Table:
        """Within a hash partition every instance of a key is present, so a
        partition-local keep-min-ts is globally correct."""
        import pyarrow.compute as pc

        order = pc.sort_indices(
            batch,
            sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending"), ("ts", "ascending")],
        )
        t = batch.take(order)
        conv = np.asarray(t["conv_id"].to_pandas(), dtype=object)
        turn = t["turn_idx"].to_numpy()
        first = np.ones(t.num_rows, dtype=bool)
        if t.num_rows > 1:
            first[1:] = (conv[1:] != conv[:-1]) | (turn[1:] != turn[:-1])
        return t.filter(pa.array(first))

    import ray

    nblocks = 2 * int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 8
    with hash_strategy():  # repartition(keys) needs the hash operator
        from ray.data.context import ShuffleStrategy

        try:  # the input Dataset snapshotted its context at creation
            ds.context.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
        except AttributeError:
            pass
        return ds.repartition(num_blocks=nblocks, keys=["conv_id", "turn_idx"]).map_batches(
            keep_first, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        )
