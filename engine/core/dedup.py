"""Exact input dedup of duplicate (conv_id, turn_idx) rows — keep first by
ts (SURVEY.md §2.8-D1; per-row invariant BASELINE.json:15).

Scale shape: hash shuffle on the composite key via repartition(keys=...) —
only needed when the input does NOT guarantee key uniqueness, so the build
exposes it as an opt-in stage (``build_index(dedup_input=True)``): an
avoidable all-to-all is off by default (SURVEY.md §4 'minimize shuffles').
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


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
