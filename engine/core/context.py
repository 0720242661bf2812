"""Ray Data execution-context knobs the engine relies on.

The build shuffle uses key-based ``repartition(keys=...)``, which requires
the hash-shuffle strategy (the right choice for us anyway: the all-to-all
exchanges are hash partitioned by term_shard / qid, never globally sorted —
SURVEY.md §4). Called lazily by the stages that shuffle; never calls
ray.init (the driver owns the session — __ray_entry__.py contract)."""

from __future__ import annotations


def ensure_hash_shuffle(ds=None) -> None:
    """Set hash shuffle on the global context and, if given, on a Dataset's
    captured context (Datasets snapshot DataContext at creation time)."""
    from ray.data.context import DataContext, ShuffleStrategy

    ctx = DataContext.get_current()
    if ctx.shuffle_strategy != ShuffleStrategy.HASH_SHUFFLE:
        ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    if ds is not None:
        try:
            ds.context.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
        except AttributeError:
            pass
