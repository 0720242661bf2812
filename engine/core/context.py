"""Ray Data execution-context knobs the engine relies on.

The engine's all-to-all exchanges (term_shard repartition, groupbys) are hash
partitioned — key-based ``repartition(keys=...)`` requires
``ShuffleStrategy.HASH_SHUFFLE``. Ray's hash-shuffle defaults assume a large
cluster (200 partitions, up to 64 aggregator actors, 300 s aggregator wait);
on a small/local cluster those actors cannot all schedule and the executor
stalls minutes per shuffle. ``ensure_hash_shuffle`` therefore sizes the
aggregator pool to the cluster that actually exists — which is also the
right behaviour on a 256-node cluster (scales back up with CPU count).

Never calls ray.init (the driver owns the session — __ray_entry__.py).
"""

from __future__ import annotations


def _cluster_cpus() -> int:
    try:
        import ray

        if ray.is_initialized():
            return max(1, int(ray.cluster_resources().get("CPU", 4)))
    except Exception:
        pass
    return 4


def ensure_hash_shuffle(ds=None) -> None:
    """Set hash shuffle (sized to the cluster) on the global context and, if
    given, on a Dataset's captured context (Datasets snapshot DataContext at
    creation time)."""
    from ray.data.context import DataContext, ShuffleStrategy

    cpus = _cluster_cpus()
    for ctx in filter(None, [DataContext.get_current(), getattr(ds, "context", None)]):
        ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
        ctx.default_hash_shuffle_parallelism = max(8, 2 * cpus)
        ctx.max_hash_shuffle_aggregators = max(2, cpus // 2)
        ctx.min_hash_shuffle_aggregator_wait_time_in_s = 10
