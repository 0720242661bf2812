"""Ray Data execution-context knobs the engine relies on.

Shuffle strategy policy (measured on this Ray version, see build.py):
- The engine's all-to-alls use the DEFAULT sort-based shuffle — the build's
  term_shard exchange is a range-partitioning sort (~9x faster than the
  hash-shuffle operator on the same triples, with row-balanced output
  blocks), and groupby/map_groups work under it unchanged.
- Key-based ``repartition(keys=...)`` (only core/dedup.py needs the
  co-location guarantee) requires ShuffleStrategy.HASH_SHUFFLE — scoped via
  the ``hash_strategy()`` context manager around dataset CREATION (Datasets
  snapshot DataContext when created, so the global flip is restored
  immediately after).
- ``tune_shuffle`` sizes the hash-aggregator pool to the cluster that
  actually exists: Ray's defaults (200 partitions, 64 aggregator actors,
  300s waits) assume a large cluster and stall a small one.

Never calls ray.init (the driver owns the session — __ray_entry__.py).
"""

from __future__ import annotations

from contextlib import contextmanager


def _cluster_cpus() -> int:
    try:
        import ray

        if ray.is_initialized():
            return max(1, int(ray.cluster_resources().get("CPU", 4)))
    except Exception:
        pass
    return 4


def tune_shuffle(ds=None) -> None:
    """Size hash-shuffle aggregators to the real cluster (no strategy change)."""
    from ray.data.context import DataContext

    cpus = _cluster_cpus()
    for ctx in filter(None, [DataContext.get_current(), getattr(ds, "context", None)]):
        ctx.default_hash_shuffle_parallelism = max(8, 2 * cpus)
        ctx.max_hash_shuffle_aggregators = max(2, cpus // 2)
        ctx.min_hash_shuffle_aggregator_wait_time_in_s = 10


@contextmanager
def hash_strategy():
    """Scoped HASH_SHUFFLE for pipelines that need repartition(keys=...)."""
    from ray.data.context import DataContext, ShuffleStrategy

    tune_shuffle()
    ctx = DataContext.get_current()
    prev = ctx.shuffle_strategy
    ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    try:
        yield
    finally:
        ctx.shuffle_strategy = prev


# Backwards-compatible alias used across ops: sizing only (strategy stays
# at Ray's default sort shuffle).
def ensure_hash_shuffle(ds=None) -> None:
    tune_shuffle(ds)


def join_args(n_joins: int = 1) -> dict:
    """kwargs for ``Dataset.join`` sized so a plan's aggregator actors can
    never starve its actor-pool map stages. Each join spawns
    min(num_partitions, max_hash_shuffle_aggregators) DEDICATED actors that
    hold their CPUs for the plan's lifetime; on a 4-CPU test cluster a plan
    with two joins at the default 1 CPU/aggregator pins every core, the
    upstream map pool can't schedule, no input flows, and the executor
    deadlocks (observed: minhash_verified hang). Fractional CPUs
    oversubscribe gracefully — aggregators are threaded and exchange-bound
    at small scale — while big clusters keep the 1-CPU default.

    ``n_joins``: how many join operators run CONCURRENTLY in the plan this
    call feeds (streaming execution overlaps them all)."""
    tune_shuffle()
    cpus = _cluster_cpus()
    aggs = max(2, cpus // 2) * max(1, n_joins)
    # aggregators together get ≤ ¼ of the cluster: they are exchange-bound,
    # while the actor-pool map stages and the read tasks that FEED the join
    # need whole cores (measured deadlock at 4 CPUs: 4 aggregators × 0.5 +
    # 2 map actors × 1 = 4.0/4.0, feeding read task pends forever)
    num_cpus = max(0.1, min(1.0, round(cpus / (4 * aggs), 2)))
    return {
        "num_partitions": max(8, 2 * cpus),
        "aggregator_ray_remote_args": {"num_cpus": num_cpus},
    }
