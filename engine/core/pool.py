"""Cluster-derived actor-pool sizing — the ONE place stage parallelism
comes from (SURVEY.md §2.0; round-4 item #1).

Every stateful ``map_batches`` stage in the engine (query servers, text
analyzers, dedup scanners, ANN probes) sizes its pool through
``default_pool()`` instead of a hard-coded literal, so the same pipeline
code saturates a 4-CPU test session, a 32-CPU node, and a 256-node
cluster: Ray Data's autoscaling actor pool starts at ``lo`` and grows
toward ``hi`` only while there are queued batches, so small fixture runs
never over-provision while big runs use every core the cluster reports.

Scale shape: ``ray.cluster_resources()`` is a constant-time driver-side
lookup of the GCS resource snapshot — no per-batch cost, and on a
multi-node cluster it counts ALL nodes' CPUs, which is exactly the upper
bound an autoscaling pool should advertise.
"""

from __future__ import annotations


def cluster_cpus(default: int = 4) -> int:
    """Total CPUs the current Ray cluster reports (``default`` when Ray
    is not yet initialised — callers building lazy pipelines before
    ``ray.init`` still get a sane bound)."""
    import ray

    if ray.is_initialized():
        return int(ray.cluster_resources().get("CPU", default))
    return default


def default_pool(lo: int = 1, cap: int | None = None) -> tuple[int, int]:
    """Autoscaling actor-pool bounds ``(lo, hi)`` for a stateful
    ``map_batches`` stage: ``hi`` = all cluster CPUs (≥2 so even a
    1-CPU toy session gets pipeline overlap), optionally clamped to
    ``cap`` when the caller knows the batch count is small."""
    hi = max(2, cluster_cpus())
    if cap is not None:
        hi = min(hi, max(lo, cap))
    return (lo, max(lo, hi))
