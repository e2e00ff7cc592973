"""Shared stage utilities."""

from __future__ import annotations


def default_pool_size(reserve: int = 2, cap: int = 16) -> int:
    """Actor-pool size that leaves CPUs for the read/write stages.

    A pool whose ``concurrency × num_cpus`` covers every cluster CPU
    starves the producer stages (observed as a hard stall in local mode:
    all CPUs parked in actor constructors, zero left for ReadParquet).
    Reserve a couple of CPUs and cap the pool."""
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    except Exception:
        cpus = 4
    return max(1, min(cap, cpus - reserve))
