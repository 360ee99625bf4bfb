"""Shared actor-pool sizing.

``cpu_pool`` returns AUTOSCALING actor-pool bounds ``(min, max)`` derived
from the cluster's CPU count.  Two rules learned the hard way:

* Never hard-code ``concurrency=2`` — that starves a 32-CPU box (round-2
  VERDICT: kNN/IVF stages ran 2-wide while 30 cores idled).
* Never use a FIXED pool (plain int) — a fixed pool must fully start
  before the dataset makes progress, and when a previous query's pool is
  still tearing down (or two pools are chained) the fixed minimum can
  exceed free CPUs and deadlock the run (observed: q_perplexity after
  q_langid at 32 CPUs, both pools idle forever).
"""

from __future__ import annotations


def cpu_pool(frac: float = 0.75, reserve: int = 2,
             floor: int = 2) -> tuple[int, int]:
    """Autoscaling ``(min, max)`` actor-pool bounds from cluster CPUs."""
    cpus = 8
    try:
        import ray

        if ray.is_initialized():
            cpus = int(ray.cluster_resources().get("CPU", 8))
    except ImportError:
        pass
    top = max(floor, min(int(cpus * frac), max(1, cpus - reserve)))
    return (min(floor, top), top)
