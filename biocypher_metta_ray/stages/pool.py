"""Cluster-size-aware actor-pool sizing.

A hard-coded ``concurrency=(1, 2)`` tuned for one box becomes the
pipeline's throughput ceiling on a 100-node cluster — a 2-actor stage
caps the whole stream. Stages whose per-actor state is genuinely
worth holding (compiled vocab tables, schema registries, permutation
matrices) default to an AUTOSCALING pool sized from the cluster's CPU
count at call time; kernels whose "state" is KB-scale broadcast data
are plain stateless functions instead (see stages/knn.py,
pipelines/kg.py) and need no pool at all.
"""

from __future__ import annotations


def autoscale_pool(
    concurrency: int | tuple | None = None, min_size: int = 1
) -> int | tuple:
    """Resolve a ``concurrency=`` argument for ``map_batches`` with a
    callable-class kernel.

    An explicit value passes through untouched (caller knows best).
    ``None`` returns ``(min_size, cluster_cpus)`` — an autoscaling
    actor pool whose ceiling tracks the CLUSTER, not this box: Ray
    only spawns actors under demand, so small inputs stay cheap while
    a 256-node run can fan the stage out fully.
    """
    if concurrency is not None:
        return concurrency
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 4)) if (
            ray.is_initialized()
        ) else 4
    except Exception:
        cpus = 4
    return (min_size, max(2, cpus))
