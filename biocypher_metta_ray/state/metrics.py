"""Pipeline metrics: distributed per-stage counters.

The reference's per-row error policy is log-and-skip with no
accounting (e.g. gtex_eqtl_adapter.py:93-95 silently drops). Here
every stage can report drop/keep counts to a named zero-CPU counter
actor — fire-and-forget, at most one call per BATCH (never per row),
so the hot path is unaffected. ``materialize_graph`` snapshots the
counters into the stage manifests.

When no metrics actor exists (plain library use), ``incr`` is a no-op:
metrics are strictly opt-in via :func:`enable_metrics`.
"""

from __future__ import annotations

import ray

ACTOR_NAME = "graft_metrics"


@ray.remote(num_cpus=0)
class MetricsActor:
    def __init__(self):
        self.counts: dict[str, dict[str, int]] = {}

    def incr(self, stage: str, key: str, n: int = 1) -> None:
        self.counts.setdefault(stage, {})
        self.counts[stage][key] = self.counts[stage].get(key, 0) + int(n)

    def snapshot(self) -> dict:
        return self.counts

    def reset(self) -> None:
        self.counts = {}


_HANDLE = None


def enable_metrics():
    """Create (or fetch) the named counter actor; returns its handle.

    Job-scoped (not detached): resolvable by name from any worker of
    this job, garbage-collected with the driver. The handle is pinned
    in a module global so the actor outlives local scopes.
    """
    global _HANDLE
    _HANDLE = MetricsActor.options(name=ACTOR_NAME, get_if_exists=True).remote()
    return _HANDLE


_WORKER_HANDLE = None


def incr(stage: str, key: str, n: int = 1) -> None:
    """Fire-and-forget increment; silently a no-op when metrics are
    not enabled. Call at batch granularity only.

    Resolution is retried briefly and the handle cached per process:
    freshly-started fused actor-pool workers have been observed to
    miss the first named-actor lookup (transiently stale name cache),
    which would silently drop counts. Metrics stay best-effort
    observability — correctness never depends on them.
    """
    global _WORKER_HANDLE
    if n == 0:
        return
    h = _WORKER_HANDLE
    if h is None:
        import time as _time

        for attempt in range(3):
            try:
                h = ray.get_actor(ACTOR_NAME)
                break
            except ValueError:
                if attempt == 2:
                    return
                _time.sleep(0.2)
        _WORKER_HANDLE = h
    h.incr.remote(stage, key, n)


def snapshot(reset: bool = False) -> dict:
    try:
        h = ray.get_actor(ACTOR_NAME)
    except ValueError:
        return {}
    out = ray.get(h.snapshot.remote())
    if reset:
        # synchronous: a fire-and-forget reset can be delivered AFTER
        # counters the next run has already incremented, silently
        # wiping them (observed on back-to-back run_build calls)
        ray.get(h.reset.remote())
    return out
