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


def incr(stage: str, key: str, n: int = 1) -> None:
    """Fire-and-forget increment; silently a no-op when metrics are
    not enabled. Call at batch granularity only."""
    if n == 0:
        return
    try:
        h = ray.get_actor(ACTOR_NAME)
    except ValueError:
        return
    h.incr.remote(stage, key, n)


def snapshot(reset: bool = False) -> dict:
    try:
        h = ray.get_actor(ACTOR_NAME)
    except ValueError:
        return {}
    out = ray.get(h.snapshot.remote())
    if reset:
        h.reset.remote()
    return out
