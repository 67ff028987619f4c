"""Shared broadcast helper.

``cached_broadcast`` fetches a ``ray.put`` object once per WORKER PROCESS
(module-level cache keyed by object-ref hex) — the broadcast-join pattern:
ship once, look up everywhere, never re-ship per batch.

Stages whose only state is a broadcast lookup should be STATELESS tasks using
this helper rather than actor pools: tasks are elastic and reserve no CPUs,
so small sessions can't deadlock on oversubscribed pools. Reserve actor pools
(`map_batches(Cls, concurrency=N)`) for stages with real init cost (engines,
models, compiled tables).
"""

from __future__ import annotations

_CACHE: dict = {}


def cached_broadcast(obj_ref):
    import ray

    # key includes the session's node id: ray.put object ids are counter-
    # based and REPEAT across sessions, so a driver that restarts Ray
    # in-process would otherwise hit a stale same-id entry
    try:
        node = ray.get_runtime_context().get_node_id()
    except Exception:
        node = None
    key = (obj_ref.hex(), node)
    if key not in _CACHE:
        _CACHE[key] = ray.get(obj_ref)
    return _CACHE[key]
