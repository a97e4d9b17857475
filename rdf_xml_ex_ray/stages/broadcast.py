"""Per-process broadcast-object cache for task-stage lookups.

The broadcast-join pattern this repo standardizes on (see
``pipelines/kg.py:link_entities``): ship a small side once with ``ray.put``,
keep stages as plain *tasks* (which Ray can fuse into one chain at full
cluster parallelism — an actor pool would become the fusion target and cap
the chain at the pool size), and resolve the ref at most once per worker
process via this module-level cache.
"""

from __future__ import annotations

from typing import Any

# Most-recent-N broadcast values per worker process. Bounded (the round-2
# advisor's finding: an unbounded cache pins every pipeline invocation's
# broadcast objects in worker RSS for the process lifetime on a long-lived
# cluster). Python dicts preserve insertion order, so eviction is FIFO —
# fine here because within one pipeline run only a handful of refs are live.
_CACHE: dict[str, Any] = {}
_CACHE_CAP = 8


def put_broadcast(obj: Any) -> Any:
    """``ray.put`` when a Ray session exists; passthrough otherwise (so the
    same pipeline code runs in plain-Python unit tests)."""
    try:
        import ray

        if ray.is_initialized():
            return ray.put(obj)
    except ImportError:  # pragma: no cover
        pass
    return obj


def cluster_cpus(default: int = 8) -> int:
    """Current cluster CPU count — the sizing basis for actor-pool stages
    (never hard-code a pool size: a constant cap starves the stage on any
    bigger cluster)."""
    try:
        import ray

        if ray.is_initialized():
            return max(1, int(ray.cluster_resources().get("CPU", default)))
    except ImportError:  # pragma: no cover
        pass
    return default


def resolve_broadcast(ref: Any) -> Any:
    """ObjectRef → value, fetched once per worker process; passthrough for
    plain values. Safe under Ray task-stage fusion: the cache lives in the
    worker process, not in any actor."""
    try:
        import ray

        if isinstance(ref, ray.ObjectRef):
            key = ref.hex()
            if key not in _CACHE:
                while len(_CACHE) >= _CACHE_CAP:
                    _CACHE.pop(next(iter(_CACHE)))
                _CACHE[key] = ray.get(ref)
            return _CACHE[key]
    except ImportError:  # pragma: no cover
        pass
    return ref
