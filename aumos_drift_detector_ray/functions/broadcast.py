"""Per-worker cache for broadcast (``ray.put``) lookup structures.

Zero-copy objects (numpy / Arrow) come out of ``ray.get`` as views onto
shared plasma memory, so repeated gets are cheap. Python dicts and other
pickled objects are NOT: every ``ray.get`` re-deserializes the payload,
so a map_batches stage that calls ``ray.get(dict_ref)`` per batch pays
an unpickle per batch — harmless for a 3k-entry dimension dict, hostile
for a 20M-entry one. ``get_broadcast`` memoizes the deserialized value
per worker process (keyed by the ObjectRef hex), so each worker pays the
deserialization exactly once per broadcast object.

The cache is intentionally small and FIFO-evicted: broadcast lookups are
query-scoped, and holding at most ``_MAX_ENTRIES`` keeps a long-lived
worker from pinning every dimension table it ever saw.
"""
from __future__ import annotations

from typing import Any

import ray

_MAX_ENTRIES = 8
_cache: "dict[str, Any]" = {}


def get_broadcast(ref: "ray.ObjectRef") -> Any:
    """Deserialize ``ref`` once per worker process and memoize it."""
    key = ref.hex()
    hit = _cache.get(key)
    if hit is not None:
        return hit
    value = ray.get(ref)
    if len(_cache) >= _MAX_ENTRIES:
        _cache.pop(next(iter(_cache)))
    _cache[key] = value
    return value
