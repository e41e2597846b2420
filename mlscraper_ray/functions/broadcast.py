"""Worker-process-global cache for ``ray.put`` broadcast objects.

``ray.get()`` of a non-zero-copy object (a Python set / dict of
strings) DESERIALIZES it on every call, so a per-batch
``ray.get(ref)`` inside ``map_batches`` pays the full unpickle per
task invocation — at the repo's 2M-entry broadcast caps that is
~100 MB of set rebuild per batch, easily dominating the batch's real
work. (numpy arrays come back zero-copy from the object store and
don't need this — the similarity/centroid broadcasts are fine as-is.)

``cached_object`` memoizes the deserialized value per worker process,
keyed by the object-ref hex — the ``_STAGE_CACHE`` idiom the crawl
stages already use for corpus readers and compiled plans. The cache
is capped with least-recently-used eviction so a long session touching
many broadcasts cannot accumulate every one of them in worker heap.
"""
from __future__ import annotations

from collections import OrderedDict

import ray

_CACHE: OrderedDict[str, object] = OrderedDict()
_CACHE_MAX = 4


def cached_object(ref):
    """Deserialized value of ``ref``, memoized per worker process."""
    key = ref.hex()
    if key in _CACHE:
        _CACHE.move_to_end(key)
        return _CACHE[key]
    obj = ray.get(ref)
    _CACHE[key] = obj
    while len(_CACHE) > _CACHE_MAX:
        _CACHE.popitem(last=False)
    return obj
