"""Bounded LRU mapping for compiled-program and score caches.

The reference's ``ScoreCache.py:18-124`` implements a doubly-linked-list
LRU; Python's OrderedDict gives the same move-to-end/evict-oldest
semantics in a few lines.  Used by the VE/BP per-signature program caches
and by :class:`pgmpy_tpu.estimators.scores.ScoreCache`.
"""

from collections import OrderedDict


class LRUDict:
    def __init__(self, max_size=128):
        if max_size <= 0:
            raise ValueError(f"max_size must be positive. Got: {max_size}")
        self.max_size = int(max_size)
        self._data = OrderedDict()

    def get(self, key, default=None):
        if key in self._data:
            self._data.move_to_end(key)
            return self._data[key]
        return default

    def __contains__(self, key):
        return key in self._data

    def __getitem__(self, key):
        self._data.move_to_end(key)
        return self._data[key]

    def __setitem__(self, key, value):
        if key in self._data:
            self._data.move_to_end(key)
        self._data[key] = value
        while len(self._data) > self.max_size:
            self._data.popitem(last=False)

    def __len__(self):
        return len(self._data)

    def keys(self):
        return self._data.keys()
