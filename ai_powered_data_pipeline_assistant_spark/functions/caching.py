"""TTL result cache for DataFrame pipelines.

Parity target (SURVEY §4): reference backend/utils/caching.py:50-251 —
three-layer TTL caches keyed on md5(func+args), default TTL 300 s. Catalyst
does not TTL-cache results, so this thin driver-side layer fills the gap:
it memoizes *materialized* small results (collected rows) or persisted
DataFrames, keyed exactly like the reference (md5 of function name + args).

Use for the API layer's repeated point queries (task lists, status counts);
NOT for large frames — those should rely on `df.persist()` managed by the
caller.
"""

from __future__ import annotations

import hashlib
import json
import time
from collections.abc import Callable
from dataclasses import dataclass, field
from threading import RLock
from typing import Any

DEFAULT_TTL_S = 300.0  # reference: caching.py:57


def cache_key(func_name: str, *args: Any, **kwargs: Any) -> str:
    """md5(func + canonicalized args) — the reference's key scheme
    (caching.py:233-251), with sorted-key JSON for dict-order insensitivity."""
    payload = json.dumps([func_name, args, kwargs], sort_keys=True, default=str)
    return hashlib.md5(payload.encode()).hexdigest()


@dataclass
class CacheStats:
    hits: int = 0
    misses: int = 0
    evictions: int = 0

    @property
    def hit_rate(self) -> float:
        total = self.hits + self.misses
        return (self.hits / total) if total else 0.0


@dataclass
class TTLCache:
    ttl_s: float = DEFAULT_TTL_S
    max_entries: int = 1024
    _store: dict[str, tuple[float, Any]] = field(default_factory=dict)
    _lock: RLock = field(default_factory=RLock)
    stats: CacheStats = field(default_factory=CacheStats)

    def get(self, key: str, now: float | None = None):
        now = time.monotonic() if now is None else now
        with self._lock:
            entry = self._store.get(key)
            if entry is None or now - entry[0] > self.ttl_s:
                if entry is not None:
                    del self._store[key]
                    self.stats.evictions += 1
                self.stats.misses += 1
                return None
            self.stats.hits += 1
            return entry[1]

    def put(self, key: str, value: Any, now: float | None = None) -> None:
        now = time.monotonic() if now is None else now
        with self._lock:
            if len(self._store) >= self.max_entries:
                oldest = min(self._store, key=lambda k: self._store[k][0])
                del self._store[oldest]
                self.stats.evictions += 1
            self._store[key] = (now, value)

    def cleanup_expired(self, now: float | None = None) -> int:
        """The reference's sweep (caching.py:178-196)."""
        now = time.monotonic() if now is None else now
        with self._lock:
            dead = [k for k, (t, _) in self._store.items() if now - t > self.ttl_s]
            for k in dead:
                del self._store[k]
            self.stats.evictions += len(dead)
            return len(dead)

    def cached(self, func: Callable, *args: Any, **kwargs: Any):
        """Memoize func(*args) under the reference's key scheme."""
        key = cache_key(getattr(func, "__name__", str(func)), *args, **kwargs)
        hit = self.get(key)
        if hit is not None:
            return hit
        value = func(*args, **kwargs)
        self.put(key, value)
        return value
