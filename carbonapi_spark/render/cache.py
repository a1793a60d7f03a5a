"""Response cache with TTL (reference cache/cache.go:22-111 in-memory
expire-cache + the short-TTL-near-now policy of render_handler.go:45-66)."""

from __future__ import annotations

import threading
import time


class ExpireCache:
    def __init__(self, default_ttl: int = 60, short_ttl: int = 10,
                 max_entries: int = 4096):
        self._data: dict[str, tuple[float, object]] = {}
        self._lock = threading.Lock()
        self.default_ttl = default_ttl
        self.short_ttl = short_ttl
        self.max_entries = max_entries

    def ttl_for(self, until_ts: int, now: float | None = None) -> int:
        """Short TTL for queries whose window touches 'now' (their tail is
        still mutating); full TTL for fully-historical windows."""
        now = now or time.time()
        return self.short_ttl if until_ts >= now - 2 * self.default_ttl \
            else self.default_ttl

    def get(self, key: str):
        with self._lock:
            item = self._data.get(key)
            if item is None:
                return None
            expires, value = item
            if expires < time.time():
                del self._data[key]
                return None
            return value

    def put(self, key: str, value, ttl: int | None = None) -> None:
        with self._lock:
            if len(self._data) >= self.max_entries:
                # drop expired, then oldest
                now = time.time()
                for k in [k for k, (e, _) in self._data.items() if e < now]:
                    del self._data[k]
                while len(self._data) >= self.max_entries:
                    self._data.pop(next(iter(self._data)))
            self._data[key] = (time.time() + (ttl or self.default_ttl), value)
