"""Response caches with TTL (reference cache/cache.go:22-111: in-memory
expire-cache, null cache, memcached; + the short-TTL-near-now policy of
render_handler.go:45-66).

Two backends behind one duck-typed contract (``get(key)``,
``put(key, value, ttl)``, ``ttl_for(until_ts)``): the default in-process
:class:`ExpireCache` and the out-of-process
:class:`MemcachedResponseCache`, whose CLIENT is injected — the engine
never owns the connection, the same config-gate as aliasByRedis
(``functions/extras.py``).  ``GraphiteAPI(cache=...)`` selects the
backend."""

from __future__ import annotations

import hashlib
import struct
import threading
import time


class _TtlPolicy:
    """render_handler.go:45-66: short TTL for query windows touching
    'now' (their tail is still mutating), full TTL for history."""

    default_ttl = 60
    short_ttl = 10

    def ttl_for(self, until_ts: int, now: float | None = None) -> int:
        """Short TTL for queries whose window touches 'now' (their tail is
        still mutating); full TTL for fully-historical windows."""
        now = now or time.time()
        return self.short_ttl if until_ts >= now - 2 * self.default_ttl \
            else self.default_ttl


class ExpireCache(_TtlPolicy):
    def __init__(self, default_ttl: int = 60, short_ttl: int = 10,
                 max_entries: int = 4096):
        self._data: dict[str, tuple[float, object]] = {}
        self._lock = threading.Lock()
        self.default_ttl = default_ttl
        self.short_ttl = short_ttl
        self.max_entries = max_entries

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


class MemcachedResponseCache(_TtlPolicy):
    """Memcached-backed response cache (cache/cache.go:60-111
    ``MemcachedCache``): keys are sha256-hex of the canonical request
    key under a deployment ``prefix`` (raw render keys contain
    characters memcached forbids and can exceed its 250-byte key
    limit); values are NON-EXECUTABLE framed response tuples —
    status/content-type header + raw body bytes, the same
    raw-bytes-only policy as the reference (cache/cache.go stores the
    serialized response body, never an object graph).  Memcached is
    typically unauthenticated plaintext, so a deserializer that can
    execute code (pickle) would hand anyone who can reach or spoof the
    server arbitrary code execution in the API process; expiration is
    delegated to the server.

    The client is INJECTED, never constructed here (the aliasByRedis
    config gate): anything exposing ``get(key) -> bytes | None`` and
    ``set(key, value, expire=seconds)`` — e.g. ``pymemcache``'s or
    ``python-memcached``'s client.  Every server/network error is a
    cache MISS, never a request failure (the reference translates all
    errors to ErrNotFound and caps Get at 50 ms; a blocking Python
    client should carry its own socket timeout); misses-by-error are
    counted on ``errors`` the way the reference counts ``timeouts``."""

    def __init__(self, client, prefix: str = "capi:",
                 default_ttl: int = 60, short_ttl: int = 10):
        self._client = client
        self._prefix = prefix
        self.default_ttl = default_ttl
        self.short_ttl = short_ttl
        self.errors = 0

    # frame: magic 'C1' | status u16 | ctype-len u16 | ctype utf-8 | body
    _MAGIC = b"C1"
    _HDR = struct.Struct(">HH")

    @classmethod
    def _encode(cls, value) -> bytes:
        status, ctype, body = value
        ct = str(ctype).encode("utf-8")
        if not isinstance(body, (bytes, bytearray)):
            raise TypeError("response body must be bytes")
        return cls._MAGIC + cls._HDR.pack(int(status), len(ct)) + ct + body

    @classmethod
    def _decode(cls, blob: bytes):
        if not blob.startswith(cls._MAGIC):
            raise ValueError("bad magic")
        off = len(cls._MAGIC)
        status, ct_len = cls._HDR.unpack_from(blob, off)
        off += cls._HDR.size
        if off + ct_len > len(blob):
            raise ValueError("truncated frame")
        ctype = blob[off:off + ct_len].decode("utf-8")
        return status, ctype, bytes(blob[off + ct_len:])

    def _key(self, key: str) -> str:
        return self._prefix + hashlib.sha256(key.encode()).hexdigest()

    def get(self, key: str):
        try:
            blob = self._client.get(self._key(key))
        except Exception:
            self.errors += 1
            return None
        if blob is None:
            return None
        try:
            return self._decode(blob)
        except Exception:
            # malformed/foreign blob (including anything an attacker
            # planted): a MISS, never an error or an object load
            self.errors += 1
            return None

    def put(self, key: str, value, ttl: int | None = None) -> None:
        try:
            self._client.set(self._key(key), self._encode(value),
                             expire=int(ttl or self.default_ttl))
        except Exception:
            self.errors += 1
