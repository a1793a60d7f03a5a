"""Pure-Python XXH64 matching Spark's ``xxhash64`` (seed 42 over UTF-8 bytes).

Independent reference implementation of the public XXH64 algorithm
(https://github.com/Cyan4973/xxHash/blob/dev/doc/xxhash_spec.md), used to
(a) unit-test the Spark-side simhash/minhash pipelines and (b) validate the
DuckDB SQL rendition used by the correctness oracles. Spark applies XXH64
to the UTF-8 bytes of a string with seed 42
(sql/catalyst XXH64.hashUnsafeBytes; reference semantics only — no code
shared).
"""

from __future__ import annotations

MASK64 = (1 << 64) - 1
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & MASK64


def _round(acc: int, val: int) -> int:
    acc = (acc + val * P2) & MASK64
    return (_rotl(acc, 31) * P1) & MASK64


def xxh64(data: bytes, seed: int = 42) -> int:
    """Unsigned 64-bit XXH64 of ``data``."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + P1 + P2) & MASK64
        v2 = (seed + P2) & MASK64
        v3 = seed & MASK64
        v4 = (seed - P1) & MASK64
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i:i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8:i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16:i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24:i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & MASK64
        for v in (v1, v2, v3, v4):
            h = ((h ^ _round(0, v)) * P1 + P4) & MASK64
    else:
        h = (seed + P5) & MASK64
    h = (h + n) & MASK64
    while i + 8 <= n:
        k = _round(0, int.from_bytes(data[i:i + 8], "little"))
        h = ((_rotl(h ^ k, 27) * P1) + P4) & MASK64
        i += 8
    if i + 4 <= n:
        h = ((_rotl(h ^ (int.from_bytes(data[i:i + 4], "little") * P1) & MASK64, 23) * P2) + P3) & MASK64
        i += 4
    while i < n:
        h = (_rotl(h ^ (data[i] * P5) & MASK64, 11) * P1) & MASK64
        i += 1
    h ^= h >> 33
    h = (h * P2) & MASK64
    h ^= h >> 29
    h = (h * P3) & MASK64
    h ^= h >> 32
    return h


def xxh64_signed(s: str, seed: int = 42) -> int:
    """Signed two's-complement view, matching Spark's BIGINT output."""
    v = xxh64(s.encode("utf-8"), seed)
    return v - (1 << 64) if v >= (1 << 63) else v


if __name__ == "__main__":
    for s in ["", "a", "hello", "hello world", "héllo wörld",
              "0123456789abcdef0123456789abcdef-and-more-tail-bytes"]:
        print(repr(s), xxh64_signed(s))
