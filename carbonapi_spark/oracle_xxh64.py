"""DuckDB-SQL rendition of XXH64 (seed 42) for correctness oracles.

The engine hashes tokens/shingles with Spark's native ``xxhash64`` (XXH64
over the UTF-8 bytes, seed 42). To value-check those pipelines against an
independent engine, this module generates ANSI-ish DuckDB SQL that computes
the same hash from first principles: hex-decode the bytes, fold 8-byte
words / the 4-byte chunk / tail bytes with 64-bit wrapping arithmetic
(UHUGEINT mod 2^64), then the avalanche mix. Validated byte-for-byte
against ``tools/xxh64_ref.py``, which is itself validated against Spark.

Algorithm reference: the public XXH64 spec
(https://github.com/Cyan4973/xxHash/blob/dev/doc/xxhash_spec.md).
"""

from __future__ import annotations

MASK64 = (1 << 64) - 1
MOD64 = "18446744073709551616"  # 2^64
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5
SEED = 42

_HEX = "'0123456789ABCDEF'"


def _u(x: int) -> str:
    return f"CAST({x} AS UBIGINT)"


def _mm(a: str, b) -> str:
    """(a * b) mod 2^64 as UBIGINT."""
    return (f"CAST((CAST({a} AS UHUGEINT) * CAST({b} AS UHUGEINT))"
            f" % {MOD64} AS UBIGINT)")


def _am(a: str, b) -> str:
    """(a + b) mod 2^64 as UBIGINT."""
    return (f"CAST((CAST({a} AS UHUGEINT) + CAST({b} AS UHUGEINT))"
            f" % {MOD64} AS UBIGINT)")


def _rotl(x: str, r: int) -> str:
    return f"({_mm(x, 1 << r)} | ({x} >> {64 - r}))"


def _round0(v: str) -> str:
    """XXH64 round with zero accumulator: rotl(v*P2, 31) * P1."""
    return _mm(_rotl(_mm(v, P2), 31), P1)


def xxh64_ctes(src: str, col: str = "t", out: str = "h64",
               final: str = "xxh") -> str:
    """CTE chain computing signed-BIGINT XXH64(seed 42) of VARCHAR ``col``.

    Returns text for inclusion in a WITH clause: ``_x0 AS (...), ...,
    {final} AS (SELECT * EXCLUDE(helper cols), {out} FROM ...)``. Reads
    ``FROM {src}``; every column of ``src`` is passed through.
    """
    byte = (f"CAST((strpos({_HEX}, substr(__hx, 2*__i+1, 1)) - 1) * 16"
            f" + strpos({_HEX}, substr(__hx, 2*__i+2, 1)) - 1 AS UBIGINT)")
    word = ("list_reduce(list_transform(range(8), __j -> __bs[8*__k + 8 - __j]),"
            " (__a, __x) -> CAST(__a * 256 + __x AS UBIGINT))")

    # stripe accumulators for len >= 32 (seed-derived constants)
    v1 = (SEED + P1 + P2) & MASK64
    v2 = (SEED + P2) & MASK64
    v3 = SEED & MASK64
    v4 = (SEED - P1) & MASK64
    rnd = lambda acc, val: _mm(_rotl(_am(acc, _mm(val, P2)), 31), P1)  # noqa: E731
    stripe_item = "[CAST(__s AS UBIGINT), " + _u(0) + ", " + _u(0) + ", " + _u(0) + "]"
    stripe_step = "[" + ", ".join(
        rnd(f"__acc[{i + 1}]",
            f"__ws[CAST(4*__it[1] AS BIGINT) + {i + 1}]")
        for i in range(4)) + "]"
    merge32 = f"({_rotl('__m[1]', 1)} | {_u(0)})"
    merge32 = _am(_am(_rotl("__m[1]", 1), _rotl("__m[2]", 7)),
                  _am(_rotl("__m[3]", 12), _rotl("__m[4]", 18)))
    h32 = merge32
    for i in range(1, 5):
        h32 = _am(_mm(f"xor({h32}, {_round0(f'__m[{i}]')})", P1), P4)
    h_short = _u((SEED + P5) & MASK64)

    word_step = _am(_mm(_rotl(
        f"xor(__h, {_round0('__ws[CAST(__wi AS BIGINT) + 1]')})", 27), P1), P4)

    u32 = ("CAST(__bs[__b4+1] + __bs[__b4+2]*256 + __bs[__b4+3]*65536"
           " + __bs[__b4+4]*16777216 AS UBIGINT)")
    chunk4 = _am(_mm(_rotl(f"xor(__hb, {_mm(u32, P1)})", 23), P2), P3)

    tail_step = _mm(_rotl(
        f"xor(__h, {_mm('__bs[CAST(__bi AS BIGINT) + 1]', P5)})", 11), P1)

    avalanche = "xor(__hd, __hd >> 33)"
    avalanche = _mm(avalanche, P2)
    avalanche = f"xor({avalanche}, {avalanche} >> 29)"
    avalanche = _mm(avalanche, P3)
    avalanche = f"xor({avalanche}, {avalanche} >> 32)"

    signed = (f"CAST(CASE WHEN __he >= CAST(9223372036854775808 AS UBIGINT)"
              f" THEN CAST(__he AS HUGEINT) - {MOD64}"
              f" ELSE CAST(__he AS HUGEINT) END AS BIGINT)")

    return f"""
__x0 AS (SELECT *, hex(encode({col})) AS __hx,
                octet_length(encode({col})) AS __n FROM {src}),
__x1 AS (SELECT *, list_transform(range(__n), __i -> {byte}) AS __bs FROM __x0),
__x2 AS (SELECT *, list_transform(range(__n // 8), __k -> {word}) AS __ws FROM __x1),
__x3 AS (SELECT *,
  CASE WHEN __n >= 32 THEN
    list_reduce(list_concat(
        [[{_u(v1)}, {_u(v2)}, {_u(v3)}, {_u(v4)}]],
        list_transform(range(__n // 32), __s -> {stripe_item})),
      (__acc, __it) -> {stripe_step})
  END AS __m FROM __x2),
__x4 AS (SELECT *, {_am(f'CASE WHEN __n >= 32 THEN {h32} ELSE {h_short} END',
                        'CAST(__n AS UBIGINT)')} AS __ha FROM __x3),
__x5 AS (SELECT *,
  list_reduce(list_concat([__ha],
      list_transform(range((__n // 32) * 4, __n // 8),
                     __wi -> CAST(__wi AS UBIGINT))),
    (__h, __wi) -> {word_step}) AS __hb,
  (__n // 8) * 8 AS __b4 FROM __x4),
__x6 AS (SELECT *,
  CASE WHEN __n % 8 >= 4 THEN {chunk4} ELSE __hb END AS __hc,
  __b4 + CASE WHEN __n % 8 >= 4 THEN 4 ELSE 0 END AS __bt FROM __x5),
__x7 AS (SELECT *,
  list_reduce(list_concat([__hc],
      list_transform(range(__bt, __n), __bi -> CAST(__bi AS UBIGINT))),
    (__h, __bi) -> {tail_step}) AS __hd FROM __x6),
__x8 AS (SELECT *, {avalanche} AS __he FROM __x7),
{final} AS (SELECT * EXCLUDE (__hx, __n, __bs, __ws, __m, __ha, __hb, __b4,
                              __hc, __bt, __hd, __he),
                   {signed} AS {out} FROM __x8)
""".strip()
