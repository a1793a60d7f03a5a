"""Graphite interval strings ('1h30m', '-2d', '1mon') -> seconds.

Semantics of reference ``pkg/parser/interval.go:11-79``: optional leading
sign (else *default_sign*), then concatenated <digits><unit> groups;
mon = 30 d, y = 365 d.
"""

from __future__ import annotations

_UNITS = {
    "s": 1, "sec": 1, "secs": 1, "second": 1, "seconds": 1,
    "m": 60, "min": 60, "mins": 60, "minute": 60, "minutes": 60,
    "h": 3600, "hr": 3600, "hrs": 3600, "hour": 3600, "hours": 3600,
    "d": 86400, "day": 86400, "days": 86400,
    "w": 604800, "wk": 604800, "wks": 604800, "week": 604800, "weeks": 604800,
    "mon": 2592000, "month": 2592000, "months": 2592000,
    "y": 31536000, "yr": 31536000, "yrs": 31536000, "year": 31536000, "years": 31536000,
}


from carbonapi_spark.parser.grammar import ParseError


class IntervalError(ParseError):
    """Malformed interval: a parse error (the reference 400s on these —
    cmd/mockbackend/testcases/pr560)."""


def interval_seconds(s: str, default_sign: int = 1) -> int:
    if not s or s in ("-", "+"):
        raise IntervalError(f"unknown time units: {s!r}")
    sign = default_sign
    if s[0] == "-":
        sign, s = -1, s[1:]
    elif s[0] == "+":
        sign, s = 1, s[1:]

    total = 0
    i = 0
    n = len(s)
    # ASCII-only digit test: str.isdigit() accepts unicode digits ('¹')
    # that int() rejects, which would leak a ValueError instead of a 400
    digit = lambda c: "0" <= c <= "9"
    while i < n:
        j = i
        while j < n and digit(s[j]):
            j += 1
        if j == i:
            raise IntervalError(f"missing digits in interval {s!r}")
        amount = int(s[i:j])
        i = j
        while j < n and not digit(s[j]):
            j += 1
        unit = s[i:j].lower()
        if unit not in _UNITS:
            raise IntervalError(f"unknown time unit {unit!r}")
        total += sign * amount * _UNITS[unit]
        i = j
    return total
