"""Graphite at-time date grammar -> unix epoch.

Semantics of reference ``date/date.go:60-190`` (itself graphite-web's
render/attime.py): ``now``, ``midnight``, ``noon``, ``teatime``, ``today``,
``yesterday``, ``tomorrow``, relative offsets (``-1d``), ``<ref>±<offset>``
(``today-2d``), raw epoch, ``HH:MM_YYYYMMDD``, ``YYYYMMDD``, ``MM/DD/YY``.
"""

from __future__ import annotations

import datetime as _dt
from zoneinfo import ZoneInfo

from carbonapi_spark.parser.interval import IntervalError, interval_seconds

UTC = ZoneInfo("UTC")

_DATE_FORMATS = ("%Y%m%d", "%m/%d/%y", "%m/%d/%Y")


class DateError(ValueError):
    pass


def _ascii_digits(s: str) -> bool:
    # str.isdigit() accepts unicode digits ('¹') that int() rejects — that
    # would leak a ValueError (a 500) instead of a DateError (a 400)
    return bool(s) and all("0" <= c <= "9" for c in s)


def _parse_hhmm(s: str) -> tuple[int, int]:
    if s == "midnight":
        return 0, 0
    if s == "noon":
        return 12, 0
    if s == "teatime":
        return 16, 0
    s = s.replace(":", "")
    if _ascii_digits(s) and len(s) in (3, 4):
        return int(s[:-2]), int(s[-2:])
    raise DateError(f"bad time-of-day {s!r}")


def parse_at_time(s: str, tz: ZoneInfo | None = None,
                  now: _dt.datetime | None = None) -> int:
    tz = tz or UTC
    now = (now or _dt.datetime.now(tz=UTC)).astimezone(tz)
    s = s.strip().lower().replace("%20", " ")
    if not s:
        raise DateError("empty date")

    if s[0] in "+-":
        try:
            return int(now.timestamp()) + interval_seconds(s, -1)
        except IntervalError as exc:
            raise DateError(str(exc)) from exc

    # <ref>±<offset>
    for i in range(1, len(s)):
        if s[i] in "+-":
            try:
                ref = _parse_reference(s[:i], tz, now)
            except DateError:
                break
            try:
                return ref + interval_seconds(s[i:], 1)
            except IntervalError as exc:
                raise DateError(str(exc)) from exc

    return _parse_reference(s, tz, now)


def _parse_reference(s: str, tz: ZoneInfo, now: _dt.datetime) -> int:
    if s == "now":
        return int(now.timestamp())
    if s in ("midnight", "noon", "teatime"):
        hh, mm = _parse_hhmm(s)
        return int(now.replace(hour=hh, minute=mm, second=0, microsecond=0).timestamp())

    if _ascii_digits(s.lstrip("+-")) and len(s) != 8:
        return int(s)  # raw epoch (8-digit numbers are YYYYMMDD)

    s = s.replace("_", " ", 1)
    parts = s.split()
    if len(parts) == 1:
        ts, ds = "", parts[0]
    elif len(parts) == 2:
        ts, ds = parts
    else:
        raise DateError(f"bad date {s!r}")

    if ds == "today":
        base = now
    elif ds == "yesterday":
        base = now - _dt.timedelta(days=1)
    elif ds == "tomorrow":
        base = now + _dt.timedelta(days=1)
    else:
        for fmt in _DATE_FORMATS:
            try:
                base = _dt.datetime.strptime(ds, fmt).replace(tzinfo=tz)
                break
            except ValueError:
                continue
        else:
            raise DateError(f"bad date {ds!r}")

    hh = mm = 0
    if ts:
        try:
            hh, mm = _parse_hhmm(ts)
        except DateError:
            hh = mm = 0
    return int(base.replace(hour=hh, minute=mm, second=0, microsecond=0).timestamp())


def date_param_to_epoch(s: str, default: int, tz: ZoneInfo | None = None,
                        now: _dt.datetime | None = None) -> int:
    """reference date/date.go:60-67 — fall back to *default* on parse error."""
    if not s:
        return default
    try:
        return parse_at_time(s, tz, now)
    except (DateError, ValueError):
        return default
