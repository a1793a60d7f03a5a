"""Graphite glob patterns -> Java-compatible regexes for Spark ``RLIKE``.

Graphite globs are per-dot-node: ``*`` and ``?`` never cross a ``.``;
``[a-z]`` is a char class; ``{a,b}`` is alternation. The reference pushes
glob matching to its storage backends; we own storage, so the translation
feeds a pushed-down RLIKE predicate on the Parquet ``name`` column.
"""

from __future__ import annotations

import re

_META = set(".^$+()|\\")


def has_wildcard(pattern: str) -> bool:
    return any(c in pattern for c in "*?[{")


def glob_to_regex(pattern: str, anchored: bool = True) -> str:
    out: list[str] = []
    i, n = 0, len(pattern)
    while i < n:
        c = pattern[i]
        if c == "*":
            out.append("[^.]*")
        elif c == "?":
            out.append("[^.]")
        elif c == "[":
            j = pattern.find("]", i + 1)
            if j < 0:
                out.append("\\[")
            else:
                out.append(pattern[i:j + 1])
                i = j
        elif c == "{":
            j = pattern.find("}", i + 1)
            if j < 0:
                out.append("\\{")
            else:
                alts = pattern[i + 1:j].split(",")
                out.append("(?:" + "|".join(re.escape(a) for a in alts) + ")")
                i = j
        elif c in _META:
            out.append("\\" + c)
        else:
            out.append(c)
        i += 1
    body = "".join(out)
    return f"^{body}$" if anchored else body


def glob_matches(pattern: str, name: str) -> bool:
    """Driver-side matcher (used by /metrics/find tree assembly and tests)."""
    return re.match(glob_to_regex(pattern), name) is not None
