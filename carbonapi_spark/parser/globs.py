"""Graphite glob patterns -> Java-compatible regexes for Spark ``RLIKE``.

Graphite globs are per-dot-node: ``*`` and ``?`` never cross a ``.``;
``[a-z]`` is a char class; ``{a,b}`` is alternation. The reference pushes
glob matching to its storage backends; we own storage, so the translation
feeds a pushed-down RLIKE predicate on the Parquet ``name`` column.
"""

from __future__ import annotations

import re
import warnings

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
            elif pattern[i + 1:j] in ("", "^", "!"):
                # '[]' / '[^]' have no members — fnmatch (and therefore
                # graphite) treats them as LITERAL brackets, and an
                # empty class doesn't even parse as a regex
                out.append(re.escape(pattern[i:j + 1]))
                i = j
            else:
                # Java's class grammar is a SUPERSET of Python's: '&&'
                # is set intersection and a bare '[' opens a nested
                # class, so a fragment that merely compiles under re
                # (e.g. '[a-b&&[c]') can still throw
                # PatternSyntaxException inside Spark rlike — a
                # request-surface 500.  In glob classes both chars are
                # plain members, so escape them (legal and literal in
                # BOTH engines) before validating.  Backslash first,
                # for the same reason (found by the r13 tri-engine
                # property fuzz): '[\0]' is an octal NUL escape in
                # Python re and RE2 but an ILLEGAL octal sequence in
                # Java (which demands digits after \0) — and fnmatch
                # glob semantics make '\' a literal member anyway.
                inner = (pattern[i + 1:j].replace("\\", "\\\\")
                         .replace("&", "\\&").replace("[", "\\["))
                cls = "[" + inner + "]"
                try:
                    # warnings-as-errors: re emits FutureWarning on
                    # fragments whose semantics will change (nested-set
                    # syntax) — treat those as malformed too
                    with warnings.catch_warnings():
                        warnings.simplefilter("error")
                        re.compile(cls)
                except (re.error, Warning):
                    # invalid class (e.g. '[z-a]' reversed range — also
                    # illegal in Java): treat as literal brackets like
                    # the other malformed-class branches — an
                    # un-compilable fragment would otherwise blow up
                    # INSIDE the Spark job (a request-surface 500)
                    cls = re.escape(pattern[i:j + 1])
                out.append(cls)
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


def glob_to_java_regex(pattern: str) -> str:
    r"""Strict-end anchored form for the JVM (Spark ``rlike``) sites.

    Java's default ``$`` matches BEFORE a final line terminator (LF, CR,
    NEL, LS, PS) while RE2's (the DuckDB oracle engine's) matches only
    at end-of-text, so a ``$``-anchored pattern shared between a Spark
    plan and its SQL replay silently diverges on a name with a trailing
    terminator — the same seam class as the BPE word-universe gate.
    ``\z`` is Java's strict end-of-input (no terminator allowance),
    which is exactly what RE2's ``$`` means, so the two engines agree
    on every input.  (Python ``re`` has no ``\z``; the driver-side
    matcher uses ``re.fullmatch`` instead.)"""
    return "^" + glob_to_regex(pattern, anchored=False) + r"\z"


def expand_braces(pattern: str, limit: int = 4096) -> list[str] | None:
    """Expand a brace-only pattern into its finite name list, else None.

    ``a.{b,c}.d`` -> ``[a.b.d, a.c.d]``. Returns None when the pattern has
    other wildcards (``*?[``), an unbalanced brace, or would expand past
    *limit* — callers then fall back to the regex path. Braces are flat
    (no nesting), matching glob_to_regex's treatment.
    """
    if "{" not in pattern or any(c in pattern for c in "*?["):
        return None
    out = [""]
    i, n = 0, len(pattern)
    while i < n:
        if pattern[i] == "{":
            j = pattern.find("}", i + 1)
            if j < 0:
                return None
            alts = pattern[i + 1:j].split(",")
            if len(out) * len(alts) > limit:
                return None
            out = [p + a for p in out for a in alts]
            i = j + 1
        else:
            k = pattern.find("{", i)
            k = n if k < 0 else k
            seg = pattern[i:k]
            out = [p + seg for p in out]
            i = k
    return out


def glob_matches(pattern: str, name: str) -> bool:
    """Driver-side matcher (used by /metrics/find tree assembly and
    tests).  ``fullmatch`` of the UNANCHORED body: Python's ``$`` also
    matches before a trailing newline, so anchor-free + fullmatch is
    the strict-end form here (the ``\\z`` of ``glob_to_java_regex``)."""
    return re.fullmatch(glob_to_regex(pattern, anchored=False),
                        name) is not None
