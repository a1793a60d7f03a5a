"""Property-based tests for the pure-Python parser components, verified
against independent in-test reference implementations (not the code under
test). These run driver-side only — no Spark session — so hypothesis can
afford hundreds of examples."""

import re
import string

from hypothesis import given, settings, strategies as st

from carbonapi_spark.parser.globs import glob_matches, glob_to_regex
from carbonapi_spark.parser.interval import IntervalError, interval_seconds

# ------------------------------------------------------------------ globs

_lit = st.text(alphabet=string.ascii_lowercase + string.digits, min_size=1,
               max_size=4)


def _ref_match(pattern: str, name: str) -> bool:
    """Independent graphite-glob matcher: expand {a,b} alternates, then
    per-character NFA where * and ? never cross a dot."""
    # expand one brace group at a time (test patterns have no nesting)
    if "{" in pattern and "}" in pattern:
        i, j = pattern.index("{"), pattern.index("}")
        return any(_ref_match(pattern[:i] + alt + pattern[j + 1:], name)
                   for alt in pattern[i + 1:j].split(","))

    def match(p: int, s: int) -> bool:
        if p == len(pattern):
            return s == len(name)
        c = pattern[p]
        if c == "*":
            if match(p + 1, s):
                return True
            return s < len(name) and name[s] != "." and match(p, s + 1)
        if s >= len(name):
            return False
        if c == "?":
            return name[s] != "." and match(p + 1, s + 1)
        if c == "[":
            j = pattern.index("]", p + 1)
            ok = re.match("^" + pattern[p:j + 1] + "$", name[s]) is not None
            return ok and match(j + 1, s + 1)
        return name[s] == c and match(p + 1, s + 1)

    return match(0, 0)


@st.composite
def glob_and_name(draw):
    """A pattern built from nodes of literals/wildcards, and a name built
    by either honoring or perturbing the pattern."""
    n_nodes = draw(st.integers(1, 3))
    pat_nodes, name_nodes = [], []
    for _ in range(n_nodes):
        kind = draw(st.sampled_from(["lit", "star", "q", "class", "brace"]))
        lit = draw(_lit)
        if kind == "lit":
            pat_nodes.append(lit)
        elif kind == "star":
            pat_nodes.append(draw(st.sampled_from(["*", lit + "*", "*" + lit])))
        elif kind == "q":
            pat_nodes.append("?" + lit[1:])
        elif kind == "class":
            pat_nodes.append("[a-m]" + lit[1:])
        else:
            pat_nodes.append("{%s,%s}" % (lit, draw(_lit)))
        name_nodes.append(draw(_lit))
    pattern = ".".join(pat_nodes)
    if draw(st.booleans()):
        name = ".".join(name_nodes)            # usually a non-match
    else:
        name = ".".join(n.replace("*", "xx").replace("?", "a")
                        .replace("[a-m]", "c")
                        for n in pat_nodes)
        name = re.sub(r"\{([^,}]*),[^}]*\}", r"\1", name)  # first alternate
    return pattern, name


@settings(max_examples=400, deadline=None)
@given(glob_and_name())
def test_glob_regex_matches_reference_nfa(case):
    pattern, name = case
    assert glob_matches(pattern, name) == _ref_match(pattern, name), \
        (pattern, name, glob_to_regex(pattern))


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=30))
def test_glob_to_regex_total(pattern):
    """Any input compiles to a valid Java-ish regex (re-compatible here)
    without raising."""
    re.compile(glob_to_regex(pattern))


@st.composite
def brace_pattern(draw):
    n_nodes = draw(st.integers(1, 3))
    nodes = []
    for _ in range(n_nodes):
        if draw(st.booleans()):
            alts = draw(st.lists(_lit, min_size=1, max_size=3))
            nodes.append("{" + ",".join(alts) + "}")
        else:
            nodes.append(draw(_lit))
    return ".".join(nodes)


@settings(max_examples=300, deadline=None)
@given(brace_pattern())
def test_expand_braces_agrees_with_glob_matcher(pattern):
    """The IN-pushdown expansion and the regex path agree: every expanded
    name matches the pattern, and the expansion is exactly the set of
    names the glob can produce (alternate choices are independent)."""
    from carbonapi_spark.parser.globs import expand_braces
    names = expand_braces(pattern)
    if "{" not in pattern:
        assert names is None  # brace-free: caller uses plain equality
        return
    assert names is not None
    assert len(names) >= 1
    for name in names:
        assert glob_matches(pattern, name), (pattern, name)


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=30))
def test_expand_braces_total(pattern):
    """Never raises; returns None or a non-empty list of plain names."""
    from carbonapi_spark.parser.globs import expand_braces, has_wildcard
    names = expand_braces(pattern)
    if names is not None:
        assert names
        for n in names:
            assert not has_wildcard(n) or "{" not in n


# --------------------------------------------------------------- intervals

_UNIT_SECS = {"s": 1, "min": 60, "h": 3600, "d": 86400, "w": 604800,
              "mon": 2592000, "y": 31536000}


@settings(max_examples=300, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 9999),
                          st.sampled_from(sorted(_UNIT_SECS))),
                min_size=1, max_size=4),
       st.sampled_from(["", "-", "+"]))
def test_interval_equals_reference_sum(groups, sign):
    s = sign + "".join(f"{n}{u}" for n, u in groups)
    expect = sum(n * _UNIT_SECS[u] for n, u in groups)
    if sign == "-":
        expect = -expect
    assert interval_seconds(s) == expect


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=16))
def test_interval_total_behavior(s):
    """Any input either parses to an int or raises IntervalError — nothing
    else escapes. (Caught a real bug: unicode digits like '¹' pass
    str.isdigit() but crash int(), leaking a ValueError -> a 500.)"""
    try:
        assert isinstance(interval_seconds(s), int)
    except IntervalError:
        pass


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=20))
def test_at_time_total_behavior(s):
    """parse_at_time: any input -> epoch int or DateError, nothing else."""
    import datetime as dt

    from carbonapi_spark.parser.dates import DateError, parse_at_time
    now = dt.datetime(2024, 1, 15, 12, 0, tzinfo=dt.timezone.utc)
    try:
        assert isinstance(parse_at_time(s, now=now), int)
    except DateError:
        pass
