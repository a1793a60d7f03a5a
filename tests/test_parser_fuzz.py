"""Parser robustness (reference layer 3: expr/fuzz.go + corpus_test.go).

The reference ships a go-fuzz harness; its crash corpus isn't in-repo, so we
fuzz with hypothesis: arbitrary input must never raise anything but
ParseError, and well-formed expressions round-trip through to_string().
"""

import string

from hypothesis import given, settings, strategies as st

from carbonapi_spark.parser import ParseError, parse

_name_chars = string.ascii_letters + string.digits + "._-*?"


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=60))
def test_arbitrary_input_never_crashes(s):
    try:
        parse(s)
    except ParseError:
        pass  # rejection is fine; anything else is a bug


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet=string.printable, max_size=80))
def test_printable_input_never_crashes(s):
    try:
        parse(s)
    except ParseError:
        pass


names = st.text(alphabet=_name_chars, min_size=1, max_size=12).filter(
    lambda s: s.lower() not in ("true", "false") and not s[0].isdigit()
    and s[0] not in "+-.")
consts = st.floats(allow_nan=False, allow_infinity=False,
                   min_value=-1e6, max_value=1e6)


@st.composite
def exprs(draw, depth=0):
    if depth >= 3 or draw(st.booleans()):
        return draw(names)
    fn = draw(names)
    n_args = draw(st.integers(min_value=1, max_value=3))
    args = [draw(exprs(depth=depth + 1)) if draw(st.booleans())
            else repr(round(draw(consts), 3)) for _ in range(n_args)]
    return f"{fn}({','.join(args)})"


@settings(max_examples=200, deadline=None)
@given(exprs())
def test_wellformed_roundtrip(target):
    e1 = parse(target)
    e2 = parse(e1.to_string())
    assert e1.to_string() == e2.to_string()
