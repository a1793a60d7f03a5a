"""Grammar parity tests (modeled on reference pkg/parser/parser_test.go cases)."""

import math

import pytest

from carbonapi_spark.parser import Expr, ExprType, ParseError, parse
from carbonapi_spark.parser.dates import parse_at_time
from carbonapi_spark.parser.globs import glob_matches, glob_to_regex
from carbonapi_spark.parser.interval import interval_seconds


def test_plain_name():
    e = parse("servers.host01.cpu.load")
    assert e.is_name() and e.target == "servers.host01.cpu.load"


def test_glob_name():
    e = parse("servers.*.cpu.{user,system}[0-9]?")
    assert e.is_name()
    assert e.target == "servers.*.cpu.{user,system}[0-9]?"


def test_simple_func():
    e = parse("sumSeries(servers.*.cpu)")
    assert e.is_func() and e.target == "sumSeries"
    assert len(e.args) == 1 and e.args[0].target == "servers.*.cpu"
    assert e.arg_string == "servers.*.cpu"


def test_nested_func_and_consts():
    e = parse("scale(sumSeries(a.b, a.c), 2.5)")
    assert e.target == "scale"
    assert e.args[0].target == "sumSeries"
    assert e.args[1].val == 2.5
    # raw arg spans are preserved verbatim (parser_test.go:102-105 keeps
    # "metricA, metricB"), so the space after each comma survives
    assert e.to_string() == "scale(sumSeries(a.b, a.c), 2.5)"


def test_named_args():
    e = parse("summarize(a.b, '1h', func='max', alignToFrom=true)")
    assert e.args[1].val_str == "1h"
    assert e.named_args["func"].val_str == "max"
    assert e.named_args["alignToFrom"].is_bool() and e.named_args["alignToFrom"].val == 1.0
    assert e.get_string(2, "sum", names=("func",)) == "max"
    assert e.get_bool(3, False, names=("alignToFrom",)) is True


def test_strings_both_quotes():
    e = parse('alias(a.b, "cpu load")')
    assert e.args[1].is_string() and e.args[1].val_str == "cpu load"


def test_negative_and_float_consts():
    e = parse("offset(a, -1.5)")
    assert e.args[1].val == -1.5
    e = parse("pow(a, 1e3)")
    assert e.args[1].val == 1000.0


def test_const_followed_by_letter_is_name():
    e = parse("timeShift(a.b, -1d)")
    assert e.args[1].is_name() and e.args[1].target == "-1d"
    assert e.get_interval(1, -1) == -86400


def test_pipe_syntax():
    e = parse("a.b.c|scale(2)|alias('x')")
    assert e.target == "alias"
    inner = e.args[0]
    assert inner.target == "scale"
    assert inner.args[0].target == "a.b.c"
    assert inner.args[1].val == 2.0
    assert e.args[1].val_str == "x"


def test_series_by_tag_is_opaque_name():
    e = parse("seriesByTag('name=cpu.load', 'dc=~us.*')")
    assert e.is_name()
    assert e.target == "seriesByTag('name=cpu.load', 'dc=~us.*')"


def test_braces_protect_commas():
    e = parse("sum(a.{b,c}.d, e.f)")
    assert [a.target for a in e.args] == ["a.{b,c}.d", "e.f"]


def test_bool_args():
    e = parse("f(a, true, False)")
    assert e.args[1].is_bool() and e.args[1].val == 1.0
    assert e.args[2].is_bool() and e.args[2].val == 0.0


def test_tagged_name_in_string():
    # bare `k=v` inside an arg list is a named arg (reference parser.go:764-771);
    # tagged fetches go through seriesByTag — tagged names appear quoted
    e = parse("f(cpu.load;dc=west)")
    assert "cpu.load;dc" in e.named_args
    e = parse("alias(a, 'cpu.load;dc=west;host=h1')")
    assert e.args[1].val_str == "cpu.load;dc=west;host=h1"


def test_name_may_end_with_equals():
    e = parse("f(a.b=,c)")
    assert e.args[0].target == "a.b="
    assert e.args[1].target == "c"


def test_trailing_garbage_rejected():
    with pytest.raises(ParseError):
        parse("a.b)")
    with pytest.raises(ParseError):
        parse("f(a")


def test_empty_args():
    e = parse("f()")
    assert e.is_func() and e.args == []


def test_node_or_tag_args():
    e = parse("aliasByNode(a.b.c, 1, -1, 'dc')")
    assert e.get_node_or_tag_args(1) == [1, -1, "dc"]


def test_inf_arg():
    e = parse("keepLastValue(a, inf)")
    assert math.isinf(e.get_float(1))


# ---------------------------------------------------------------- intervals
@pytest.mark.parametrize("s,sign,want", [
    ("1h", 1, 3600),
    ("1h30m", 1, 5400),
    ("-2d", 1, -172800),
    ("1mon", 1, 2592000),
    ("1y", 1, 31536000),
    ("3", -1, pytest.raises(Exception)),
])
def test_interval(s, sign, want):
    if not isinstance(want, int):
        with want:
            interval_seconds(s, sign)
    else:
        assert interval_seconds(s, sign) == want


def test_interval_default_sign():
    assert interval_seconds("1h", -1) == -3600
    assert interval_seconds("+1h", -1) == 3600


# ---------------------------------------------------------------- dates
def test_at_time():
    import datetime as dt
    now = dt.datetime(2024, 6, 15, 10, 30, tzinfo=dt.timezone.utc)
    assert parse_at_time("now", now=now) == int(now.timestamp())
    assert parse_at_time("-1d", now=now) == int(now.timestamp()) - 86400
    assert parse_at_time("midnight", now=now) == int(now.replace(hour=0, minute=0).timestamp())
    assert parse_at_time("today-2d", now=now) == int(now.replace(hour=0, minute=0).timestamp()) - 2 * 86400
    assert parse_at_time("20240102", now=now) == 1704153600
    assert parse_at_time("00:00_20240102", now=now) == 1704153600
    assert parse_at_time("1704067200", now=now) == 1704067200


# ---------------------------------------------------------------- globs
@pytest.mark.parametrize("pat,name,want", [
    ("a.*.c", "a.b.c", True),
    ("a.*.c", "a.b.d.c", False),  # * does not cross dots
    ("a.b?.c", "a.b1.c", True),
    ("a.b?.c", "a.b12.c", False),
    ("a.{b,c}.d", "a.c.d", True),
    ("a.{b,c}.d", "a.x.d", False),
    ("a.[0-9].c", "a.5.c", True),
    ("plain.name", "plain.name", True),
    ("plain.name", "plain.namex", False),
])
def test_glob(pat, name, want):
    assert glob_matches(pat, name) is want


def test_glob_regex_escapes_dots():
    assert glob_to_regex("a.b") == "^a\\.b$"


def test_expand_braces():
    from carbonapi_spark.parser.globs import expand_braces
    assert expand_braces("a.{b,c}.d") == ["a.b.d", "a.c.d"]
    assert expand_braces("{x.y,z.w}") == ["x.y", "z.w"]
    assert expand_braces("plain.name") is None          # no braces
    assert expand_braces("a.{b,c}.*") is None           # other wildcard
    assert expand_braces("a.{b,c") is None              # unbalanced
    assert expand_braces("{a,b}.{c,d}") == ["a.c", "a.d", "b.c", "b.d"]
    assert expand_braces("{a,b}", limit=1) is None      # over limit


def test_glob_invalid_char_class_is_literal():
    """A malformed character class ('[z-a]' reversed range) must not
    emit an un-compilable regex — that detonates inside the Spark job
    and turns /metrics/find into a 500.  Like the unterminated-'['
    and empty-class branches, it degrades to literal brackets."""
    import re

    from carbonapi_spark.parser.globs import glob_matches, glob_to_regex
    for pat in ("[z-a]", "a.[9-0].b", "web.[z-a]*.cpu"):
        rx = glob_to_regex(pat)
        re.compile(rx)   # must compile (the Java \z form is JVM-only)
        assert not glob_matches(pat, "anything")
    assert glob_matches("[z-a]", "[z-a]")   # literal-bracket fallback
    # valid classes still work as classes
    assert glob_matches("web.[ab].cpu", "web.a.cpu")
    assert not glob_matches("web.[ab].cpu", "web.c.cpu")


def test_glob_java_only_class_syntax_sanitized():
    """Java's class grammar is a superset of Python's: '&&' (set
    intersection) and a bare '[' (nested class) compile under re but
    throw PatternSyntaxException inside Spark rlike (ADVICE r11).
    The translator must escape both so the emitted regex is legal —
    and means the same literal members — in BOTH engines."""
    import re

    from carbonapi_spark.parser.globs import glob_matches, glob_to_regex
    for pat in ("web.[a-b&&[c].cpu", "[a&&b]", "[[]", "[[:alpha:]]",
                "[a-b&&[c]", "[&]", "x.[a[b].y"):
        rx = glob_to_regex(pat)
        re.compile(rx)
        assert "&&" not in rx and "[[" not in rx.replace("\\[", ""), rx
    # the escapes are literal members, same as glob semantics
    assert glob_matches("[a&&b]", "a")
    assert glob_matches("[a&&b]", "&")
    assert glob_matches("[a&&b]", "b")
    assert not glob_matches("[a&&b]", "c")
    assert glob_matches("x.[a[b].y", "x.[.y")
    assert glob_matches("x.[a[b].y", "x.a.y")


def test_glob_java_only_class_runs_under_spark_rlike(spark):
    """End-to-end pin: the sanitized class regexes execute under the
    ACTUAL Java engine (Spark rlike) without PatternSyntaxException —
    the seam the Python-side re.compile gate cannot see."""
    from pyspark.sql import functions as F

    from carbonapi_spark.parser.globs import glob_to_java_regex
    df = spark.createDataFrame(
        [("web.a.cpu",), ("web.&.cpu",), ("web.[.cpu",)], "name STRING")
    for pat, want in (("web.[a-b&&[c].cpu", {"web.a.cpu", "web.&.cpu",
                                             "web.[.cpu"}),
                      ("web.[a&&b].cpu", {"web.a.cpu", "web.&.cpu"}),
                      ("web.[z-a].cpu", set()),
                      ("web.[[].cpu", {"web.[.cpu"})):
        got = {r["name"] for r in
               df.where(F.col("name").rlike(glob_to_java_regex(pat)))
               .collect()}
        assert got == want, (pat, got)
