"""Recursive-descent parser for the Graphite target expression language.

Grammar parity with the reference parser (reference:
``pkg/parser/parser.go:608-979``), re-implemented from scratch in Python:

- expressions: metric name patterns (dot-hierarchy with ``* ? [] {}`` globs,
  ``;tag=value`` suffixes), function calls with positional + named args,
  float constants, single/double-quoted strings, booleans,
- pipe syntax ``a.b.c|func(1)|other()`` == ``other(func(a.b.c,1))``
  (``parser.go:676-697``),
- ``seriesByTag('k=v', ...)`` is treated as an opaque *name* (the whole call
  string is the fetch pattern, ``parser.go:640-644``),
- a const immediately followed by a letter re-parses as a name, so bare
  interval args like ``-1d`` survive (``parser.go:615-621``).

The AST is deliberately tiny: evaluation happens over Spark DataFrames, this
is only the logical form.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field


class ParseError(ValueError):
    pass


class ExprType(enum.Enum):
    NAME = "name"
    FUNC = "func"
    CONST = "const"
    STRING = "string"
    BOOL = "bool"


# Characters always allowed inside a metric name (reference parser.go:703-720),
# plus ';' and '=' which the reference admits via its tag/unicode paths.
_NAME_CHARS = set(
    "abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    "0123456789"
    "._-*?:[]^$<>&#/%@+"
)
_NAME_DISALLOWED = set("()\"' /|")  # parser.go:843-851 (plus whitespace)


@dataclass
class Expr:
    etype: ExprType
    target: str = ""  # name text or function name
    val: float = 0.0  # CONST / BOOL value
    val_str: str = ""  # literal text of CONST / STRING (exact, for name synthesis)
    args: list["Expr"] = field(default_factory=list)
    named_args: dict[str, "Expr"] = field(default_factory=dict)
    arg_string: str = ""  # raw text between parens (for name synthesis)

    # ---- predicates -------------------------------------------------
    def is_name(self) -> bool:
        return self.etype is ExprType.NAME

    def is_func(self) -> bool:
        return self.etype is ExprType.FUNC

    def is_const(self) -> bool:
        return self.etype is ExprType.CONST

    def is_string(self) -> bool:
        return self.etype is ExprType.STRING

    def is_bool(self) -> bool:
        return self.etype is ExprType.BOOL

    # ---- rendering (exact strings matter for output series names) ---
    def to_string(self) -> str:
        if self.etype is ExprType.FUNC:
            return f"{self.target}({self.arg_string})"
        if self.etype is ExprType.CONST:
            return self.val_str
        if self.etype is ExprType.STRING:
            s = self.val_str.replace("\\", "\\\\").replace("'", "\\'")
            return f"'{s}'"
        if self.etype is ExprType.BOOL:
            return "true" if self.val else "false"
        return self.target

    # ---- typed argument getters (reference parser.go:180-520) -------
    def _arg(self, n: int):
        if n >= len(self.args):
            raise ParseError(f"{self.target}: missing argument {n}")
        return self.args[n]

    def _named_or_pos(self, n: int, names: tuple[str, ...]):
        for nm in names:
            if nm in self.named_args:
                return self.named_args[nm]
        if n < len(self.args):
            return self.args[n]
        return None

    def get_float(self, n: int, default: float | None = None, *, names: tuple[str, ...] = ()) -> float:
        a = self._named_or_pos(n, names)
        if a is None:
            if default is None:
                raise ParseError(f"{self.target}: missing float arg {n}")
            return default
        if a.is_const():
            return a.val
        if a.is_name() or a.is_string():
            s = a.target or a.val_str
            low = s.strip().lower()
            if low in ("inf", "+inf"):
                return float("inf")
            if low == "-inf":
                return float("-inf")
            try:
                return float(s)
            except ValueError as exc:
                raise ParseError(f"{self.target}: bad float arg {s!r}") from exc
        raise ParseError(f"{self.target}: arg {n} is not a number")

    def get_int(self, n: int, default: int | None = None, *, names: tuple[str, ...] = ()) -> int:
        a = self._named_or_pos(n, names)
        if a is None:
            if default is None:
                raise ParseError(f"{self.target}: missing int arg {n}")
            return default
        v = self.get_float(n, names=names)
        if v != int(v):
            raise ParseError(f"{self.target}: arg {n} is not an integer")
        return int(v)

    def get_string(self, n: int, default: str | None = None, *, names: tuple[str, ...] = ()) -> str:
        a = self._named_or_pos(n, names)
        if a is None:
            if default is None:
                raise ParseError(f"{self.target}: missing string arg {n}")
            return default
        if a.is_string():
            return a.val_str
        if a.is_name():
            return a.target
        if a.is_const():
            return a.val_str
        if a.is_bool():
            return "true" if a.val else "false"
        raise ParseError(f"{self.target}: arg {n} is not a string")

    def get_bool(self, n: int, default: bool | None = None, *, names: tuple[str, ...] = ()) -> bool:
        a = self._named_or_pos(n, names)
        if a is None:
            if default is None:
                raise ParseError(f"{self.target}: missing bool arg {n}")
            return default
        if a.is_bool():
            return bool(a.val)
        if a.is_name() or a.is_string():
            s = (a.target or a.val_str).lower()
            if s == "true":
                return True
            if s == "false":
                return False
        if a.is_const():
            return a.val != 0
        raise ParseError(f"{self.target}: arg {n} is not a bool")

    def get_interval(self, n: int, default_sign: int = 1, default: int | None = None,
                     *, names: tuple[str, ...] = ()) -> int:
        """Interval arg in seconds; accepts '1h', bare numbers, names like -1d."""
        from carbonapi_spark.parser.interval import interval_seconds

        a = self._named_or_pos(n, names)
        if a is None:
            if default is None:
                raise ParseError(f"{self.target}: missing interval arg {n}")
            return default
        if a.is_const():
            return int(a.val) * (default_sign if a.val >= 0 else 1)
        s = a.val_str if a.is_string() else a.target
        return interval_seconds(s, default_sign)

    def get_node_or_tag_args(self, start: int = 1) -> list[int | str]:
        """Mixed int node-index / string tag-name varargs (parser
        interface.go:60-63). Only consts and quoted strings are legal
        (GetNodeOrTagArgs, parser.go:735-763) — a bare name is an error."""
        out: list[int | str] = []
        for a in self.args[start:]:
            if a.is_const():
                out.append(int(a.val))
            elif a.is_string():
                try:
                    out.append(int(a.val_str))
                except ValueError:
                    out.append(a.val_str)
            else:
                raise ParseError(
                    f"{self.target}: node-or-tag arg must be int or string")
        return out

    # literal text of positional arg n as it appeared in the query
    def raw_arg(self, n: int) -> str:
        return self._arg(n).to_string()

    def __repr__(self) -> str:  # pragma: no cover
        return f"Expr<{self.etype.value}:{self.to_string()}>"


# ----------------------------------------------------------------------
# parsing
# ----------------------------------------------------------------------

# user-defined macro templates (reference pkg/parser/define.go:15-88; the
# reference uses Go text/template — we take Python str.format templates with
# the same data: {argString}, {args[i]}, {kwargs[name]})
_DEFINES: dict[str, str] = {}


def define(name: str, template: str) -> None:
    _DEFINES[name] = template


def undefine_all() -> None:
    _DEFINES.clear()


def parse(s: str) -> Expr:
    """Parse a complete target string; trailing garbage is an error."""
    exp, rest = _parse_expr(s)
    if rest.strip():
        raise ParseError(f"unparsed trailing input: {rest!r}")
    return _expand_defines(exp)


def _expand_defines(exp: Expr, depth: int = 0) -> Expr:
    if depth > 10:
        raise ParseError("define expansion too deep (recursive define?)")
    if exp.etype in (ExprType.NAME, ExprType.FUNC) and exp.target in _DEFINES:
        data = {
            "argString": exp.arg_string,
            "args": [a.to_string() for a in exp.args],
            "kwargs": {k: v.to_string() for k, v in exp.named_args.items()},
        }
        try:
            rendered = _DEFINES[exp.target].format_map(data)
        except (KeyError, IndexError) as exc:
            raise ParseError(f"define {exp.target}: bad template ref: {exc}") from exc
        exp, rest = _parse_expr(rendered)
        if rest.strip():
            raise ParseError(f"define {exp.target}: trailing input {rest!r}")
        return _expand_defines(exp, depth + 1)
    exp.args = [_expand_defines(a, depth) for a in exp.args]
    exp.named_args = {k: _expand_defines(v, depth)
                      for k, v in exp.named_args.items()}
    return exp


def _skip_ws(s: str) -> str:
    return s.lstrip()


def _parse_expr(s: str) -> tuple[Expr, str]:
    exp, s = _parse_expr_no_pipe(s)
    return _pipe(exp, s)


def _pipe(exp: Expr, s: str) -> tuple[Expr, str]:
    # a.b|func(x) == func(a.b, x)   (parser.go:676-697)
    s = _skip_ws(s)
    while s.startswith("|"):
        wrapped, s = _parse_expr_no_pipe(s[1:])
        if not wrapped.is_func():
            # name piped with no parens: `a|avg` == avg(a)
            if wrapped.is_name():
                wrapped = Expr(ExprType.FUNC, target=wrapped.target)
            else:
                raise ParseError("can only pipe into a function")
        wrapped.args.insert(0, exp)
        inner = exp.to_string()
        wrapped.arg_string = inner if not wrapped.arg_string else f"{inner},{wrapped.arg_string}"
        exp = wrapped
        s = _skip_ws(s)
    return exp, s


def _parse_expr_no_pipe(s: str) -> tuple[Expr, str]:
    s = _skip_ws(s)
    if not s:
        raise ParseError("missing expression")

    c = s[0]
    if c.isdigit() or c in "+-":
        try:
            val, val_str, rest = _parse_const(s)
        except ParseError:
            pass
        else:
            # const followed by a letter (e.g. -1d) re-parses as a name
            if not (rest and rest[0].isalpha()):
                return Expr(ExprType.CONST, val=val, val_str=val_str), rest

    if c in "'\"":
        val, rest = _parse_string(s)
        return Expr(ExprType.STRING, val_str=val), rest

    name, rest = _parse_name(s)
    if not name:
        raise ParseError(f"missing argument at {s[:30]!r}")

    low = name.lower()
    if low in ("true", "false"):
        return Expr(ExprType.BOOL, target=low, val=1.0 if low == "true" else 0.0,
                    val_str=low), rest

    if rest.startswith("("):
        if name == "seriesByTag":
            # opaque fetch pattern: keep the whole call as a NAME (parser.go:640-644)
            arg_string, _, _, rest = _parse_arg_list(rest)
            return Expr(ExprType.NAME, target=f"{name}({arg_string})"), rest
        arg_string, args, named, rest = _parse_arg_list(rest)
        return Expr(ExprType.FUNC, target=name, args=args, named_args=named,
                    arg_string=arg_string), rest

    return Expr(ExprType.NAME, target=name), rest


def _parse_const(s: str) -> tuple[float, str, str]:
    i = 0
    while i < len(s) and (s[i].isdigit() or s[i] in ".+-eE"):
        i += 1
    try:
        v = float(s[:i])
    except ValueError as exc:
        raise ParseError(f"bad number at {s[:20]!r}") from exc
    return v, s[:i], s[i:]


def _parse_string(s: str) -> tuple[str, str]:
    quote = s[0]
    end = s.find(quote, 1)
    if end < 0:
        raise ParseError("missing closing quote")
    return s[1:end], s[end + 1:]


def _parse_name(s: str) -> tuple[str, str]:
    """Consume a metric-name pattern.

    Braces nest and protect commas; '=' is a name char only when it cannot
    start a named-arg / tag-value boundary (trailing '=', '==', '=,', '=)')
    — mirrors reference parser.go:853-939. Backslash escapes the next char.
    """
    out: list[str] = []
    braces = 0
    i = 0
    n = len(s)
    while i < n:
        ch = s[i]
        if ch == "\\" and i + 1 < n:
            out.append(s[i + 1])
            i += 2
            continue
        if ch in _NAME_CHARS:
            if ch == "[":
                pass  # char-class brackets are plain name chars here
            out.append(ch)
            i += 1
            continue
        if ch == "{":
            braces += 1
            out.append(ch)
            i += 1
            continue
        if ch == "}":
            if braces == 0:
                break
            braces -= 1
            out.append(ch)
            i += 1
            continue
        if ch == ",":
            if braces == 0:
                break
            out.append(ch)
            i += 1
            continue
        if ch == "=":
            # allow name to *end* with '='; otherwise it's a k=v separator
            if i + 1 >= n or s[i + 1] in "=,)":
                out.append(ch)
                i += 1
                continue
            break
        if ch == ";":
            out.append(ch)
            i += 1
            continue
        if ch in _NAME_DISALLOWED or ch.isspace():
            break
        # permissive unicode (reference gates this on configured RangeTables)
        out.append(ch)
        i += 1
    return "".join(out), s[i:]


def _parse_arg_list(s: str) -> tuple[str, list[Expr], dict[str, Expr], str]:
    assert s[0] == "("
    s = s[1:]
    t = _skip_ws(s)
    if t.startswith(")"):
        return "", [], {}, t[1:]

    args: list[Expr] = []
    named: dict[str, Expr] = {}
    raw_parts: list[str] = []

    while True:
        before = s
        arg, s = _parse_expr(s)
        if not s:
            raise ParseError("missing comma or closing paren")

        if arg.is_name() and s.startswith("="):
            val, s = _parse_expr(s[1:])
            if not (val.is_const() or val.is_name() or val.is_string() or val.is_bool()):
                raise ParseError(f"bad named-arg value for {arg.target}")
            named[arg.target] = val
            raw_parts.append(before[: len(before) - len(s)])
        else:
            args.append(arg)
            if arg.is_func():
                raw_parts.append(arg.to_string())
            else:
                raw_parts.append(before[: len(before) - len(s)])

        s = _skip_ws(s)
        if not s:
            raise ParseError("missing closing paren")
        if s[0] == ")":
            # verbatim raw spans (leading whitespace kept, parser.go:790-806):
            # synthesized names must reproduce the reference byte-for-byte,
            # e.g. diffSeries(time("t"), some.metric) keeps the space
            return ",".join(raw_parts), args, named, s[1:]
        if s[0] != ",":
            raise ParseError(f"unexpected character {s[0]!r} in arg list")
        s = s[1:]
