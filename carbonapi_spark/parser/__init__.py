"""Graphite target-expression language: grammar, intervals, at-time dates, globs."""

from carbonapi_spark.parser.grammar import Expr, ExprType, ParseError, parse
from carbonapi_spark.parser.interval import interval_seconds
from carbonapi_spark.parser.dates import date_param_to_epoch
from carbonapi_spark.parser.globs import glob_to_regex, has_wildcard

__all__ = [
    "Expr",
    "ExprType",
    "ParseError",
    "parse",
    "interval_seconds",
    "date_param_to_epoch",
    "glob_to_regex",
    "has_wildcard",
]
