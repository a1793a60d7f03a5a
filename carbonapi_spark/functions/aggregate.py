"""Cross-series aggregation (SURVEY §2.6).

The engine core is one shape: align N series to a common step/range, then
``groupBy(group_key, ts).agg(consolidation)`` — Spark's hash aggregate with
map-side partial aggregation replaces the reference's per-point Go fold
(``expr/helper/helper.go:151-189`` AggregateSeries). At 100 TB the shuffle
key is (key, ts-bucket): high cardinality, no skew hot-spot, and Catalyst
fuses the pre-agg projection into the scan stage.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from carbonapi_spark.functions import register
from carbonapi_spark.functions.helper import agg_key_expr, series_arg, series_args
from carbonapi_spark.model.consolidation import agg_column, percentile_column
from carbonapi_spark.model.series import NAME, ORD, TS, VALUE, SeriesFrame


# ...Series aliases -> consolidation callback (aggregate/function.go:23-37)
SERIES_ALIASES = {
    "sum": "sum", "sumSeries": "sum", "total": "sum", "totalSeries": "sum",
    "avg": "avg", "avgSeries": "avg", "average": "average",
    "averageSeries": "average", "avg_zero": "avg_zero",
    "avg_zeroSeries": "avg_zero", "max": "max", "maxSeries": "max",
    "min": "min", "minSeries": "min", "multiply": "multiply",
    "multiplySeries": "multiply", "median": "median",
    "medianSeries": "median", "diff": "diff", "diffSeries": "diff",
    "stddev": "stddev", "stddevSeries": "stddev", "count": "count",
    "countSeries": "count", "range": "range", "rangeSeries": "range",
    "rangeOf": "rangeOf", "rangeOfSeries": "rangeOf", "last": "last",
    "lastSeries": "last", "current": "current", "currentSeries": "current",
    "first": "first", "firstSeries": "first",
}


# folds where a missing row is indistinguishable from a NULL row: for these
# the aggregation can consume the pre-densify (sparse) scan directly and the
# densify shuffle of the full point set is skipped — the aggregated output
# (1 row per bucket) is densified instead, which is orders of magnitude
# smaller. Count/order-sensitive folds (avg_zero, multiply, first, last,
# diff, xff-gated anything) still need the dense input.
_NULL_SKIPPING = frozenset({
    "sum", "total", "avg", "average", "max", "maximum", "min", "minimum",
    "count", "range", "rangeOf", "stddev", "median",
})


def _agg_source(frame: SeriesFrame, func: str, xff: float):
    if (frame.raw_df is not None and xff <= 0
            and (func in _NULL_SKIPPING or func.startswith("p"))):
        return frame.raw_df
    return frame.df


def _aggregate_frames(frame: SeriesFrame, func: str, out_name: str,
                      xff: float = 0.0) -> SeriesFrame:
    """Fold all series in *frame* pointwise into one named series."""
    V = F.col(VALUE)
    agg = agg_column(func, V, F.col(ORD), xff).cast("double").alias(VALUE)
    src = _agg_source(frame, func, xff)
    used_raw = src is frame.raw_df
    df = (src.groupBy(TS).agg(agg)
          .select(F.lit(out_name).alias(NAME), F.lit(out_name).alias(ORD),
                  F.col(TS), F.col(VALUE)))
    out = frame.with_df(df, dense=not used_raw)
    # sparse-source output may miss all-NULL buckets; densify the (tiny)
    # aggregated result
    return out.densify() if used_raw else out


@register("aggregate", *SERIES_ALIASES.keys())
def aggregate(ctx, exp, f, u):
    """aggregate(seriesList, func, xff) + every <func>Series alias
    — aggregate/function.go:40-98; fold table consolidations.go:19-39.

    Name parity: result is `<callback>Series(<rawArgs>)` with rawArgs the
    first arg's text for aggregate() and the full arg text for aliases
    (helper.go:162 CopyNameArg + function.go:80-85)."""
    callback = None
    if len(exp.args) > 1 and exp.args[1].is_string():
        callback = exp.args[1].val_str
    if exp.target == "aggregate" and callback is None:
        raise ValueError("aggregate: missing func argument")
    if callback is not None:
        frame = series_arg(ctx, exp, exp.args[0], f, u)
        xff = exp.get_float(2, frame.xff, names=("xFilesFactor",))
        raw = exp.args[0].to_string()
    else:
        callback = SERIES_ALIASES[exp.target]
        frame = series_args(ctx, exp, f, u)
        xff = -1.0
        raw = exp.arg_string
    out_name = f"{callback}Series({raw})"
    return _aggregate_frames(frame, callback, out_name,
                             xff if xff and xff > 0 else 0.0)


@register("percentileOfSeries")
def percentile_of_series(ctx, exp, f, u):
    """per-ts n-th percentile across series — percentileOfSeries/function.go:37."""
    V = F.col(VALUE)
    frame = series_arg(ctx, exp, exp.args[0], f, u)
    n = exp.get_float(1)
    interpolate = exp.get_bool(2, False, names=("interpolate",))
    out_name = f"percentileOfSeries({exp.arg_string})"
    agg = percentile_column(V, n, interpolate).cast("double").alias(VALUE)
    df = (frame.df.groupBy(TS).agg(agg)
          .select(F.lit(out_name).alias(NAME), F.lit(out_name).alias(ORD),
                  F.col(TS), F.col(VALUE)))
    return frame.with_df(df, dense=True)


def _grouped_aggregate(frame: SeriesFrame, key_col, callback: str,
                       name_fmt) -> SeriesFrame:
    """groupBy(key, ts) fold; output one series per key, named by *name_fmt*
    (a Column fn of the key). NULL-skipping callbacks aggregate the sparse
    scan directly (one shuffle); the per-key output is densified after."""
    V = F.col(VALUE)
    src = _agg_source(frame, callback, 0.0)
    used_raw = src is frame.raw_df
    df = (src
          .withColumn("__key", key_col)
          .groupBy("__key", TS)
          .agg(agg_column(callback, V, F.col(ORD), 0.0).cast("double").alias(VALUE))
          .select(name_fmt(F.col("__key")).alias(NAME),
                  name_fmt(F.col("__key")).alias(ORD), F.col(TS), F.col(VALUE)))
    out = frame.with_df(df, dense=not used_raw)
    return out.densify() if used_raw else out


@register("groupByNode", "groupByNodes")
def group_by_node(ctx, exp, f, u):
    """group by dot-node(s)/tag(s), fold with callback — groupByNode/function.go:33.

    groupByNode(sl, node, callback='average'); groupByNodes(sl, callback, *nodes).
    Output series are named by the group key itself."""
    frame = series_arg(ctx, exp, exp.args[0], f, u)
    if exp.target == "groupByNode":
        keys = [exp.get_int(1)]
        callback = exp.get_string(2, "average", names=("callback",))
    else:
        callback = exp.get_string(1)
        keys = exp.get_node_or_tag_args(2)
        if not keys:
            raise ValueError("groupByNodes: at least one node required")
    key = agg_key_expr(F.col(NAME), keys)
    return _grouped_aggregate(frame, key, callback, lambda k: k)


@register("aggregateWithWildcards", "averageSeriesWithWildcards",
          "sumSeriesWithWildcards", "multiplySeriesWithWildcards")
def aggregate_with_wildcards(ctx, exp, f, u):
    """group key = name with given node positions removed
    — aggregateWithWildcards/function.go:30."""
    frame = series_arg(ctx, exp, exp.args[0], f, u)
    if exp.target == "aggregateWithWildcards":
        callback = exp.get_string(1)
        positions = [exp.get_int(i) for i in range(2, len(exp.args))]
    else:
        callback = {"averageSeriesWithWildcards": "average",
                    "sumSeriesWithWildcards": "sum",
                    "multiplySeriesWithWildcards": "multiply"}[exp.target]
        positions = [exp.get_int(i) for i in range(1, len(exp.args))]
    base = F.split_part(F.col(NAME), F.lit(";"), F.lit(1))
    parts = F.split(base, "\\.")
    kept = F.filter(parts, lambda x, i: ~i.isin([p for p in positions]))
    key = F.array_join(kept, ".")
    return _grouped_aggregate(frame, key, callback, lambda k: k)


@register("groupByTags")
def group_by_tags(ctx, exp, f, u):
    """group by tag values; name = name-tag;tag=v... — groupByTags/function.go:32.

    The key is built with plain string ops (split_part for the name tag,
    one anchored regexp_extract per requested tag) rather than
    materializing the full tag map per row: the key construction happens
    before the exchange, so it runs once per input point and stays inside
    whole-stage codegen. A missing tag extracts '' — the same as the
    map path's coalesce('') — and the value runs to the next ';', which
    is the reference's everything-after-first-'=' semantics."""
    import re as _re

    frame = series_arg(ctx, exp, exp.args[0], f, u)
    callback = exp.get_string(1)
    tag_names = [exp.get_string(i) for i in range(2, len(exp.args))]
    if not tag_names:
        raise ValueError("groupByTags: at least one tag required")
    parts = [F.split_part(F.col(NAME), F.lit(";"), F.lit(1))]
    for t in tag_names:
        if t != "name":
            val = F.regexp_extract(F.col(NAME), ";" + _re.escape(t) + "=([^;]*)", 1)
            parts.append(F.concat(F.lit(f";{t}="), val))
    key = F.concat(*parts)
    return _grouped_aggregate(frame, key, callback, lambda k: k)


@register("countValues")
def count_values(ctx, exp, f, u):
    """histogram-as-series: one series per distinct int(value)
    — countValues/function.go:38 (carbonapi extension)."""
    V = F.col(VALUE)
    frame = series_arg(ctx, exp, exp.args[0], f, u)
    limit = exp.get_int(1, 50, names=("valuesLimit",))
    bucket = F.floor(V).cast("long")
    df = (frame.df.where(V.isNotNull())
          .groupBy(bucket.alias("__v"), F.col(TS))
          .agg(F.count(F.lit(1)).cast("double").alias(VALUE)))
    n_distinct = df.select("__v").distinct().limit(limit + 1).count()
    if n_distinct > limit:
        raise ValueError("countValues: valuesLimit reached")
    name = F.concat(F.lit("value_"), F.col("__v").cast("string"))
    out = df.select(name.alias(NAME), name.alias(ORD), F.col(TS), F.col(VALUE))
    return frame.with_df(out, dense=False)


@register("group")
def group(ctx, exp, f, u):
    """concat seriesLists — group/function.go:29."""
    return series_args(ctx, exp, f, u)


@register("unique")
def unique(ctx, exp, f, u):
    """keep the first series (by list order) per distinct name
    — unique/function.go:29."""
    frame = series_args(ctx, exp, f, u)
    first_ord = frame.df.groupBy(NAME).agg(F.min(ORD).alias("__fo"))
    df = (frame.df.join(F.broadcast(first_ord), NAME)
          .where(F.col(ORD) == F.col("__fo")).drop("__fo"))
    return frame.with_df(df)
