"""Data model: the SeriesFrame (long/tidy DataFrame of metric points) and
Graphite consolidation-function -> Spark aggregate dispatch."""

from carbonapi_spark.model.series import SeriesFrame, NAME, TS, VALUE, ORD
from carbonapi_spark.model.consolidation import agg_column, VALID_CONSOLIDATIONS

__all__ = ["SeriesFrame", "NAME", "TS", "VALUE", "ORD", "agg_column", "VALID_CONSOLIDATIONS"]
