"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship render on sf0.001 (smoke check),
- ``queries()``: one entry per implemented operator family (SURVEY.md §2 +
  the training-data pipeline ops), each (spark, sf_dir) -> DataFrame,
- ``oracle_sql()``: the DuckDB-equivalent SQL for each query (omitted only
  for genuinely non-SQL-expressible ops -> rows-only check).

The real engine lives in ``carbonapi_spark/``; the query/oracle catalog in
``carbonapi_spark/entry_queries.py``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from carbonapi_spark.entry_queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: groupByNode aggregation over the events series lake
    at sf0.001."""
    return QUERIES["group_by_node"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
