"""carbonapi_spark — a PySpark-native Graphite-compatible analytics engine.

A from-scratch re-expression of go-graphite/carbonapi's query surface
(expression language, ~190 render functions, metadata endpoints) on top of
Spark DataFrames + Parquet, designed for 100 TB-scale lakes:

- the expression language is parsed by a pure-Python recursive-descent
  parser (``carbonapi_spark.parser``),
- series fetches become Parquet scans with glob->RLIKE predicate pushdown
  and timestamp partition pruning (``carbonapi_spark.sources``),
- render functions are lazy DataFrame transformations fused by Catalyst
  (``carbonapi_spark.functions``); pandas UDFs only for genuinely
  recursive kernels (EMA, Holt-Winters, ...),
- a single render = a single Spark job DAG; collect happens only at
  serialization (``carbonapi_spark.render``).

Reference behavior (NOT code) derives from /root/reference
(go-graphite/carbonapi); citations in docstrings are reference file:line.
"""

__version__ = "0.1.0"
