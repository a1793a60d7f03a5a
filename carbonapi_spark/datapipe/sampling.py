"""Deterministic sampling for training-data mixing.

Data-mixture recipes ("use 20% of CommonCrawl, all of Wikipedia, ...")
need sampling that is (a) exactly reproducible across runs and engines,
(b) stable under repartitioning, and (c) a pure map over the scan — no
shuffle, no RNG state. The standard trick is a hash gate: keep a row iff
``hash(id) mod D`` falls below the stratum's threshold. Spark's
``xxhash64`` (XXH64, seed 42) is the gate hash; the DuckDB oracle replays
the identical hash from first principles (``oracle_xxh64.py``), which is
what makes the sample value-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["stratified_sample"]


def stratified_sample(df: DataFrame, rates: dict[str, float],
                      group_col: str = "lang", id_col: str = "doc_id",
                      default_rate: float = 0.5,
                      denom: int = 1000) -> DataFrame:
    """Keep each row with its stratum's probability, deterministically.

    ``rates`` maps group value -> keep fraction in [0, 1]. The gate key
    is the STRING form of the id (so external oracles can hash the same
    bytes). Per-mille resolution by default.
    """
    thresholds = F.lit(int(round(default_rate * denom)))
    for value, rate in sorted(rates.items()):
        thresholds = F.when(F.col(group_col) == value,
                            F.lit(int(round(rate * denom)))
                            ).otherwise(thresholds)
    gate = F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(denom))
    return df.where(gate < thresholds)
