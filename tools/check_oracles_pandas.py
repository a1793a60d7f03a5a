"""PANDAS-PATH replica of the driver's correctness gate.

`tools/check_oracles.py` compares `collect()` vs `fetchall()` rows with
Python `==`, where DuckDB HUGEINT comes back as exact Python ints and
`6.0 == 6` is True — the two blind spots that let the r07–r10 driver
hash failures stay local-green for three rounds.  This tool replays the
comparison the way the driver plausibly hashes it:

  * Spark side through ``DataFrame.toPandas()`` (Arrow batch path),
  * DuckDB side through ``.df()`` (HUGEINT -> float64, DECIMAL ->
    object/Decimal — the conversions fetchall() hides),
  * every cell canonicalized to a STRING (repr), so ``6`` (int64) vs
    ``6.0`` (float64) is a mismatch exactly like a value-hash mismatch,
  * columns sorted by name, rows sorted, like the driver's documented
    compare.

A catalog entry green HERE is green under both the fetchall and the
pandas/Arrow rendering of its oracle.

Usage: python tools/check_oracles_pandas.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
from decimal import Decimal

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd
from pyspark.sql import SparkSession

from carbonapi_spark.entry_queries import ORACLES, QUERIES
from carbonapi_spark.sources.testdata import TABLES

# r11's hugeint_probe diagnostic lived here until r12; no expected
# failures remain — every catalog entry must replay exactly.
EXPECTED_FAIL: set = set()


def canon(v):
    """Canonical repr string for one cell — type-sensitive on purpose:
    int 6 -> '6', float 6.0 -> '6.0', Decimal('6') -> 'Decimal(6)'."""
    if v is None or v is pd.NaT:
        return "None"
    if isinstance(v, np.generic):
        v = v.item()
    if isinstance(v, float):
        return "None" if math.isnan(v) else repr(v)
    if isinstance(v, Decimal):
        return f"Decimal({v})"
    if isinstance(v, np.ndarray):
        v = v.tolist()
    if isinstance(v, (list, tuple)):
        return "[" + ", ".join(canon(x) for x in v) + "]"
    if isinstance(v, pd.Timestamp):
        v = v.to_pydatetime()
    return repr(v)


def frame_rows(df: pd.DataFrame) -> list:
    cols = sorted(df.columns)
    rows = [tuple(canon(v) for v in t)
            for t in df[cols].itertuples(index=False, name=None)]
    rows.sort()
    return rows


def main():
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) \
        else "/root/testdata/sf0.001"
    only = set(a for a in args if not os.path.isdir(a))

    spark = (SparkSession.builder
             .master(os.environ.get("CHECK_MASTER", "local[8]"))
             .config("spark.sql.shuffle.partitions",
                     os.environ.get("CHECK_SHUFFLE", "8"))
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures, unexpected = 0, 0
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        if name not in ORACLES:
            continue
        try:
            spdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            unexpected += name not in EXPECTED_FAIL
            continue
        finally:
            from carbonapi_spark import scratch
            scratch.release()
        try:
            odf = con.execute(ORACLES[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            failures += 1
            unexpected += name not in EXPECTED_FAIL
            continue
        if sorted(spdf.columns) != sorted(odf.columns):
            print(f"FAIL {name}: columns {sorted(spdf.columns)} "
                  f"vs {sorted(odf.columns)}")
            failures += 1
            unexpected += name not in EXPECTED_FAIL
            continue
        srows, orows = frame_rows(spdf), frame_rows(odf)
        if srows != orows:
            bad = [(a, b) for a, b in zip(srows, orows) if a != b]
            first = bad[0] if bad else (len(srows), len(orows))
            tag = " [EXPECTED — the HUGEINT mechanism probe]" \
                if name in EXPECTED_FAIL else ""
            print(f"FAIL {name}: {len(bad)} mismatched rows; "
                  f"first: {first}{tag}")
            failures += 1
            unexpected += name not in EXPECTED_FAIL
            continue
        print(f"ok   {name}: {len(srows)} rows match (pandas path)")

    print(f"\n{'ALL OK' if unexpected == 0 else f'{unexpected} UNEXPECTED'}"
          f" ({failures} total failures incl. expected probes)")
    sys.exit(1 if unexpected else 0)


if __name__ == "__main__":
    main()
