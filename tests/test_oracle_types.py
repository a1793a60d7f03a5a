"""Driver-hash type-safety pin for every oracle's OUTPUT schema.

Root cause of the r07-r10 driver hash failures (diagnosed round 11):
DuckDB types ``sum(BIGINT)`` as HUGEINT (int128).  ``fetchall()``
yields Python ints — so the local ``tools/check_oracles.py`` gate was
bit-exact — but the pandas/Arrow conversion the driver hashes through
renders HUGEINT as float64/decimal128 ("3.0" where Spark ships int64
"3").  The failure set was perfectly separated by this property: all 7
never-driver-green oracles shipped an uncast sum() column; none of the
43 r10-green ones did.

This test DESCRIBEs every catalog oracle against the sf0.001 views and
asserts the output schema uses only types whose Python/pandas/Arrow
renderings are unambiguous and Spark-representable.  A new oracle with
an uncast aggregate (HUGEINT), a DECIMAL literal residue, a FLOAT
narrow, or an exotic nested type fails HERE, at pytest time, instead of
as a driver hash mismatch one round later.

(The round-11 ``hugeint_probe`` diagnostic — an oracle deliberately
shipping HUGEINT to confirm the mechanism on the driver — was retired
in r12 after CORRECTNESS_r11 confirmed it red-by-design; no exceptions
remain.)
"""

import os

import duckdb
import pytest

from carbonapi_spark.entry_queries import ORACLES

SF_DIR = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")

# Types whose duckdb->pandas and Spark renderings agree exactly.
SAFE_TYPES = {"BIGINT", "INTEGER", "SMALLINT", "TINYINT", "DOUBLE",
              "VARCHAR", "BOOLEAN", "DATE", "TIMESTAMP"}

@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                  f"read_parquet('{SF_DIR}/{t}.parquet')")
    return c


def test_every_oracle_output_schema_is_driver_hash_safe(con):
    offenders = {}
    for name, sql in ORACLES.items():
        desc = con.execute("DESCRIBE " + sql).fetchall()
        bad = [f"{col}:{typ}" for col, typ, *_ in desc
               if typ not in SAFE_TYPES]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "oracle output columns with driver-hash-unsafe DuckDB types "
        "(CAST aggregates to BIGINT, decimals to DOUBLE): "
        f"{offenders}")
