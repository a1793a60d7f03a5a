"""HDR-histogram quantile sketch (datapipe/sketch.py): bucket math vs a
Python bit_length reference, the relative-error guarantee, merge
invariance (shard-then-merge == one-pass), and cross-engine integer
semantics (no libm in the bucket path)."""

import math
import random

import pytest
from pyspark.sql import functions as F

from carbonapi_spark.datapipe.sketch import (hdr_buckets, hdr_merge,
                                             hdr_quantiles)

P = 7
SCALE_POW2 = 20


def _py_bucket_lo(value: float, p: int = P, scale_pow2: int = SCALE_POW2):
    v = int(math.floor(value * (1 << scale_pow2)))
    # bit_length via the same length(bin(v)) definition both engines
    # use: bin(0) = '0' has length 1, not 0
    msb = max(len(bin(v)) - 2, 1)
    sh = max(msb - p, 0)
    return (v >> sh) << sh


@pytest.fixture(scope="module")
def values():
    rng = random.Random(42)
    # spread across many orders of magnitude incl. sub-1 and near-0
    return ([rng.uniform(0.001, 1.0) for _ in range(300)]
            + [rng.uniform(1.0, 500.0) for _ in range(300)]
            + [rng.uniform(500.0, 1e6) for _ in range(200)]
            + [0.0, 1e-7, 123456.789])


def test_bucket_lo_matches_python_reference(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "value DOUBLE")
    got = {r["bucket_lo"]: r["cnt"]
           for r in hdr_buckets(df, "value").collect()}
    want: dict = {}
    for v in values:
        lb = _py_bucket_lo(v)
        want[lb] = want.get(lb, 0) + 1
    assert got == want


def test_relative_error_guarantee(spark, values):
    """bucket_lo <= v_fixed < bucket_lo + 2^shift, so the sketch
    quantile lower-bounds the true quantile with relative error
    < 2^(1-p) (for values >= 1 fixed-point unit)."""
    df = spark.createDataFrame([(v,) for v in values], "value DOUBLE")
    b = hdr_buckets(df, "value")
    out = {r["q"]: r["est"]
           for r in hdr_quantiles(b, qs=(0.5, 0.9, 0.99)).collect()}
    sv = sorted(values)
    n = len(sv)
    for q, est in out.items():
        true = sv[math.ceil(q * n) - 1]
        assert est <= true + 2 ** -SCALE_POW2
        if true > 2 ** -(SCALE_POW2 - P):
            assert est >= true * (1 - 2 ** (1 - P)) - 2 ** -SCALE_POW2, \
                (q, est, true)


def test_merge_invariance(spark, values):
    """Sketches built per-shard and merged == the one-pass sketch, and
    the quantiles read from either are identical (the mergeability
    contract that makes the sketch safe to build per-partition/per-day
    at lake scale)."""
    df = spark.createDataFrame(
        [(i % 5, v) for i, v in enumerate(values)],
        "shard INT, value DOUBLE")
    sharded = hdr_buckets(df, "value", by=("shard",))
    merged = {(r["bucket_lo"], r["cnt"])
              for r in hdr_merge(sharded).collect()}
    onepass = {(r["bucket_lo"], r["cnt"])
               for r in hdr_buckets(df, "value").collect()}
    assert merged == onepass


def test_nulls_and_negatives_dropped(spark):
    df = spark.createDataFrame(
        [(1.0,), (None,), (-5.0,), (2.0,)], "value DOUBLE")
    b = hdr_buckets(df, "value")
    assert b.agg(F.sum("cnt")).collect()[0][0] == 2


def test_overflow_range_guard(spark):
    """Values >= 2^(63-scale_pow2) would overflow the int64 fixed
    point (Spark's non-ANSI double->long cast clamps silently, DuckDB
    raises) — the guard drops them, mirrored in the SQL oracles."""
    bound = float(1 << (63 - SCALE_POW2))
    df = spark.createDataFrame(
        [(1.0,), (bound,), (bound * 2,), (1e300,), (bound - 1e6,)],
        "value DOUBLE")
    b = hdr_buckets(df, "value").collect()
    # only 1.0 and bound-1e6 survive; every kept bucket_lo is a valid
    # (non-clamped) fixed-point long
    assert sum(r["cnt"] for r in b) == 2
    assert all(0 <= r["bucket_lo"] < (1 << 63) - 1 for r in b)


def test_grouped_quantiles_shape(spark):
    df = spark.createDataFrame(
        [("a", float(i)) for i in range(1, 101)]
        + [("b", float(i * 10)) for i in range(1, 101)],
        "g STRING, value DOUBLE")
    b = hdr_buckets(df, "value", by=("g",))
    out = hdr_quantiles(b, qs=(0.5, 0.99), by=("g",)).collect()
    assert len(out) == 4
    got = {(r["g"], r["q"]): (r["est"], r["n"]) for r in out}
    # p50 of 1..100 is 50 exactly (50 is a bucket boundary at p=7)
    assert got[("a", 0.5)][1] == 100
    assert abs(got[("a", 0.5)][0] - 50.0) < 50.0 * 2 ** (1 - P)
    assert abs(got[("b", 0.5)][0] - 500.0) < 500.0 * 2 ** (1 - P)


def test_stream_hdr_multi_batch_equals_batch(spark, tmp_path):
    """The streamed sketch over several micro-batches (and a
    checkpointed restart) must equal the batch bucket table row for
    row — counts merge by addition, so arrival slicing can't move a
    bucket."""
    import random as _random

    from carbonapi_spark.streaming.stateful import stream_hdr_buckets

    rng = _random.Random(7)
    rows = [("a" if i % 3 else "b", rng.uniform(0.01, 900.0))
            for i in range(2000)]
    src = str(tmp_path / "src")
    batch = spark.createDataFrame(rows, "g string, value double")
    batch.repartition(4).write.parquet(src)

    final: dict = {}

    def sink(bdf, _bid):
        for r in bdf.collect():
            k = (r["grp"], r["bucket_lo"])
            final[k] = max(final.get(k, 0), r["cnt"])

    ckpt = str(tmp_path / "ckpt")
    stream = (spark.readStream.schema(batch.schema)
              .option("maxFilesPerTrigger", "1").parquet(src))
    out = stream_hdr_buckets(stream, "value", "g")
    for _run in range(2):  # second run: restart from checkpoint, no-op
        q = (out.writeStream.outputMode("update").foreachBatch(sink)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()

    want = {(r["g"], r["bucket_lo"]): r["cnt"]
            for r in hdr_buckets(batch, "value", by=("g",)).collect()}
    assert final == want and len(want) > 50
