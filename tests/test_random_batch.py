"""Randomized-batch equivalence: many seeded random series (with NaN
gaps) flow through the engine in ONE Spark job and the result is compared
point-for-point against an independent pandas computation. This covers
input shapes hand-written cases miss — especially for movingMedian's
codegen'd lag-array percentile, the round-3 rewrite of the hot path."""

import math

import numpy as np
import pandas as pd
import pytest

from tests.conftest import make_lake, run

R_SERIES = 12
LENGTH = 60


def _random_series(seed: int) -> dict[str, list]:
    rng = np.random.RandomState(seed)
    out = {}
    for i in range(R_SERIES):
        vals = rng.randn(LENGTH) * 10
        mask = rng.rand(LENGTH) < 0.2  # ~20% gaps
        out[f"m.s{i:02d}"] = [None if m else float(v)
                              for v, m in zip(vals, mask)]
    return out


def _rolling_expect(values, wp: int, p: float):
    s = pd.Series(values, dtype=float)
    return s.rolling(wp, min_periods=1).quantile(p, interpolation="linear")


def _check(spark, target_fmt: str, wp: int, p: float, seed: int):
    series = _random_series(seed)
    lake = make_lake(spark, series, 1, 0)
    got = run(spark, lake, target_fmt, wp, LENGTH)
    assert len(got) == R_SERIES
    for name, pts in got.items():
        inner = name[name.index("(") + 1:name.rindex(",")]
        expect = _rolling_expect(series[inner], wp, p)
        assert len(pts) == LENGTH - wp
        for ts, v in pts:
            e = expect[ts]
            if v is None or (isinstance(v, float) and math.isnan(v)):
                assert math.isnan(e), (name, ts, v, e)
            else:
                assert e == pytest.approx(v, abs=1e-9), (name, ts, v, e)


def test_moving_median_lag_path_random(spark):
    _check(spark, "movingMedian(m.*, 7)", 7, 0.5, seed=1)


def test_moving_p75_lag_path_random(spark):
    _check(spark, "movingWindow(m.*, 5, 'p75')", 5, 0.75, seed=2)


def test_moving_median_wide_pandas_path_random(spark):
    # wp > _LAG_WINDOW_MAX exercises the applyInPandas rolling kernel;
    # use a longer series so output is non-trivial
    global LENGTH
    old = LENGTH
    LENGTH = 300
    try:
        _check(spark, "movingMedian(m.*, 140)", 140, 0.5, seed=3)
    finally:
        LENGTH = old


def test_moving_average_matches_pandas_mean(spark):
    series = _random_series(seed=4)
    lake = make_lake(spark, series, 1, 0)
    wp = 6
    got = run(spark, lake, "movingAverage(m.*, 6)", wp, LENGTH)
    for name, pts in got.items():
        inner = name[name.index("(") + 1:name.rindex(",")]
        expect = (pd.Series(series[inner], dtype=float)
                  .rolling(wp, min_periods=1).mean())
        for ts, v in pts:
            e = expect[ts]
            if v is None or (isinstance(v, float) and math.isnan(v)):
                assert math.isnan(e), (name, ts)
            else:
                assert e == pytest.approx(v, abs=1e-9), (name, ts, v, e)
