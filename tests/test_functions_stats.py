"""Tests for statistical kernels + misc operators."""

import math

import pytest

from tests.conftest import approx_list, make_lake, run, values_of

NAN = float("nan")


def test_ema_int_window(spark):
    # seed = mean of first window over extended fetch
    lake = make_lake(spark, {"m": [1, 2, 3, 4, 5, 6]}, 1, 0)
    res = run(spark, lake, "exponentialMovingAverage(m, 2)", 2, 6)
    # fetch [0,6): seed=mean(1,2)=1.5 at ts=2; c=2/3
    # ts3: 2/3*4+1/3*1.5=3.166667; ts4: 2/3*5+1/3*3.166667=4.388889
    got = values_of(res, "exponentialMovingAverage(m,2)")
    approx_list(got[:2], [1.5, pytest.approx(2 / 3 * 3 + 1.5 / 3, abs=1e-6)])


def test_ewma(spark):
    lake = make_lake(spark, {"m": [2, 4, None, 8]}, 1, 0)
    res = run(spark, lake, "ewma(m, 0.5)", 0, 4)
    approx_list(values_of(res, "ewma(m,0.5)"), [2, 3, None, 5.5])


def test_pearson_perfect_correlation(spark):
    lake = make_lake(spark, {"m.a": [1, 2, 3, 4], "m.b": [2, 4, 6, 8]}, 1, 0)
    res = run(spark, lake, "pearson(m.a, m.b, 3)", 0, 4)
    got = values_of(res, "pearson(m.a,m.b,3)")
    assert got[3] == pytest.approx(1.0)


def test_pearson_closest(spark):
    lake = make_lake(spark, {
        "m.a": [1, 2, 3, 4], "m.b": [2, 4, 6, 8], "m.c": [5, 1, 9, 2],
        "ref": [1, 2, 3, 4],
    }, 1, 0)
    res = run(spark, lake, "pearsonClosest(m.*, ref, 2)", 0, 4)
    assert set(res) == {"m.a", "m.b"}


def test_polyfit_linear(spark):
    lake = make_lake(spark, {"m": [1, 3, 5, 7]}, 1, 0)
    res = run(spark, lake, "polyfit(m)", 0, 4)
    approx_list(values_of(res, "polyfit(m)"), [1, 3, 5, 7], tol=1e-6)


def test_holt_winters_forecast_runs(spark):
    vals = [float(i % 4) for i in range(24)]
    lake = make_lake(spark, {"m": vals}, 1, 0)
    res = run(spark, lake, "holtWintersForecast(m, '8s', '4s')", 8, 24)
    got = values_of(res, "holtWintersForecast(m)")
    assert len(got) == 16
    assert all(v is not None for v in got[1:])


def test_holt_winters_bands(spark):
    vals = [float(i % 4) for i in range(24)]
    lake = make_lake(spark, {"m": vals}, 1, 0)
    res = run(spark, lake, "holtWintersConfidenceBands(m, 3, '8s', '4s')", 8, 24)
    assert set(res) == {"holtWintersConfidenceLower(m)",
                       "holtWintersConfidenceUpper(m)"}


def test_low_pass_preserves_constant(spark):
    lake = make_lake(spark, {"m": [5.0] * 8}, 1, 0)
    res = run(spark, lake, "lowPass(m, 50)", 0, 8)
    approx_list(values_of(res, "lowPass(m,50)"), [5.0] * 8, tol=1e-9)


# ----------------------------------------------------------- misc

def test_substr(spark):
    lake = make_lake(spark, {"a.b.c.d": [1]}, 1, 0)
    res = run(spark, lake, "substr(a.b.c.d, 1, 3)", 0, 1)
    assert list(res) == ["b.c"]


def test_to_upper(spark):
    lake = make_lake(spark, {"a.b": [1]}, 1, 0)
    res = run(spark, lake, "toUpperCase(a.b)", 0, 1)
    assert list(res) == ["A.B"]


def test_join_and(spark):
    lake = make_lake(spark, {"a.x": [1], "a.y": [2], "b.x": [3]}, 1, 0)
    res = run(spark, lake, "join(a.*, b.*, 'AND')", 0, 1)
    # AND matches by full name: a.x vs b.x don't share names -> empty
    assert res == {}


def test_join_sub(spark):
    lake = make_lake(spark, {"a.x": [1], "a.y": [2]}, 1, 0)
    res = run(spark, lake, "join(a.*, a.x, 'SUB')", 0, 1)
    assert set(res) == {"a.y"}


def test_join_or(spark):
    lake = make_lake(spark, {"a.x": [1], "b.y": [2]}, 1, 0)
    res = run(spark, lake, "join(a.*, b.*, 'OR')", 0, 1)
    assert set(res) == {"a.x", "b.y"}


def test_reduce_series(spark):
    lake = make_lake(spark, {
        "srv.s1.bytes_used": [50, 25], "srv.s1.total_bytes": [100, 100],
        "srv.s2.bytes_used": [10, 20], "srv.s2.total_bytes": [100, 50],
    }, 1, 0)
    res = run(spark, lake,
              "reduceSeries(mapSeries(srv.*.*, 1), 'asPercent', 2, 'bytes_used', 'total_bytes')",
              0, 2)
    assert set(res) == {"srv.s1.reduce.asPercent", "srv.s2.reduce.asPercent"}
    approx_list(values_of(res, "srv.s1.reduce.asPercent"), [50, 25])
    approx_list(values_of(res, "srv.s2.reduce.asPercent"), [10, 40])


def test_integral_with_reset(spark):
    lake = make_lake(spark, {"m": [1, 1, 1, 1, 1], "r": [0, 0, 1, 0, 0]}, 1, 0)
    res = run(spark, lake, "integralWithReset(m, r)", 0, 5)
    approx_list(values_of(res, "integralWithReset(m,r)"), [1, 2, 0, 1, 2])


def test_consolidate_by_sets_meta(spark):
    lake = make_lake(spark, {"m": [1, 2]}, 1, 0)
    res = run(spark, lake, "consolidateBy(m, 'max')", 0, 2)
    assert list(res) == ["consolidateBy(m,'max')"]


def test_pow_series(spark):
    lake = make_lake(spark, {"m.a": [2, 3], "m.b": [3, 2]}, 1, 0)
    res = run(spark, lake, "powSeries(m.a, m.b)", 0, 2)
    approx_list(values_of(res, "powSeries(m.a, m.b)"), [8, 9])


def test_heat_map(spark):
    lake = make_lake(spark, {"m.1": [1, 1], "m.2": [3, 5]}, 1, 0)
    res = run(spark, lake, "heatMap(m.*)", 0, 2)
    approx_list(values_of(res, "heatMap(m.2,m.1)"), [2, 4])
