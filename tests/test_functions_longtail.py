"""Tests for the final coverage-gap operators."""

import pytest

from tests.conftest import approx_list, make_lake, run, values_of

NAN = float("nan")


def test_area_between(spark):
    lake = make_lake(spark, {"m.lo": [1], "m.hi": [5]}, 1, 0)
    res = run(spark, lake, "areaBetween(m.*)", 0, 1)
    assert set(res) == {"areaBetween(m.lo)", "areaBetween(m.hi)"}


def test_compress_periodic_gaps(spark):
    # data every 3rd slot: stride detected -> re-bucketed to step 3
    vals = [1.0, NAN, NAN, 2.0, NAN, NAN, 3.0, NAN, NAN, 4.0, NAN, NAN]
    lake = make_lake(spark, {"m": vals}, 1, 0)
    res = run(spark, lake, "compressPeriodicGaps(m)", 0, 12)
    approx_list(values_of(res, "compressPeriodicGaps(m)"), [1, 2, 3, 4])


def test_compress_periodic_gaps_no_period(spark):
    lake = make_lake(spark, {"m": [1.0, 2.0, 3.0]}, 1, 0)
    res = run(spark, lake, "compressPeriodicGaps(m)", 0, 3)
    approx_list(values_of(res, "compressPeriodicGaps(m)"), [1, 2, 3])


def test_time_shift_by_metric(spark):
    # two versioned series; marks say v2_0's data ends 2 steps after v1_0's
    lake = make_lake(spark, {
        "app.1_0.reqs": [1.0, 2.0, 3.0, NAN, NAN, NAN],
        "app.2_0.reqs": [NAN, NAN, 10.0, 20.0, 30.0, NAN],
        "marks.1_0": [1.0, 1.0, 1.0, NAN, NAN, NAN],
        "marks.2_0": [NAN, NAN, 1.0, 1.0, 1.0, NAN],
    }, 1, 0)
    res = run(spark, lake, "timeShiftByMetric(app.*.reqs, marks.*, 1)", 0, 6)
    # 2_0 is newest (last mark at idx 4 vs 2): 1_0 shifted by +2, 2_0 by 0
    v1 = dict(res["timeShiftByMetric(app.1_0.reqs)"])
    v2 = dict(res["timeShiftByMetric(app.2_0.reqs)"])
    assert v1[2] == 1.0 and v1[4] == 3.0  # shifted forward 2 steps
    assert v2[2] == 10.0 and v2[4] == 30.0  # unshifted
