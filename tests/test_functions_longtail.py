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


def test_use_series_above_batched_fetch(spark):
    """useSeriesAbove rewrites names of series whose max exceeds the
    threshold and fetches the rewritten metrics — in ONE batched
    brace-alternation fetch, not a per-name driver loop."""
    from carbonapi_spark.evaluator import EvalContext, eval_target
    lake = make_lake(spark, {
        "reqs.s1": [10.0, 80.0], "reqs.s2": [1.0, 2.0], "reqs.s3": [90.0, 5.0],
        "errors.s1": [3.0, 4.0], "errors.s2": [7.0, 8.0], "errors.s3": [5.0, 6.0],
    }, 1, 0)
    ctx = EvalContext(spark, lake, 0, 2)
    res_frame = eval_target(ctx, "useSeriesAbove(reqs.*, 50, 'reqs', 'errors')")
    got = {r["name"]: r["value"] for r in res_frame.df.collect()
           if r["ts"] == 0}
    assert got == {"errors.s1": 3.0, "errors.s3": 5.0}
    # exactly two fetches hit the lake: the source glob + ONE batched
    # brace fetch for both rewritten names
    patterns = sorted(k[0] for k in ctx.values)
    assert patterns == ["reqs.*", "{errors.s1,errors.s3}"]


def test_use_series_above_no_matches(spark):
    from carbonapi_spark.evaluator import EvalContext, eval_target
    lake = make_lake(spark, {"reqs.s1": [1.0], "errors.s1": [3.0]}, 1, 0)
    ctx = EvalContext(spark, lake, 0, 1)
    frame = eval_target(ctx, "useSeriesAbove(reqs.*, 50, 'reqs', 'errors')")
    assert frame.df.count() == 0
