"""Physical-plan regression guards: the shuffle economy is a design
property, not an accident. These tests count Exchange operators in real
plans so a refactor that silently doubles the shuffles fails CI."""

import re

from carbonapi_spark.evaluator import EvalContext, eval_target
from tests.conftest import make_lake


def _exchanges(spark, lake, target, f, u) -> int:
    ctx = EvalContext(spark, lake, f, u)
    frame = eval_target(ctx, target)
    plan = frame.df._jdf.queryExecution().executedPlan().toString()
    return len(re.findall(r"Exchange ", plan))


def test_window_pipeline_single_shuffle(spark):
    """fetch -> densify -> derivative -> movingAverage: densify's hash(ord)
    aggregation satisfies the window operators' partitioning, so the whole
    chain is ONE exchange."""
    lake = make_lake(spark, {"m.a": [1, 2, 3, 4], "m.b": [5, 6, 7, 8]}, 1, 0)
    assert _exchanges(spark, lake, "movingAverage(derivative(m.*), 2)", 0, 4) == 1


def test_pointwise_chain_adds_no_shuffle(spark):
    """scale(absolute(x)) fuses into the densify stage: still one exchange."""
    lake = make_lake(spark, {"m.a": [1, -2]}, 1, 0)
    assert _exchanges(spark, lake, "scale(absolute(m.a), 2)", 0, 2) == 1


def test_aggregation_shuffle_budget(spark):
    """sumSeries (NULL-skipping) takes the sparse fast path: ONE shuffle
    touches the full point set (hash agg by ts on the raw scan); up to two
    more exchanges may appear but only over the already-aggregated output
    (bucket-count rows), so the full-data shuffle budget is 1."""
    lake = make_lake(spark, {"m.a": [1, 2], "m.b": [3, 4]}, 1, 0)
    assert _exchanges(spark, lake, "sumSeries(m.*)", 0, 2) <= 3
    # order-sensitive fold -> dense path (densify + agg over full data)
    assert _exchanges(spark, lake, "diffSeries(m.a, m.b)", 0, 2) <= 3
