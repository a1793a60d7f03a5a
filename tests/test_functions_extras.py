"""Tests for long-tail operators: slo, baselines, ksTest2, applyByNode,
define macros, percentile band filter."""

import pytest

from carbonapi_spark.evaluator import EvalError
from carbonapi_spark.parser.grammar import define, undefine_all
from tests.conftest import approx_list, make_lake, run, values_of


def test_slo(spark):
    lake = make_lake(spark, {"m": [1, 5, 1, 5, 1, 5]}, 1, 0)
    res = run(spark, lake, "slo(m, '2s', 'above', 2)", 0, 6)
    name = "slo(m, 2s, above, 2)"
    approx_list(values_of(res, name), [0.5, 0.5, 0.5])


def test_slo_error_budget(spark):
    lake = make_lake(spark, {"m": [5, 5, 1, 1]}, 1, 0)
    res = run(spark, lake, "sloErrorBudget(m, '2s', 'above', 2, 0.5)", 0, 4)
    name = "sloErrorBudget(m, 2s, above, 2, 0.5)"
    # bucket fractions 1.0 and 0.0; (frac-0.5)*2
    approx_list(values_of(res, name), [1.0, -1.0])


def test_baseline(spark):
    # 3 identical periods of 4 points, values = period index
    vals = [1.0] * 4 + [2.0] * 4 + [10.0] * 4
    lake = make_lake(spark, {"m": vals}, 1, 0)
    # current window = last 4 points; baseline = median of 2 prior periods
    res = run(spark, lake, "baseline(m, '4s', 1, 3)", 8, 12)
    approx_list(values_of(res, "baseline(m)"), [1.5] * 4)


def test_baseline_aberration(spark):
    vals = [2.0] * 4 + [2.0] * 4 + [10.0] * 4
    lake = make_lake(spark, {"m": vals}, 1, 0)
    res = run(spark, lake, "baselineAberration(m, '4s', 1, 3)", 8, 12)
    approx_list(values_of(res, "baselineAberration(m)"), [5.0] * 4)


def test_ks_test2(spark):
    lake = make_lake(spark, {"m.a": [1, 2, 3, 4, 1, 2, 3, 4],
                             "m.b": [1, 2, 3, 4, 101, 102, 103, 104]}, 1, 0)
    res = run(spark, lake, "kolmogorovSmirnovTest2(m.a, m.b, 4)", 0, 8)
    got = values_of(res, "kolmogorovSmirnovTest2(m.a,m.b,4)")
    assert got[:4] == [None] * 4
    assert got[4] == pytest.approx(0.0)  # first window identical
    assert got[7] == pytest.approx(0.75)  # 3/4 of window disjoint


def test_apply_by_node(spark):
    lake = make_lake(spark, {
        "srv.s1.used": [50.0, 60.0], "srv.s1.total": [100.0, 100.0],
        "srv.s2.used": [10.0, 10.0], "srv.s2.total": [40.0, 50.0],
    }, 1, 0)
    res = run(spark, lake,
              'applyByNode(srv.*.used, 1, "divideSeries(%.used, %.total)")',
              0, 2)
    assert set(res) == {"divideSeries(srv.s1.used,srv.s1.total)",
                       "divideSeries(srv.s2.used,srv.s2.total)"}
    approx_list(values_of(res, "divideSeries(srv.s1.used,srv.s1.total)"),
                [0.5, 0.6])


def test_remove_between_percentile(spark):
    series = {f"m.{i}": [float(i), float(i)] for i in range(10)}
    lake = make_lake(spark, series, 1, 0)
    res = run(spark, lake, "removeBetweenPercentile(m.*, 30)", 0, 2)
    # survivors stray outside the [p30, p70] per-ts band
    assert set(res) == {"m.0", "m.1", "m.2", "m.7", "m.8", "m.9"}


def test_external_stubs_raise(spark):
    lake = make_lake(spark, {"m": [1]}, 1, 0)
    with pytest.raises(EvalError, match="external service"):
        run(spark, lake, "aliasByPostgres(m, 'a', 'b', 'c')", 0, 1)


def test_define_macro(spark):
    lake = make_lake(spark, {"m.a": [60.0, 120.0]}, 1, 0)
    define("perMinute", "scaleToSeconds({args[0]},60)")
    try:
        res = run(spark, lake, "perMinute(m.a)", 0, 2)
        approx_list(values_of(res, "scaleToSeconds(m.a,60)"), [3600.0, 7200.0])
    finally:
        undefine_all()


def test_alias_query(spark):
    lake = make_lake(spark, {
        "cpu.rack1.load": [1.0, 2.0],
        "cpu.rack2.load": [3.0, 4.0],
        "meta.rack1.cores": [8.0, 8.0],
        "meta.rack2.cores": [16.0, 16.0],
    }, 1, 0)
    res = run(spark, lake,
              r"aliasQuery(cpu.rack*.load, 'cpu\.(rack\d+)\.load', 'meta.\1.cores', 'load (%g cores)')",
              0, 2)
    assert set(res) == {"load (8 cores)", "load (16 cores)"}


def test_alias_query_batches_collects(spark, monkeypatch):
    """aliasQuery fetches every derived target's last value in ONE union +
    window job: 2 driver round-trips total (names + last values), not
    2 per series."""
    # patch the concrete class: pyspark.sql.DataFrame is abstract in Spark 4
    from pyspark.sql.classic.dataframe import DataFrame
    lake = make_lake(spark, {
        "cpu.rack1.load": [1.0, 2.0],
        "cpu.rack2.load": [3.0, 4.0],
        "meta.rack1.cores": [8.0, 8.0],
        "meta.rack2.cores": [16.0, 16.0],
    }, 1, 0)
    calls = []
    orig = DataFrame.collect
    monkeypatch.setattr(DataFrame, "collect",
                        lambda self: calls.append(1) or orig(self))
    from carbonapi_spark.evaluator import EvalContext, eval_target
    ctx = EvalContext(spark, lake, 0, 2)
    frame = eval_target(
        ctx, r"aliasQuery(cpu.rack*.load, 'cpu\.(rack\d+)\.load',"
             r" 'meta.\1.cores', 'load (%g cores)')")
    assert len(calls) == 2
    names = {r["name"] for r in frame.df.select("name").distinct().collect()}
    assert names == {"load (8 cores)", "load (16 cores)"}


# ------------------------------------------------- injectable external clients

def _run_ctx(spark, lake, target, f, u, clients):
    from carbonapi_spark.evaluator import EvalContext, eval_target
    ctx = EvalContext(spark, lake, f, u, external_clients=clients)
    frame = eval_target(ctx, target)
    out = {}
    for row in frame.df.collect():
        out.setdefault(row["name"], []).append((row["ts"], row["value"]))
    for k in out:
        out[k].sort()
    return out


def test_external_functions_unconfigured_raise(spark):
    lake = make_lake(spark, {"m.a": [1, 2]}, 1, 0)
    for tgt in ("aliasByRedis(m.a, 'h')",
                "aliasByPostgres(m.a, 'db', 'k', 0)",
                "graphiteWeb(m.a)"):
        with pytest.raises(EvalError, match="external service"):
            run(spark, lake, tgt, 0, 2)


def test_alias_by_redis_injected(spark):
    lake = make_lake(spark, {"sys.host1.cpu": [1.0, 2.0],
                             "sys.host2.cpu": [3.0, 4.0]}, 1, 0)
    calls = []

    def redis_client(hash_name, keys):
        calls.append((hash_name, tuple(keys)))
        return {"cpu": "CPU Load"}

    out = _run_ctx(spark, lake, "aliasByRedis(sys.*.cpu, 'renames')", 0, 2,
                   {"aliasByRedis": redis_client})
    assert set(out) == {"CPU Load"}
    assert calls == [("renames", ("cpu",))]  # ONE batched round-trip

    out = _run_ctx(spark, lake,
                   "aliasByRedis(sys.*.cpu, 'renames', true)", 0, 2,
                   {"aliasByRedis": redis_client})
    assert set(out) == {"sys.host1.CPU Load", "sys.host2.CPU Load"}


def test_alias_by_postgres_injected(spark):
    lake = make_lake(spark, {"sys.host1.cpu": [1.0], "sys.host2.cpu": [2.0]},
                     1, 0)

    def pg_client(database, key, node_lists):
        assert database == "db" and key == "k"
        # alias host1 only; host2 has no match -> dropped (reference drops)
        return ["host one" if nl == ["host1"] else None for nl in node_lists]

    out = _run_ctx(spark, lake, "aliasByPostgres(sys.*.cpu, 'db', 'k', 1)",
                   0, 1, {"aliasByPostgres": pg_client})
    assert set(out) == {"host one"}


def test_graphite_web_injected(spark):
    lake = make_lake(spark, {"m.a": [1.0]}, 1, 0)

    def gw_client(target, f, u):
        assert target == "remoteOnly(m.a)" and (f, u) == (0, 4)
        return [("m.a", 0, 7.0), ("m.a", 2, 9.0)], 2

    out = _run_ctx(spark, lake, "graphiteWeb(remoteOnly(m.a))", 0, 4,
                   {"graphiteWeb": gw_client})
    assert out == {"m.a": [(0, 7.0), (2, 9.0)]}
