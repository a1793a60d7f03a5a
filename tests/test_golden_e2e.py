"""Golden e2e replay of the reference's mockbackend YAML testcases
(cmd/mockbackend/testcases/*, runner e2e_test.sh — SURVEY §5 layer 2).

Each case's ``listeners.expressions`` blocks become a lake; each query's
target runs through the full parse→eval→serialize path and the JSON
datapoints are compared. Only data-bearing cases with currently-supported
semantics are replayed; HTTP-error-handling cases (connection_refused,
render_error, ...) don't apply to an embedded engine.
"""

from __future__ import annotations

import json
import math
import urllib.parse
from pathlib import Path

import pytest
import yaml

from carbonapi_spark.evaluator import EvalContext, eval_target
from carbonapi_spark.render.serialize import collect_series, render_json
from carbonapi_spark.sources.lake import SeriesLake

CASES_DIR = Path("/root/reference/cmd/mockbackend/testcases")

# data-bearing cases whose queries exercise implemented, non-HTTP semantics
# (consolidateBy / error-path cases assert only HTTP codes — not replayable
# against an embedded engine)
REPLAY = ["sortBy", "i484", "i517", "i545", "i565", "i589", "i598",
          "i661", "pr743", "pr817"]


def _load_case(name: str) -> dict:
    return yaml.safe_load((CASES_DIR / name / f"{name}.yaml").read_text())


def _lake_from_listeners(spark, case) -> tuple[SeriesLake, int, int]:
    # the same metric may appear under several glob expressions: merge
    # point-wise preferring non-NaN, like the reference's zipper merge
    # (zipper/types/response.go:458) — lakes keep (name, ts) unique
    points: dict[tuple, float | None] = {}
    min_start, max_stop, step0 = None, None, 60
    for listener in case.get("listeners", []):
        for block in (listener.get("expressions") or {}).values():
            for md in block.get("data", []):
                name = md["metricName"]
                step = md.get("step", 1)  # mockbackend default step is 1
                start = md.get("startTime", 1)
                step0 = step
                for i, v in enumerate(md["values"]):
                    ts = start + i * step
                    if v is None or (isinstance(v, float) and math.isnan(v)):
                        v = None  # NULL row: all-NaN series still exist
                    else:
                        v = float(v)
                    if points.get((name, ts)) is None:
                        points[(name, ts)] = v
                min_start = start if min_start is None else min(min_start, start)
                stop = start + len(md["values"]) * step
                max_stop = stop if max_stop is None else max(max_stop, stop)
    rows = [(n, t, v) for (n, t), v in points.items()]
    df = spark.createDataFrame(rows, "name STRING, ts BIGINT, value DOUBLE")
    return SeriesLake(df, step0), min_start or 0, max_stop or 0


def _expected_metrics(query: dict):
    resp = query.get("expectedResponse") or {}
    if resp.get("httpCode") != 200:
        return None
    for block in resp.get("expectedResults") or []:
        if "metrics" in block:
            return block["metrics"] or []
    return None


def _targets_of(query: dict) -> list[str]:
    qs = urllib.parse.urlparse(query["URL"]).query
    params = urllib.parse.parse_qs(qs)
    if params.get("format", ["json"])[0] != "json":
        return []
    return params.get("target", [])


@pytest.mark.parametrize("case_name", REPLAY)
def test_golden_case(spark, case_name):
    case = _load_case(case_name)
    lake, start, stop = _lake_from_listeners(spark, case)
    replayed = 0
    for query in case.get("test", {}).get("queries", []):
        want = _expected_metrics(query)
        targets = _targets_of(query)
        if want is None or not targets:
            continue
        got = []
        ctx = EvalContext(spark, lake, start, stop)
        for target in targets:
            frame = eval_target(ctx, target)
            got.extend(json.loads(render_json(collect_series(frame))))
        want_set = {m["target"]: m["datapoints"] for m in want}
        got_set = {m["target"]: m["datapoints"] for m in got}
        assert set(got_set) == set(want_set), \
            f"{case_name} {query['URL']}: series {set(got_set)} != {set(want_set)}"
        for name, want_dp in want_set.items():
            got_dp = got_set[name]
            assert len(got_dp) == len(want_dp), f"{case_name}/{name}: point count"
            for (gv, gt), (wv, wt) in zip(got_dp, want_dp):
                wv = None if wv in ("null", None) else float(wv)
                assert gt == wt, f"{case_name}/{name}: ts {gt} != {wt}"
                if wv is None:
                    assert gv is None, f"{case_name}/{name}@{gt}: {gv} != null"
                else:
                    assert gv == pytest.approx(wv, abs=1e-6), \
                        f"{case_name}/{name}@{gt}: {gv} != {wv}"
        replayed += 1
    assert replayed > 0, f"{case_name}: no replayable queries"
