"""Pin bench.py's mover-attribution baseline selection (ADVICE r13 #1).

The driver writes BENCH_r{N}.json BEFORE the round's wrap-up commit, so
the newest BENCH file on disk is routinely uncommitted.  Attribution must
fall back to the newest COMMITTED baseline instead of returning ({}, None)
in exactly the re-run scenario it exists for.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def test_mover_attribution_skips_uncommitted_newest(tmp_path):
    here = os.path.dirname(os.path.abspath(bench.__file__))
    fake = os.path.join(here, "BENCH_r98.json")
    assert not os.path.exists(fake)
    with open(fake, "w") as f:
        json.dump({}, f)
    try:
        verdicts, base = bench._mover_verdicts({"sum_series": 1e9}, {})
    finally:
        os.remove(fake)
    # must resolve to a committed baseline, not the untracked r98
    assert base is not None and base != "BENCH_r98.json"
    assert "sum_series" in verdicts


def test_mover_attribution_resolves_against_committed_tree():
    verdicts, base = bench._mover_verdicts({"sum_series": 1e9}, {})
    assert base is not None
    row = verdicts["sum_series"]
    assert row["ratio"] > bench.MOVER_THRESHOLD
    assert row["verdict"].startswith(("within", "exceeds"))
