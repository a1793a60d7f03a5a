"""Catalog-wide bit-exact oracle gate as a pytest target.

``tools/check_oracles.py --strict`` is the documented pre-rotation
workflow, but through round 10 strict runs were manual and per-entry —
an oracle edit could land local-green (6-dp tolerance) yet strict-red,
and nothing in ``pytest tests/`` would notice until the driver did.
This marker makes the full-catalog strict replay a first-class CI
invocation:

    python -m pytest -m strict_oracles -q        # the nightly gate

It is EXCLUDED from the default run (pytest.ini deselects the marker;
the replay takes minutes) — the round-start checklist runs it once per
round alongside the sf0.01 pass.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")


@pytest.mark.strict_oracles
def test_full_catalog_strict_bit_exact_at_sf0001():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "check_oracles.py"),
         "--strict", SF_DIR],
        capture_output=True, text=True, timeout=3600, cwd=REPO)
    tail = "\n".join(proc.stdout.splitlines()[-25:])
    assert proc.returncode == 0, (
        f"strict oracle replay failed at {SF_DIR}:\n{tail}\n{proc.stderr[-2000:]}")
    assert "ALL OK" in proc.stdout


@pytest.mark.strict_oracles
def test_full_catalog_pandas_path_at_sf0001():
    """The pandas/Arrow-path replica (tools/check_oracles_pandas.py):
    catches the value-RENDERING class the fetchall gate can't — DuckDB
    HUGEINT -> float64, DECIMAL residues, any cell whose string form
    diverges between engines (the r07-r10 driver hash failures' root
    cause)."""
    proc = subprocess.run(
        [sys.executable,
         os.path.join(REPO, "tools", "check_oracles_pandas.py"), SF_DIR],
        capture_output=True, text=True, timeout=3600, cwd=REPO)
    tail = "\n".join(proc.stdout.splitlines()[-25:])
    assert proc.returncode == 0, (
        f"pandas-path oracle replay failed at {SF_DIR}:\n{tail}\n"
        f"{proc.stderr[-2000:]}")
    assert "ALL OK" in proc.stdout
