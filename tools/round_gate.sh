#!/usr/bin/env bash
# Round-start correctness gate — ONE command (VERDICT r11 next-round #6).
#
# Runs, in order:
#   1. the fast suite            (pytest tests/, ~16 min)
#   2. both strict oracle gates  (pytest -m strict_oracles: bit-exact
#      fetchall replay AND the pandas/Arrow-path rendering replica that
#      mirrors how the driver hashes results — the hedge against the
#      next HUGEINT-class divergence, ~17 min)
#   3. chaos-knob validation of the driver prefix at sf0.01
#      (partition-order / input-split / Arrow-chunking stress:
#      local[3], shuffle=7, 1 MB splits, Arrow batch 17)
#
# Record the outcome in SCALE.md's round notes ("Round-N findings").
# Usage:  bash tools/round_gate.sh [--skip-fast]
set -uo pipefail
cd "$(dirname "$0")/.."

fail=0
if [[ "${1:-}" != "--skip-fast" ]]; then
    echo "== [1/3] fast suite =="
    python -m pytest tests/ -x -q || fail=1
fi

echo "== [2/3] strict oracle gates (fetchall + pandas path) =="
python -m pytest -m strict_oracles -q || fail=1

echo "== [3/3] chaos-knob prefix validation at sf0.01 =="
CHECK_MASTER='local[3]' CHECK_SHUFFLE=7 CHECK_SPLIT_MB=1 \
CHECK_ARROW_BATCH=17 \
python tools/check_oracles.py --strict --prefix-only \
    /root/testdata/sf0.01 || fail=1

if [[ $fail -ne 0 ]]; then
    echo "ROUND GATE: FAIL"
    exit 1
fi
echo "ROUND GATE: PASS — record this run in SCALE.md"
