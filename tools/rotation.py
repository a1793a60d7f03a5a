"""Driver-prefix staleness rotation (VERDICT r11 next-round #2).

The per-round correctness driver verifies only the first ``_DRIVER_CAP``
(50) catalog entries, so most of the ~250-entry catalog goes unverified
for many rounds.  The r07-r11 HUGEINT episode proved the local gate can
silently diverge from the driver's pandas/Arrow hash path for a whole
class of entries, so driver-row freshness is itself a correctness
signal.  This tool computes, from the CORRECTNESS_r*.json history, each
entry's most recent GREEN driver round (rows+schema+hash all true) and
prints the longest-unverified greens — the candidates for the next
round's ``_DRIVER_PREFIX`` after any must-verify (new / plan-changed /
oracle-changed) entries.

Usage:
    python tools/rotation.py [--n 30] [--markdown]

``--markdown`` emits the full last_driver_green table for COVERAGE.md.
"""

import argparse
import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_history():
    """-> dict name -> {round: green_bool} across all CORRECTNESS files."""
    hist = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        rnd = int(m.group(1))
        with open(path) as f:
            data = json.load(f)
        for name, row in data.items():
            green = bool(row.get("rows_match") and row.get("schema_match")
                         and row.get("hash_match") and not row.get("err"))
            hist.setdefault(name, {})[rnd] = green
    return hist


def last_green(hist):
    """-> dict name -> last green round (0 if never green)."""
    return {name: max((r for r, g in rounds.items() if g), default=0)
            for name, rounds in hist.items()}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=30,
                    help="how many longest-unverified entries to print")
    ap.add_argument("--markdown", action="store_true",
                    help="emit the full table for COVERAGE.md")
    args = ap.parse_args()

    sys.path.insert(0, REPO)
    from carbonapi_spark.entry_queries import QUERIES

    lg = last_green(load_history())
    catalog = list(QUERIES)
    rows = sorted(((lg.get(n, 0), n) for n in catalog),
                  key=lambda t: (t[0], catalog.index(t[1])))

    if args.markdown:
        print("| entry | last driver-green round |")
        print("|---|---|")
        for rnd, name in rows:
            print(f"| {name} | {'r%02d' % rnd if rnd else 'never'} |")
        return

    never = [n for rnd, n in rows if rnd == 0]
    if never:
        print(f"# {len(never)} catalog entries NEVER driver-green:")
        for n in never:
            print(f"  {n}")
    print(f"# {args.n} longest-unverified catalog entries "
          f"(last green round, oldest first):")
    for rnd, name in rows[:args.n]:
        print(f"  r{rnd:02d}  {name}")


if __name__ == "__main__":
    main()
