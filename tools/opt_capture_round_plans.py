"""VERDICT r14 #8: capture the REAL per-round plans of the iterative
graph kernels (pagerank / label_propagation / textrank / core_numbers).

The committed ``plans/r14`` graph dumps were taken on the returned
DataFrame — post-checkpoint, i.e. a bare ``Scan ExistingRDD`` that
proves nothing about what a round costs.  This tool wraps
``DataFrame.localCheckpoint`` so every per-round plan is explained
FORMATTED at the moment the loop cuts it — the actual pre-checkpoint
round plan from the genuine code path, not a reconstruction — and
writes the LAST full round's plan (plus round count) to
``plans/r15/<entry>_round.txt``.

Usage: python tools/opt_capture_round_plans.py entry [entry ...]
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Spark 4: pyspark.sql.DataFrame is the abstract facade; the methods
# actually dispatched at runtime live on the classic concrete class —
# patch THAT or the wrapper never fires.
try:
    from pyspark.sql.classic.dataframe import DataFrame
except ImportError:           # older layouts
    from pyspark.sql import DataFrame


def main() -> None:
    entries = [a for a in sys.argv[1:] if not a.startswith("--")] or \
        ["pagerank", "label_prop", "textrank", "core_numbers"]
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    outdir = os.environ.get("PLANS_DIR", os.path.join(here, "plans", "r15"))
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    sys.path.insert(0, os.path.join(here, "tools"))
    from opt_phase_probe import session
    spark = session()

    from carbonapi_spark import scratch
    from carbonapi_spark.entry_queries import QUERIES

    real = DataFrame.localCheckpoint
    captured: list[str] = []

    def capturing(self, eager=True):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            self.explain(mode="formatted")
        captured.append(buf.getvalue())
        return real(self, eager=eager)

    for name in entries:
        captured.clear()
        DataFrame.localCheckpoint = capturing
        try:
            df = QUERIES[name](spark, sf_dir)
            df.collect()
        finally:
            DataFrame.localCheckpoint = real
            scratch.release()
        if not captured:
            print(f"{name}: no localCheckpoint calls captured")
            continue
        # the last capture is the final round's plan (the seed/setup
        # checkpoints come first); keep it plus a capture count so the
        # claim "every round looks like this" is checkable
        path = os.path.join(outdir, f"{name}_round.txt")
        with open(path, "w") as f:
            f.write(f"== {name}: {len(captured)} localCheckpoint-cut "
                    f"plans captured; the LAST (final-round) plan ==\n\n")
            f.write(captured[-1])
            ex = [i for i, p in enumerate(captured)
                  if "Exchange" in p]
            bhj = [i for i, p in enumerate(captured)
                   if "BroadcastHashJoin" in p]
            f.write(f"\n== summary: plans with Exchange: {ex}; "
                    f"plans with BroadcastHashJoin: {bhj} ==\n")
        print(f"captured {name}: {len(captured)} plans -> {path}")
    spark.stop()


if __name__ == "__main__":
    main()
