"""tools/rotation.py --changed: the transitive must-verify map.

The r13 policy (COVERAGE.md) makes "entry's transitive engine code
changed" a must-verify trigger; this pins the import-graph mapping that
implements it, so the tool's answers cannot silently rot as the catalog
grows — rotting here would mean rounds quietly skipping must-verify
entries again (the r12 process gap).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

from rotation import entries_for_changed, entry_modules  # noqa: E402


def test_changed_similarity_hits_ann_family_not_render():
    hits = set(entries_for_changed(
        ["carbonapi_spark/datapipe/similarity.py"]))
    # the nine entries VERDICT r12 named, plus the two the tool found
    for name in ("pq_adc_topk", "pq_rerank", "pq_ivf_topk",
                 "pq_ivf_refine", "ivf_kmeans_topk", "pq_ivf_residual",
                 "ivf_cell_stats", "ann_quality", "margin_topk",
                 "sq8_topk", "rrf_fuse", "ann_compact_probe"):
        assert name in hits, name
    # pure-evaluator entries must NOT be dragged in by parent packages
    for name in ("fetch_glob", "sum_series", "moving_average",
                 "token_count", "sessionize"):
        assert name not in hits, name


def test_changed_evaluator_module_hits_graphite_entries():
    hits = set(entries_for_changed(["carbonapi_spark/parser/globs.py"]))
    assert {"fetch_glob", "sum_series", "moving_average"} <= hits
    # datapipe-only entries don't run the evaluator stack
    assert "dedup_exact" not in hits
    assert "pq_adc_topk" not in hits


def test_every_catalog_entry_has_a_dependency_closure():
    """Every registered entry must resolve to a non-empty module set —
    an empty closure would make it invisible to --changed forever."""
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from carbonapi_spark.entry_queries import QUERIES
    mods = entry_modules()
    missing = [n for n in QUERIES if not mods.get(n)]
    assert not missing, missing[:10]
