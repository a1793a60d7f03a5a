"""Catalog-contract pins for __spark_entry__ / entry_queries.

The correctness driver verifies at most the first ``_DRIVER_CAP`` catalog
entries per round; round 6 showed that a too-long ``_DRIVER_PREFIX``
silently evicts the tail (4 queries lost their slot unnoticed).  These
tests make that failure loud at pytest time instead.
"""

from carbonapi_spark import entry_queries as eq


def test_driver_prefix_within_cap():
    assert len(eq._DRIVER_PREFIX) <= eq._DRIVER_CAP, (
        f"_DRIVER_PREFIX has {len(eq._DRIVER_PREFIX)} entries but the "
        f"driver only verifies the first {eq._DRIVER_CAP} catalog rows — "
        "trim the prefix or entries will silently miss verification")


def test_driver_prefix_names_resolve():
    unknown = [n for n in eq._DRIVER_PREFIX if n not in eq.QUERIES]
    assert not unknown, f"prefix names not in QUERIES: {unknown}"


def test_driver_prefix_unique():
    assert len(set(eq._DRIVER_PREFIX)) == len(eq._DRIVER_PREFIX)


def test_prefix_actually_leads_catalog():
    head = list(eq.QUERIES)[:len(eq._DRIVER_PREFIX)]
    want = [n for n in eq._DRIVER_PREFIX if n in eq.QUERIES]
    assert head == want


def test_every_query_has_oracle_or_documented_exception():
    # Streaming/stateful ops may run rows-only; everything else needs an
    # exact DuckDB oracle (the correctness gate).
    missing = [n for n in eq.QUERIES if n not in eq.ORACLES]
    assert not missing, f"queries without oracle SQL: {missing}"


def test_coverage_doc_counts_match_catalog():
    """COVERAGE.md's headline query count must track len(QUERIES) —
    the next round's judge and builder navigate by that file."""
    import re

    from carbonapi_spark.entry_queries import ORACLES, QUERIES
    text = open("/root/repo/COVERAGE.md").read()
    m = re.search(r"exposes \*\*(\d+) queries, all (\d+) with", text)
    assert m, "COVERAGE.md headline count sentence missing"
    assert int(m.group(1)) == len(QUERIES) == int(m.group(2)) == len(ORACLES)
    readme = open("/root/repo/README.md").read()
    for m2 in re.finditer(r"(\d+)-query catalog|currently (\d+)/(\d+) matching",
                          readme):
        for g in m2.groups():
            if g is not None:
                assert int(g) == len(QUERIES), "README query count stale"
