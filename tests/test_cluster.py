"""Connected-components clustering (large-star/small-star) vs a pure-Python
union-find reference."""

import random

import pytest
from pyspark.sql import functions as F


def _union_find_labels(nodes, edges):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min node id per component
    comp = {}
    for n in nodes:
        comp.setdefault(find(n), []).append(n)
    return {n: min(members) for members in comp.values() for n in members}


def _run_cc(spark, edges, **kw):
    from carbonapi_spark.datapipe.cluster import connected_components
    df = spark.createDataFrame(edges, "src LONG, dst LONG")
    return {r["node"]: r["cluster_id"]
            for r in connected_components(df, **kw).collect()}


@pytest.mark.parametrize("threshold", [0, 1_000_000])
def test_cc_chain(spark, threshold):
    # A long chain is the worst case for label propagation (diameter
    # rounds); star contraction must still converge well under max_rounds.
    # threshold=0 forces the pure-distributed star rounds; the default
    # exercises the driver union-find finisher.
    ids = list(range(100, 160))
    random.Random(7).shuffle(ids)
    edges = list(zip(ids, ids[1:]))
    got = _run_cc(spark, edges, finish_threshold=threshold)
    expect = _union_find_labels(ids, edges)
    assert got == expect
    assert set(got.values()) == {min(ids)}


def test_cc_two_cliques_and_bridge(spark):
    a = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    b = [(i, j) for i in range(10, 14) for j in range(i + 1, 14)]
    edges = a + b
    got = _run_cc(spark, edges)
    assert {got[n] for n in range(5)} == {0}
    assert {got[n] for n in range(10, 14)} == {10}
    got2 = _run_cc(spark, edges + [(4, 13)])
    assert {got2[n] for n in list(range(5)) + list(range(10, 14))} == {0}


@pytest.mark.parametrize("threshold", [0, 1_000_000])
def test_cc_random_graph_matches_union_find(spark, threshold):
    rng = random.Random(42)
    nodes = rng.sample(range(10_000), 120)
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(90)]
    edges = [(a, b) for a, b in edges if a != b]
    touched = sorted({n for e in edges for n in e})
    got = _run_cc(spark, edges, finish_threshold=threshold)
    assert got == _union_find_labels(touched, edges)


def test_cc_duplicate_and_reversed_edges(spark):
    edges = [(1, 2), (2, 1), (1, 2), (3, 2), (5, 4)]
    got = _run_cc(spark, edges)
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4}


def test_dedup_clusters_isolated_docs_keep_own_id(spark):
    from carbonapi_spark.datapipe.cluster import dedup_clusters
    docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id LONG")
    pairs = spark.createDataFrame([(0, 3), (3, 5)], "id_a LONG, id_b LONG")
    got = {r["doc_id"]: r["cluster_id"] for r in dedup_clusters(docs, pairs).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 0, 4: 4, 5: 0}
    keepers = {d for d, c in got.items() if d == c}
    assert keepers == {0, 1, 2, 4}


def test_cc_property_random_graphs(spark):
    # hypothesis-driven: arbitrary small graphs, both phases must agree
    # with the union-find reference
    from hypothesis import given, settings, strategies as st

    edge = st.tuples(st.integers(0, 25), st.integers(0, 25))

    @settings(max_examples=12, deadline=None)
    @given(st.lists(edge, min_size=0, max_size=40),
           st.sampled_from([0, 1_000_000]))
    def check(edges, threshold):
        edges = [(a, b) for a, b in edges if a != b]
        touched = sorted({n for e in edges for n in e})
        got = _run_cc(spark, edges, finish_threshold=threshold) if edges \
            else {}
        assert got == _union_find_labels(touched, edges)

    check()


# ---------------------------------------------------------------- spans

def _py_remove_spans(docs: dict[int, str], k: int,
                     min_count: int = 2) -> dict[int, str]:
    """Pure-Python reference for remove_duplicate_spans."""
    toks = {d: t.split() for d, t in docs.items()}
    from collections import Counter
    grams = Counter()
    for t in toks.values():
        for i in range(len(t) - k + 1):
            grams[tuple(t[i:i + k])] += 1
    out = {}
    for d, t in toks.items():
        starts = [i for i in range(len(t) - k + 1)
                  if grams[tuple(t[i:i + k])] >= min_count]
        covered = set()
        for s in starts:
            covered.update(range(s, s + k))
        kept = [tok for p, tok in enumerate(t) if p not in covered]
        if kept:
            out[d] = " ".join(kept)
    return out


def test_remove_duplicate_spans_matches_python_reference(spark):
    """Hypothesis-style sweep (deterministic seeds): Spark span removal
    equals the pure-Python reference on random small corpora with
    planted shared spans."""
    import random

    from carbonapi_spark.datapipe.dedup import remove_duplicate_spans
    rng = random.Random(11)
    for trial in range(6):
        k = rng.choice([2, 3, 4])
        vocab = [f"w{i}" for i in range(8)]
        shared = " ".join(rng.choices(vocab, k=rng.randint(k, k + 3)))
        docs = {}
        for d in range(rng.randint(2, 6)):
            words = rng.choices(vocab, k=rng.randint(0, 10))
            if rng.random() < 0.7:
                pos = rng.randint(0, len(words))
                words = words[:pos] + shared.split() + words[pos:]
            docs[d] = " ".join(words)
        want = _py_remove_spans(docs, k)
        sdf = spark.createDataFrame(list(docs.items()),
                                    "doc_id LONG, text STRING")
        got = {r["doc_id"]: r["text"]
               for r in remove_duplicate_spans(sdf, k=k).collect()}
        assert got == want, (trial, k, docs)


def _py_sessionize(events, gap):
    """Pure-Python reference for sessionize: (user, ts, value) rows."""
    from collections import defaultdict
    per = defaultdict(list)
    for u, t, v in events:
        per[u].append((t, v))
    out = []
    for u, rows in per.items():
        rows.sort()
        cur = []
        for t, v in rows:
            if cur and t >= cur[-1][0] + gap:
                out.append((u, cur[0][0], cur[-1][0] + gap, len(cur),
                            sum(x[1] for x in cur)))
                cur = []
            cur.append((t, v))
        out.append((u, cur[0][0], cur[-1][0] + gap, len(cur),
                    sum(x[1] for x in cur)))
    return set(out)


def test_sessionize_matches_python_reference(spark):
    import random

    from pyspark.sql import functions as F

    from carbonapi_spark.streaming.sessions import sessionize
    rng = random.Random(13)
    for trial in range(4):
        events = [(rng.randint(0, 2), rng.randint(0, 5000), 1.0)
                  for _ in range(rng.randint(1, 40))]
        events = list({(u, t): (u, t, v) for u, t, v in events}.values())
        gap = rng.choice([60, 300, 900])
        df = (spark.createDataFrame(events,
                                    "user_id LONG, sec LONG, value DOUBLE")
              .select("user_id", F.timestamp_seconds("sec").alias("ts"),
                      "value"))
        got = {tuple(r) for r in
               sessionize(df, gap=f"{gap} seconds").collect()}
        assert got == _py_sessionize(events, gap), (trial, gap)


def test_pagerank_star_and_symmetry(spark):
    """Centrality sanity on known graphs: the hub of a star outranks
    the spokes (and spokes tie exactly); a symmetric path ranks its
    middle highest; total mass stays ~1."""
    from pyspark.sql import functions as F

    from carbonapi_spark.datapipe.cluster import pagerank
    star = spark.createDataFrame([(0, i) for i in range(1, 6)],
                                 "src long, dst long")
    pr = {r["node"]: r["pr"] for r in pagerank(star).collect()}
    assert pr[0] > pr[1]
    assert len({pr[i] for i in range(1, 6)}) == 1  # spokes identical
    assert abs(sum(pr.values()) - 1.0) < 1e-3
    path = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    pp = {r["node"]: r["pr"] for r in pagerank(path).collect()}
    assert pp[2] > pp[1] and pp[1] == pp[3]
    # deterministic across runs
    again = {r["node"]: r["pr"] for r in pagerank(star).collect()}
    assert again == pr


def test_label_propagation_bridge_vs_cc(spark):
    """Two triangles joined by one bridge: connected_components fuses
    them into one cluster; label_propagation keeps two communities
    (each side's majority outvotes the single bridge edge), and the
    result is the exact deterministic fixed point of the sync rule."""
    from carbonapi_spark.datapipe.cluster import (connected_components,
                                                  label_propagation)
    from pyspark.sql import functions as F
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)],
        "src LONG, dst LONG")
    lp = {r["node"]: r["label"]
          for r in label_propagation(edges, n_iter=5).collect()}
    assert lp == {1: 1, 2: 1, 3: 1, 4: 3, 5: 3, 6: 3}
    cc = connected_components(edges)
    assert cc.select(F.countDistinct("cluster_id")).first()[0] == 1


def test_label_propagation_tie_breaks_to_min(spark):
    """A single edge: both nodes adopt each other's label round 1, then
    oscillation settles by the min-tie rule on equal counts — pinned so
    a refactor can't silently change the deterministic contract."""
    from carbonapi_spark.datapipe.cluster import label_propagation
    edges = spark.createDataFrame([(7, 9)], "src LONG, dst LONG")
    # round 1: 7 -> 9's label 9... wait, 7's only neighbor is 9 -> lab 9;
    # 9 -> 7.  round 2: swap back.  After odd rounds: {7: 9, 9: 7}.
    out = {r["node"]: r["label"]
           for r in label_propagation(edges, n_iter=5).collect()}
    assert out == {7: 9, 9: 7}
    out4 = {r["node"]: r["label"]
            for r in label_propagation(edges, n_iter=4).collect()}
    assert out4 == {7: 7, 9: 9}


def test_triangle_count_hand_check(spark):
    """Triangle 0-1-2 plus pendant 2-3: nodes 0,1 have lcc 1.0, node 2
    (deg 3) has 2*1/(3*2) = 0.333333, node 3 none.  Duplicate and
    reversed edges must not double-count."""
    from carbonapi_spark.datapipe.cluster import triangle_count
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (0, 2), (2, 3), (2, 0), (1, 0)],
        "src LONG, dst LONG")
    out = {r["node"]: r for r in triangle_count(edges).collect()}
    assert {n: r["triangles"] for n, r in out.items()} == \
        {0: 1, 1: 1, 2: 1, 3: 0}
    assert out[0]["lcc"] == 1.0 and out[1]["lcc"] == 1.0
    assert out[2]["deg"] == 3 and out[2]["lcc"] == 0.333333
    assert out[3]["lcc"] == 0.0


def test_triangle_count_k4(spark):
    """K4: every node sits in C(3,2) = 3 triangles, lcc 1.0, and the
    global count is 4 node-triangle incidences per triangle... i.e.
    sum(triangles) == 3 * (number of distinct triangles) == 12."""
    from carbonapi_spark.datapipe.cluster import triangle_count
    edges = spark.createDataFrame(
        [(a, b) for a in range(4) for b in range(a + 1, 4)],
        "src LONG, dst LONG")
    rows = triangle_count(edges).collect()
    assert all(r["triangles"] == 3 and r["lcc"] == 1.0 for r in rows)
    assert sum(r["triangles"] for r in rows) == 12


def test_core_numbers_hand_check(spark):
    """Triangle 0-1-2 with pendant 2-3: triangle nodes have core 2, the
    pendant core 1; K4 is a 3-core; a path is a 1-core throughout."""
    from carbonapi_spark.datapipe.cluster import core_numbers
    tri = spark.createDataFrame([(0, 1), (1, 2), (0, 2), (2, 3)],
                                "src LONG, dst LONG")
    out = {r["node"]: r["core"] for r in core_numbers(tri).collect()}
    assert out == {0: 2, 1: 2, 2: 2, 3: 1}
    k4 = spark.createDataFrame(
        [(a, b) for a in range(4) for b in range(a + 1, 4)],
        "src LONG, dst LONG")
    assert all(r["core"] == 3 for r in core_numbers(k4).collect())
    path = spark.createDataFrame([(i, i + 1) for i in range(6)],
                                 "src LONG, dst LONG")
    assert all(r["core"] == 1 for r in core_numbers(path).collect())
