"""Embedding linear algebra (datapipe/linalg.py): JL distance
preservation, sign-generator twins, covariance vs numpy, PCA
orthonormality + numpy equivalence, projection correctness."""

import math
import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from carbonapi_spark.datapipe.linalg import (
    PROJ_SCALE, covariance_matrix, jl_signs, pca_components, pca_project,
    random_projection)


def _vec_df(spark, n=200, dim=32, seed=4):
    rng = random.Random(seed)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(dim)]) for i in range(n)]
    return rows, spark.createDataFrame(
        rows, "vec_id long, embedding array<float>")


def test_projection_matches_driver_twin(spark):
    rows, df = _vec_df(spark, n=50, dim=16)
    out_dim = 8
    got = {(r["vec_id"], r["odim"]): r["value"]
           for r in random_projection(df, out_dim).collect()}
    den = PROJ_SCALE * math.sqrt(out_dim)
    signs = jl_signs(16, out_dim)
    for vid, vec in rows:
        vecf = [np.float32(x) for x in vec]   # storage dtype
        q = [round(float(x) * PROJ_SCALE) for x in vecf]
        for j in range(out_dim):
            exp = sum(q[i] * signs[i][j]
                      for i in range(len(q))) / den
            assert got[(vid, j)] == pytest.approx(exp, rel=1e-12)


def test_projection_preserves_distances(spark):
    # JL: with k=32 output dims, pairwise squared distances are
    # preserved within a modest epsilon with high probability
    rows, df = _vec_df(spark, n=40, dim=64, seed=7)
    k = 32
    proj = random_projection(df, k).collect()
    pv: dict = {}
    for r in proj:
        pv.setdefault(r["vec_id"], [0.0] * k)[r["odim"]] = r["value"]
    ids = sorted(pv)
    orig = {vid: np.array(v, dtype=float) for vid, v in rows}
    ratios = []
    rng = random.Random(3)
    for _ in range(200):
        a, b = rng.sample(ids, 2)
        d_orig = float(np.sum((orig[a] - orig[b]) ** 2))
        d_proj = float(np.sum((np.array(pv[a]) - np.array(pv[b])) ** 2))
        ratios.append(d_proj / d_orig)
    med = sorted(ratios)[len(ratios) // 2]
    assert 0.6 < med < 1.4, med
    assert all(0.2 < r < 2.5 for r in ratios), (min(ratios), max(ratios))


def test_covariance_matches_numpy(spark):
    rows, df = _vec_df(spark, n=100, dim=8)
    X = np.array([[float(np.float32(x)) for x in v] for _, v in rows])
    exp = np.cov(X, rowvar=False, bias=True)
    got = covariance_matrix(df).collect()
    assert len(got) == 8 * 9 // 2
    for r in got:
        # 1e9 fixed-point quantization bounds the error at ~1e-7
        assert r["cov"] == pytest.approx(exp[r["i"], r["j"]], abs=5e-6)


def test_covariance_partition_invariant(spark):
    _, df = _vec_df(spark, n=60, dim=6)
    a = {(r["i"], r["j"]): r["cov"]
         for r in covariance_matrix(df).collect()}
    b = {(r["i"], r["j"]): r["cov"]
         for r in covariance_matrix(df.repartition(7)).collect()}
    assert a == b   # exact equality: integer sums are order-independent


def test_covariance_dirty_frame_paths_agree(spark):
    """NULL and RAGGED embedding rows: the Arrow kernel (which used to
    crash on a non-rectangular batch) must agree bit-for-bit with the
    JVM HOF path's tolerance — nulls contribute nothing, a length-L row
    contributes only to pairs/moments with indices < L, and per-pair
    counts track actual contributors."""
    rng = random.Random(5)
    rows = []
    for i in range(40):
        if i % 9 == 0:
            rows.append((i, None))
        elif i % 7 == 0:
            rows.append((i, [rng.uniform(-1, 1) for _ in range(3)]))
        else:
            rows.append((i, [rng.uniform(-1, 1) for _ in range(5)]))
    df = spark.createDataFrame(rows,
                               "vec_id long, embedding array<float>")
    for reparted in (df, df.repartition(5)):
        a = {(r["i"], r["j"]): r["cov"]
             for r in covariance_matrix(reparted, arrow=True).collect()}
        b = {(r["i"], r["j"]): r["cov"]
             for r in covariance_matrix(reparted, arrow=False).collect()}
        assert a == b and len(a) == 5 * 6 // 2
    # all-null / empty partitions must not crash the kernel
    empt = spark.createDataFrame([(0, None)],
                                 "vec_id long, embedding array<float>")
    assert covariance_matrix(empt, arrow=True).collect() == []


def test_pca_components_match_numpy(spark):
    rng = random.Random(11)
    # anisotropic data: dim 0 dominates, dim 1 second
    rows = [(i, [rng.gauss(0, 3), rng.gauss(0, 1), rng.gauss(0, 0.1),
                 rng.gauss(0, 0.05)]) for i in range(400)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    comps, ev = pca_components(df, k=2)
    assert len(comps) == 2 and len(ev) == 2
    assert ev[0] > ev[1] > 0
    C = np.array(comps)
    # orthonormal rows
    assert np.allclose(C @ C.T, np.eye(2), atol=1e-9)
    # first component aligns with the dominant axis
    assert abs(C[0, 0]) > 0.99
    # eigenvalues match numpy on the same (quantized) covariance
    X = np.array([[float(np.float32(x)) for x in v] for _, v in rows])
    w = np.sort(np.linalg.eigvalsh(np.cov(X, rowvar=False, bias=True)))
    assert ev[0] == pytest.approx(w[-1], rel=1e-3)
    assert ev[1] == pytest.approx(w[-2], rel=1e-3)


def test_pca_project_is_matmul(spark):
    rows, df = _vec_df(spark, n=30, dim=6, seed=9)
    comps, _ = pca_components(df, k=3)
    got = {r["vec_id"]: r["pc"] for r in pca_project(df, comps).collect()}
    C = np.array(comps)
    for vid, vec in rows:
        x = np.array([float(np.float32(v)) for v in vec])
        exp = C @ x
        assert np.allclose(got[vid], exp, atol=1e-9), vid


def test_sign_generator_is_balanced():
    m = jl_signs(64, 16)
    flat = [s for row in m for s in row]
    frac = sum(1 for s in flat if s == 1) / len(flat)
    assert 0.42 < frac < 0.58, frac
    # rows (input dims) must not share a sign pattern — the failure
    # mode of the discarded affine-parity generator (rank-1 projection)
    assert len({tuple(r) for r in m}) == 64
    # deterministic: same seed, same matrix
    assert jl_signs(64, 16) == m


def test_correlation_matches_numpy(spark):
    from carbonapi_spark.datapipe.linalg import correlation_matrix
    rows, df = _vec_df(spark, n=120, dim=6, seed=21)
    X = np.array([[float(np.float32(x)) for x in v] for _, v in rows])
    exp = np.corrcoef(X, rowvar=False)
    got = correlation_matrix(df).collect()
    assert len(got) == 6 * 7 // 2
    for r in got:
        assert r["corr"] == pytest.approx(exp[r["i"], r["j"]], abs=1e-4)
        if r["i"] == r["j"]:
            assert r["corr"] == pytest.approx(1.0, abs=1e-12)


def test_correlation_zero_variance_is_null(spark):
    from carbonapi_spark.datapipe.linalg import correlation_matrix
    df = spark.createDataFrame(
        [(i, [float(i), 7.0]) for i in range(10)],
        "vec_id long, embedding array<float>")
    got = {(r["i"], r["j"]): r["corr"]
           for r in correlation_matrix(df).collect()}
    assert got[(0, 0)] == pytest.approx(1.0)
    assert got[(0, 1)] is None and got[(1, 1)] is None


def test_random_projection_paths_agree_clean_and_dirty(spark):
    """The Arrow int64-matmul path must equal the JVM HOF fold
    bit-for-bit — clean rows, NULL embeddings (null values out), short
    rows (partial sums over the first len coords), too-long and empty
    rows (null, matching the fold's null element_at)."""
    from carbonapi_spark.datapipe.linalg import random_projection
    rng = random.Random(3)
    rows = [(0, None), (1, [])]
    rows += [(10 + i, [rng.uniform(-1, 1) for _ in range(8)])
             for i in range(25)]
    rows.append((90, [rng.uniform(-1, 1) for _ in range(5)]))   # short
    rows.append((91, [rng.uniform(-1, 1) for _ in range(12)]))  # long
    rows.append((92, [float("nan")] + [0.5] * 7))               # NaN
    rows.append((93, [float("inf")] + [0.5] * 7))               # +Inf
    rows.append((94, [-float("inf")] + [0.5] * 7))              # -Inf
    rows.append((95, [1e30] + [0.5] * 7))       # finite int64 overflow
    rows.append((96, [0.5] * 3 + [None] + [0.5] * 4))  # null element
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    # first() establishes in_dim from an arbitrary row: pin it by
    # filtering the probe rows the same way both calls do internally
    for reparted in (df, df.repartition(4)):
        a = {(r["vec_id"], r["odim"]): r["value"]
             for r in random_projection(reparted, out_dim=4,
                                        arrow=True).collect()}
        b = {(r["vec_id"], r["odim"]): r["value"]
             for r in random_projection(reparted, out_dim=4,
                                        arrow=False).collect()}
        assert a == b and len(a) == len(rows) * 4
        assert a[(0, 0)] is None and a[(1, 0)] is None
        assert a[(91, 0)] is None and a[(90, 0)] is not None
        # non-finite / overflowing / null-element rows: explicit null on
        # BOTH paths (never an engine-specific int64 garbage sentinel)
        for rid in (92, 93, 94, 95, 96):
            assert a[(rid, 0)] is None, rid
