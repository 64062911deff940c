"""PCA power iteration (queries/vectorops.pca_power_iteration): exact
pure-Python integer replay, plus a float-tracking check — the int64
max-norm lattice must stay directionally aligned with the same power
iteration run in float64, so the fixed-point trick is an implementation
detail, not a different algorithm."""

import math

import numpy as np

from spider_go_spark.queries.vectorops import (
    DIMS,
    PCA_ITERS,
    PCA_SCALE,
    pca_power_iteration,
)

SF = "/root/testdata/sf0.001"


def _tdiv(a: int, b: int) -> int:
    """Truncating integer division (Spark `div` / DuckDB `//`)."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _py_pca(vectors):
    q = [[math.floor(x * PCA_SCALE) for x in v] for v in vectors]
    n = len(q)
    mean = []
    for d in range(DIMS):
        s = sum(row[d] for row in q)
        mean.append(s // n if s >= 0 else -((-s + n - 1) // n))
    c = [[row[d] - mean[d] for d in range(DIMS)] for row in q]
    v = [PCA_SCALE] * DIMS
    for _ in range(PCA_ITERS):
        w = [0] * DIMS
        for row in c:
            s = _tdiv(sum(row[d] * v[d] for d in range(DIMS)), PCA_SCALE)
            for d in range(DIMS):
                w[d] += row[d] * s
        m = max(abs(x) for x in w) or 1
        v = [_tdiv(PCA_SCALE * x, m) for x in w]
    return v


def test_pca_matches_python(spark):
    rows = spark.read.parquet(f"{SF}/embeddings.parquet").orderBy("vec_id").collect()
    vectors = [list(r["embedding"]) for r in rows]
    expect = _py_pca(vectors)
    got = {r["dim"]: r["loading"] for r in pca_power_iteration(spark, SF).collect()}
    assert [got[d] for d in range(DIMS)] == expect
    # max-norm contract: the largest-|·| component is exactly ±PCA_SCALE
    assert max(abs(x) for x in expect) == PCA_SCALE


def test_pca_tracks_float_power_iteration(spark):
    rows = spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    x = np.array([list(r["embedding"]) for r in rows], dtype=np.float64)
    xc = x - x.mean(axis=0)
    v = np.ones(DIMS)
    for _ in range(PCA_ITERS):
        w = xc.T @ (xc @ v)
        v = w / np.abs(w).max()
    got = {r["dim"]: r["loading"] for r in pca_power_iteration(spark, SF).collect()}
    vi = np.array([got[d] for d in range(DIMS)], dtype=np.float64)
    cos = abs(vi @ v) / (np.linalg.norm(vi) * np.linalg.norm(v))
    assert cos > 0.999, cos
