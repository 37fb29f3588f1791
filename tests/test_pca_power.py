"""Tests for embedding_pca_power: agreement with numpy's exact
eigendecomposition, unit-norm/sign invariants, and the quantization
knife-edge margin that underwrites the cross-engine determinism
claim."""

from __future__ import annotations

import numpy as np
import pytest

from project_2_semantic_similarity_spark.plans.q_knn import (
    _PCA_ITERS,
    embedding_pca_power,
)


@pytest.fixture(scope="module")
def pca(spark, sf_dir):
    rows = embedding_pca_power(spark, sf_dir).collect()
    x = np.asarray(
        [np.asarray(r.embedding, dtype=np.float64) for r in
         spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()])
    return rows, x


def test_pca_matches_numpy_eigh(pca):
    rows, x = pca
    v = np.zeros(len(rows))
    for r in rows:
        v[r.dim_idx] = r.loading
    cov = np.round(np.cov(x, rowvar=False, bias=True), 6)
    evals, evecs = np.linalg.eigh(cov)
    top = evecs[:, -1]
    # power iteration after _PCA_ITERS steps: direction aligned with
    # the true top component (the synthetic spectrum is near-isotropic,
    # λ2/λ1 ≈ 0.93 — _PCA_ITERS is sized for it), eigenvalue within
    # 1% of the true maximum
    assert abs(float(np.dot(v, top))) > 0.95
    lam = rows[0].eigenvalue
    assert lam == pytest.approx(float(evals[-1]), rel=0.01)
    assert all(r.eigenvalue == lam for r in rows)


def test_pca_invariants(pca):
    rows, _ = pca
    v = np.array([r.loading for r in sorted(rows,
                                            key=lambda r: r.dim_idx)])
    assert float(np.dot(v, v)) == pytest.approx(1.0, abs=1e-3)
    # sign rule: the largest-|loading| component is positive
    i = np.lexsort((np.arange(len(v)), -np.abs(v)))[0]
    assert v[i] > 0
    assert sorted(r.dim_idx for r in rows) == list(range(len(rows)))


def test_pca_quantization_margin(pca):
    """Replicate the iteration and pin that no quantization input
    sits within 1e-13 of the floor(x+0.5) half-grid boundary — the
    ulp-scale knife-edge a cross-engine summation-order difference
    would need to flip (inputs are re-quantized every step, so only
    ~1e-15 relative noise separates the engines)."""
    rows, x = pca
    dim = x.shape[1]
    cov = np.round(np.cov(x, rowvar=False, bias=True), 6)

    def margin(vals):
        f = np.abs((1e6 * vals + 0.5) % 1.0 - 0.5)
        return float(np.min(np.abs(f - 0.5)))

    def quant(v):
        return np.floor(1e6 * v + 0.5) / 1e6

    v = quant(np.full(dim, 1.0 / np.sqrt(dim)))
    for _ in range(_PCA_ITERS):
        w = cov @ v
        nv = w / np.sqrt(float(np.dot(w, w)))
        assert margin(nv) > 1e-13
        v = quant(nv)
