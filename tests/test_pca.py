"""Distributed PCA: bit-level determinism vs a single-node numpy
reference on the same quantized values, plus the spectral invariants
(variance ordering, orthonormality, projection variance ≈ eigenvalue)."""

import numpy as np
import pyspark.sql.functions as F

from dataframe_retail_e_inventarios_spark.operators.pca import (
    _SCALE,
    pca_fit,
    pca_project,
)
from dataframe_retail_e_inventarios_spark.sources.readers import load_table

from conftest import SF_SMOKE


def _local_reference(X: np.ndarray, k: int):
    """The exact computation pca_fit distributes: quantize, integer
    moments, numpy eigh, sign convention."""
    Q = np.round(X * _SCALE).astype(np.int64)
    n, d = Q.shape
    sx = Q.sum(axis=0).astype(object)  # exact big-int sums
    sxx = Q.T.astype(object) @ Q.astype(object)  # exact integer matmul
    # exact integer numerator, single rounding at the division —
    # mirrors pca_fit (overflow-proof past 2^53)
    cov = ((n * sxx - np.outer(sx, sx)) / (n * (n - 1))).astype(np.float64)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T
    for row in comps:
        j = int(np.argmax(np.abs(row)))
        if row[j] < 0:
            row *= -1
    return comps, sx / n / _SCALE, evals[order] / (_SCALE * _SCALE)


class TestPcaFit:
    def test_matches_local_reference_exactly(self, spark):
        emb = load_table(spark, SF_SMOKE, "embeddings")
        X = np.array([r.embedding for r in emb.orderBy("vec_id").collect()])
        comps, mean, evals = pca_fit(emb, k=4)
        ref_comps, ref_mean, ref_evals = _local_reference(X, 4)
        # same integer moments -> same covariance bits -> same eigh
        np.testing.assert_array_equal(mean, ref_mean)
        np.testing.assert_array_equal(evals, ref_evals)
        np.testing.assert_array_equal(comps, ref_comps)

    def test_spectral_invariants(self, spark):
        emb = load_table(spark, SF_SMOKE, "embeddings")
        comps, mean, evals = pca_fit(emb, k=4)
        # variance ordering
        assert all(evals[i] >= evals[i + 1] for i in range(len(evals) - 1))
        assert evals[-1] > 0
        # orthonormal rows
        gram = comps @ comps.T
        np.testing.assert_allclose(gram, np.eye(len(comps)), atol=1e-9)
        # sign convention: max-|coeff| entry positive
        for row in comps:
            assert row[int(np.argmax(np.abs(row)))] > 0

    def test_projection_variance_matches_eigenvalues(self, spark):
        emb = load_table(spark, SF_SMOKE, "embeddings")
        comps, mean, evals = pca_fit(emb, k=2)
        proj = pca_project(emb, comps, mean)
        rows = proj.select("pc1", "pc2").collect()
        P = np.array([[r.pc1, r.pc2] for r in rows])
        var = P.var(axis=0, ddof=1)
        # quantization + 6dp output rounding: loose-but-tight-enough bound
        np.testing.assert_allclose(var, evals, rtol=1e-3)

    def test_projection_is_native_plan(self, spark):
        """The corpus-side projection must stay in codegen: no Python
        eval operators in the plan."""
        emb = load_table(spark, SF_SMOKE, "embeddings")
        comps, mean, _ = pca_fit(emb, k=2)
        plan = pca_project(emb, comps, mean)._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
