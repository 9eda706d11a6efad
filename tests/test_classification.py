"""GPClassification / SparseGPClassification wrappers
(GPy models/gp_classification.py:10, sparse_gp_classification.py:12)."""
import numpy as np

import gaussian_process_optimization_tpu.kernels as kern
from gaussian_process_optimization_tpu.models.classification import (
    GPClassification,
    SparseGPClassification,
)


def _toy(rng, n=40):
    X = np.concatenate([rng.uniform(-2, -0.3, n // 2),
                        rng.uniform(0.3, 2, n // 2)])[:, None]
    y = np.where(X[:, 0] > 0, 1.0, 0.0)  # 0/1 labels accepted
    return X, y


def test_gp_classification_separates(rng):
    X, y = _toy(rng)
    m = GPClassification.create(X, y, kernel=kern.RBF.create(1, variance=3.0))
    assert np.isfinite(float(m.log_marginal_likelihood()))
    p = np.asarray(m.predict(np.array([[-1.5], [1.5]])))
    assert p[0] < 0.25 and p[1] > 0.75


def test_gp_classification_optimize_improves_evidence(rng):
    X, y = _toy(rng, n=30)
    m = GPClassification.create(X, y, kernel=kern.RBF.create(1, variance=0.3,
                                                             lengthscale=3.0))
    lml0 = float(m.log_marginal_likelihood())
    fitted, _ = m.optimize(rounds=2, maxiter=20)
    lml1 = float(fitted.log_marginal_likelihood())
    assert lml1 > lml0, (lml0, lml1)
    p = np.asarray(fitted.predict(np.array([[-1.5], [1.5]])))
    assert p[0] < 0.3 and p[1] > 0.7


def test_sparse_gp_classification(rng):
    X, y = _toy(rng, n=60)
    m = SparseGPClassification.create(
        X, y, kernel=kern.RBF.create(1, variance=3.0), num_inducing=10, seed=0
    )
    assert np.isfinite(float(m.log_marginal_likelihood()))
    p = np.asarray(m.predict(np.array([[-1.5], [1.5]])))
    assert p[0] < 0.3 and p[1] > 0.7


def test_sparse_matches_dense_with_all_inducing(rng):
    X, y = _toy(rng, n=24)
    k = kern.RBF.create(1, variance=2.0)
    dense = GPClassification.create(X, y, kernel=k, max_sweeps=200)
    sparse = SparseGPClassification.create(X, y, kernel=k, Z=X, max_sweeps=200)
    pd = np.asarray(dense.predict(np.array([[-1.0], [0.0], [1.0]])))
    ps = np.asarray(sparse.predict(np.array([[-1.0], [0.0], [1.0]])))
    np.testing.assert_allclose(ps, pd, atol=5e-3)
