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


def test_sparse_gp_classification_optimize_improves_evidence(rng):
    """Alternated EP evidence maximization for the SPARSE classifier
    (reference EPBase ep_mode='alternated' driving EPDTC): the site-fixed
    L-BFGS rounds must increase the EP evidence and keep separation."""
    X, y = _toy(rng, n=50)
    m = SparseGPClassification.create(
        X, y, kernel=kern.RBF.create(1, variance=0.3, lengthscale=3.0),
        num_inducing=8, seed=0)
    lml0 = float(m.log_marginal_likelihood())
    fitted, _ = m.optimize(rounds=2, maxiter=20)
    lml1 = float(fitted.log_marginal_likelihood())
    assert lml1 > lml0, (lml0, lml1)
    p = np.asarray(fitted.predict(np.array([[-1.5], [1.5]])))
    assert p[0] < 0.3 and p[1] > 0.7


def test_conf_matrix_counts():
    """conf_matrix (GPy util/classification.py:6): exact count bookkeeping and
    the reference's (error, TP, FP, TN, FN) return order."""
    import numpy as np

    from gaussian_process_optimization_tpu.utils.classification import conf_matrix

    p = np.array([0.9, 0.8, 0.4, 0.2, 0.6, 0.1])
    labels = np.array([1, 0, 1, 0, 1, 1])
    err, t1, f1, t0, f0 = conf_matrix(p, labels, show=False)
    # decisions: 1,1,0,0,1,0 -> true1 {0,4}, false1 {1}, true0 {3}, false0 {2,5}
    assert (t1, f1, t0, f0) == (2, 1, 1, 2)
    np.testing.assert_allclose(err, 3 / 6)
    # perfect classifier
    err, t1, f1, t0, f0 = conf_matrix(labels.astype(float), labels, show=False)
    assert err == 0.0 and t1 == 4 and t0 == 2 and f1 == 0 and f0 == 0


def test_sparse_uncertain_input_zero_variance_matches_certain(rng):
    """SparseGPClassificationUncertainInput (sparse_gp_classification.py:103):
    as X_variance -> 0 the psi statistics collapse to the plain kernel matrices
    (psi1 -> Kmn^T, psi2n -> kmn kmn^T, psi0 -> Kdiag), so the model must match
    SparseGPClassification with the same Z."""
    from gaussian_process_optimization_tpu.models.classification import (
        SparseGPClassificationUncertainInput,
    )

    X, y = _toy(rng, n=40)
    k = kern.RBF.create(1, variance=2.0, lengthscale=0.8)
    Z = X[::4].copy()
    certain = SparseGPClassification.create(X, y, kernel=k, Z=Z, max_sweeps=200)
    uncertain = SparseGPClassificationUncertainInput.create(
        X, np.full_like(X, 1e-10), y, kernel=k, Z=Z, max_sweeps=200)
    lml_c = float(certain.log_marginal_likelihood())
    lml_u = float(uncertain.log_marginal_likelihood())
    np.testing.assert_allclose(lml_u, lml_c, rtol=1e-4)
    Xs = np.array([[-1.0], [0.0], [1.0]])
    np.testing.assert_allclose(np.asarray(uncertain.predict(Xs)),
                               np.asarray(certain.predict(Xs)), atol=1e-4)


def test_sparse_uncertain_input_variance_softens(rng):
    """With substantial input noise the classifier must still separate the
    classes but with less extreme probabilities than the certain-input model
    (uncertainty widens the effective likelihood)."""
    from gaussian_process_optimization_tpu.models.classification import (
        SparseGPClassificationUncertainInput,
    )

    X, y = _toy(rng, n=60)
    k = kern.RBF.create(1, variance=3.0, lengthscale=0.8)
    Z = X[::6].copy()
    m = SparseGPClassificationUncertainInput.create(
        X, np.full_like(X, 0.25), y, kernel=k, Z=Z, max_sweeps=200)
    assert np.isfinite(float(m.log_marginal_likelihood()))
    p = np.asarray(m.predict(np.array([[-1.5], [1.5]])))
    assert p[0] < 0.5 < p[1]
