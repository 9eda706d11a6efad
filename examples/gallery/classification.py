"""Classification gallery — mirrors GPy/GPy/examples/classification.py (7 demos).

EP probit classification (dense and sparse EPDTC), Laplace inference, and the
uncertain-input sparse classifier. The `oil` and `crescent_data` demos use
synthetic stand-ins for the downloaded datasets (zero egress) with the same
model exercise.
"""
import numpy as np

import gaussian_process_optimization_tpu.kernels as kern
from gaussian_process_optimization_tpu.models.classification import (
    GPClassification,
    SparseGPClassification,
    SparseGPClassificationUncertainInput,
)

default_seed = 10000


def _two_moons(n, seed, spread=0.25):
    rng = np.random.default_rng(seed)
    t = rng.uniform(0, np.pi, n)
    upper = np.stack([np.cos(t), np.sin(t)], 1)
    lower = np.stack([1 - np.cos(t), 0.5 - np.sin(t)], 1)
    X = np.vstack([upper, lower]) + spread * rng.standard_normal((2 * n, 2))
    y = np.hstack([np.ones(n), -np.ones(n)])
    return X, y


def oil(num_inducing=15, max_iters=40, kernel=None, optimize=True, plot=False):
    """GPy examples/classification.py:10 — sparse EP classification on the oil
    flow data (synthetic stand-in: two overlapping 12-D Gaussian classes)."""
    rng = np.random.default_rng(0)
    n = 60
    X = np.vstack([rng.standard_normal((n, 12)) - 0.7,
                   rng.standard_normal((n, 12)) + 0.7])
    y = np.hstack([np.ones(n), -np.ones(n)])
    m = SparseGPClassification.create(
        X, y, kernel=kernel or kern.RBF.create(12), num_inducing=num_inducing)
    if optimize:
        m, _ = m.optimize(rounds=2, maxiter=max_iters)
    p = np.asarray(m.predict(X))
    acc = np.mean((p > 0.5) == (y > 0))
    assert acc > 0.7, f"oil demo accuracy {acc}"
    return m


def toy_linear_1d_classification(seed=default_seed, optimize=True, plot=False):
    """GPy examples/classification.py:43 — 1-D EP probit classification."""
    rng = np.random.default_rng(seed)
    X = np.vstack([rng.normal(1, 0.5, (25, 1)), rng.normal(3, 0.5, (25, 1))])
    y = np.hstack([-np.ones(25), np.ones(25)])
    m = GPClassification.create(X, y)
    if optimize:
        m, _ = m.optimize(rounds=2, maxiter=30)
    if plot:
        from gaussian_process_optimization_tpu.utils.plotting_library import (
            plot_mean)

        plot_mean(m, filename="toy_linear_1d_classification.png")
    return m


def toy_linear_1d_classification_laplace(seed=default_seed, optimize=True,
                                         plot=False):
    """GPy examples/classification.py:78 — the Laplace-inference variant."""
    from gaussian_process_optimization_tpu.models import fit as fit_mod
    from gaussian_process_optimization_tpu.models.laplace import GPLaplace
    from gaussian_process_optimization_tpu.models.likelihoods import Bernoulli

    rng = np.random.default_rng(seed)
    X = np.vstack([rng.normal(1, 0.5, (25, 1)), rng.normal(3, 0.5, (25, 1))])
    y = np.hstack([-np.ones(25), np.ones(25)])
    m = GPLaplace.create(X, y, kernel=kern.RBF.create(1), likelihood=Bernoulli())
    if optimize:
        import jax

        m, _ = fit_mod.fit(m, num_restarts=1, maxiter=30,
                           key=jax.random.PRNGKey(0))
    assert np.isfinite(float(m.log_marginal_likelihood()))
    return m


def sparse_toy_linear_1d_classification(num_inducing=10, seed=default_seed,
                                        optimize=True, plot=False):
    """GPy examples/classification.py:117 — sparse EPDTC on the 1-D toy."""
    rng = np.random.default_rng(seed)
    X = np.vstack([rng.normal(1, 0.5, (30, 1)), rng.normal(3, 0.5, (30, 1))])
    y = np.hstack([-np.ones(30), np.ones(30)])
    m = SparseGPClassification.create(X, y, num_inducing=num_inducing)
    if optimize:
        m, _ = m.optimize(rounds=2, maxiter=30)
    return m


def sparse_toy_linear_1d_classification_uncertain_input(
        num_inducing=10, seed=default_seed, optimize=True, plot=False):
    """GPy examples/classification.py:150 — uncertain (noisy) inputs through
    the psi-statistics EPDTC path."""
    rng = np.random.default_rng(seed)
    X = np.vstack([rng.normal(1, 0.5, (30, 1)), rng.normal(3, 0.5, (30, 1))])
    X_var = 0.04 * np.ones_like(X)
    y = np.hstack([-np.ones(30), np.ones(30)])
    m = SparseGPClassificationUncertainInput.create(
        X, X_var, y, num_inducing=num_inducing)
    if optimize:
        m, _ = m.optimize(rounds=2, maxiter=30)
    return m


def toy_heaviside(seed=default_seed, max_iters=30, optimize=True, plot=False):
    """GPy examples/classification.py:186 — EP with a step (Heaviside-like)
    decision boundary; the reference uses EP for its robustness here."""
    rng = np.random.default_rng(seed)
    X = rng.uniform(-2, 2, (60, 1))
    y = np.where(X[:, 0] > 0.3, 1.0, -1.0)
    flip = rng.uniform(size=60) < 0.05
    y = np.where(flip, -y, y)
    m = GPClassification.create(X, y, kernel=kern.Matern52.create(1))
    if optimize:
        m, _ = m.optimize(rounds=2, maxiter=max_iters)
    return m


def crescent_data(model_type="Full", num_inducing=10, seed=default_seed,
                  kernel=None, optimize=True, plot=False):
    """GPy examples/classification.py:225 — the two-crescents (two-moons)
    dataset, dense or sparse by `model_type` ('Full' | 'DTC')."""
    X, y = _two_moons(30, seed)
    if model_type == "Full":
        m = GPClassification.create(X, y, kernel=kernel or kern.RBF.create(2))
    else:
        m = SparseGPClassification.create(
            X, y, kernel=kernel or kern.RBF.create(2),
            num_inducing=num_inducing)
    if optimize:
        m, _ = m.optimize(rounds=2, maxiter=30)
    p = np.asarray(m.predict(X))
    acc = np.mean((p > 0.5) == (y > 0))
    assert acc > 0.75, f"crescent demo accuracy {acc}"
    return m
