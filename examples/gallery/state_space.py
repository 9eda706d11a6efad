"""State-space gallery — mirrors GPy/GPy/examples/state_space.py.

The O(N) Kalman-filter GP (models/state_space.py — `lax.scan` over the SDE
discretization, replacing the reference's 4.6k-LoC Cython state-space stack)
against the dense GP on the same kernel: near-identical posteriors, linear
scaling.
"""
import numpy as np

import gaussian_process_optimization_tpu.kernels as kern
from gaussian_process_optimization_tpu.models.gp import GPRegression
from gaussian_process_optimization_tpu.models.state_space import StateSpaceGP


def state_space_example(optimize=True, plot=False, max_iters=40, n=400):
    """GPy examples/state_space.py:7 — Matern32 state-space GP on a long 1-D
    series; check the filtered LML matches the dense GP on a subsample."""
    import jax

    from gaussian_process_optimization_tpu.models import fit as fit_mod

    rng = np.random.default_rng(0)
    X = np.sort(rng.uniform(0, 20, (n, 1)), axis=0)
    Y = (np.sin(X) + 0.3 * np.sin(3.1 * X)
         + 0.1 * rng.standard_normal(X.shape))
    m = StateSpaceGP.create(X, Y, family="matern32", variance=1.0,
                            lengthscale=1.0, noise_var=0.1)
    if optimize:
        m, _ = fit_mod.fit(m, num_restarts=1, maxiter=max_iters,
                           key=jax.random.PRNGKey(0))
    # consistency vs the dense GP at the fitted hyperparameters (small slice)
    idx = np.arange(0, n, 8)
    dense = GPRegression.create(
        X[idx], Y[idx],
        kernel=kern.Matern32.create(1, variance=float(m.variance),
                                    lengthscale=float(m.lengthscale)),
        noise_var=float(m.noise_variance))
    m_small = StateSpaceGP.create(
        X[idx], Y[idx], family="matern32", variance=float(m.variance),
        lengthscale=float(m.lengthscale),
        noise_var=float(m.noise_variance))
    lml_ss = float(m_small.log_marginal_likelihood())
    lml_dense = float(dense.log_marginal_likelihood())
    assert abs(lml_ss - lml_dense) < 1e-2 * max(1.0, abs(lml_dense)), (
        lml_ss, lml_dense)
    return m
