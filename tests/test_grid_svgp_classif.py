"""Grid (Kronecker) GP vs dense exact GP, and SVGP classification."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gaussian_process_optimization_tpu.kernels as kern
from gaussian_process_optimization_tpu.models.gp import GPRegression
from gaussian_process_optimization_tpu.models.gp_grid import GPGridRegression


def test_grid_matches_dense(rng):
    """Kronecker inference on a 2-D grid must match the dense GP with the product
    kernel exactly (same model, different algebra — like GPy gp_grid)."""
    a1 = np.linspace(0, 3, 8)
    a2 = np.linspace(-1, 1, 6)
    A1, A2 = np.meshgrid(a1, a2, indexing="ij")
    Xfull = np.stack([A1.ravel(), A2.ravel()], 1)
    F = np.sin(Xfull[:, 0]) * np.cos(2 * Xfull[:, 1])
    Y = F + 0.05 * rng.standard_normal(F.shape)

    k1 = kern.RBF.create(1, variance=1.3, lengthscale=0.9)
    k2 = kern.Matern32.create(1, variance=1.0, lengthscale=0.7)
    noise = 0.04

    grid = GPGridRegression.create([a1, a2], Y, [k1, k2], noise_var=noise)

    k1f = kern.RBF.create(1, variance=1.3, lengthscale=0.9, active_dims=(0,))
    k2f = kern.Matern32.create(1, variance=1.0, lengthscale=0.7, active_dims=(1,))
    dense = GPRegression.create(Xfull, Y[:, None], kernel=k1f * k2f, noise_var=noise)

    np.testing.assert_allclose(
        float(grid.log_marginal_likelihood()), float(dense.log_marginal_likelihood()),
        rtol=1e-8,
    )
    Xs = rng.uniform([0, -1], [3, 1], size=(9, 2))
    mu_g, var_g = grid.predict(jnp.asarray(Xs))
    mu_d, var_d = dense.predict(jnp.asarray(Xs))
    np.testing.assert_allclose(np.asarray(mu_g), np.asarray(mu_d), rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(var_g), np.asarray(var_d), rtol=1e-5, atol=1e-8)


def test_svgp_classification(rng):
    from gaussian_process_optimization_tpu.models.likelihoods import Bernoulli
    from gaussian_process_optimization_tpu.models.svgp import SVGP, fit_svgp

    X = np.concatenate([rng.uniform(-2, -0.2, 40), rng.uniform(0.2, 2, 40)])[:, None]
    y = (X[:, 0] > 0).astype(float)[:, None]
    m = SVGP.create(X, y, kernel=kern.RBF.create(1, variance=3.0), num_inducing=12,
                    likelihood=Bernoulli())
    elbo0 = float(m.elbo(jnp.asarray(X), jnp.asarray(y)))
    fitted, _ = fit_svgp(m, X, y, num_steps=400, batch_size=40, learning_rate=5e-2,
                         key=jax.random.PRNGKey(0))
    elbo1 = float(fitted.elbo(jnp.asarray(X), jnp.asarray(y)))
    assert elbo1 > elbo0
    p, _ = fitted.predict(np.array([[-1.5], [1.5]]))
    assert float(p[0, 0]) < 0.25 and float(p[1, 0]) > 0.75
