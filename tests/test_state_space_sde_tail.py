"""The sde_* family tail: White, Bias, Brownian, Linear, RBF spectral form.

Each is the SAME model as the dense O(N^3) GP with the corresponding kernel
(exactly, or to spectral order for RBF), so LML and predictions must match —
the consistency pattern of tests/test_state_space_periodic.py.

Reference: GPy/GPy/kern/src/sde_static.py (sde_White:13, sde_Bias:61),
sde_brownian.py:13, sde_linear.py:12, sde_stationary.py (sde_RBF:20).
"""
import jax.numpy as jnp
import numpy as np
import pytest

import gaussian_process_optimization_tpu.kernels as kern
from gaussian_process_optimization_tpu.models.gp import GPRegression
from gaussian_process_optimization_tpu.models.state_space import (
    StateSpaceGP,
    from_kernel,
)


def _toy(rng, n=30, lo=0.2, hi=4.0):
    t = np.sort(rng.uniform(lo, hi, n))
    y = np.sin(1.7 * t) + 0.1 * rng.standard_normal(n)
    return t[:, None], y[:, None]


def _check_match(ss, dense, Xs, rtol_lml=1e-8, atol_mu=1e-8, rtol_var=1e-7):
    lml_ss = float(ss.log_marginal_likelihood())
    lml_d = float(dense.log_marginal_likelihood())
    np.testing.assert_allclose(lml_ss, lml_d, rtol=rtol_lml)
    mu_ss, var_ss = ss.predict(jnp.asarray(Xs))
    mu_d, var_d = dense.predict(jnp.asarray(Xs))
    np.testing.assert_allclose(np.asarray(mu_ss), np.asarray(mu_d),
                               atol=atol_mu)
    np.testing.assert_allclose(np.asarray(var_ss), np.asarray(var_d),
                               rtol=rtol_var)


def test_white_matches_dense(rng):
    X, Y = _toy(rng)
    ss = StateSpaceGP.create(X, Y, family="white", variance=0.7, noise_var=0.05)
    dense = GPRegression.create(
        X, Y, kernel=kern.White.create(1, variance=0.7), noise_var=0.05)
    Xs = np.linspace(0.5, 3.5, 7)[:, None]
    _check_match(ss, dense, Xs, rtol_lml=1e-6, atol_mu=1e-6, rtol_var=1e-5)


def test_bias_matches_dense(rng):
    X, Y = _toy(rng)
    ss = StateSpaceGP.create(X, Y, family="bias", variance=1.4, noise_var=0.1)
    dense = GPRegression.create(
        X, Y, kernel=kern.Bias.create(1, variance=1.4), noise_var=0.1)
    Xs = np.linspace(0.5, 3.5, 7)[:, None]
    _check_match(ss, dense, Xs, rtol_lml=1e-6, atol_mu=1e-6, rtol_var=1e-5)


def test_brownian_matches_dense(rng):
    X, Y = _toy(rng)  # strictly positive times
    ss = StateSpaceGP.create(X, Y, family="brownian", variance=0.9,
                             noise_var=0.05)
    dense = GPRegression.create(
        X, Y, kernel=kern.Brownian.create(variance=0.9), noise_var=0.05)
    Xs = np.linspace(0.3, 3.8, 9)[:, None]
    _check_match(ss, dense, Xs, rtol_lml=1e-6, atol_mu=1e-6, rtol_var=1e-5)


def test_linear_matches_dense(rng):
    X, Y = _toy(rng)
    ss = StateSpaceGP.create(X, Y, family="linear", variance=0.8, period=0.0,
                             noise_var=0.05)
    dense = GPRegression.create(
        X, Y, kernel=kern.Linear.create(1, variances=0.8), noise_var=0.05)
    Xs = np.linspace(0.3, 3.8, 9)[:, None]
    _check_match(ss, dense, Xs, rtol_lml=1e-6, atol_mu=1e-6, rtol_var=1e-5)


def test_rbf_spectral_matches_dense(rng):
    X, Y = _toy(rng)
    var, ls, noise = 1.2, 1.1, 0.05
    ss = StateSpaceGP.create(X, Y, family="rbf", variance=var, lengthscale=ls,
                             noise_var=noise, order=10)
    dense = GPRegression.create(
        X, Y, kernel=kern.RBF.create(1, variance=var, lengthscale=ls),
        noise_var=noise)
    # spectral approximation (sde_stationary.py:76 notes l in (0.8,8) for N=10;
    # measured kernel error: 3.6e-3 at N=6, 1.5e-4 at N=10, 3.4e-5 at N=12)
    lml_d = float(dense.log_marginal_likelihood())
    lml_10 = float(ss.log_marginal_likelihood())
    np.testing.assert_allclose(lml_10, lml_d, atol=0.05)
    ss12 = StateSpaceGP.create(X, Y, family="rbf", variance=var, lengthscale=ls,
                               noise_var=noise, order=12)
    lml_12 = float(ss12.log_marginal_likelihood())
    assert abs(lml_12 - lml_d) < abs(lml_10 - lml_d)  # converges with order
    Xs = np.linspace(0.4, 3.7, 9)[:, None]
    mu_ss, var_ss = ss12.predict(jnp.asarray(Xs))
    mu_d, var_d = dense.predict(jnp.asarray(Xs))
    np.testing.assert_allclose(np.asarray(mu_ss), np.asarray(mu_d), atol=5e-3)
    np.testing.assert_allclose(np.asarray(var_ss), np.asarray(var_d), rtol=2e-2)


def test_brownian_plus_matern_sum_matches_dense(rng):
    """A non-stationary + stationary sum: the shared t=0 clock start must leave
    the stationary component invariant."""
    X, Y = _toy(rng, n=25)
    ss = StateSpaceGP.create(
        X, Y, family=("brownian", "matern32"),
        variance=np.array([0.6, 1.1]), lengthscale=np.array([1.0, 0.8]),
        noise_var=0.05)
    k = kern.Add(parts=(kern.Brownian.create(variance=0.6),
                        kern.Matern32.create(1, variance=1.1, lengthscale=0.8)))
    dense = GPRegression.create(X, Y, kernel=k, noise_var=0.05)
    Xs = np.linspace(0.3, 3.8, 7)[:, None]
    _check_match(ss, dense, Xs, rtol_lml=1e-6, atol_mu=1e-6, rtol_var=1e-5)


@pytest.mark.parametrize("kfactory, fam", [
    (lambda: kern.White.create(1, variance=0.5), "white"),
    (lambda: kern.Bias.create(1, variance=0.5), "bias"),
    (lambda: kern.Brownian.create(variance=0.5), "brownian"),
    (lambda: kern.Linear.create(1, variances=0.5), "linear"),
    (lambda: kern.RBF.create(1, variance=0.5, lengthscale=1.3), "rbf"),
])
def test_from_kernel_bridge_tail(kfactory, fam, rng):
    X, Y = _toy(rng, n=12)
    ss = from_kernel(kfactory(), X, Y, noise_var=0.1, order=8)
    assert ss.family == fam
    assert np.isfinite(float(ss.log_marginal_likelihood()))


def test_rbf_spectral_gradients_finite(rng):
    """The companion/Lyapunov construction stays differentiable in
    (variance, lengthscale)."""
    import jax

    X, Y = _toy(rng, n=15)

    def lml(v, l):
        ss = StateSpaceGP.create(X, Y, family="rbf", variance=v, lengthscale=l,
                                 noise_var=0.1, order=8)
        return ss.log_marginal_likelihood()

    g = jax.grad(lml, argnums=(0, 1))(1.2, 1.1)
    assert all(np.isfinite(float(x)) for x in g)
    # finite-difference check on the lengthscale
    eps = 1e-5
    fd = (float(lml(1.2, 1.1 + eps)) - float(lml(1.2, 1.1 - eps))) / (2 * eps)
    np.testing.assert_allclose(float(g[1]), fd, rtol=1e-4)


def test_state_space_packs_and_fits():
    """Regression (round-2 review): noise_variance must be positivity-constrained
    in the packer and a linear-family t0=0 (riding the 'period' slot) must pack
    FINITE — POSITIVE.inverse(0) used to be -inf in f32, NaN-ing every fit."""
    import jax
    from gaussian_process_optimization_tpu.models import fit as fit_mod
    from gaussian_process_optimization_tpu.models.state_space import StateSpaceGP

    t = np.linspace(0, 5, 40)[:, None]
    y = np.sin(t) + 0.1 * np.random.default_rng(0).standard_normal(t.shape)

    m = StateSpaceGP.create(t, y, family="matern32", noise_var=0.1)
    fitter = fit_mod.Fitter(m, num_restarts=2, maxiter=15, tol=0.0)
    fitted, res = fitter(m, jax.random.PRNGKey(0))
    assert np.isfinite(float(jnp.min(res.f)))
    assert float(fitted.noise_variance) > 0.0  # constrained, cannot go negative
    assert float(fitted.log_marginal_likelihood()) >= float(m.log_marginal_likelihood())

    # linear family: t0 = 0 rides the 'period' slot; the packed vector must be finite
    lin = StateSpaceGP.create(t, y, family="linear", period=0.0)
    from gaussian_process_optimization_tpu.models.parameters import make_packer

    u = make_packer(lin).pack(lin)
    assert np.all(np.isfinite(np.asarray(u))), u
