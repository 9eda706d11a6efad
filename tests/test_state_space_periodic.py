"""Periodic / quasi-periodic / sum state-space GPs vs the dense O(N^3) GP.

The state-space form is the same model (to harmonic truncation for the periodic
part), so LML and predictions must match the dense computation — the consistency
pattern of tests/test_likelihoods_laplace.py::test_state_space_matches_dense,
extended to the new SDE forms (VERDICT round-1 item 7; reference:
GPy/GPy/kern/src/sde_standard_periodic.py + state_space_main.py combinations).
"""
import jax.numpy as jnp
import numpy as np
import pytest

import gaussian_process_optimization_tpu.kernels as kern
from gaussian_process_optimization_tpu.models.gp import GPRegression
from gaussian_process_optimization_tpu.models.state_space import (
    StateSpaceGP,
    _bessel_iv_series,
)


def _toy(rng, n=40):
    t = np.sort(rng.uniform(0, 6, n))
    y = np.sin(2 * np.pi * t / 1.5) + 0.1 * rng.standard_normal(n)
    return t[:, None], y[:, None]


def test_bessel_series_matches_scipy():
    from scipy.special import iv

    z = jnp.asarray(1.7)
    ours = np.asarray(_bessel_iv_series(9, z))
    ref = iv(np.arange(9), 1.7)
    np.testing.assert_allclose(ours, ref, rtol=1e-10)


def test_periodic_matches_dense(rng):
    X, Y = _toy(rng)
    var, ls, per, noise = 1.3, 1.0, 1.5, 0.05
    ss = StateSpaceGP.create(X, Y, family="periodic", variance=var,
                             lengthscale=ls, period=per, noise_var=noise, order=10)
    k = kern.StandardPeriodic.create(1, variance=var, period=per, lengthscale=ls)
    dense = GPRegression.create(X, Y, kernel=k, noise_var=noise)
    lml_ss = float(ss.log_marginal_likelihood())
    lml_d = float(dense.log_marginal_likelihood())
    # exact up to the harmonic truncation (order 10 at l=1: < 1e-8 relative)
    # and the dense path's 1e-8 noise floor
    np.testing.assert_allclose(lml_ss, lml_d, rtol=1e-6)

    Xs = np.linspace(0.3, 5.7, 9)[:, None]
    mu_ss, var_ss = ss.predict(jnp.asarray(Xs))
    mu_d, var_d = dense.predict(jnp.asarray(Xs))
    np.testing.assert_allclose(np.asarray(mu_ss), np.asarray(mu_d), atol=1e-6)
    np.testing.assert_allclose(np.asarray(var_ss), np.asarray(var_d), rtol=1e-5)


@pytest.mark.parametrize("damp", ["matern12", "matern32"])
def test_quasiperiodic_matches_dense(damp, rng):
    X, Y = _toy(rng, n=35)
    var, ls, per, ls_damp, noise = 1.1, 0.9, 1.5, 3.0, 0.05
    ss = StateSpaceGP.create(
        X, Y, family=f"quasiperiodic_{damp}", variance=var, lengthscale=ls,
        period=per, lengthscale_damp=ls_damp, noise_var=noise, order=10,
    )
    kp = kern.StandardPeriodic.create(1, variance=var, period=per, lengthscale=ls)
    km = (kern.OU if damp == "matern12" else kern.Matern32).create(
        1, variance=1.0, lengthscale=ls_damp
    )
    dense = GPRegression.create(X, Y, kernel=kern.Prod(parts=(kp, km)),
                                noise_var=noise)
    np.testing.assert_allclose(
        float(ss.log_marginal_likelihood()),
        float(dense.log_marginal_likelihood()), rtol=1e-6,
    )
    Xs = np.linspace(0.5, 5.5, 7)[:, None]
    mu_ss, var_ss = ss.predict(jnp.asarray(Xs))
    mu_d, var_d = dense.predict(jnp.asarray(Xs))
    np.testing.assert_allclose(np.asarray(mu_ss), np.asarray(mu_d), atol=1e-6)
    np.testing.assert_allclose(np.asarray(var_ss), np.asarray(var_d), rtol=1e-5)


def test_sum_kernel_matches_dense(rng):
    """family tuple -> block-diagonal sum: periodic + Matern-3/2."""
    X, Y = _toy(rng, n=30)
    noise = 0.08
    ss = StateSpaceGP.create(
        X, Y, family=("periodic", "matern32"),
        variance=(0.8, 0.5), lengthscale=(1.0, 2.0), period=(1.5, 1.0),
        noise_var=noise, order=9,
    )
    kp = kern.StandardPeriodic.create(1, variance=0.8, period=1.5, lengthscale=1.0)
    km = kern.Matern32.create(1, variance=0.5, lengthscale=2.0)
    dense = GPRegression.create(X, Y, kernel=kern.Add(parts=(kp, km)),
                                noise_var=noise)
    np.testing.assert_allclose(
        float(ss.log_marginal_likelihood()),
        float(dense.log_marginal_likelihood()), rtol=1e-6,
    )
    Xs = np.linspace(0.5, 5.5, 6)[:, None]
    mu_ss, var_ss = ss.predict(jnp.asarray(Xs))
    mu_d, var_d = dense.predict(jnp.asarray(Xs))
    np.testing.assert_allclose(np.asarray(mu_ss), np.asarray(mu_d), atol=1e-6)
    np.testing.assert_allclose(np.asarray(var_ss), np.asarray(var_d), rtol=1e-5)


def test_from_kernel_bridge_matches_dense(rng):
    """The sde_* bridge: from_kernel(StandardPeriodic + Matern32) == dense GP
    with the same Add kernel."""
    from gaussian_process_optimization_tpu.models.state_space import from_kernel

    X, Y = _toy(rng, n=28)
    kp = kern.StandardPeriodic.create(1, variance=0.7, period=1.5, lengthscale=1.1)
    km = kern.Matern32.create(1, variance=0.4, lengthscale=1.8)
    ss = from_kernel(kern.Add(parts=(kp, km)), X, Y, noise_var=0.07, order=9)
    dense = GPRegression.create(X, Y, kernel=kern.Add(parts=(kp, km)),
                                noise_var=0.07)
    np.testing.assert_allclose(
        float(ss.log_marginal_likelihood()),
        float(dense.log_marginal_likelihood()), rtol=1e-6,
    )
    # quasi-periodic product bridge
    ss2 = from_kernel(kern.Prod(parts=(kp, km)), X, Y, noise_var=0.07, order=9)
    dense2 = GPRegression.create(X, Y, kernel=kern.Prod(parts=(kp, km)),
                                 noise_var=0.07)
    np.testing.assert_allclose(
        float(ss2.log_marginal_likelihood()),
        float(dense2.log_marginal_likelihood()), rtol=1e-6,
    )


def test_matern_families_still_match_dense(rng):
    """Regression guard: the refactor must not change the Matern forms."""
    X, Y = _toy(rng, n=25)
    for family, kcls in (("matern12", kern.OU), ("matern52", kern.Matern52)):
        ss = StateSpaceGP.create(X, Y, family=family, variance=1.2,
                                 lengthscale=0.8, noise_var=0.1)
        dense = GPRegression.create(
            X, Y, kernel=kcls.create(1, variance=1.2, lengthscale=0.8),
            noise_var=0.1,
        )
        np.testing.assert_allclose(
            float(ss.log_marginal_likelihood()),
            float(dense.log_marginal_likelihood()), rtol=1e-6,
        )
