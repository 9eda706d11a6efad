"""Kernel-zoo tail tests (VERDICT round-1 item 8): periodic-subspace Matern RKHS
kernels (GPy kern/src/periodic.py), the Integral kernel (integral.py), and the
GridRBF/gp_grid wiring (grid_kerns.py).

The periodic RKHS Gram matrices are validated against NUMERICAL QUADRATURE of
the defining RKHS inner products — an independent implementation, per the
project test policy."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gaussian_process_optimization_tpu.kernels as kern
from gaussian_process_optimization_tpu.kernels.periodic_rkhs import (
    PeriodicExponential,
    PeriodicMatern32,
    PeriodicMatern52,
)


def _numeric_gram(k, n_quad=20001):
    """RKHS Gram by quadrature: G_ij = c * int (L phi_i)(L phi_j) + boundary
    terms, with L the Matern operator. Uses autodiff for basis derivatives."""
    lower, upper = k.lower, k.upper
    xs = np.linspace(lower, upper, n_quad)
    dx = xs[1] - xs[0]
    alpha, omega, phi = k._basis()
    alpha, omega, phi = map(np.asarray, (alpha, omega, phi))
    l = float(k.lengthscale)
    s2 = float(k.variance)

    def basis(x, order=0):
        # (len(x), 2F): order-th derivative of alpha cos(omega x + phi)
        return (alpha * omega**order) * np.cos(
            np.outer(x, omega) + phi + order * np.pi / 2.0
        )

    w = np.full(n_quad, dx)
    w[0] = w[-1] = dx / 2.0  # trapezoid weights
    if isinstance(k, PeriodicExponential):
        Lphi = basis(xs) / l + basis(xs, 1)
        G = (l / (2 * s2)) * (Lphi.T @ (w[:, None] * Lphi))
        Fl = basis(np.array([lower]))[0][:, None]
        G += (Fl @ Fl.T) / s2
    elif isinstance(k, PeriodicMatern32):
        Lphi = (3 / l**2) * basis(xs) + (2 * np.sqrt(3) / l) * basis(xs, 1) \
            + basis(xs, 2)
        G = (l**3 / (12 * np.sqrt(3) * s2)) * (Lphi.T @ (w[:, None] * Lphi))
        Fl = basis(np.array([lower]))[0][:, None]
        F1l = basis(np.array([lower]), 1)[0][:, None]
        G += (Fl @ Fl.T) / s2 + (l**2 / (3 * s2)) * (F1l @ F1l.T)
    else:
        raise AssertionError
    return G


@pytest.mark.parametrize("cls", [PeriodicExponential, PeriodicMatern32])
def test_gram_matches_quadrature(cls):
    k = cls.create(variance=1.3, lengthscale=0.9, period=2.0, n_freq=4,
                   lower=0.0, upper=6.0)
    G_analytic = np.asarray(k._gram())
    G_numeric = _numeric_gram(k)
    # trapezoid error ~ dx^2 on an oscillatory integrand; entries are O(1)-O(30)
    np.testing.assert_allclose(G_analytic, G_numeric, rtol=1e-3, atol=1e-5)


@pytest.mark.parametrize("cls", [PeriodicExponential, PeriodicMatern32,
                                 PeriodicMatern52])
def test_periodic_rkhs_psd_and_periodic(cls, rng):
    k = cls.create(variance=1.0, lengthscale=1.2, period=1.5, n_freq=5,
                   lower=0.0, upper=6.0)
    X = rng.uniform(0, 6, (25, 1))
    K = np.asarray(k.K(jnp.asarray(X)))
    np.testing.assert_allclose(K, K.T, atol=1e-9)
    assert np.linalg.eigvalsh(K).min() > -1e-8
    # exact periodicity: shifting any input by the period leaves K unchanged
    K2 = np.asarray(k.K(jnp.asarray(X + 1.5), jnp.asarray(X)))
    np.testing.assert_allclose(K2, K, atol=1e-6)
    # gradient-consistency (project test policy): d sum(K)/d lengthscale finite
    g = jax.grad(lambda kk: jnp.sum(kk.K(jnp.asarray(X))))(k)
    assert np.isfinite(float(g.lengthscale))


def test_integral_kernel_matches_quadrature(rng):
    """k_xx(t,t') must equal the double integral of k_ff over [0,t]x[0,t'], and
    k_xf the single integral (integral.py:51-59)."""
    k = kern.Integral.create(variances=1.4, lengthscale=0.8)
    t_vals = [0.5, 1.1, 2.0]
    n = 2000
    for t in t_vals:
        for tp in t_vals:
            us = np.linspace(0, t, n)
            vs = np.linspace(0, tp, n)
            U, V = np.meshgrid(us, vs, indexing="ij")
            ff = np.exp(-((U - V) ** 2) / 0.8**2)
            num_xx = 1.4 * ff.sum() * (us[1] - us[0]) * (vs[1] - vs[0])
            if t == tp:
                got_xx = float(k.K(jnp.asarray([[t]]), None)[0, 0])
                np.testing.assert_allclose(got_xx, num_xx, rtol=5e-3)
            # k_xf: int_0^t k_ff(u, tp) du
            ff1 = np.exp(-((us - tp) ** 2) / 0.8**2)
            num_xf = 1.4 * ff1.sum() * (us[1] - us[0])
            got_xf = float(k.K(jnp.asarray([[t]]), jnp.asarray([[tp]]))[0, 0])
            np.testing.assert_allclose(got_xf, num_xf, rtol=5e-3)


def test_integral_limits_matches_quadrature(rng):
    """k_xx over windows [s,t]x[s',t'] must equal the double integral of k_ff
    (integral_limits.py:55-64); k_xf the single integral over [s,t]."""
    k = kern.IntegralLimits.create(variances=1.2, lengthscale=0.9)
    n = 1500
    cases = [((0.2, 1.5), (0.5, 2.2)), ((0.0, 1.0), (0.3, 0.9))]
    for (s, t), (sp, tp) in cases:
        us = np.linspace(s, t, n)
        vs = np.linspace(sp, tp, n)
        U, V = np.meshgrid(us, vs, indexing="ij")
        ff = np.exp(-((U - V) ** 2) / 0.9**2)
        num = 1.2 * np.trapezoid(np.trapezoid(ff, vs, axis=1), us)
        X = jnp.asarray([[t, s], [tp, sp]])
        got = float(k.K(X)[0, 1])
        np.testing.assert_allclose(got, num, rtol=5e-3)
        # cross: int_s^t k_ff(u, tq) du at a probe point tq
        tq = 0.8
        num_xf = 1.2 * np.trapezoid(np.exp(-((us - tq) ** 2) / 0.9**2), us)
        got_xf = float(k.K(jnp.asarray([[t, s]]), jnp.asarray([[tq, 0.0]]))[0, 0])
        np.testing.assert_allclose(got_xf, num_xf, rtol=5e-3)


def test_multidimensional_integral_limits_is_product(rng):
    k2 = kern.MultidimensionalIntegralLimits.create(4, variances=1.0,
                                                    lengthscale=[0.8, 1.1])
    k1a = kern.IntegralLimits.create(variances=1.0, lengthscale=0.8)
    k1b = kern.IntegralLimits.create(variances=1.0, lengthscale=1.1)
    Xs = rng.uniform(0, 2, (5, 4))
    # enforce t >= s per pair
    Xs = np.column_stack([
        np.maximum(Xs[:, 0], Xs[:, 1]), np.minimum(Xs[:, 0], Xs[:, 1]),
        np.maximum(Xs[:, 2], Xs[:, 3]), np.minimum(Xs[:, 2], Xs[:, 3]),
    ])
    X = jnp.asarray(Xs)
    K = np.asarray(k2.K(X))
    Ka = np.asarray(k1a.K(X[:, :2]))
    Kb = np.asarray(k1b.K(X[:, 2:]))
    np.testing.assert_allclose(K, Ka * Kb, rtol=1e-10)


def test_integral_kernel_psd_and_gp(rng):
    k = kern.Integral.create(variances=1.0, lengthscale=1.0)
    X = np.sort(rng.uniform(0.1, 3, 15))[:, None]
    K = np.asarray(k.K(jnp.asarray(X)))
    np.testing.assert_allclose(K, K.T, atol=1e-9)
    assert np.linalg.eigvalsh(K).min() > -1e-8


def test_gridrbf_gp_grid_gradients(rng):
    """GridRBF + gp_grid: the per-axis kernels are differentiable through the
    Kronecker LML (what grid_kerns.py's dKd_dVar/dKd_dLen provide by hand)."""
    from gaussian_process_optimization_tpu.models.gp_grid import GPGridRegression

    ax1 = np.linspace(0, 1, 6)[:, None]
    ax2 = np.linspace(0, 1, 5)[:, None]
    Y = rng.standard_normal((6, 5))
    m = GPGridRegression.create(
        [ax1, ax2], Y,
        kernels=[kern.GridRBF.create(1, variance=1.2, lengthscale=0.7),
                 kern.GridRBF.create(1, variance=1.0, lengthscale=0.4)],
        noise_var=0.1,
    )
    lml = float(m.log_marginal_likelihood())
    assert np.isfinite(lml)
    g = jax.grad(lambda mm: mm.log_marginal_likelihood())(m)
    for gk in g.kerns:
        assert np.isfinite(float(gk.variance)) and abs(float(gk.variance)) > 0
        assert np.isfinite(float(jnp.sum(gk.lengthscale)))
