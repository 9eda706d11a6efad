"""ODE output-kernel family (GPy kern/src/ODE_UY.py, ODE_UYC.py, ODE_t.py,
ODE_st.py).

Consistency strategy (CLAUDE.md): every closed form is checked against an
independent computation —
- ODE_UY cross/output blocks vs direct quadrature of the causal filter
  y(t) = sqrt(2 ly Vy) int_{-inf}^t e^{-ly(t-s)} U(s) ds over the Matern-3/2
  prior on U;
- ODE_t / ODE_st blocks vs autodiff-applied ODE operators on the base RBF
  (the blocks ARE operator images, so jax.grad must reproduce them);
- PSD + GP-regression smoke tests on mixed-index designs.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gaussian_process_optimization_tpu.kernels as kern


def _mixed_X(rng, n_u=6, n_y=7, lo=0.0, hi=4.0):
    tu = np.sort(rng.uniform(lo, hi, n_u))
    ty = np.sort(rng.uniform(lo, hi, n_y))
    X = np.concatenate([
        np.stack([tu, np.zeros_like(tu)], 1),
        np.stack([ty, np.ones_like(ty)], 1),
    ])
    return X, n_u


# --------------------------------------------------------------------- ODE_UY
def _uy_quadrature_blocks(taus, Vu, Vy, lU, lY):
    from scipy import integrate

    lu = np.sqrt(3) / lU
    ly = 1.0 / lY
    ku = lambda t: Vu * (1 + lu * np.abs(t)) * np.exp(-lu * np.abs(t))
    kappa = np.sqrt(2 * ly * Vy)

    def kyy(tau):
        f = lambda q, p: np.exp(-ly * (p + q)) * ku(tau + p - q)
        v, _ = integrate.dblquad(f, 0, 50, 0, 50, epsabs=1e-11, epsrel=1e-11)
        return kappa ** 2 * v

    def kyu(tau):  # Cov(y(t), u(t')), tau = t - t'
        f = lambda p: np.exp(-ly * p) * ku(tau - p)
        v, _ = integrate.quad(f, 0, 60, limit=300)
        return kappa * v

    return np.array([kyy(t) for t in taus]), np.array([kyu(t) for t in taus])


def test_ode_uy_matches_quadrature():
    Vu, Vy, lU, lY = 1.3, 0.7, 1.1, 1.6
    k = kern.ODE_UY.create(variance_U=Vu, variance_Y=Vy,
                           lengthscale_U=lU, lengthscale_Y=lY)
    taus = np.array([0.0, 0.4, 1.2, -0.8, -2.0])
    kyy_q, kyu_q = _uy_quadrature_blocks(taus, Vu, Vy, lU, lY)

    # build X pairs: row = (t, idx). Y at t=tau vs Y at 0; Y at tau vs U at 0.
    Xy = np.stack([taus, np.ones_like(taus)], 1)
    Y0 = np.array([[0.0, 1.0]])
    U0 = np.array([[0.0, 0.0]])
    kyy_ours = np.asarray(k.K(jnp.asarray(Xy), jnp.asarray(Y0)))[:, 0]
    kyu_ours = np.asarray(k.K(jnp.asarray(Xy), jnp.asarray(U0)))[:, 0]
    np.testing.assert_allclose(kyy_ours, kyy_q, rtol=1e-8)
    np.testing.assert_allclose(kyu_ours, kyu_q, rtol=1e-7)

    # U block is plain Matern-3/2
    Xu = np.stack([taus, np.zeros_like(taus)], 1)
    kuu = np.asarray(k.K(jnp.asarray(Xu), jnp.asarray(U0)))[:, 0]
    m32 = kern.Matern32.create(1, variance=Vu, lengthscale=lU)
    ref = np.asarray(m32.K(jnp.asarray(taus[:, None]),
                           jnp.asarray([[0.0]])))[:, 0]
    np.testing.assert_allclose(kuu, ref, rtol=1e-10)


def test_ode_uy_psd_symmetric_kdiag(rng):
    k = kern.ODE_UY.create(variance_U=1.2, variance_Y=0.9,
                           lengthscale_U=0.8, lengthscale_Y=1.3)
    X, _ = _mixed_X(rng)
    K = np.asarray(k.K(jnp.asarray(X)))
    np.testing.assert_allclose(K, K.T, atol=1e-12)
    w = np.linalg.eigvalsh(K)
    assert w.min() > -1e-9
    np.testing.assert_allclose(np.diag(K), np.asarray(k.Kdiag(jnp.asarray(X))),
                               rtol=1e-10)


def test_ode_uy_gradients_finite(rng):
    X, _ = _mixed_X(rng, 4, 4)

    def tr(vU, vY, lU, lY):
        k = kern.ODE_UY.create(variance_U=vU, variance_Y=vY,
                               lengthscale_U=lU, lengthscale_Y=lY)
        return jnp.sum(k.K(jnp.asarray(X)))

    g = jax.grad(tr, argnums=(0, 1, 2, 3))(1.2, 0.9, 0.8, 1.3)
    assert all(np.isfinite(float(x)) for x in g)


def test_ode_uyc_bias_on_uu_only(rng):
    X, n_u = _mixed_X(rng)
    k0 = kern.ODE_UY.create(variance_U=1.2, variance_Y=0.9,
                            lengthscale_U=0.8, lengthscale_Y=1.3)
    kc = kern.ODE_UYC.create(variance_U=1.2, variance_Y=0.9,
                             lengthscale_U=0.8, lengthscale_Y=1.3, ubias=0.5)
    K0 = np.asarray(k0.K(jnp.asarray(X)))
    Kc = np.asarray(kc.K(jnp.asarray(X)))
    diff = Kc - K0
    np.testing.assert_allclose(diff[:n_u, :n_u], 0.5, atol=1e-12)
    np.testing.assert_allclose(diff[n_u:, :], 0.0, atol=1e-12)
    np.testing.assert_allclose(diff[:, n_u:], 0.0, atol=1e-12)
    np.testing.assert_allclose(np.diag(Kc), np.asarray(kc.Kdiag(jnp.asarray(X))),
                               rtol=1e-10)


# ------------------------------------------------------------------ ODE_t/st
def test_ode_t_blocks_are_operator_images(rng):
    vyt, lYt, ub = 1.4, 1.2, 0.3
    k = kern.ODE_t.create(variance_Yt=vyt, lengthscale_Yt=lYt, ubias=ub)
    lyt = 1.0 / (2.0 * lYt)
    base = lambda t, s: vyt * jnp.exp(-lyt * (t - s) ** 2)
    # U = (1 + d/dt) Y  => K_yu(t,s) = (1 + d/ds) k, K_uu = (1+d/dt)(1+d/ds) k
    k_yu = lambda t, s: base(t, s) + jax.grad(base, 1)(t, s)
    k_uu = lambda t, s: (base(t, s) + jax.grad(base, 0)(t, s)
                         + jax.grad(base, 1)(t, s)
                         + jax.grad(jax.grad(base, 0), 1)(t, s)) + ub
    ts = rng.uniform(0, 3, 5)
    ss = rng.uniform(0, 3, 5)
    for t, s in zip(ts, ss):
        Xy = jnp.asarray([[t, 0.0]])
        Xu_row = jnp.asarray([[t, 1.0]])
        Su = jnp.asarray([[s, 1.0]])
        np.testing.assert_allclose(float(k.K(Xy, Su)[0, 0]),
                                   float(k_yu(t, s)), rtol=1e-9)
        np.testing.assert_allclose(float(k.K(Xu_row, Su)[0, 0]),
                                   float(k_uu(t, s)), rtol=1e-9)


def test_ode_st_blocks_are_operator_images(rng):
    a, b, c = 0.6, 1.1, 0.8
    vyt, vyx, lYt, lYx = 1.3, 0.9, 1.4, 1.7
    k = kern.ODE_st.create(a=a, b=b, c=c, variance_Yt=vyt, variance_Yx=vyx,
                           lengthscale_Yt=lYt, lengthscale_Yx=lYx)
    lyt, lyx = 1 / (2 * lYt), 1 / (2 * lYx)
    base = lambda t, x, s, z: vyt * vyx * jnp.exp(-lyt * (t - s) ** 2
                                                  - lyx * (x - z) ** 2)

    def L2(f):  # operator on the second point: -a d^2/dz^2 + b d/ds + c
        d_s = jax.grad(f, 2)
        d_zz = jax.grad(jax.grad(f, 3), 3)
        return lambda t, x, s, z: (-a * d_zz(t, x, s, z) + b * d_s(t, x, s, z)
                                   + c * f(t, x, s, z))

    def L1(f):  # operator on the first point
        d_t = jax.grad(f, 0)
        d_xx = jax.grad(jax.grad(f, 1), 1)
        return lambda t, x, s, z: (-a * d_xx(t, x, s, z) + b * d_t(t, x, s, z)
                                   + c * f(t, x, s, z))

    k_yu = L2(base)
    k_uu = L1(L2(base))
    pts = rng.uniform(0, 2.5, (4, 4))
    for t, x, s, z in pts:
        Xy = jnp.asarray([[t, x, 0.0]])
        Xu = jnp.asarray([[t, x, 1.0]])
        Su = jnp.asarray([[s, z, 1.0]])
        Sy = jnp.asarray([[s, z, 0.0]])
        np.testing.assert_allclose(float(k.K(Xy, Su)[0, 0]),
                                   float(k_yu(t, x, s, z)), rtol=1e-8)
        np.testing.assert_allclose(float(k.K(Xu, Su)[0, 0]),
                                   float(k_uu(t, x, s, z)), rtol=1e-8)
        # cross-symmetry: K_uy(p, q) = K_yu(q, p)
        np.testing.assert_allclose(float(k.K(Xu, Sy)[0, 0]),
                                   float(k_yu(s, z, t, x)), rtol=1e-8)


def test_ode_st_psd(rng):
    k = kern.ODE_st.create(a=0.6, b=1.1, c=0.8)
    t = rng.uniform(0, 3, 10)
    x = rng.uniform(0, 3, 10)
    idx = (np.arange(10) % 2).astype(float)
    X = jnp.asarray(np.stack([t, x, idx], 1))
    K = np.asarray(k.K(X))
    np.testing.assert_allclose(K, K.T, atol=1e-10)
    assert np.linalg.eigvalsh(K).min() > -1e-8
    np.testing.assert_allclose(np.diag(K), np.asarray(k.Kdiag(X)), rtol=1e-9)


def test_ode_uy_gp_regression_smoke(rng):
    """Joint (U, Y) regression: observing U improves the Y posterior."""
    from gaussian_process_optimization_tpu.models.gp import GPRegression

    X, n_u = _mixed_X(rng, n_u=10, n_y=8)
    k = kern.ODE_UY.create(variance_U=1.0, variance_Y=1.0,
                           lengthscale_U=1.0, lengthscale_Y=1.0)
    Kfull = np.asarray(k.K(jnp.asarray(X)))
    L = np.linalg.cholesky(Kfull + 1e-10 * np.eye(len(X)))
    f = L @ rng.standard_normal(len(X))
    Y = (f + 0.05 * rng.standard_normal(len(X)))[:, None]
    m = GPRegression.create(X, Y, kernel=k, noise_var=0.05)
    assert np.isfinite(float(m.log_marginal_likelihood()))
    Xs = np.stack([np.linspace(0.5, 3.5, 6), np.ones(6)], 1)
    mu, var = m.predict(jnp.asarray(Xs))
    assert np.all(np.isfinite(np.asarray(mu)))
    assert np.all(np.asarray(var) > 0)
