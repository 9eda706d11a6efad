"""Kernel tests, mirroring the reference's test genres (GPy/GPy/testing/kernel_tests.py):
value checks, PSD spot-checks via eigvals, and checkgrad-style finite-difference vs
autodiff gradient asserts through L = sum(dL_dK * K(X)) (the Kern_check_model pattern,
kernel_tests.py:23-118)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gaussian_process_optimization_tpu.kernels as kern


def _fd_grad(f, x, eps=1e-6):
    x = np.asarray(x, dtype=np.float64)
    g = np.zeros_like(x)
    flat = x.reshape(-1)
    gf = g.reshape(-1)
    for i in range(flat.size):
        xp, xm = flat.copy(), flat.copy()
        xp[i] += eps
        xm[i] -= eps
        gf[i] = (f(xp.reshape(x.shape)) - f(xm.reshape(x.shape))) / (2 * eps)
    return g


ALL_STATIONARY = [
    kern.RBF, kern.Exponential, kern.OU, kern.Matern32, kern.Matern52,
    kern.Cosine, kern.RatQuad,
]


@pytest.mark.parametrize("cls", ALL_STATIONARY)
def test_stationary_values_and_psd(cls, rng):
    X = rng.standard_normal((20, 3))
    k = cls.create(3, variance=1.7, lengthscale=0.8)
    K = np.asarray(k.K(jnp.asarray(X)))
    # symmetric, diag == variance (except Cosine whose K_of_r(0)=variance too)
    np.testing.assert_allclose(K, K.T, atol=1e-12)
    np.testing.assert_allclose(np.diag(K), 1.7, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(k.Kdiag(jnp.asarray(X))), 1.7, rtol=1e-12)
    if cls is not kern.Cosine:  # cosine kernel is not PSD in general dims
        ev = np.linalg.eigvalsh(K)
        assert ev.min() > -1e-8
    # cross-K consistent with self-K (diagonal only near-equal: the explicit-X2 path
    # has ~1e-7 cancellation error in self-distances, same as the reference)
    K2 = np.asarray(k.K(jnp.asarray(X), jnp.asarray(X)))
    np.testing.assert_allclose(K, K2, atol=1e-6)


def test_rbf_matches_formula(rng):
    X = rng.standard_normal((10, 2))
    Y = rng.standard_normal((7, 2))
    var, ls = 2.0, 1.3
    k = kern.RBF.create(2, variance=var, lengthscale=ls)
    K = np.asarray(k.K(jnp.asarray(X), jnp.asarray(Y)))
    d2 = ((X[:, None, :] - Y[None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(K, var * np.exp(-0.5 * d2 / ls**2), rtol=1e-10)


def test_exponential_matches_formula(rng):
    # Pins K_of_r = variance * exp(-r) exactly as GPy stationary.py:384-388
    # (round-1 shipped exp(-r/2) by mistake — ADVICE.md medium finding).
    X = rng.standard_normal((10, 2))
    Y = rng.standard_normal((7, 2))
    var, ls = 1.9, 0.7
    k = kern.Exponential.create(2, variance=var, lengthscale=ls)
    K = np.asarray(k.K(jnp.asarray(X), jnp.asarray(Y)))
    r = np.sqrt(((X[:, None, :] - Y[None, :, :]) ** 2).sum(-1)) / ls
    np.testing.assert_allclose(K, var * np.exp(-r), rtol=1e-10)
    # Exponential == OU == Matern-1/2 in GPy
    K_ou = np.asarray(kern.OU.create(2, variance=var, lengthscale=ls).K(
        jnp.asarray(X), jnp.asarray(Y)))
    np.testing.assert_allclose(K, K_ou, rtol=1e-12)


def test_matern52_matches_formula(rng):
    X = rng.standard_normal((8, 2))
    var = 1.5
    ls = np.array([0.7, 1.9])
    k = kern.Matern52.create(2, variance=var, lengthscale=ls, ARD=True)
    K = np.asarray(k.K(jnp.asarray(X)))
    r = np.sqrt((((X[:, None, :] - X[None, :, :]) / ls) ** 2).sum(-1))
    expected = var * (1 + np.sqrt(5) * r + 5.0 / 3.0 * r**2) * np.exp(-np.sqrt(5) * r)
    np.testing.assert_allclose(K, expected, rtol=1e-9, atol=1e-12)


@pytest.mark.parametrize("cls", [kern.RBF, kern.Matern52, kern.Matern32, kern.RatQuad])
def test_checkgrad_theta_and_X(cls, rng):
    """Finite-difference vs autodiff through L = sum(dL_dK * K(X)) for hyperparameters
    and inputs — the reference's Kern_check_dK_dtheta / Kern_check_dK_dX harnesses."""
    X = rng.standard_normal((9, 3))
    dL_dK = rng.standard_normal((9, 9))
    dL_dK = dL_dK + dL_dK.T
    k = cls.create(3, variance=1.3, lengthscale=np.array([0.5, 1.0, 2.0]), ARD=True)

    def loss_theta(var, ls):
        kk = cls.create(3, variance=1.0, lengthscale=np.ones(3), ARD=True)
        import dataclasses

        kk = dataclasses.replace(k, variance=var, lengthscale=ls)
        return jnp.sum(kk.K(jnp.asarray(X)) * jnp.asarray(dL_dK))

    g_var, g_ls = jax.grad(loss_theta, argnums=(0, 1))(k.variance, k.lengthscale)
    fd_var = _fd_grad(lambda v: float(loss_theta(jnp.asarray(v).reshape(()), k.lengthscale)),
                      np.array(1.3))
    fd_ls = _fd_grad(lambda l: float(loss_theta(k.variance, jnp.asarray(l))),
                     np.array([0.5, 1.0, 2.0]))
    np.testing.assert_allclose(np.asarray(g_var), fd_var, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(g_ls), fd_ls, rtol=1e-5, atol=1e-7)

    # dL/dX with coincident points included (row 0 == row 1): gradient must be finite
    X2 = X.copy()
    X2[1] = X2[0]
    def loss_X(Xv):
        return jnp.sum(k.K(Xv) * jnp.asarray(dL_dK))

    gX = np.asarray(jax.grad(loss_X)(jnp.asarray(X2)))
    assert np.all(np.isfinite(gX))
    fdX = _fd_grad(lambda Xv: float(loss_X(jnp.asarray(Xv))), X2)
    np.testing.assert_allclose(gX, fdX, rtol=1e-4, atol=1e-6)


def test_gradients_X_interface(rng):
    X = rng.standard_normal((6, 2))
    dL_dK = rng.standard_normal((6, 6))
    k = kern.RBF.create(2, variance=1.0, lengthscale=0.9)
    g = np.asarray(k.gradients_X(jnp.asarray(dL_dK), jnp.asarray(X)))
    fd = _fd_grad(lambda Xv: float(jnp.sum(k.K(jnp.asarray(Xv)) * jnp.asarray(dL_dK))), X)
    np.testing.assert_allclose(g, fd, rtol=1e-5, atol=1e-7)


def test_add_prod_active_dims(rng):
    X = rng.standard_normal((12, 4))
    k1 = kern.RBF.create(2, variance=0.5, lengthscale=1.1, active_dims=(0, 1))
    k2 = kern.Matern32.create(2, variance=2.0, lengthscale=0.7, active_dims=(2, 3))
    ks = k1 + k2
    kp = k1 * k2
    Xj = jnp.asarray(X)
    np.testing.assert_allclose(
        np.asarray(ks.K(Xj)), np.asarray(k1.K(Xj)) + np.asarray(k2.K(Xj)), rtol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(kp.K(Xj)), np.asarray(k1.K(Xj)) * np.asarray(k2.K(Xj)), rtol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(ks.Kdiag(Xj)), np.asarray(k1.Kdiag(Xj)) + np.asarray(k2.Kdiag(Xj))
    )
    # active_dims slicing matches manual slicing
    k1_full = kern.RBF.create(2, variance=0.5, lengthscale=1.1)
    np.testing.assert_allclose(
        np.asarray(k1.K(Xj)), np.asarray(k1_full.K(Xj[:, :2])), rtol=1e-12
    )


def test_white_bias_linear(rng):
    X = rng.standard_normal((8, 2))
    Xj = jnp.asarray(X)
    w = kern.White.create(2, variance=0.3)
    np.testing.assert_allclose(np.asarray(w.K(Xj)), 0.3 * np.eye(8), atol=1e-12)
    assert np.all(np.asarray(w.K(Xj, Xj)) == 0.0)
    b = kern.Bias.create(2, variance=1.2)
    np.testing.assert_allclose(np.asarray(b.K(Xj)), 1.2, rtol=1e-12)
    lin = kern.Linear.create(2, variances=np.array([0.5, 2.0]), ARD=True)
    np.testing.assert_allclose(
        np.asarray(lin.K(Xj)), (X * [0.5, 2.0]) @ X.T, rtol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(lin.Kdiag(Xj)), ((X**2) * [0.5, 2.0]).sum(-1), rtol=1e-10
    )


def test_periodic_mlp_poly_brownian_coreg(rng):
    X = rng.standard_normal((10, 2))
    Xj = jnp.asarray(X)
    per = kern.StandardPeriodic.create(2, variance=1.1, period=2.0, lengthscale=0.8)
    K = np.asarray(per.K(Xj))
    s = np.sin(np.pi * (X[:, None, :] - X[None, :, :]) / 2.0) / 0.8
    np.testing.assert_allclose(K, 1.1 * np.exp(-0.5 * (s**2).sum(-1)), rtol=1e-10)

    mlp = kern.MLP.create(2, variance=0.9)
    Km = np.asarray(mlp.K(Xj))
    np.testing.assert_allclose(Km, Km.T, atol=1e-12)
    np.testing.assert_allclose(np.diag(Km), np.asarray(mlp.Kdiag(Xj)), rtol=1e-9)

    poly = kern.Poly.create(2, variance=1.0, order=2)
    np.testing.assert_allclose(
        np.asarray(poly.K(Xj)), (X @ X.T + 1.0) ** 2, rtol=1e-10
    )

    t = np.abs(rng.standard_normal((7, 1)))
    bro = kern.Brownian.create(1, variance=2.0)
    np.testing.assert_allclose(
        np.asarray(bro.K(jnp.asarray(t))), 2.0 * np.minimum(t[:, 0][:, None], t[:, 0][None, :])
    )

    idx = rng.integers(0, 3, size=(9, 1)).astype(float)
    co = kern.Coregionalize.create(1, output_dim=3, rank=2)
    B = np.asarray(co.B)
    Kc = np.asarray(co.K(jnp.asarray(idx)))
    ii = idx[:, 0].astype(int)
    np.testing.assert_allclose(Kc, B[ii][:, ii], rtol=1e-12)


def test_gower_gpy_compat(rng):
    """Replicates the reference Gower semantics (GPy stationary.py:108-140):
    continuous r = |dx|/range, discrete r = Hamming, K = prod of K_of_r factors
    (each including the variance), lengthscale ignored, Kdiag = variance."""
    n = 15
    Xc = rng.uniform(0, 4, size=(n, 1))
    Xd = rng.integers(0, 3, size=(n, 1)).astype(float)
    X = np.concatenate([Xc, Xd], axis=1)
    base = kern.Matern52.create(2, variance=1.6, lengthscale=123.0)  # ls must be ignored
    g = kern.Gower.create(base, ranges=[4.0], cont_dims=(0,), disc_dims=(1,), gpy_compat=True)
    K = np.asarray(g.K(jnp.asarray(X)))

    def m52(r, var):
        return var * (1 + np.sqrt(5) * r + 5 / 3 * r**2) * np.exp(-np.sqrt(5) * r)

    r_cont = np.abs(Xc[:, None, 0] - Xc[None, :, 0]) / 4.0
    r_disc = (Xd[:, None, 0] != Xd[None, :, 0]).astype(float)
    expected = m52(r_cont, 1.6) * m52(r_disc, 1.6)
    np.testing.assert_allclose(K, expected, rtol=1e-9)
    # diag of K is variance**2 (2 dims), but Kdiag is variance — the reference quirk
    np.testing.assert_allclose(np.diag(K), 1.6**2, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(g.Kdiag(jnp.asarray(X))), 1.6, rtol=1e-12)


def test_gower_corrected_consistent(rng):
    n = 12
    X = np.concatenate(
        [rng.uniform(0, 4, size=(n, 1)), rng.integers(0, 3, size=(n, 1)).astype(float)], axis=1
    )
    base = kern.Matern52.create(2, variance=1.6, lengthscale=np.array([0.5, 2.0]), ARD=True)
    g = kern.Gower.create(base, ranges=[4.0], cont_dims=(0,), disc_dims=(1,), gpy_compat=False)
    K = np.asarray(g.K(jnp.asarray(X)))
    np.testing.assert_allclose(np.diag(K), 1.6, rtol=1e-10)  # consistent diagonal
    np.testing.assert_allclose(np.diag(K), np.asarray(g.Kdiag(jnp.asarray(X))), rtol=1e-10)
    ev = np.linalg.eigvalsh(K)
    assert ev.min() > -1e-8
    # lengthscale gradient exists and is nonzero (unlike the reference's broken grads)
    def loss(ls):
        import dataclasses
        gg = dataclasses.replace(g, base=dataclasses.replace(base, lengthscale=ls))
        return jnp.sum(gg.K(jnp.asarray(X)))
    grad_ls = np.asarray(jax.grad(loss)(base.lengthscale))
    assert np.all(np.isfinite(grad_ls)) and np.any(grad_ls != 0)


def test_spline_and_white_het(rng):
    x = np.abs(rng.standard_normal((9, 1)))
    sp = kern.Spline.create(1, variance=1.3)
    K = np.asarray(sp.K(jnp.asarray(x)))
    np.testing.assert_allclose(K, K.T, atol=1e-12)
    np.testing.assert_allclose(np.diag(K), np.asarray(sp.Kdiag(jnp.asarray(x))), rtol=1e-10)
    ev = np.linalg.eigvalsh(K)
    assert ev.min() > -1e-9  # PSD on positive inputs

    v = rng.uniform(0.1, 1.0, size=9)
    wh = kern.WhiteHeteroscedastic.create(1, 9, variance=v)
    np.testing.assert_allclose(np.asarray(wh.K(jnp.asarray(x))), np.diag(v))
    assert np.all(np.asarray(wh.K(jnp.asarray(x), jnp.asarray(x[:4]))) == 0)
