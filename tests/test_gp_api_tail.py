"""GP user-API tail: predict_quantiles, log_predictive_density(+sampling),
posterior_covariance_between_points, predict_jacobian / wishart embedding /
magnification (GPy core/gp.py:384,456,521,556,680,696,714)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.stats import norm

import gaussian_process_optimization_tpu.kernels as kern
from gaussian_process_optimization_tpu.models.gp import GPRegression


@pytest.fixture
def model(rng):
    X = rng.uniform(-2, 2, (18, 2))
    Y = np.sin(X[:, :1]) * np.cos(0.5 * X[:, 1:2]) + 0.05 * rng.standard_normal((18, 1))
    k = kern.RBF.create(2, ARD=True)
    return GPRegression.create(X, Y, kernel=k, noise_var=0.04)


@pytest.fixture
def xs(rng):
    return jnp.asarray(rng.uniform(-2, 2, (5, 2)))


def test_predict_quantiles(model, xs):
    lo, hi = model.predict_quantiles(xs)  # default (2.5, 97.5)
    mu, var = model.predict(xs)
    sd = np.sqrt(np.asarray(var))
    np.testing.assert_allclose(np.asarray(lo), np.asarray(mu) + norm.ppf(0.025) * sd,
                               rtol=1e-8)
    np.testing.assert_allclose(np.asarray(hi), np.asarray(mu) + norm.ppf(0.975) * sd,
                               rtol=1e-8)
    (med,) = model.predict_quantiles(xs, quantiles=(50,))
    np.testing.assert_allclose(np.asarray(med), np.asarray(mu), rtol=1e-8)


def test_log_predictive_density_closed_form(model, xs, rng):
    y = jnp.asarray(rng.standard_normal((5, 1)))
    lpd = np.asarray(model.log_predictive_density(xs, y))
    mu, var = model.predict(xs)
    want = norm.logpdf(np.asarray(y), np.asarray(mu), np.sqrt(np.asarray(var)))
    np.testing.assert_allclose(lpd, want, rtol=1e-8)


def test_log_predictive_density_sampling_converges(model, xs, rng):
    # y near the predictive mean keeps the MC estimator's variance low enough
    # for a tight tolerance at this sample count
    mu, var = model.predict(xs)
    y = mu + 0.5 * jnp.sqrt(var) * jnp.asarray(rng.standard_normal((5, 1)))
    exact = np.asarray(model.log_predictive_density(xs, y))
    mc = np.asarray(model.log_predictive_density_sampling(
        xs, y, key=jax.random.PRNGKey(0), num_samples=40000))
    np.testing.assert_allclose(mc, exact, atol=0.03)


def test_posterior_covariance_between_points(model, xs):
    """Dense-numpy twin + diagonal consistency with full_cov predict."""
    cov = np.asarray(model.posterior_covariance_between_points(xs, xs))
    _, full = model.predict(xs, full_cov=True, include_likelihood=False)
    np.testing.assert_allclose(cov, np.asarray(full), rtol=1e-7, atol=1e-10)
    # independent dense formula
    X = np.asarray(model.X)
    Ky = np.asarray(model.kern.K(model.X)) + float(model.likelihood_variance) * np.eye(len(X))
    k1 = np.asarray(model.kern.K(model.X, xs))
    want = np.asarray(model.kern.K(xs, xs)) - k1.T @ np.linalg.solve(Ky, k1)
    np.testing.assert_allclose(cov, want, rtol=1e-6, atol=1e-8)


def test_predict_jacobian_mean_vs_fd(model, xs):
    mean_jac, var_jac = model.predict_jacobian(xs)
    assert mean_jac.shape == (5, 2, 1) and var_jac.shape == (5, 2, 2)
    # mean jacobian == finite differences of the noiseless predictive mean
    eps = 1e-5
    for d in range(2):
        dx = np.zeros((1, 2))
        dx[0, d] = eps
        mu_p, _ = model.predict(xs + dx, include_likelihood=False)
        mu_m, _ = model.predict(xs - dx, include_likelihood=False)
        fd = (np.asarray(mu_p) - np.asarray(mu_m)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(mean_jac[:, d, :]), fd,
                                   rtol=1e-4, atol=1e-7)


def test_predict_jacobian_cov_vs_fd(model, xs):
    """var_jac == mixed second derivative of the posterior covariance function
    (GPy gp.py:456 formula), cross-checked by central differences."""
    _, var_jac = model.predict_jacobian(xs)
    x0 = np.asarray(xs[2])
    eps = 1e-4

    def g(x1, x2):
        return float(model.posterior_covariance_between_points(
            jnp.asarray(x1)[None], jnp.asarray(x2)[None])[0, 0])

    for a in range(2):
        for b in range(2):
            ea = np.eye(2)[a] * eps
            eb = np.eye(2)[b] * eps
            fd = (g(x0 + ea, x0 + eb) - g(x0 + ea, x0 - eb)
                  - g(x0 - ea, x0 + eb) + g(x0 - ea, x0 - eb)) / (4 * eps * eps)
            np.testing.assert_allclose(float(var_jac[2, a, b]), fd,
                                       rtol=5e-3, atol=1e-6)


def test_wishart_embedding_and_magnification(model, xs):
    mean_jac, var_jac = model.predict_jacobian(xs)
    G = np.asarray(model.predict_wishart_embedding(xs))
    want = (np.einsum("idp,iep->ide", np.asarray(mean_jac), np.asarray(mean_jac))
            + 1 * np.asarray(var_jac))
    np.testing.assert_allclose(G, want, rtol=1e-8)
    mag = np.asarray(model.predict_magnification(xs))
    np.testing.assert_allclose(mag, np.sqrt(np.linalg.det(want)), rtol=1e-6)
    # mean/covariance toggles (GPy gp.py:521 flags)
    G_mu = np.asarray(model.predict_wishart_embedding(xs, covariance=False))
    G_cov = np.asarray(model.predict_wishart_embedding(xs, mean=False))
    np.testing.assert_allclose(G_mu + G_cov, G, rtol=1e-8)


@pytest.mark.parametrize("kcls,kw", [
    ("RBF", {}),
    ("Matern32", {}),
    ("Matern52", {}),
    ("RatQuad", {"power": 1.7}),
    ("Cosine", {}),
    ("Sinc", {}),
])
def test_d2K_diag_vs_fd(kcls, kw, rng):
    """Analytic prior curvature at the diagonal == central differences of the
    mixed partial d2k(x1,x2)/dx1 dx2 at x1 == x2 (GPy stationary.py:108-140
    dK2_drdr limits). Nested AD through safe_sqrt silently returns 0 for the
    sqrt family — this pins the analytic route."""
    k = getattr(kern, kcls).create(3, variance=1.7, lengthscale=[0.9, 1.3, 2.1],
                                   ARD=True, **kw)
    x0 = jnp.asarray(rng.uniform(-1, 1, (3,)))
    got = np.asarray(k.d2K_dXdX2_diag(x0))
    eps = 1e-4

    def kv(x1, x2):
        return float(k.K(jnp.asarray(x1)[None], jnp.asarray(x2)[None])[0, 0])

    x0n = np.asarray(x0)
    for a in range(3):
        for b in range(3):
            ea, eb = np.eye(3)[a] * eps, np.eye(3)[b] * eps
            fd = (kv(x0n + ea, x0n + eb) - kv(x0n + ea, x0n - eb)
                  - kv(x0n - ea, x0n + eb) + kv(x0n - ea, x0n - eb)) / (4 * eps**2)
            # rtol 1e-3: the sqrt family's O(u^{3/2}) term makes the central
            # FD only O(eps)-accurate exactly at the diagonal
            np.testing.assert_allclose(got[a, b], fd, rtol=1e-3, atol=5e-6)


def test_d2K_diag_composites_and_active_dims(rng):
    """Add/Prod product rule + active_dims scattering, vs FD on the composite."""
    k1 = kern.Matern52.create(2, variance=0.8, lengthscale=1.4,
                              active_dims=(0, 2))
    k2 = kern.Linear.create(1, variances=0.5, active_dims=(1,))
    for k in (k1 + k2, k1 * k2):
        x0 = np.asarray(rng.uniform(0.5, 1.5, (3,)))
        got = np.asarray(k.d2K_dXdX2_diag(jnp.asarray(x0)))
        eps = 1e-4

        def kv(x1, x2):
            return float(k.K(jnp.asarray(x1)[None], jnp.asarray(x2)[None])[0, 0])

        for a in range(3):
            for b in range(3):
                ea, eb = np.eye(3)[a] * eps, np.eye(3)[b] * eps
                fd = (kv(x0 + ea, x0 + eb) - kv(x0 + ea, x0 - eb)
                      - kv(x0 - ea, x0 + eb) + kv(x0 - ea, x0 - eb)) / (4 * eps**2)
                np.testing.assert_allclose(got[a, b], fd, rtol=2e-4, atol=5e-6)


def test_predict_jacobian_matern_psd(rng):
    """The round-3 verify drive caught var_jac coming out NEGATIVE definite for
    Matern52 surrogates: nested AD lost the prior curvature through safe_sqrt.
    Cov[df/dx] must be PSD (up to roundoff)."""
    X = rng.uniform(-2, 2, (20, 2))
    Y = np.sin(X[:, :1]) + 0.05 * rng.standard_normal((20, 1))
    m = GPRegression.create(X, Y, kernel=kern.Matern52.create(2, ARD=True),
                            noise_var=0.04)
    _, var_jac = m.predict_jacobian(jnp.asarray(rng.uniform(-2, 2, (6, 2))))
    eigs = np.linalg.eigvalsh(np.asarray(var_jac))
    assert eigs.min() > -1e-8, eigs
