"""Non-Gaussian likelihood stack tests: likelihood derivative checkgrads, Laplace
classification vs quadrature/accuracy, parallel EP vs brute-force log-evidence,
state-space Kalman GP vs the dense exact GP (the strongest parity check: same model,
two algebras)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gaussian_process_optimization_tpu.kernels as kern
from gaussian_process_optimization_tpu.models import likelihoods as lik
from gaussian_process_optimization_tpu.models.gp import GPRegression


@pytest.mark.parametrize(
    "likelihood,y",
    [
        (lik.GaussianLik.create(0.3), np.array([0.5, -1.2, 2.0])),
        (lik.Bernoulli(), np.array([1.0, 0.0, 1.0])),
        (lik.Poisson(), np.array([0.0, 3.0, 1.0])),
        (lik.StudentT.create(5.0, 1.5), np.array([0.5, -1.2, 2.0])),
    ],
)
def test_likelihood_derivatives(likelihood, y):
    f = jnp.asarray([0.3, -0.7, 1.1])
    y = jnp.asarray(y)
    d1 = likelihood.dlogpdf_df(f, y)
    d1_auto = jax.grad(lambda ff: jnp.sum(likelihood.logpdf(ff, y)))(f)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d1_auto), rtol=1e-8)
    d2 = likelihood.d2logpdf_df2(f, y)
    d2_auto = jax.grad(lambda ff: jnp.sum(likelihood.dlogpdf_df(ff, y)))(f)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(d2_auto), rtol=1e-8)


def test_laplace_classification(rng):
    from gaussian_process_optimization_tpu.models.laplace import GPClassification

    # separable 1-D classification
    X = np.concatenate([rng.uniform(-2, -0.3, 20), rng.uniform(0.3, 2, 20)])[:, None]
    y = (X[:, 0] > 0).astype(float)
    m = GPClassification.create(X, y, kernel=kern.RBF.create(1, variance=4.0, lengthscale=1.0))
    lml = float(m.log_marginal_likelihood())
    assert np.isfinite(lml)
    p, _ = m.predict(np.array([[-1.5], [1.5]]))
    assert float(p[0]) < 0.2 and float(p[1]) > 0.8
    # in-sample accuracy
    p_train, _ = m.predict(X)
    acc = np.mean((np.asarray(p_train) > 0.5) == (y > 0.5))
    assert acc > 0.95


def test_laplace_matches_exact_for_gaussian(rng):
    """With a Gaussian likelihood the Laplace approximation is EXACT — the latent
    posterior must equal the analytic exact GP."""
    from gaussian_process_optimization_tpu.models.laplace import GPLaplace

    X = rng.uniform(-2, 2, size=(15, 1))
    Y = np.sin(X[:, 0]) + 0.1 * rng.standard_normal(15)
    k = kern.RBF.create(1, variance=1.2, lengthscale=0.8)
    noise = 0.05
    mlap = GPLaplace.create(X, Y, kernel=k, likelihood=lik.GaussianLik.create(noise))
    mex = GPRegression.create(X, Y[:, None], kernel=k, noise_var=noise)
    Xs = np.linspace(-2, 2, 7)[:, None]
    mu_l, var_l = mlap.predict_latent(jnp.asarray(Xs))
    mu_e, var_e = mex.predict_noiseless(jnp.asarray(Xs))
    np.testing.assert_allclose(np.asarray(mu_l), np.asarray(mu_e)[:, 0], rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(var_l), np.asarray(var_e)[:, 0], rtol=1e-3, atol=1e-6)
    # Laplace lml == exact lml for Gaussian likelihood (up to the 1e-8 noise-floor
    # difference in the exact path)
    np.testing.assert_allclose(
        float(mlap.log_marginal_likelihood()), float(mex.log_marginal_likelihood()),
        rtol=1e-4,
    )


def test_ep_probit_logZ_vs_bruteforce(rng):
    """n=2 probit evidence by 2-D quadrature vs parallel EP's logZ."""
    from gaussian_process_optimization_tpu.models.ep import ep_probit_inference

    K = np.array([[1.0, 0.6], [0.6, 1.0]])
    y = np.array([1.0, -1.0])

    # brute force: int Phi(y1 f1) Phi(y2 f2) N(f; 0, K) df
    from scipy.stats import multivariate_normal, norm

    grid = np.linspace(-6, 6, 301)
    F1, F2 = np.meshgrid(grid, grid)
    pts = np.stack([F1.ravel(), F2.ravel()], 1)
    pdf = multivariate_normal(np.zeros(2), K).pdf(pts)
    like = norm.cdf(y[0] * pts[:, 0]) * norm.cdf(y[1] * pts[:, 1])
    dz = (grid[1] - grid[0]) ** 2
    logZ_true = np.log(np.sum(pdf * like) * dz)

    post = ep_probit_inference(jnp.asarray(K), jnp.asarray(y), sweeps=60, damping=0.5)
    np.testing.assert_allclose(float(post.lml), logZ_true, atol=5e-3)


def test_ep_predict(rng):
    from gaussian_process_optimization_tpu.models.ep import ep_predict, ep_probit_inference

    X = np.concatenate([rng.uniform(-2, -0.3, 15), rng.uniform(0.3, 2, 15)])[:, None]
    y = np.where(X[:, 0] > 0, 1.0, -1.0)
    k = kern.RBF.create(1, variance=4.0, lengthscale=1.0)
    K = k.K(jnp.asarray(X))
    post = ep_probit_inference(K, jnp.asarray(y), sweeps=40)
    Xs = np.array([[-1.5], [1.5]])
    Ks = k.K(jnp.asarray(X), jnp.asarray(Xs))
    mu, var = ep_predict(K, Ks, k.Kdiag(jnp.asarray(Xs)), post)
    # latent mean signs must separate the classes
    assert float(mu[0]) < -0.5 and float(mu[1]) > 0.5
    assert np.all(np.asarray(var) > 0)


@pytest.mark.parametrize("family", ["matern12", "matern32", "matern52"])
def test_state_space_matches_dense(family, rng):
    """Kalman LML and predictions must match the dense O(N^3) GP exactly — the
    state-space form is the same model."""
    from gaussian_process_optimization_tpu.models.state_space import StateSpaceGP

    t = np.sort(rng.uniform(0, 10, size=25))
    y = np.sin(t) + 0.1 * rng.standard_normal(25)
    var, ls, noise = 1.3, 1.1, 0.05

    ss = StateSpaceGP.create(t, y, family=family, variance=var, lengthscale=ls,
                             noise_var=noise)
    dense_kern = {
        "matern12": kern.OU, "matern32": kern.Matern32, "matern52": kern.Matern52,
    }[family].create(1, variance=var, lengthscale=ls)
    dense = GPRegression.create(t[:, None], y[:, None], kernel=dense_kern,
                                noise_var=noise)

    lml_ss = float(ss.log_marginal_likelihood())
    lml_dense = float(dense.log_marginal_likelihood())
    np.testing.assert_allclose(lml_ss, lml_dense, rtol=1e-6)

    t_new = np.linspace(0.5, 9.5, 11)
    mu_ss, var_ss = ss.predict(t_new)
    mu_d, var_d = dense.predict(jnp.asarray(t_new[:, None]))
    np.testing.assert_allclose(np.asarray(mu_ss), np.asarray(mu_d), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(var_ss), np.asarray(var_d), rtol=1e-4, atol=1e-7)


def test_laplace_lml_gradient_is_implicit_derivative(rng):
    """The Laplace LML must be reverse-differentiable (the mode-finding
    while_loop is detached; one differentiable Newton step at the fixed point
    carries the implicit derivative — exact to first order because the Newton
    map's Jacobian vanishes at the mode). Autodiff vs central differences on
    kernel hyperparameters, mirroring the reference's hand-derived
    explicit+implicit dL/dtheta (GPy laplace.py:122). Poisson is log-concave,
    so the mode is unique and f_hat(theta) is smooth — a Student-t surface can
    hop between posterior modes discontinuously, which would break ANY
    derivative check (including the reference's)."""
    from gaussian_process_optimization_tpu.models.laplace import GPLaplace
    from gaussian_process_optimization_tpu.models import likelihoods as lik2

    X = np.sort(rng.uniform(0, 6, (25, 1)), axis=0)
    Y = rng.poisson(np.exp(np.sin(X[:, 0]) + 0.5)).astype(float)

    def lml(params):
        var, ls = params
        m = GPLaplace.create(
            X, Y, kernel=kern.RBF.create(1, variance=var, lengthscale=ls),
            likelihood=lik2.Poisson())
        return m.log_marginal_likelihood()

    p0 = jnp.asarray([1.3, 0.9])
    g = np.asarray(jax.grad(lml)(p0))
    eps = 1e-5
    for i in range(2):
        e = np.zeros(2)
        e[i] = eps
        fd = (float(lml(p0 + e)) - float(lml(p0 - e))) / (2 * eps)
        np.testing.assert_allclose(g[i], fd, rtol=2e-4, atol=1e-7)


def test_laplace_model_fits_with_lbfgs(rng):
    """End-to-end: fit_mod.fit on a GPLaplace Student-t model (the gallery
    student_t_approx path) must run and improve the evidence."""
    from gaussian_process_optimization_tpu.models import fit as fit_mod
    from gaussian_process_optimization_tpu.models.laplace import GPLaplace
    from gaussian_process_optimization_tpu.models import likelihoods as lik2

    X = np.sort(rng.uniform(0, 6, (30, 1)), axis=0)
    Y = np.sin(X[:, 0]) + 0.1 * rng.standard_normal(30)
    m = GPLaplace.create(X, Y, kernel=kern.RBF.create(1, variance=0.5,
                                                      lengthscale=2.5),
                         likelihood=lik2.StudentT.create(deg_free=4.0))
    lml0 = float(m.log_marginal_likelihood())
    fitted, _ = fit_mod.fit(m, num_restarts=1, maxiter=25,
                            key=jax.random.PRNGKey(0))
    lml1 = float(fitted.log_marginal_likelihood())
    assert lml1 > lml0, (lml0, lml1)
