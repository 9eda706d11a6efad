"""Likelihood observation sampling + predictive quantiles / densities
(GPy likelihoods/likelihood.py samples:769, predictive_quantiles:757,
log_predictive_density; gp.py:384 inheritors on TP/Warped/Sparse/SVGP)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.stats import norm, t as student_t

import gaussian_process_optimization_tpu.kernels as kern
from gaussian_process_optimization_tpu.models import likelihoods as lik
from gaussian_process_optimization_tpu.models.gp import GPRegression
from gaussian_process_optimization_tpu.models.sparse import SparseGPRegression
from gaussian_process_optimization_tpu.models.svgp import SVGP
from gaussian_process_optimization_tpu.models.tp import TPRegression
from gaussian_process_optimization_tpu.models.warped import (IdentityWarp,
                                                             LogWarp, WarpedGP)

KEY = jax.random.PRNGKey(7)


@pytest.mark.parametrize("likelihood", [
    lik.GaussianLik.create(0.3),
    lik.Bernoulli(),
    lik.Poisson(),
    lik.StudentT.create(deg_free=6.0, sigma2=0.5),
    lik.GammaLik.create(beta=2.0),
    lik.ExponentialLik(),
    lik.Weibull.create(r=1.5),
    lik.LogGaussian.create(variance=0.4),
    lik.LogLogistic.create(r=4.0),
])
def test_samples_moments_match_conditionals(likelihood):
    """MC moments of samples(f) == conditional_mean / conditional_variance."""
    f = jnp.asarray([[-0.5], [0.3], [1.1]])
    fw = jnp.broadcast_to(f, (3, 60000))
    y = np.asarray(likelihood.samples(fw, KEY))
    m = np.asarray(likelihood.conditional_mean(f))[:, 0]
    v = np.asarray(likelihood.conditional_variance(f))[:, 0]
    np.testing.assert_allclose(y.mean(1), m, rtol=0.05, atol=0.02)
    np.testing.assert_allclose(y.var(1), v, rtol=0.12, atol=0.02)


def test_samples_binomial_heteroscedastic():
    """Per-datapoint-parameter likelihoods broadcast over the sample axis."""
    f = jnp.broadcast_to(jnp.asarray([[-0.4], [0.8]]), (2, 40000))
    b = lik.Binomial.create(trials=[4, 9])
    y = np.asarray(b.samples(f, KEY))
    want = np.asarray(b.conditional_mean(jnp.asarray([[-0.4], [0.8]])))[:, 0]
    np.testing.assert_allclose(y.mean(1), want, rtol=0.05)
    h = lik.HeteroscedasticGaussian.create([0.1, 0.7])
    y = np.asarray(h.samples(f, KEY))
    np.testing.assert_allclose(y.var(1), [0.1, 0.7], rtol=0.08)


def test_generic_predictive_quantiles_vs_gaussian_closed_form():
    """The sampling fallback (base class) converges to the Gaussian closed
    form when the likelihood is Gaussian."""
    g = lik.GaussianLik.create(0.2)
    mu = jnp.asarray([0.4, -1.0])
    var = jnp.asarray([0.5, 0.1])
    closed = g.predictive_quantiles(mu, var, (10.0, 50.0, 90.0))
    generic = lik.Likelihood.predictive_quantiles(
        g, mu, var, (10.0, 50.0, 90.0), key=KEY, n_samples=200000)
    for c, s in zip(closed, generic):
        np.testing.assert_allclose(np.asarray(s), np.asarray(c), atol=0.02)


def test_log_predictive_density_quadrature_vs_closed_form():
    g = lik.GaussianLik.create(0.2)
    mu, var = jnp.asarray([0.4, -1.0]), jnp.asarray([0.5, 0.1])
    y = jnp.asarray([0.1, -0.6])
    closed = np.asarray(g.log_predictive_density(y, mu, var))
    quad = np.asarray(lik.Likelihood.log_predictive_density(g, y, mu, var))
    np.testing.assert_allclose(quad, closed, rtol=1e-6)
    # non-Gaussian: quadrature vs independent MC estimate (Student-t)
    st = lik.StudentT.create(deg_free=5.0, sigma2=0.3)
    quad = np.asarray(st.log_predictive_density(y, mu, var))
    f = np.asarray(mu)[:, None] + np.sqrt(np.asarray(var))[:, None] \
        * np.random.default_rng(0).standard_normal((2, 400000))
    p = student_t.pdf(np.asarray(y)[:, None], df=5.0, loc=f, scale=np.sqrt(0.3))
    np.testing.assert_allclose(quad, np.log(p.mean(1)), atol=0.01)


@pytest.fixture
def data(rng):
    X = rng.uniform(-2, 2, (25, 1))
    Y = np.sin(X) + 0.1 * rng.standard_normal((25, 1))
    return X, Y


def test_tp_predict_quantiles(data):
    X, Y = data
    m = TPRegression.create(X, Y, kernel=kern.RBF.create(1), deg_free=6.0)
    Xs = np.linspace(-2, 2, 7)[:, None]
    lo, med, hi = m.predict_quantiles(Xs, quantiles=(2.5, 50, 97.5))
    mu, var = m.predict(Xs)
    df = 6.0 + 25
    np.testing.assert_allclose(np.asarray(med), np.asarray(mu), rtol=1e-8)
    want_lo = np.asarray(mu) + student_t.ppf(0.025, df) * np.sqrt(np.asarray(var))
    np.testing.assert_allclose(np.asarray(lo), want_lo, rtol=1e-6)
    assert np.all(np.asarray(lo) < np.asarray(hi))


def test_warped_quantiles_identity_and_log(data, rng):
    X, Y = data
    # identity warp: quantiles == plain GP quantiles
    m = WarpedGP.create(X, Y, kernel=kern.RBF.create(1), noise_var=0.05,
                        warping_function=IdentityWarp())
    Xs = np.linspace(-2, 2, 5)[:, None]
    got = m.warp.f_inv(jnp.zeros(()))  # touch warp
    lo, hi = m.predict_quantiles(Xs)
    gp_lo, gp_hi = m.gp.predict_quantiles(Xs)
    np.testing.assert_allclose(np.asarray(lo), np.asarray(gp_lo), rtol=1e-7)
    np.testing.assert_allclose(np.asarray(hi), np.asarray(gp_hi), rtol=1e-7)
    # log warp on positive targets: quantiles == exp(latent quantiles)
    Yp = np.exp(Y)
    mw = WarpedGP.create(X, Yp, kernel=kern.RBF.create(1), noise_var=0.05,
                         warping_function=LogWarp())
    gp_z, post = mw._posterior()
    lo, hi = mw.predict_quantiles(Xs)
    zlo, zhi = gp_z.predict_quantiles(Xs, posterior=post)
    np.testing.assert_allclose(np.asarray(lo), np.exp(np.asarray(zlo)), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(hi), np.exp(np.asarray(zhi)), rtol=1e-6)
    assert np.all(np.asarray(lo) > 0)  # log warp keeps the support


def test_warped_log_predictive_density_identity_matches_gp(data):
    X, Y = data
    m = WarpedGP.create(X, Y, kernel=kern.RBF.create(1), noise_var=0.05,
                        warping_function=IdentityWarp())
    Xs = np.linspace(-2, 2, 5)[:, None]
    ys = np.sin(Xs)
    got = np.asarray(m.log_predictive_density(Xs, ys))
    want = np.asarray(m.gp.log_predictive_density(Xs, ys))
    np.testing.assert_allclose(got, want, rtol=1e-7)


def test_sparse_and_svgp_quantiles(data, rng):
    X, Y = data
    Z = rng.uniform(-2, 2, (8, 1))
    sp = SparseGPRegression.create(X, Y, kernel=kern.RBF.create(1), Z=Z,
                                   noise_var=0.05)
    Xs = np.linspace(-2, 2, 6)[:, None]
    lo, hi = sp.predict_quantiles(Xs)
    mu, var = sp.predict(Xs)
    np.testing.assert_allclose(
        np.asarray(lo), np.asarray(mu) + norm.ppf(0.025) * np.sqrt(np.asarray(var)),
        rtol=1e-7)
    sv = SVGP.create(X, Y, Z=Z, kernel=kern.RBF.create(1), noise_var=0.05)
    lo, hi = sv.predict_quantiles(Xs)
    mu_f, var_f = sv.predict(Xs, include_likelihood=False)
    want = np.asarray(mu_f) + norm.ppf(0.025) * np.sqrt(
        np.asarray(var_f) + float(sv.likelihood_variance))
    np.testing.assert_allclose(np.asarray(lo), want, rtol=1e-6)
    # LPD through the Gaussian path == closed form
    lpd = np.asarray(sv.log_predictive_density(Xs, np.sin(Xs)))
    mu_y, var_y = sv.predict(Xs, include_likelihood=True)
    want = norm.logpdf(np.sin(Xs), np.asarray(mu_y), np.sqrt(np.asarray(var_y)))
    np.testing.assert_allclose(lpd, want, rtol=1e-6)


def test_laplace_quantiles_and_samples(rng):
    """GPLaplace (probit classification): quantiles through the sampling
    fallback are in {0,1}; LPD quadrature matches closed-form Bernoulli
    predictive; posterior_samples are Bernoulli draws at predictive rate."""
    from gaussian_process_optimization_tpu.models.laplace import GPClassification

    X = rng.uniform(-2, 2, (30, 1))
    Y = (np.sin(2 * X[:, 0]) > 0).astype(float)
    m = GPClassification.create(X, Y, kernel=kern.RBF.create(1, variance=2.0))
    Xs = np.linspace(-2, 2, 9)[:, None]
    lo, hi = m.predict_quantiles(Xs, key=KEY)
    assert set(np.unique(np.asarray(lo))) <= {0.0, 1.0}
    assert np.all(np.asarray(lo) <= np.asarray(hi))
    # LPD: quadrature vs closed-form probit predictive
    p, _ = m.predict(Xs)
    ys = np.ones((9, 1))
    lpd = np.asarray(m.log_predictive_density(Xs, ys))
    np.testing.assert_allclose(lpd, np.log(np.asarray(p)), atol=5e-4)
    s = np.asarray(m.posterior_samples(Xs, 20000, KEY))
    np.testing.assert_allclose(s.mean(1), np.asarray(p), atol=0.02)
    s_full = np.asarray(m.posterior_samples(Xs[:4], 50, KEY, full_cov=True))
    assert s_full.shape == (4, 50) and set(np.unique(s_full)) <= {0.0, 1.0}


def test_mixed_and_multioutput_samples():
    """Row-wise sampler dispatch: per-row moments match the row's own
    likelihood (mixed_noise.py + multioutput_likelihood.py samples)."""
    f0 = jnp.asarray([[0.5], [0.5], [1.0]])
    f = jnp.broadcast_to(f0, (3, 50000))
    mixed = lik.MixedNoise.create([0.1, 0.9], [0, 1, 0])
    y = np.asarray(mixed.samples(f, KEY))
    np.testing.assert_allclose(y.var(1), [0.1, 0.9, 0.1], rtol=0.08)
    mo = lik.MultioutputLikelihood.create(
        [lik.GaussianLik.create(0.2), lik.Poisson()], [0, 1, 1])
    y = np.asarray(mo.samples(f, KEY))
    np.testing.assert_allclose(y.mean(1), [0.5, np.exp(0.5), np.exp(1.0)],
                               rtol=0.05)
    np.testing.assert_allclose(y.var(1), [0.2, np.exp(0.5), np.exp(1.0)],
                               rtol=0.1)
