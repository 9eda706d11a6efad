"""Likelihood tail (VERDICT round-1 missing #8): Weibull, LogGaussian,
LogLogistic (with censoring), MixedNoise, and first-class link functions
(GPy likelihoods/{weibull,loggaussian,loglogistic,mixed_noise}.py +
link_functions.py). Formula pinning vs scipy + Laplace-fit smoke tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import stats

import gaussian_process_optimization_tpu.kernels as kern
from gaussian_process_optimization_tpu.models import likelihoods as lik
from gaussian_process_optimization_tpu.models.laplace import GPLaplace


def test_links_match_reference_formulas():
    f = jnp.asarray([-1.5, -0.2, 0.0, 0.7, 2.0])
    np.testing.assert_allclose(np.asarray(lik.IdentityLink().transf(f)), np.asarray(f))
    np.testing.assert_allclose(np.asarray(lik.LogLink().transf(f)), np.exp(np.asarray(f)))
    np.testing.assert_allclose(
        np.asarray(lik.ProbitLink().transf(f)), stats.norm.cdf(np.asarray(f)), rtol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(lik.CloglogLink().transf(f)), 1 - np.exp(-np.exp(np.asarray(f))),
        rtol=1e-10,
    )
    np.testing.assert_allclose(
        np.asarray(lik.LogExp1Link().transf(f)), np.log1p(np.exp(np.asarray(f))),
        rtol=1e-10,
    )
    # autodiff dtransf matches analytic for Log
    d = lik.LogLink().dtransf_df(f)
    np.testing.assert_allclose(np.asarray(d), np.exp(np.asarray(f)), rtol=1e-10)


def test_weibull_pins_scipy():
    """Our Weibull(lam = exp(f)) is weibull_min(c=r, scale=lam^(1/r)):
    log p = log r - log lam + (r-1) log y - y^r/lam (weibull.py:78)."""
    r = 1.7
    w = lik.Weibull.create(r=r)
    f = jnp.asarray([0.2, -0.5, 1.0])
    y = jnp.asarray([0.8, 1.5, 0.3])
    ours = np.asarray(w.logpdf(f, y))
    lam = np.exp(np.asarray(f))
    ref = stats.weibull_min.logpdf(np.asarray(y), c=r, scale=lam ** (1.0 / r))
    np.testing.assert_allclose(ours, ref, rtol=1e-8)


def test_loggaussian_pins_scipy():
    s2 = 0.6
    g = lik.LogGaussian.create(variance=s2)
    f = jnp.asarray([0.1, -0.4, 0.9])
    y = jnp.asarray([1.2, 0.7, 2.5])
    ours = np.asarray(g.logpdf(f, y))
    ref = stats.lognorm.logpdf(np.asarray(y), s=np.sqrt(s2), scale=np.exp(np.asarray(f)))
    np.testing.assert_allclose(ours, ref, rtol=1e-8)
    # censored entries: log survival function
    gc = lik.LogGaussian.create(variance=s2, censored=np.array([1.0, 0.0, 1.0]))
    ours_c = np.asarray(gc.logpdf(f, y))
    ref_sf = stats.lognorm.logsf(np.asarray(y), s=np.sqrt(s2), scale=np.exp(np.asarray(f)))
    np.testing.assert_allclose(ours_c[0], ref_sf[0], rtol=1e-6)
    np.testing.assert_allclose(ours_c[1], ref[1], rtol=1e-8)


def test_loglogistic_pins_scipy():
    """Fisk with shape r and scale lam: logpdf matches scipy.stats.fisk."""
    r = 2.5
    ll = lik.LogLogistic.create(r=r)
    f = jnp.asarray([0.3, -0.2, 0.8])
    y = jnp.asarray([0.9, 1.4, 0.5])
    ours = np.asarray(ll.logpdf(f, y))
    lam = np.exp(np.asarray(f))
    ref = stats.fisk.logpdf(np.asarray(y), c=r, scale=lam)
    np.testing.assert_allclose(ours, ref, rtol=1e-8)
    # censored: log survival
    llc = lik.LogLogistic.create(r=r, censored=np.array([0.0, 1.0, 0.0]))
    ours_c = np.asarray(llc.logpdf(f, y))
    ref_sf = stats.fisk.logsf(np.asarray(y), c=r, scale=lam)
    np.testing.assert_allclose(ours_c[1], ref_sf[1], rtol=1e-6)


def test_conditional_moments_match_scipy():
    """conditional_mean/variance vs scipy's analytic distribution moments
    (a numerical integral truncates the Fisk heavy tail too early)."""
    cases = []
    f0 = 0.4
    lam = np.exp(f0)
    cases.append((lik.Weibull.create(r=2.0), f0,
                  stats.weibull_min(2.0, scale=lam ** 0.5)))
    f0 = 0.2
    cases.append((lik.LogGaussian.create(variance=0.3), f0,
                  stats.lognorm(s=np.sqrt(0.3), scale=np.exp(f0))))
    f0 = 0.1
    cases.append((lik.LogLogistic.create(r=3.0), f0, stats.fisk(3.0, scale=np.exp(f0))))
    for likelihood, f0, dist in cases:
        mean_ours = float(likelihood.conditional_mean(jnp.asarray(f0)))
        var_ours = float(likelihood.conditional_variance(jnp.asarray(f0)))
        np.testing.assert_allclose(mean_ours, dist.mean(), rtol=1e-8)
        np.testing.assert_allclose(var_ours, dist.var(), rtol=1e-8)


def test_mixed_noise_variance_routing():
    mn = lik.MixedNoise.create(variances=[0.1, 0.5], output_index=[0, 1, 0, 1])
    f = jnp.asarray([0.0, 0.0, 1.0, 1.0])
    y = jnp.asarray([0.1, 0.1, 1.1, 1.1])
    lp = np.asarray(mn.logpdf(f, y))
    lp0 = stats.norm.logpdf(0.1, 0.0, np.sqrt(0.1))
    lp1 = stats.norm.logpdf(0.1, 0.0, np.sqrt(0.5))
    np.testing.assert_allclose(lp[0], lp0, rtol=1e-10)
    np.testing.assert_allclose(lp[1], lp1, rtol=1e-10)
    mu, var = mn.predictive_values(f, jnp.zeros_like(f))
    np.testing.assert_allclose(np.asarray(var), [0.1, 0.5, 0.1, 0.5])


def test_laplace_weibull_survival(rng):
    """Laplace fit on Weibull-distributed positive data: the predicted mean must
    track the true scale trend."""
    X = np.linspace(0, 4, 50)[:, None]
    lam_true = np.exp(0.5 + 0.8 * np.sin(X[:, 0]))  # scale^r
    r = 2.0
    y = stats.weibull_min.rvs(r, scale=lam_true ** (1 / r),
                              random_state=np.random.default_rng(0).integers(1 << 31))
    m = GPLaplace.create(
        X, y, kernel=kern.RBF.create(1, variance=0.5, lengthscale=1.0),
        likelihood=lik.Weibull.create(r=r),
    )
    assert np.isfinite(float(m.log_marginal_likelihood()))
    ey, _ = m.predict(X)
    corr = np.corrcoef(np.asarray(ey), lam_true ** (1 / r))[0, 1]
    assert corr > 0.5
