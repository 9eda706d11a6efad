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


def test_multioutput_likelihood_row_routing():
    """MultioutputLikelihood (multioutput_likelihood.py:20): every method must
    equal the selected sub-likelihood's value row-by-row, for an arbitrary
    (non-Gaussian) mix."""
    g = lik.GaussianLik.create(variance=0.3)
    st = lik.StudentT.create(deg_free=4.0, sigma2=0.5)
    idx = [0, 1, 1, 0, 1]
    ml = lik.MultioutputLikelihood.create([g, st], idx)
    f = jnp.asarray([0.1, -0.2, 0.5, 1.0, -1.0])
    y = jnp.asarray([0.0, 0.3, 0.4, 1.2, -0.8])
    subs = [g, st]
    for name, args in [("logpdf", (f, y)), ("dlogpdf_df", (f, y)),
                       ("d2logpdf_df2", (f, y)), ("conditional_mean", (f,)),
                       ("conditional_variance", (f,))]:
        ours = np.asarray(getattr(ml, name)(*args))
        for n, j in enumerate(idx):
            want = np.asarray(getattr(subs[j], name)(*args))[n]
            np.testing.assert_allclose(ours[n], want, rtol=1e-12,
                                       err_msg=f"{name} row {n}")


def test_multioutput_likelihood_gaussian_matches_mixed_noise():
    """All-Gaussian MultioutputLikelihood degenerates to MixedNoise
    (the reference subclasses MixedNoise for exactly this case)."""
    idx = [0, 1, 0, 1]
    ml = lik.MultioutputLikelihood.create(
        [lik.GaussianLik.create(0.1), lik.GaussianLik.create(0.5)], idx)
    mn = lik.MixedNoise.create(variances=[0.1, 0.5], output_index=idx)
    f = jnp.asarray([0.0, 0.0, 1.0, 1.0])
    y = jnp.asarray([0.1, 0.1, 1.1, 1.1])
    np.testing.assert_allclose(np.asarray(ml.gaussian_variance()),
                               np.asarray(mn.gaussian_variance()), rtol=1e-14)
    np.testing.assert_allclose(np.asarray(ml.logpdf(f, y)),
                               np.asarray(mn.logpdf(f, y)), rtol=1e-14)
    mu1, v1 = ml.predictive_values(f, jnp.zeros_like(f))
    mu2, v2 = mn.predictive_values(f, jnp.zeros_like(f))
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-14)
    # non-Gaussian mix refuses the exact-inference path
    bad = lik.MultioutputLikelihood.create(
        [lik.GaussianLik.create(0.1), lik.StudentT.create(4.0, 0.5)], idx)
    with pytest.raises(TypeError):
        bad.gaussian_variance()


def test_multioutput_likelihood_ep_moments():
    """Site-wise EP moment matching routes through the matching sub-likelihood
    (multioutput_likelihood.py:59-60)."""
    g = lik.GaussianLik.create(variance=0.3)
    b = lik.Bernoulli()
    idx = [0, 1, 0, 1]
    ml = lik.MultioutputLikelihood.create([g, b], idx)
    y = jnp.asarray([0.2, 1.0, -0.1, -1.0])
    tau = jnp.asarray([1.0, 2.0, 0.5, 1.5])
    v = jnp.asarray([0.3, -0.2, 0.1, 0.4])
    lZ, mu, s2 = ml.moments_match_ep(y, tau, v)
    lZg, mug, s2g = g.moments_match_ep(y, tau, v)
    lZb, mub, s2b = b.moments_match_ep(y, tau, v)
    for n, j in enumerate(idx):
        src = (lZg, mug, s2g) if j == 0 else (lZb, mub, s2b)
        np.testing.assert_allclose(float(lZ[n]), float(src[0][n]), rtol=1e-10)
        np.testing.assert_allclose(float(mu[n]), float(src[1][n]), rtol=1e-10)
        np.testing.assert_allclose(float(s2[n]), float(src[2][n]), rtol=1e-10)


def test_multioutput_index_validation():
    """create() must reject out-of-range output_index eagerly: the branchless
    select would silently route such rows to likelihoods[0] while the Gaussian
    gather clamps to the last — two different silent answers."""
    import pytest

    g = lik.GaussianLik.create(variance=0.1)
    b = lik.Bernoulli()
    with pytest.raises(ValueError, match="output_index"):
        lik.MultioutputLikelihood.create([g, b], [0, 1, 2])
    with pytest.raises(ValueError, match="output_index"):
        lik.MultioutputLikelihood.create([g, b], [-1, 0])
