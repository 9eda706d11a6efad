"""Hyperparameter prior densities vs scipy.stats (GPy testing/prior_tests.py
genre; parameterizations pinned to GPy core/parameterization/priors.py:
Gaussian:67 (mu, sigma=std), LogGaussian:169, Gamma:299 (shape a, rate b),
InverseGamma:370, Exponential:1308 (rate l), StudentT:1359, HalfT:1244).

GPy's HalfT density is unnormalized (priors.py:1252 drops the log 2 of halving
and mixes A-as-scale with A-as-variance in its constant); ours is the properly
normalized half-Student-t with scale A. The x-dependence (hence every gradient)
matches GPy's exactly — asserted below — only the additive constant differs.
"""
import numpy as np
import pytest
from scipy import stats
from scipy.special import gammaln

from gaussian_process_optimization_tpu.utils import priors as pr

X_POS = np.array([0.05, 0.3, 1.0, 2.7, 9.0])
X_REAL = np.array([-3.2, -0.4, 0.0, 1.3, 5.5])


def _check(prior, xs, scipy_logpdf, rtol=1e-9):
    ours = np.array([float(prior.lnpdf(x)) for x in xs])
    np.testing.assert_allclose(ours, scipy_logpdf(xs), rtol=rtol, atol=1e-12)


def test_gaussian_prior():
    _check(pr.GaussianPrior(mu=0.7, sigma=1.3), X_REAL,
           lambda x: stats.norm.logpdf(x, 0.7, 1.3))


def test_uniform_prior():
    p = pr.UniformPrior(lower=-1.0, upper=3.0)
    _check(p, np.array([-0.5, 0.0, 2.9]),
           lambda x: stats.uniform.logpdf(x, -1.0, 4.0))
    assert np.isneginf(float(p.lnpdf(4.0)))


def test_log_gaussian_prior():
    _check(pr.LogGaussianPrior(mu=0.5, sigma=0.8), X_POS,
           lambda x: stats.lognorm.logpdf(x, s=0.8, scale=np.exp(0.5)))


def test_gamma_prior():
    _check(pr.GammaPrior(a=2.5, b=1.7), X_POS,
           lambda x: stats.gamma.logpdf(x, 2.5, scale=1.0 / 1.7))


def test_gamma_from_ev():
    g = pr.GammaPrior.from_EV(2.0, 4.0)
    d = stats.gamma(float(g.a), scale=1.0 / float(g.b))
    np.testing.assert_allclose(d.mean(), 2.0, rtol=1e-12)
    np.testing.assert_allclose(d.var(), 4.0, rtol=1e-12)


def test_inverse_gamma_prior():
    _check(pr.InverseGammaPrior(a=3.0, b=2.0), X_POS,
           lambda x: stats.invgamma.logpdf(x, 3.0, scale=2.0))


def test_exponential_prior():
    _check(pr.ExponentialPrior(l=0.6), X_POS,
           lambda x: stats.expon.logpdf(x, scale=1.0 / 0.6))


def test_student_t_prior():
    # the reference's own lnpdf IS scipy's t.logpdf (priors.py:1368-1370)
    _check(pr.StudentTPrior(mu=0.4, sigma=1.2, nu=5.0), X_REAL,
           lambda x: stats.t.logpdf(x, 5.0, 0.4, 1.2))


def test_half_t_prior_normalized():
    """Proper density: integrates to 1 over [0, inf)."""
    from scipy.integrate import quad

    p = pr.HalfTPrior(A=1.5, nu=4.0)
    total, _ = quad(lambda x: np.exp(float(p.lnpdf(x))), 0.0, np.inf)
    np.testing.assert_allclose(total, 1.0, rtol=1e-8)
    assert np.isneginf(float(p.lnpdf(-0.1)))


def test_half_t_matches_gpy_up_to_constant():
    """x-dependence == GPy priors.py:1252 (constant - .5(nu+1) log(1+(x/A)^2/nu)),
    so gradients agree exactly even though GPy's constant is unnormalized."""
    A, nu = 1.5, 4.0
    p = pr.HalfTPrior(A=A, nu=nu)
    gpy_const = gammaln(0.5 * (nu + 1)) - gammaln(0.5 * nu) - 0.5 * np.log(np.pi * A * nu)
    gpy = gpy_const - 0.5 * (nu + 1) * np.log(1.0 + (X_POS / A) ** 2 / nu)
    ours = np.array([float(p.lnpdf(x)) for x in X_POS])
    diffs = ours - gpy
    np.testing.assert_allclose(diffs, diffs[0], rtol=0, atol=1e-10)


def test_log_prior_tree_sum():
    import jax.numpy as jnp

    params = {"variance": jnp.asarray([1.0, 2.0]), "lengthscale": jnp.asarray(0.5)}
    ps = {"variance": pr.GammaPrior(a=2.0, b=1.0), "lengthscale": None}
    got = float(pr.log_prior(ps, params))
    want = float(stats.gamma.logpdf(1.0, 2.0) + stats.gamma.logpdf(2.0, 2.0))
    np.testing.assert_allclose(got, want, rtol=1e-9)
