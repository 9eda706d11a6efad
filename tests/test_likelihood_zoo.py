"""Extended likelihood zoo: derivative consistency + Laplace fits on count/positive
data (GPy likelihoods/{binomial,gamma,exponential}.py equivalents)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gaussian_process_optimization_tpu.kernels as kern
from gaussian_process_optimization_tpu.models import likelihoods as lik
from gaussian_process_optimization_tpu.models.laplace import GPLaplace


@pytest.mark.parametrize(
    "likelihood,y",
    [
        (lik.Binomial.create(np.array([10.0, 10.0, 10.0])), np.array([3.0, 7.0, 10.0])),
        (lik.GammaLik.create(2.0), np.array([0.5, 1.2, 2.0])),
        (lik.ExponentialLik(), np.array([0.5, 1.2, 2.0])),
    ],
)
def test_derivative_consistency(likelihood, y):
    f = jnp.asarray([0.3, -0.7, 1.1])
    y = jnp.asarray(y)
    d1 = likelihood.dlogpdf_df(f, y)
    d1_auto = jax.grad(lambda ff: jnp.sum(likelihood.logpdf(ff, y)))(f)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d1_auto), rtol=1e-7)
    d2 = likelihood.d2logpdf_df2(f, y)
    assert np.all(np.asarray(d2) <= 1e-10)  # log-concave likelihoods


def test_laplace_poisson_counts(rng):
    X = np.linspace(0, 4, 40)[:, None]
    rate = np.exp(1.0 + np.sin(X[:, 0]))
    y = rng.poisson(rate).astype(float)
    m = GPLaplace.create(X, y, kernel=kern.RBF.create(1, variance=1.0, lengthscale=1.0),
                         likelihood=lik.Poisson())
    assert np.isfinite(float(m.log_marginal_likelihood()))
    ey, _ = m.predict(X)
    # predicted rates should track the truth reasonably
    corr = np.corrcoef(np.asarray(ey), rate)[0, 1]
    assert corr > 0.8


def test_laplace_binomial(rng):
    X = np.linspace(-2, 2, 30)[:, None]
    p_true = 1.0 / (1.0 + np.exp(-2 * X[:, 0]))
    trials = np.full(30, 20.0)
    y = rng.binomial(20, p_true).astype(float)
    m = GPLaplace.create(X, y, kernel=kern.RBF.create(1, variance=2.0),
                         likelihood=lik.Binomial.create(trials))
    ey, _ = m.predict(X)
    corr = np.corrcoef(np.asarray(ey), 20 * p_true)[0, 1]
    assert corr > 0.9
