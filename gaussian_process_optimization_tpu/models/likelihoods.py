"""Likelihoods (GPy/GPy/likelihoods/: gaussian.py:22, bernoulli, poisson, student_t —
14 files, SURVEY §2.1 'Likelihoods'). Gaussian is the only one on the BO path; the
non-Gaussian ones pair with Laplace inference (models/laplace.py) for classification
and robust regression.

Each likelihood provides log p(y|f) and its first two derivatives in f (analytic —
used by the Newton mode-finding), and Gauss-Hermite predictive marginals (the
reference's quadrature fallback, likelihoods/likelihood.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.special import erfc, gammaln

from ..utils.pytree import pytree_dataclass


def _norm_logcdf(z):
    return jax.scipy.stats.norm.logcdf(z)


@pytree_dataclass
class Likelihood:
    def logpdf(self, f, y):
        raise NotImplementedError

    def dlogpdf_df(self, f, y):
        return jax.grad(lambda ff: jnp.sum(self.logpdf(ff, y)))(f)

    def d2logpdf_df2(self, f, y):
        # diagonal Hessian: likelihoods factorize over points, so
        # d/df_i sum_j dlogpdf_j == d2logpdf_i
        return jax.grad(lambda ff: jnp.sum(self.dlogpdf_df(ff, y)))(f)

    def predictive(self, mu, var, gh_points=20):
        """E[y*], V[y*] by Gauss-Hermite over the latent marginal."""
        gh_x, gh_w = np.polynomial.hermite.hermgauss(gh_points)
        gh_x = jnp.asarray(gh_x)
        gh_w = jnp.asarray(gh_w) / jnp.sqrt(jnp.pi)
        f = mu[..., None] + jnp.sqrt(2.0 * var[..., None]) * gh_x
        ey = jnp.sum(gh_w * self.conditional_mean(f), -1)
        ey2 = jnp.sum(gh_w * (self.conditional_variance(f) + self.conditional_mean(f) ** 2), -1)
        return ey, jnp.maximum(ey2 - ey**2, 1e-15)

    def conditional_mean(self, f):
        raise NotImplementedError

    def conditional_variance(self, f):
        raise NotImplementedError


@pytree_dataclass
class GaussianLik(Likelihood):
    """(likelihoods/gaussian.py:22)"""

    variance: jnp.ndarray = None

    @classmethod
    def create(cls, variance=1.0):
        return cls(variance=jnp.asarray(variance, dtype=float).reshape(()))

    def logpdf(self, f, y):
        return -0.5 * (jnp.log(2 * jnp.pi * self.variance) + jnp.square(y - f) / self.variance)

    def dlogpdf_df(self, f, y):
        return (y - f) / self.variance

    def d2logpdf_df2(self, f, y):
        return -jnp.ones_like(f) / self.variance

    def conditional_mean(self, f):
        return f

    def conditional_variance(self, f):
        return jnp.broadcast_to(self.variance, f.shape)


@pytree_dataclass
class Bernoulli(Likelihood):
    """Probit-link Bernoulli (GPy likelihoods/bernoulli.py); y in {0,1} or {-1,1}."""

    def _z(self, f, y):
        ypm = jnp.where(y > 0, 1.0, -1.0)
        return ypm * f, ypm

    def logpdf(self, f, y):
        z, _ = self._z(f, y)
        return _norm_logcdf(z)

    def dlogpdf_df(self, f, y):
        z, ypm = self._z(f, y)
        # N(z)/Phi(z) computed stably via exp(logpdf - logcdf)
        ratio = jnp.exp(jax.scipy.stats.norm.logpdf(z) - _norm_logcdf(z))
        return ypm * ratio

    def d2logpdf_df2(self, f, y):
        z, ypm = self._z(f, y)
        ratio = jnp.exp(jax.scipy.stats.norm.logpdf(z) - _norm_logcdf(z))
        return -(ratio**2) - z * ratio

    def conditional_mean(self, f):
        return 0.5 * erfc(-f / jnp.sqrt(2.0))  # Phi(f)

    def conditional_variance(self, f):
        p = self.conditional_mean(f)
        return p * (1 - p)

    def predictive(self, mu, var, gh_points=None):
        """Closed-form probit predictive: p = Phi(mu / sqrt(1 + var))."""
        p = 0.5 * erfc(-(mu / jnp.sqrt(1.0 + var)) / jnp.sqrt(2.0))
        return p, p * (1 - p)


@pytree_dataclass
class Poisson(Likelihood):
    """Exp-link Poisson (GPy likelihoods/poisson.py); y non-negative counts."""

    def logpdf(self, f, y):
        lam = jnp.exp(f)
        return y * f - lam - gammaln(y + 1.0)

    def dlogpdf_df(self, f, y):
        return y - jnp.exp(f)

    def d2logpdf_df2(self, f, y):
        return -jnp.exp(f)

    def conditional_mean(self, f):
        return jnp.exp(f)

    def conditional_variance(self, f):
        return jnp.exp(f)


@pytree_dataclass
class StudentT(Likelihood):
    """Student-t observation noise (GPy likelihoods/student_t.py)."""

    deg_free: jnp.ndarray = None
    sigma2: jnp.ndarray = None

    @classmethod
    def create(cls, deg_free=5.0, sigma2=2.0):
        return cls(deg_free=jnp.asarray(deg_free, dtype=float).reshape(()),
                   sigma2=jnp.asarray(sigma2, dtype=float).reshape(()))

    def logpdf(self, f, y):
        v, s2 = self.deg_free, self.sigma2
        e2 = jnp.square(y - f)
        return (
            gammaln((v + 1) / 2) - gammaln(v / 2)
            - 0.5 * jnp.log(s2 * v * jnp.pi)
            - (v + 1) / 2 * jnp.log1p(e2 / (v * s2))
        )

    def dlogpdf_df(self, f, y):
        v, s2 = self.deg_free, self.sigma2
        e = y - f
        return (v + 1) * e / (v * s2 + jnp.square(e))

    def d2logpdf_df2(self, f, y):
        v, s2 = self.deg_free, self.sigma2
        e2 = jnp.square(y - f)
        return (v + 1) * (e2 - v * s2) / jnp.square(v * s2 + e2)

    def conditional_mean(self, f):
        return f

    def conditional_variance(self, f):
        return jnp.broadcast_to(self.deg_free / (self.deg_free - 2) * self.sigma2, f.shape)


@pytree_dataclass
class Binomial(Likelihood):
    """Binomial with probit link (GPy likelihoods/binomial.py): y successes out of
    `trials` with p = Phi(f)."""

    trials: jnp.ndarray = None

    @classmethod
    def create(cls, trials):
        return cls(trials=jnp.asarray(trials, dtype=float).reshape(-1))

    def _p(self, f):
        return jnp.clip(0.5 * erfc(-f / jnp.sqrt(2.0)), 1e-9, 1 - 1e-9)

    def _n(self, f):
        # trials is per-datapoint; broadcast over trailing (e.g. quadrature) axes
        return self.trials.reshape((-1,) + (1,) * (f.ndim - 1))

    def logpdf(self, f, y):
        n = self._n(f)
        p = self._p(f)
        return (
            gammaln(n + 1) - gammaln(y + 1) - gammaln(n - y + 1)
            + y * jnp.log(p) + (n - y) * jnp.log1p(-p)
        )

    def conditional_mean(self, f):
        return self._n(f) * self._p(f)

    def conditional_variance(self, f):
        p = self._p(f)
        return self._n(f) * p * (1 - p)


@pytree_dataclass
class GammaLik(Likelihood):
    """Gamma with exp link and fixed shape beta (GPy likelihoods/gamma.py):
    y ~ Gamma(shape=beta, rate=beta*exp(-f)) so E[y] = exp(f)."""

    beta: jnp.ndarray = None

    @classmethod
    def create(cls, beta=1.0):
        return cls(beta=jnp.asarray(beta, dtype=float).reshape(()))

    def logpdf(self, f, y):
        b = self.beta
        rate = b * jnp.exp(-f)
        return b * jnp.log(rate) - gammaln(b) + (b - 1) * jnp.log(y) - rate * y

    def conditional_mean(self, f):
        return jnp.exp(f)

    def conditional_variance(self, f):
        return jnp.exp(2 * f) / self.beta


@pytree_dataclass
class ExponentialLik(Likelihood):
    """Exponential with exp link (GPy likelihoods/exponential.py): rate exp(-f)."""

    def logpdf(self, f, y):
        return -f - y * jnp.exp(-f)

    def dlogpdf_df(self, f, y):
        return -1.0 + y * jnp.exp(-f)

    def d2logpdf_df2(self, f, y):
        return -y * jnp.exp(-f)

    def conditional_mean(self, f):
        return jnp.exp(f)

    def conditional_variance(self, f):
        return jnp.exp(2 * f)


@pytree_dataclass
class HeteroscedasticGaussian(Likelihood):
    """Per-point noise variances (GPy likelihoods/gaussian.py HeteroscedasticGaussian:347)."""

    variances: jnp.ndarray = None  # (N,)

    @classmethod
    def create(cls, variances):
        return cls(variances=jnp.asarray(variances, dtype=float).reshape(-1))

    def logpdf(self, f, y):
        v = self.variances.reshape(f.shape)
        return -0.5 * (jnp.log(2 * jnp.pi * v) + jnp.square(y - f) / v)

    def dlogpdf_df(self, f, y):
        return (y - f) / self.variances.reshape(f.shape)

    def d2logpdf_df2(self, f, y):
        return -1.0 / self.variances.reshape(f.shape)

    def conditional_mean(self, f):
        return f

    def conditional_variance(self, f):
        return jnp.broadcast_to(self.variances.reshape(f.shape), f.shape)
