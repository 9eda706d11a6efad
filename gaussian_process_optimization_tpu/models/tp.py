"""Student-t process regression (GPy/GPy/models/tp_regression.py).

Same kernel machinery as the exact GP; the marginal is a multivariate-t with
deg_free nu: LML gains Gamma-function normalization and a log-quadratic data term,
and the predictive covariance is scaled by (nu + beta - 2)/(nu + n - 2) where
beta = y^T K^-1 y (Shah et al. 2014, which GPy's implementation follows).
"""
from __future__ import annotations

import jax.numpy as jnp
from jax.scipy.special import gammaln

from ..config import config
from ..kernels.base import Kernel
from ..kernels.stationary import RBF
from ..ops import linalg
from ..utils.pytree import pytree_dataclass

import math

LOG_PI = math.log(math.pi)  # host constant — no device computation at import time


@pytree_dataclass
class TPRegression:
    kern: Kernel = None
    deg_free: jnp.ndarray = None  # nu > 2
    X: jnp.ndarray = None
    Y: jnp.ndarray = None

    @classmethod
    def create(cls, X, Y, kernel=None, deg_free=5.0):
        X = jnp.atleast_2d(jnp.asarray(X, dtype=float))
        Y = jnp.asarray(Y, dtype=float)
        if Y.ndim == 1:
            Y = Y[:, None]
        if kernel is None:
            kernel = RBF.create(X.shape[1])
        return cls(kern=kernel, deg_free=jnp.asarray(deg_free, dtype=float).reshape(()),
                   X=X, Y=Y)

    def _factor(self):
        K = self.kern.K(self.X)
        n = K.shape[0]
        K = K + config.noise_jitter * jnp.eye(n, dtype=K.dtype)
        L, _, ok = linalg.jitchol(K)
        alpha = linalg.cho_solve(L, self.Y)
        beta = jnp.sum(alpha * self.Y)
        return L, alpha, beta, ok

    def log_marginal_likelihood(self):
        """Multivariate-t log density (tp_regression.py log_likelihood)."""
        n = self.X.shape[0]
        nu = self.deg_free
        L, alpha, beta, _ = self._factor()
        return (
            gammaln((nu + n) / 2.0)
            - gammaln(nu / 2.0)
            - 0.5 * n * (jnp.log(nu - 2.0) + LOG_PI)
            - 0.5 * linalg.logdet_from_chol(L)
            - 0.5 * (nu + n) * jnp.log1p(beta / (nu - 2.0))
        )

    def predict(self, Xnew, full_cov=False):
        """Predictive t-distribution moments: GP mean; covariance scaled by
        (nu + beta - 2)/(nu + n - 2) (tp_regression.py predict)."""
        n = self.X.shape[0]
        nu = self.deg_free
        L, alpha, beta, _ = self._factor()
        Xnew = jnp.atleast_2d(Xnew)
        Ks = self.kern.K(self.X, Xnew)
        mu = Ks.T @ alpha
        tmp = linalg.solve_lower(L, Ks)
        scale = (nu + beta - 2.0) / (nu + n - 2.0)
        if full_cov:
            cov = self.kern.K(Xnew) - tmp.T @ tmp
            return mu, scale * linalg.symmetrify(cov)
        var = jnp.clip(self.kern.Kdiag(Xnew) - jnp.sum(jnp.square(tmp), 0), 1e-15, None)
        return mu, (scale * var)[:, None]

    def predict_quantiles(self, Xnew, quantiles=(2.5, 97.5)):
        """Student-t predictive quantiles (tp_regression.py:232-251):
        mu + t_ppf(q/100, df) * sqrt(var) with df = nu_effective + N. GPy
        parametrizes deg_free as nu_eff - 2 (it passes self.nu + 2 into
        inference, tp_regression.py:164) — ours IS nu_eff, so df = nu + N."""
        from scipy.stats import t as _t

        mu, var = self.predict(Xnew, full_cov=False)
        df = float(self.deg_free) + self.X.shape[0]
        sd = jnp.sqrt(var)
        return [mu + float(_t.ppf(q / 100.0, df)) * sd for q in quantiles]
