"""Warped GPs.

- WarpedGP (``GPy/GPy/models/warped_gp.py`` + ``GPy/GPy/util/warping_functions.py``
  ``TanhFunction:71``): a monotone tanh warp on the OUTPUTS,
  f(y) = y*d + sum_i a_i tanh(b_i (y + c_i));  LML(z=f(y)) + sum log f'(y).
  Prediction inverts the warp (Newton iterations, jit-safe fori_loop) for the
  median, or Gauss-Hermite quadrature for the mean (warped_gp.py predict).
- InputWarpedGP (``GPy/GPy/models/input_warped_gp.py`` +
  ``GPy/GPy/util/input_warping_functions.py`` ``KumarWarping``): Kumaraswamy CDF
  warp on each INPUT dim, x' = 1 - (1 - x_unit^a)^b with x_unit min-max normalized;
  standard GP on warped inputs, a/b trainable (positive).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..kernels.base import Kernel
from ..kernels.stationary import RBF
from ..utils.pytree import pytree_dataclass, static_field
from .gp import GPRegression, Posterior


@pytree_dataclass
class TanhWarp:
    """f(y) = y*d + sum_i a_i tanh(b_i (y + c_i)) — GPy TanhFunction (a,b,d > 0)."""

    d: jnp.ndarray = None
    a: jnp.ndarray = None
    b: jnp.ndarray = None
    c: jnp.ndarray = None

    @classmethod
    def create(cls, n_terms=3):
        return cls(
            d=jnp.asarray(1.0),
            a=jnp.ones((n_terms,)),
            b=jnp.ones((n_terms,)),
            c=jnp.zeros((n_terms,)),
        )

    def f(self, y):
        return y * self.d + jnp.sum(
            self.a * jnp.tanh(self.b * (y[..., None] + self.c)), axis=-1
        )

    def fgrad_y(self, y):
        t = jnp.tanh(self.b * (y[..., None] + self.c))
        return self.d + jnp.sum(self.a * self.b * (1.0 - jnp.square(t)), axis=-1)

    def f_inv(self, z, iters=30):
        """Newton inversion (GPy warping_functions f_inv uses iterative updates)."""
        y0 = z / self.d

        def body(_, y):
            return y - (self.f(y) - z) / jnp.maximum(self.fgrad_y(y), 1e-10)

        return lax.fori_loop(0, iters, body, y0)


@pytree_dataclass
class LogWarp:
    """Fixed log warp for positive-only targets — GPy ``LogFunction``
    (``GPy/GPy/util/warping_functions.py:172-200``): f(y) = log y, f'(y) = 1/y,
    f^-1(z) = exp(z). No trainable parameters (num_parameters = 0)."""

    def f(self, y):
        return jnp.log(y)

    def fgrad_y(self, y):
        return 1.0 / y

    def f_inv(self, z, iters=None):
        return jnp.exp(z)


@pytree_dataclass
class IdentityWarp:
    """Identity warp (testing/sanity) — GPy ``IdentityFunction``
    (``GPy/GPy/util/warping_functions.py:203-230``)."""

    def f(self, y):
        return y

    def fgrad_y(self, y):
        return jnp.ones_like(y)

    def f_inv(self, z, iters=None):
        return z


@pytree_dataclass
class WarpedGP:
    """GP on z = warp(Y) with the warp Jacobian in the LML (warped_gp.py:62-78)."""

    gp: GPRegression = None  # holds warped targets implicitly via Y + warp
    warp: TanhWarp = None

    @classmethod
    def create(cls, X, Y, kernel=None, noise_var=1.0, warping_terms=3, max_points=None,
               warping_function=None):
        """`warping_function`: any warp pytree with f/fgrad_y/f_inv (TanhWarp
        default; LogWarp / IdentityWarp for the GPy warping_functions tail)."""
        Y = jnp.asarray(Y, dtype=float)
        if Y.ndim == 1:
            Y = Y[:, None]
        warp = warping_function if warping_function is not None \
            else TanhWarp.create(warping_terms)
        gp = GPRegression.create(X, Y, kernel=kernel, noise_var=noise_var,
                                 max_points=max_points)
        return cls(gp=gp, warp=warp)

    def _safe_y(self):
        """Targets with padded rows replaced by a warp-safe filler: padded Y is 0,
        and warps with a restricted domain (LogWarp: f(0) = -inf, fgrad 1/0) would
        otherwise poison the masked LML with 0 * inf = NaN."""
        y = self.gp.Y[..., 0]
        if self.gp.mask is not None:
            y = jnp.where(self.gp.mask > 0, y, jnp.ones_like(y))
        return y

    def _warped_gp(self):
        Z = self.warp.f(self._safe_y())[..., None]
        if self.gp.mask is not None:
            Z = Z * self.gp.mask[:, None]
        return self.gp, Z  # callers dataclasses.replace(gp, Y=Z); gp is frozen

    def log_marginal_likelihood(self):
        gp, Z = self._warped_gp()
        import dataclasses

        gp_z = dataclasses.replace(gp, Y=Z)
        lml = gp_z.log_marginal_likelihood()
        jac = jnp.log(jnp.maximum(self.warp.fgrad_y(self._safe_y()), 1e-300))
        if self.gp.mask is not None:
            jac = jnp.where(self.gp.mask > 0, jac, jnp.zeros_like(jac))
        return lml + jnp.sum(jac)

    def _posterior(self):
        import dataclasses

        gp, Z = self._warped_gp()
        gp_z = dataclasses.replace(gp, Y=Z)
        return gp_z, gp_z.inference()

    def posterior_cache(self):
        """Precompute the warped-space posterior once (one Cholesky); pass the
        result to predict(posterior=...) for repeated predictions — the BO
        wrapper calls predict per acquisition point under vmap/grad, where an
        uncached posterior re-factorizes the padded Gram every trace."""
        return self._posterior()

    def predict(self, Xnew, median=False, include_likelihood=True, gh_points=20,
                posterior=None):
        """Warped-space predict then un-warp: median = f_inv(mu); mean/var via
        Gauss-Hermite quadrature (warped_gp.py predict:110)."""
        gp_z, post = self._posterior() if posterior is None else posterior
        mu, var = gp_z.predict(jnp.atleast_2d(Xnew), include_likelihood=include_likelihood,
                               posterior=post)
        if median:
            return self.warp.f_inv(mu), var
        # E[y] = int f_inv(z) N(z; mu, var) dz by Gauss-Hermite
        gh_x, gh_w = np.polynomial.hermite.hermgauss(gh_points)
        gh_x = jnp.asarray(gh_x)
        gh_w = jnp.asarray(gh_w) / jnp.sqrt(jnp.pi)
        z = mu[..., None] + jnp.sqrt(2.0 * var[..., None]) * gh_x
        y = self.warp.f_inv(z)
        mean = jnp.sum(gh_w * y, axis=-1)
        second = jnp.sum(gh_w * jnp.square(y), axis=-1)
        return mean, jnp.maximum(second - jnp.square(mean), 1e-15)

    def predict_quantiles(self, Xnew, quantiles=(2.5, 97.5), posterior=None):
        """Gaussian quantiles in WARPED space, un-warped through f_inv
        (warped_gp.py predict_quantiles:118-131 — quantiles commute with the
        monotone inverse warp, unlike the mean). Percent units."""
        gp_z, post = self._posterior() if posterior is None else posterior
        qs = gp_z.predict_quantiles(jnp.atleast_2d(Xnew), quantiles=quantiles,
                                    posterior=post)
        return [self.warp.f_inv(q) for q in qs]

    def log_predictive_density(self, x_test, y_test):
        """log p(y*|D) = latent Gaussian density at f(y*) plus the warp's
        log-Jacobian (warped_gp.py log_predictive_density:143-160)."""
        gp_z, post = self._posterior()
        y = jnp.atleast_2d(jnp.asarray(y_test, dtype=float))
        fy = self.warp.f(y[:, 0])[:, None]
        lpd = gp_z.log_predictive_density(jnp.atleast_2d(x_test), fy)
        return lpd + jnp.log(self.warp.fgrad_y(y[:, 0]))[:, None]

    def predictive_gradients(self, Xnew):
        """(dmu (M, D, 1), dvar (M, D)) — GPy gp.py:407 shape convention."""
        def mu_var(x):
            m, v = self.predict(x[None, :])
            return m[0, 0], v[0, 0]

        Xnew = jnp.atleast_2d(Xnew)
        dm = jax.vmap(lambda x: jax.jacfwd(lambda xx: mu_var(xx)[0])(x))(Xnew)  # (M, D)
        dv = jax.vmap(lambda x: jax.jacfwd(lambda xx: mu_var(xx)[1])(x))(Xnew)  # (M, D)
        return dm[:, :, None], dv


@pytree_dataclass
class KumarWarp:
    """Kumaraswamy input warp per dim: x' = 1 - (1 - u^a)^b, u = minmax(x)
    (GPy input_warping_functions.py KumarWarping). a, b positive, per warped dim."""

    a: jnp.ndarray = None
    b: jnp.ndarray = None
    lo: jnp.ndarray = None
    hi: jnp.ndarray = None
    dims: tuple = static_field(default=None)

    @classmethod
    def create(cls, X, dims=None):
        X = np.atleast_2d(np.asarray(X, dtype=float))
        d = X.shape[1]
        dims = tuple(range(d)) if dims is None else tuple(dims)
        lo = X.min(0) - 1e-9
        hi = X.max(0) + 1e-9
        k = len(dims)
        return cls(a=jnp.ones((k,)), b=jnp.ones((k,)),
                   lo=jnp.asarray(lo), hi=jnp.asarray(hi), dims=dims)

    def f(self, X):
        X = jnp.atleast_2d(X)
        u = jnp.clip((X - self.lo) / (self.hi - self.lo), 1e-9, 1.0 - 1e-9)
        out = X
        for i, dim in enumerate(self.dims):
            w = 1.0 - (1.0 - u[:, dim] ** self.a[i]) ** self.b[i]
            out = out.at[:, dim].set(w)
        return out


@pytree_dataclass
class InputWarpedGP:
    """GP over Kumar-warped inputs (input_warped_gp.py:9). The BO wrapper warps the
    continuous+discrete dims (GPyOpt input_warped_gpmodel.py:9)."""

    gp: GPRegression = None
    warp: KumarWarp = None

    @classmethod
    def create(cls, X, Y, kernel=None, noise_var=1.0, warping_indices=None,
               max_points=None):
        warp = KumarWarp.create(X, dims=warping_indices)
        gp = GPRegression.create(X, Y, kernel=kernel, noise_var=noise_var,
                                 max_points=max_points)
        return cls(gp=gp, warp=warp)

    def _warped(self):
        import dataclasses

        Xw = self.warp.f(self.gp.X)
        return dataclasses.replace(self.gp, X=Xw)

    def log_marginal_likelihood(self):
        return self._warped().log_marginal_likelihood()

    def posterior_cache(self):
        """See WarpedGP.posterior_cache."""
        gp_w = self._warped()
        return gp_w, gp_w.inference()

    def predict(self, Xnew, include_likelihood=True, posterior=None):
        gp_w, post = self.posterior_cache() if posterior is None else posterior
        return gp_w.predict(self.warp.f(jnp.atleast_2d(Xnew)),
                            include_likelihood=include_likelihood,
                            posterior=post)

    def predictive_gradients(self, Xnew):
        gp_w = self._warped()
        post = gp_w.inference()

        def mu_var(x):
            xw = self.warp.f(x[None, :])[0]
            mu, v = gp_w._raw_predict(xw[None, :], posterior=post)
            return mu[0, 0], v[0, 0] + gp_w.likelihood_variance

        Xnew = jnp.atleast_2d(Xnew)
        dm = jax.vmap(lambda x: jax.jacfwd(lambda xx: mu_var(xx)[0])(x))(Xnew)  # (M, D)
        dv = jax.vmap(lambda x: jax.jacfwd(lambda xx: mu_var(xx)[1])(x))(Xnew)  # (M, D)
        return dm[:, :, None], dv
