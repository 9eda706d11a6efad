"""Additional kernels from the GPy zoo: StandardPeriodic, MLP, Poly, Brownian,
Coregionalize (GPy kern/src/{standard_periodic.py:21, mlp.py:11, poly.py:10,
brownian.py:9, coregionalize.py:18}).

Coregionalize replaces the Cython gather/scatter hot loops
(``coregionalize_cython.pyx``) with XLA gathers: B[idx1][:, idx2].
"""
from __future__ import annotations

import jax.numpy as jnp

from ..utils.pytree import pytree_dataclass, static_field
from .base import Kernel


@pytree_dataclass
class StandardPeriodic(Kernel):
    """K = sigma^2 exp(-0.5 sum_d (sin(pi (x_d - x'_d)/T_d) / l_d)^2)."""

    variance: jnp.ndarray = None
    period: jnp.ndarray = None
    lengthscale: jnp.ndarray = None

    @classmethod
    def create(cls, input_dim, variance=1.0, period=1.0, lengthscale=1.0,
               ARD1=False, ARD2=False, active_dims=None):
        p = jnp.asarray(period, dtype=float)
        l = jnp.asarray(lengthscale, dtype=float)
        p = jnp.broadcast_to(p, (input_dim,)) if ARD1 else p.reshape(())
        l = jnp.broadcast_to(l, (input_dim,)) if ARD2 else l.reshape(())
        return cls(
            input_dim=input_dim,
            active_dims=tuple(active_dims) if active_dims is not None else None,
            variance=jnp.asarray(variance, dtype=float).reshape(()),
            period=p,
            lengthscale=l,
        )

    def K(self, X, X2=None):
        X = self._slice(X)
        X2c = X if X2 is None else self._slice(X2)
        diff = X[:, None, :] - X2c[None, :, :]
        s = jnp.sin(jnp.pi * diff / self.period) / self.lengthscale
        return self.variance * jnp.exp(-0.5 * jnp.sum(jnp.square(s), axis=-1))

    def Kdiag(self, X):
        return jnp.full((X.shape[0],), 1.0, dtype=X.dtype) * self.variance


@pytree_dataclass
class MLP(Kernel):
    """Arc-sine (neural network) kernel (GPy mlp.py:11):
    K = sigma^2 (2/pi) asin( (w x.x' + b) / sqrt((w x.x + b + 1)(w x'.x' + b + 1)) )."""

    variance: jnp.ndarray = None
    weight_variance: jnp.ndarray = None
    bias_variance: jnp.ndarray = None

    @classmethod
    def create(cls, input_dim, variance=1.0, weight_variance=1.0, bias_variance=1.0,
               ARD=False, active_dims=None):
        w = jnp.asarray(weight_variance, dtype=float)
        w = jnp.broadcast_to(w, (input_dim,)) if ARD else w.reshape(())
        return cls(
            input_dim=input_dim,
            active_dims=tuple(active_dims) if active_dims is not None else None,
            variance=jnp.asarray(variance, dtype=float).reshape(()),
            weight_variance=w,
            bias_variance=jnp.asarray(bias_variance, dtype=float).reshape(()),
        )

    def _prod(self, X, X2):
        return (X * self.weight_variance) @ X2.T + self.bias_variance

    def K(self, X, X2=None):
        X = self._slice(X)
        X2c = X if X2 is None else self._slice(X2)
        num = self._prod(X, X2c)
        dX = jnp.sum(jnp.square(X) * self.weight_variance, -1) + self.bias_variance + 1.0
        dX2 = jnp.sum(jnp.square(X2c) * self.weight_variance, -1) + self.bias_variance + 1.0
        arg = jnp.clip(num / jnp.sqrt(dX[:, None] * dX2[None, :]), -1.0, 1.0)
        return self.variance * (2.0 / jnp.pi) * jnp.arcsin(arg)

    def Kdiag(self, X):
        X = self._slice(X)
        d = jnp.sum(jnp.square(X) * self.weight_variance, -1) + self.bias_variance
        return self.variance * (2.0 / jnp.pi) * jnp.arcsin(d / (d + 1.0))


@pytree_dataclass
class Poly(Kernel):
    """Polynomial kernel (GPy poly.py:10): K = sigma^2 (w x.x' + b)^order."""

    order: int = static_field(default=3)
    variance: jnp.ndarray = None
    weight_variance: jnp.ndarray = None
    bias_variance: jnp.ndarray = None

    @classmethod
    def create(cls, input_dim, variance=1.0, weight_variance=1.0, bias_variance=1.0,
               order=3, active_dims=None):
        return cls(
            input_dim=input_dim,
            active_dims=tuple(active_dims) if active_dims is not None else None,
            order=int(order),
            variance=jnp.asarray(variance, dtype=float).reshape(()),
            weight_variance=jnp.asarray(weight_variance, dtype=float).reshape(()),
            bias_variance=jnp.asarray(bias_variance, dtype=float).reshape(()),
        )

    def K(self, X, X2=None):
        X = self._slice(X)
        X2c = X if X2 is None else self._slice(X2)
        base = self.weight_variance * (X @ X2c.T) + self.bias_variance
        return self.variance * base**self.order

    def Kdiag(self, X):
        X = self._slice(X)
        base = self.weight_variance * jnp.sum(jnp.square(X), -1) + self.bias_variance
        return self.variance * base**self.order


@pytree_dataclass
class Brownian(Kernel):
    """Brownian motion kernel, 1-D (GPy brownian.py:9): K = sigma^2 min(x, x')."""

    variance: jnp.ndarray = None

    @classmethod
    def create(cls, input_dim=1, variance=1.0, active_dims=None):
        return cls(
            input_dim=input_dim,
            active_dims=tuple(active_dims) if active_dims is not None else None,
            variance=jnp.asarray(variance, dtype=float).reshape(()),
        )

    def K(self, X, X2=None):
        X = self._slice(X)
        X2c = X if X2 is None else self._slice(X2)
        return self.variance * jnp.minimum(X[:, 0][:, None], X2c[:, 0][None, :])

    def Kdiag(self, X):
        X = self._slice(X)
        return self.variance * X[:, 0]


@pytree_dataclass
class Spline(Kernel):
    """1-D cubic-spline kernel (GPy kern/src/spline.py):
    K = sigma^2 (1 + xy + xy*min(x,y) - (x+y)/2 * min(x,y)^2 + min(x,y)^3/3)."""

    variance: jnp.ndarray = None

    @classmethod
    def create(cls, input_dim=1, variance=1.0, active_dims=None):
        return cls(
            input_dim=input_dim,
            active_dims=tuple(active_dims) if active_dims is not None else None,
            variance=jnp.asarray(variance, dtype=float).reshape(()),
        )

    def K(self, X, X2=None):
        X = self._slice(X)
        X2c = X if X2 is None else self._slice(X2)
        x = X[:, 0][:, None]
        y = X2c[:, 0][None, :]
        m = jnp.minimum(x, y)
        return self.variance * (
            1.0 + x * y + x * y * m - 0.5 * (x + y) * jnp.square(m) + jnp.power(m, 3) / 3.0
        )

    def Kdiag(self, X):
        X = self._slice(X)
        x = X[:, 0]
        # K(x,x) = 1 + x^2 + x^3 - x^3 + x^3/3 = 1 + x^2 + x^3/3
        return self.variance * (1.0 + jnp.square(x) + jnp.power(x, 3) / 3.0)


@pytree_dataclass
class Coregionalize(Kernel):
    """Intrinsic coregionalization B = W W^T + diag(kappa); inputs are integer task
    indices in the sliced column (GPy coregionalize.py:18; Cython gather loops in
    coregionalize_cython.pyx become XLA gathers)."""

    W: jnp.ndarray = None
    kappa: jnp.ndarray = None

    @classmethod
    def create(cls, input_dim, output_dim, rank=1, W=None, kappa=None, active_dims=None):
        W = jnp.asarray(W, dtype=float) if W is not None else 0.5 * jnp.ones((output_dim, rank))
        kappa = jnp.asarray(kappa, dtype=float) if kappa is not None else 0.5 * jnp.ones((output_dim,))
        return cls(
            input_dim=input_dim,
            active_dims=tuple(active_dims) if active_dims is not None else None,
            W=W,
            kappa=kappa,
        )

    @property
    def B(self):
        return self.W @ self.W.T + jnp.diag(self.kappa)

    def K(self, X, X2=None):
        X = self._slice(X)
        X2c = X if X2 is None else self._slice(X2)
        # rint (not truncation): task columns inside trainable inducing inputs
        # get exactly-zero gradients through the rounding, so gradient fitting
        # cannot move them off their integer values — the analog of the
        # reference fixing the inducing task column
        # (sparse_gp_coregionalized_regression.py:66).
        i1 = jnp.rint(X[:, 0]).astype(jnp.int32)
        i2 = jnp.rint(X2c[:, 0]).astype(jnp.int32)
        return self.B[i1][:, i2]

    def Kdiag(self, X):
        X = self._slice(X)
        i1 = jnp.rint(X[:, 0]).astype(jnp.int32)
        return jnp.diagonal(self.B)[i1]
