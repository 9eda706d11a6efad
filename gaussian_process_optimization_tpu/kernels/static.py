"""Static kernels: White, Bias, Fixed/Precomputed (GPy kern/src/static.py:63,137,177)."""
from __future__ import annotations

import jax.numpy as jnp

from ..utils.pytree import pytree_dataclass, static_field
from .base import Kernel


@pytree_dataclass
class White(Kernel):
    """White noise: K = sigma^2 I when X2 is None, else 0 (GPy static.py:63)."""

    variance: jnp.ndarray = None

    @classmethod
    def create(cls, input_dim, variance=1.0, active_dims=None):
        return cls(
            input_dim=input_dim,
            active_dims=tuple(active_dims) if active_dims is not None else None,
            variance=jnp.asarray(variance, dtype=float).reshape(()),
        )

    def K(self, X, X2=None):
        n = X.shape[0]
        if X2 is None:
            return self.variance * jnp.eye(n, dtype=X.dtype)
        return jnp.zeros((n, X2.shape[0]), dtype=X.dtype)

    def Kdiag(self, X):
        return jnp.full((X.shape[0],), 1.0, dtype=X.dtype) * self.variance


@pytree_dataclass
class Bias(Kernel):
    """Constant covariance sigma^2 (GPy static.py:137)."""

    variance: jnp.ndarray = None

    @classmethod
    def create(cls, input_dim, variance=1.0, active_dims=None):
        return cls(
            input_dim=input_dim,
            active_dims=tuple(active_dims) if active_dims is not None else None,
            variance=jnp.asarray(variance, dtype=float).reshape(()),
        )

    def K(self, X, X2=None):
        m = X.shape[0] if X2 is None else X2.shape[0]
        return jnp.full((X.shape[0], m), 1.0, dtype=X.dtype) * self.variance

    def Kdiag(self, X):
        return jnp.full((X.shape[0],), 1.0, dtype=X.dtype) * self.variance


@pytree_dataclass
class WhiteHeteroscedastic(Kernel):
    """Per-point noise kernel: K(X_train) = diag(variances); zero off the training
    set (GPy static.py WhiteHeteroscedastic)."""

    variances: jnp.ndarray = None

    @classmethod
    def create(cls, input_dim, num_data, variance=1.0, active_dims=None):
        return cls(
            input_dim=input_dim,
            active_dims=tuple(active_dims) if active_dims is not None else None,
            variances=jnp.broadcast_to(jnp.asarray(variance, dtype=float), (num_data,)),
        )

    def K(self, X, X2=None):
        n = X.shape[0]
        if X2 is None:
            return jnp.diag(jnp.broadcast_to(self.variances, (n,)))
        return jnp.zeros((n, X2.shape[0]), dtype=X.dtype)

    def Kdiag(self, X):
        return jnp.broadcast_to(self.variances, (X.shape[0],))


@pytree_dataclass
class Fixed(Kernel):
    """Fixed covariance matrix scaled by a variance (GPy static.py:177).

    Only meaningful on the training set: K(X) = variance * fixed_K.
    """

    variance: jnp.ndarray = None
    fixed_K: jnp.ndarray = None

    @classmethod
    def create(cls, input_dim, fixed_K, variance=1.0, active_dims=None):
        return cls(
            input_dim=input_dim,
            active_dims=tuple(active_dims) if active_dims is not None else None,
            variance=jnp.asarray(variance, dtype=float).reshape(()),
            fixed_K=jnp.asarray(fixed_K, dtype=float),
        )

    def K(self, X, X2=None):
        if X2 is None:
            return self.variance * self.fixed_K
        return jnp.zeros((X.shape[0], X2.shape[0]), dtype=self.fixed_K.dtype)

    def Kdiag(self, X):
        return self.variance * jnp.diagonal(self.fixed_K)
