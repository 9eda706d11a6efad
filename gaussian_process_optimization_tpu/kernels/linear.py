"""Linear kernel (GPy kern/src/linear.py:13): K = X diag(variances) X2^T, optional ARD."""
from __future__ import annotations

import jax.numpy as jnp

from ..utils.pytree import pytree_dataclass
from .base import Kernel


@pytree_dataclass
class Linear(Kernel):
    variances: jnp.ndarray = None

    @classmethod
    def create(cls, input_dim, variances=1.0, ARD=False, active_dims=None):
        v = jnp.asarray(variances, dtype=float)
        v = jnp.broadcast_to(v, (input_dim,)) if ARD else v.reshape(())
        return cls(
            input_dim=input_dim,
            active_dims=tuple(active_dims) if active_dims is not None else None,
            variances=v,
        )

    def K(self, X, X2=None):
        X = self._slice(X)
        X2 = self._slice(X2)
        Xw = X * self.variances
        return Xw @ (X if X2 is None else X2).T

    def Kdiag(self, X):
        X = self._slice(X)
        return jnp.sum(jnp.square(X) * self.variances, axis=-1)

    def input_sensitivity(self, summarize=True):
        """Per-dim variances (GPy linear.py:134 input_sensitivity)."""
        return jnp.broadcast_to(self.variances, (self.input_dim,))
