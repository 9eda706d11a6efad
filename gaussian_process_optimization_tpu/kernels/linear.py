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


@pytree_dataclass
class LinearFull(Kernel):
    """Full-matrix linear kernel K = X (W W^T + diag(kappa)) X2^T
    (GPy kern/src/linear.py:183 LinearFull). W is (input_dim, rank), kappa a
    positive diagonal; the reference's hand-written einsum gradients
    (update_gradients_full :201-206) are autodiff here."""

    W: jnp.ndarray = None      # (D, rank)
    kappa: jnp.ndarray = None  # (D,) positive

    @classmethod
    def create(cls, input_dim, rank, W=None, kappa=None, active_dims=None):
        W = jnp.ones((input_dim, rank)) if W is None else jnp.asarray(W, dtype=float)
        kappa = (jnp.ones((input_dim,)) if kappa is None
                 else jnp.asarray(kappa, dtype=float))
        assert W.shape == (input_dim, rank)
        assert kappa.shape == (input_dim,)
        return cls(
            input_dim=input_dim,
            active_dims=tuple(active_dims) if active_dims is not None else None,
            W=W, kappa=kappa,
        )

    def _P(self):
        return self.W @ self.W.T + jnp.diag(self.kappa)

    def K(self, X, X2=None):
        X = self._slice(X)
        X2c = X if X2 is None else self._slice(X2)
        return (X @ self._P()) @ X2c.T

    def Kdiag(self, X):
        X = self._slice(X)
        return jnp.sum((X @ self._P()) * X, axis=-1)

    def input_sensitivity(self, summarize=True):
        return jnp.diagonal(self._P())
