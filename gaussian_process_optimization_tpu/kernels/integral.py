"""Integral kernel (GPy/GPy/kern/src/integral.py:10): a GP over a latent rate
f with RBF covariance k_ff, observed through its running integral
F(t) = int_0^t f(s) ds.

- K(X)        -> k_xx: Cov[F(t), F(t')], the double integral of k_ff
                 (integral.py:51-52, via g(z) = z sqrt(pi) erf(z) + e^{-z^2})
- K(X, X2)    -> k_xf: Cov[F(t), f(t')] (integral.py:58-59)
- Kdiag(X)    -> k_ff diag (integral.py:76-83's hack, kept for API parity)

The reference computes every entry in a Python double loop; here the closed
forms evaluate on full (N, M) grids (VPU elementwise + erf). 1-D inputs.
tests/test_periodic_rkhs.py checks k_xx/k_xf against numerical quadrature of
k_ff and gradient-consistency through the LML.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.pytree import pytree_dataclass
from .base import Kernel


def _g(z):
    """(integral.py:47-48)"""
    return z * jnp.sqrt(jnp.pi) * jax.scipy.special.erf(z) + jnp.exp(-(z**2))


@pytree_dataclass
class Integral(Kernel):
    variances: jnp.ndarray = None
    lengthscale: jnp.ndarray = None

    @classmethod
    def create(cls, input_dim=1, variances=1.0, lengthscale=1.0, active_dims=None):
        assert input_dim == 1, "Integral kernel is 1-D (integral.py:15-25)"
        return cls(
            input_dim=1,
            active_dims=tuple(active_dims) if active_dims is not None else None,
            variances=jnp.asarray(variances, dtype=float).reshape(()),
            lengthscale=jnp.asarray(lengthscale, dtype=float).reshape(()),
        )

    def k_xx(self, t, tprime):
        """Cov of the integrals: 0.5 l^2 (g(t/l) - g((t-t')/l) + g(t'/l) - 1)."""
        l = self.lengthscale
        return 0.5 * l**2 * (_g(t / l) - _g((t - tprime) / l) + _g(tprime / l) - 1.0)

    def k_xf(self, t, tprime):
        """Cov of integral vs latent: 0.5 sqrt(pi) l (erf((t-t')/l) + erf(t'/l))."""
        l = self.lengthscale
        erf = jax.scipy.special.erf
        return 0.5 * jnp.sqrt(jnp.pi) * l * (erf((t - tprime) / l) + erf(tprime / l))

    def k_ff(self, t, tprime):
        return jnp.exp(-jnp.square(t - tprime) / jnp.square(self.lengthscale))

    def K(self, X, X2=None):
        X = self._slice(X)
        t = X[:, 0]
        if X2 is None:
            return self.variances * self.k_xx(t[:, None], t[None, :])
        X2 = self._slice(X2)
        return self.variances * self.k_xf(t[:, None], X2[:, 0][None, :])

    def Kdiag(self, X):
        X = self._slice(X)
        t = X[:, 0]
        return self.variances * self.k_ff(t, t)
