"""First-order latent force model kernel (GPy/GPy/kern/src/eq_ode1.py:11
EQ_ODE1; Lawrence, Sanguinetti & Rattray 2007 "SIM"):

    dy_j/dt + d_j y_j(t) = sum_r w_{jr} u_r(t),   u_r ~ GP(0, exp(-(t-t')^2/l_r^2))

so y_j(t) = sum_r w_{jr} int_0^t e^{-d_j (t-s)} u_r(s) ds and all covariances are
closed-form in erf:

    k_fu^{(r)}(t, t')  = w_{jr} (sqrt(pi) l_r / 2) e^{nu^2} e^{-d_j(t-t')}
                         [erf((t-t')/l_r - nu) + erf(t'/l_r + nu)],  nu = d_j l_r/2
    k_ff(t, t')        = sum_r w_{jr} w_{kr} (sqrt(pi) l_r / 2)
                         [h(t', t; d_k, d_j) + h(t, t'; d_j, d_k)]
    h(t, t'; d_j, d_k) = e^{nu_k^2}/(d_j + d_k) * ( e^{-d_k(t-t')}
                         [erf((t-t')/l - nu_k) + erf(t'/l + nu_k)]
                         - e^{-(d_k t + d_j t')} [erf(t/l - nu_k) + erf(nu_k)] )

Inputs carry (time, function index) with index < output_dim selecting output j
and index >= output_dim selecting latent r = index - output_dim (the reference's
layout, eq_ode1.py:84-122). The reference evaluates per-index slices with
erfcx/lnDifErf guards; here the blocks are branchless masked assemblies and the
plain-erf forms are used (accurate for moderate nu = d*l/2; the quadrature tests
in tests/test_lfm.py pin k_fu and k_ff against numerical integration of the
defining ODE integrals).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.pytree import pytree_dataclass, static_field
from .base import Kernel

_SQPI = 1.7724538509055159


def _erf(x):
    return jax.scipy.special.erf(x)


@pytree_dataclass
class EQ_ODE1(Kernel):
    """First-order LFM / SIM kernel (eq_ode1.py)."""

    W: jnp.ndarray = None  # (output_dim, rank) sensitivities
    lengthscale: jnp.ndarray = None  # (rank,)
    decay: jnp.ndarray = None  # (output_dim,)
    output_dim: int = static_field(default=1)
    rank: int = static_field(default=1)

    @classmethod
    def create(cls, output_dim=1, rank=1, W=None, lengthscale=None, decay=None,
               seed=0):
        import numpy as np

        rng = np.random.default_rng(seed)
        if lengthscale is None:
            lengthscale = 0.5 + rng.random(rank)
        if W is None:
            W = 0.5 * rng.standard_normal((output_dim, rank)) / np.sqrt(rank)
        if decay is None:
            decay = np.ones(output_dim)
        return cls(
            input_dim=2,
            W=jnp.asarray(W, dtype=float).reshape(output_dim, rank),
            lengthscale=jnp.broadcast_to(
                jnp.asarray(lengthscale, dtype=float).reshape(-1), (rank,)),
            decay=jnp.broadcast_to(
                jnp.asarray(decay, dtype=float).reshape(-1), (output_dim,)),
            output_dim=output_dim, rank=rank,
        )

    # ---- closed forms (one latent r at a time; scalars broadcast over grids) --
    def _k_uu(self, t, t2, l):
        return jnp.exp(-jnp.square(t - t2) / jnp.square(l))

    def _k_fu(self, t, d, t2, l):
        """Cov[y_j(t), u(t')] for decay d, latent lengthscale l."""
        nu = d * l / 2.0
        return (_SQPI * l / 2.0) * jnp.exp(jnp.square(nu)) * jnp.exp(-d * (t - t2)) \
            * (_erf((t - t2) / l - nu) + _erf(t2 / l + nu))

    def _h(self, t, t2, dj, dk, l):
        """h(t, t'; d_j, d_k) (Lawrence et al. 2007 eq. 7-style)."""
        nu = dk * l / 2.0
        expnu2 = jnp.exp(jnp.square(nu))
        term1 = jnp.exp(-dk * (t - t2)) * (
            _erf((t - t2) / l - nu) + _erf(t2 / l + nu)
        )
        term2 = jnp.exp(-(dk * t + dj * t2)) * (_erf(t / l - nu) + _erf(nu))
        return expnu2 / (dj + dk) * (term1 - term2)

    def _k_ff(self, t, dj, t2, dk, l):
        # derived by integrating k_fu once more against e^{-dj(t-s)}:
        # k_ff = (sqrt(pi) l/2) [h(t', t; dj, dk) + h(t, t'; dk, dj)] where the
        # LAST decay argument of h carries the nu (see _h)
        return (_SQPI * l / 2.0) * (
            self._h(t2, t, dj, dk, l) + self._h(t, t2, dk, dj, l)
        )

    # ---- assembly over the (time, index) layout ---------------------------
    def K(self, X, X2=None):
        X2c = X if X2 is None else X2
        t1, i1 = X[:, 0], X[:, -1].astype(int)
        t2, i2 = X2c[:, 0], X2c[:, -1].astype(int)
        P = self.output_dim
        is_out1 = (i1 < P)[:, None]
        is_out2 = (i2 < P)[None, :]
        # gathered per-row output params (clipped indices; masked out when latent)
        j1 = jnp.clip(i1, 0, P - 1)
        j2 = jnp.clip(i2, 0, P - 1)
        d1 = self.decay[j1][:, None]
        d2 = self.decay[j2][None, :]
        r1 = jnp.clip(i1 - P, 0, self.rank - 1)
        r2 = jnp.clip(i2 - P, 0, self.rank - 1)

        T1 = t1[:, None]
        T2 = t2[None, :]
        out = jnp.zeros((X.shape[0], X2c.shape[0]), dtype=X.dtype)
        for r in range(self.rank):
            l = self.lengthscale[r]
            w1 = self.W[j1, r][:, None]
            w2 = self.W[j2, r][None, :]
            # output-output
            ff = w1 * w2 * self._k_ff(T1, d1, T2, d2, l)
            out = out + jnp.where(is_out1 & is_out2, ff, 0.0)
            # output-latent r (only when the latent column IS latent r)
            lat2_is_r = (i2 == P + r)[None, :]
            fu = w1 * self._k_fu(T1, d1, T2, l)
            out = out + jnp.where(is_out1 & lat2_is_r, fu, 0.0)
            lat1_is_r = (i1 == P + r)[:, None]
            uf = w2 * self._k_fu(T2.T, d2.T, T1.T, l).T
            out = out + jnp.where(lat1_is_r & is_out2, uf, 0.0)
            # latent-latent (same latent only)
            uu = self._k_uu(T1, T2, l)
            out = out + jnp.where(lat1_is_r & lat2_is_r, uu, 0.0)
        return out

    def Kdiag(self, X):
        return jnp.diagonal(self.K(X))
