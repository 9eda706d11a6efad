"""Periodic-subspace Matern RKHS kernels (GPy/GPy/kern/src/periodic.py:12
Periodic, :70 PeriodicExponential, :171 PeriodicMatern32, :284 PeriodicMatern52).

These are NOT the standard-periodic (exp-sine) kernel: they project the Matern
RKHS onto the span of n_freq Fourier harmonics of a given period,

    K(x, x') = F(x) G^{-1} F(x')^T,

where F collects cos/sin basis functions and G is the RKHS Gram matrix of the
basis under the Matern differential operator on [lower, upper] (computed in
closed form from products of cosines — ``Gram_matrix`` in the reference).

Differences from the reference (documented): phases come from ``arctan2``
(the reference's arctan-plus-branch formula relies on silenced numpy errors and
mishandles the r1 == 0 case); the degenerate omega_i == omega_j integral is a
masked select instead of NaN-then-replace; and K solves against G instead of
materializing G^{-1}. Parameter gradients come from autodiff through the whole
construction (replacing ~150 lines of hand gradients per subclass).

tests/test_periodic_rkhs.py validates the closed-form Gram against numerical
quadrature of the RKHS inner products, plus PSD/periodicity.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..utils.pytree import pytree_dataclass, static_field
from .base import Kernel


def _cos_factorization(alpha, omega, phase):
    """Combine per-row sums of cosine terms sharing a frequency into a single
    r*cos(omega x + psi) (periodic.py:44-50 _cos_factorization)."""
    r1 = jnp.sum(alpha * jnp.cos(phase), axis=1)[:, None]
    r2 = jnp.sum(alpha * jnp.sin(phase), axis=1)[:, None]
    r = jnp.sqrt(r1**2 + r2**2)
    psi = jnp.arctan2(r2, r1)
    return r, omega[:, 0:1], psi


def _int_computation(lower, upper, r1, omega1, phi1, r2, omega2, phi2):
    """int_lower^upper r1 cos(w1 x + p1) r2 cos(w2 x + p2) dx, elementwise over
    the outer pairing (periodic.py:52-57 _int_computation); the w1 == w2
    degenerate limit is a masked select."""
    wsum = omega1 + omega2.T
    wdiff = omega1 - omega2.T
    psum = phi1 + phi2.T
    pdiff = phi1 - phi2.T
    term_sum = (jnp.sin(wsum * upper + psum) - jnp.sin(wsum * lower + psum)) / wsum
    same = jnp.abs(wdiff) < 1e-10
    wdiff_safe = jnp.where(same, 1.0, wdiff)
    term_diff = jnp.where(
        same,
        jnp.cos(pdiff) * (upper - lower),
        (jnp.sin(wdiff * upper + pdiff) - jnp.sin(wdiff * lower + pdiff)) / wdiff_safe,
    )
    return (r1 @ r2.T) / 2.0 * (term_sum + term_diff)


@pytree_dataclass
class _PeriodicRKHS(Kernel):
    variance: jnp.ndarray = None
    lengthscale: jnp.ndarray = None
    period: jnp.ndarray = None
    n_freq: int = static_field(default=10)
    lower: float = static_field(default=0.0)
    upper: float = static_field(default=4.0 * 3.141592653589793)

    @classmethod
    def create(cls, input_dim=1, variance=1.0, lengthscale=1.0,
               period=2.0 * 3.141592653589793, n_freq=10, lower=0.0,
               upper=4.0 * 3.141592653589793, active_dims=None):
        assert input_dim == 1, "periodic RKHS kernels are 1-D (periodic.py:27)"
        return cls(
            input_dim=1,
            active_dims=tuple(active_dims) if active_dims is not None else None,
            variance=jnp.asarray(variance, dtype=float).reshape(()),
            lengthscale=jnp.asarray(lengthscale, dtype=float).reshape(()),
            period=jnp.asarray(period, dtype=float).reshape(()),
            n_freq=n_freq, lower=float(lower), upper=float(upper),
        )

    # --- basis ---
    def _basis(self):
        f = jnp.arange(1, self.n_freq + 1, dtype=float)
        omega = jnp.repeat(2.0 * jnp.pi * f / self.period, 2)  # (2F,)
        phi = jnp.tile(jnp.asarray([-jnp.pi / 2.0, 0.0]), self.n_freq)
        alpha = jnp.ones((2 * self.n_freq,))
        return alpha, omega, phi

    def _FX(self, x):
        alpha, omega, phi = self._basis()
        return alpha[None, :] * jnp.cos(omega[None, :] * x + phi[None, :])

    # --- operator definition per subclass ---
    def _operator_columns(self, omega, phi):
        """(La, Lo, Lp): columns of cosine terms of the Matern operator applied
        to each basis function."""
        raise NotImplementedError

    def _gram(self):
        raise NotImplementedError

    def _gram_int(self):
        alpha, omega, phi = self._basis()
        La, Lo, Lp = self._operator_columns(omega, phi)
        r, w, p = _cos_factorization(La, Lo, Lp)
        return _int_computation(self.lower, self.upper, r, w, p, r, w, p)

    def _f_at_lower(self, order):
        """Basis derivatives evaluated at `lower`: order 0/1/2 -> F, F', F''."""
        alpha, omega, phi = self._basis()
        a = alpha * omega**order
        return (a * jnp.cos(omega * self.lower + phi + order * jnp.pi / 2.0))[:, None]

    # --- kernel contract ---
    def K(self, X, X2=None):
        X = self._slice(X)
        X2c = X if X2 is None else self._slice(X2)
        FX = self._FX(X[:, 0:1])
        FX2 = FX if X2 is None else self._FX(X2c[:, 0:1])
        G = self._gram()
        return FX @ jnp.linalg.solve(G, FX2.T)

    def Kdiag(self, X):
        return self._pairwise_diag(X)  # O(N), single-sourced closed forms


@pytree_dataclass
class PeriodicExponential(_PeriodicRKHS):
    """Periodic subspace of the Matern-1/2 RKHS (periodic.py:70-101):
    G = l/(2 s2) Gint + F(lower) F(lower)^T / s2,
    Gint from the operator a0 f + a1 f' with a = [1/l, 1]."""

    def _operator_columns(self, omega, phi):
        ones = jnp.ones_like(omega)[:, None]
        La = jnp.column_stack([(1.0 / self.lengthscale) * ones[:, 0], omega])
        Lo = jnp.column_stack([omega, omega])
        Lp = jnp.column_stack([phi, phi + jnp.pi / 2.0])
        return La, Lo, Lp

    def _gram(self):
        Gint = self._gram_int()
        Fl = self._f_at_lower(0)
        return (self.lengthscale / (2.0 * self.variance)) * Gint \
            + (Fl @ Fl.T) / self.variance


@pytree_dataclass
class PeriodicMatern32(_PeriodicRKHS):
    """Periodic subspace of the Matern-3/2 RKHS (periodic.py:171-209):
    operator a = [3/l^2, 2 sqrt(3)/l, 1];
    G = l^3/(12 sqrt(3) s2) Gint + F F^T/s2 + l^2/(3 s2) F' F'^T (at lower)."""

    def _operator_columns(self, omega, phi):
        La = jnp.column_stack([
            (3.0 / self.lengthscale**2) * jnp.ones_like(omega),
            (2.0 * jnp.sqrt(3.0) / self.lengthscale) * omega,
            omega**2,
        ])
        Lo = jnp.column_stack([omega, omega, omega])
        Lp = jnp.column_stack([phi, phi + jnp.pi / 2.0, phi + jnp.pi])
        return La, Lo, Lp

    def _gram(self):
        Gint = self._gram_int()
        Fl = self._f_at_lower(0)
        F1l = self._f_at_lower(1)
        return (
            self.lengthscale**3 / (12.0 * jnp.sqrt(3.0) * self.variance) * Gint
            + (Fl @ Fl.T) / self.variance
            + self.lengthscale**2 / (3.0 * self.variance) * (F1l @ F1l.T)
        )


@pytree_dataclass
class PeriodicMatern52(_PeriodicRKHS):
    """Periodic subspace of the Matern-5/2 RKHS (periodic.py:284-330):
    operator a = [5 sqrt(5)/l^3, 15/l^2, 3 sqrt(5)/l, 1]; boundary terms with
    b = [9/8, 9 l^4/200, 3 l^2/5, 3 l^2/40, 3 l^2/40]."""

    def _operator_columns(self, omega, phi):
        La = jnp.column_stack([
            (5.0 * jnp.sqrt(5.0) / self.lengthscale**3) * jnp.ones_like(omega),
            (15.0 / self.lengthscale**2) * omega,
            (3.0 * jnp.sqrt(5.0) / self.lengthscale) * omega**2,
            omega**3,
        ])
        Lo = jnp.column_stack([omega] * 4)
        Lp = jnp.column_stack([phi, phi + jnp.pi / 2.0, phi + jnp.pi,
                               phi + 3.0 * jnp.pi / 2.0])
        return La, Lo, Lp

    def _gram(self):
        Gint = self._gram_int()
        Fl = self._f_at_lower(0)
        F1l = self._f_at_lower(1)
        F2l = self._f_at_lower(2)
        l2 = self.lengthscale**2
        lower_terms = (
            (9.0 / 8.0) * (Fl @ Fl.T)
            + (9.0 * l2**2 / 200.0) * (F2l @ F2l.T)
            + (3.0 * l2 / 5.0) * (F1l @ F1l.T)
            + (3.0 * l2 / 40.0) * (F2l @ Fl.T)
            + (3.0 * l2 / 40.0) * (Fl @ F2l.T)
        )
        return (
            3.0 * self.lengthscale**5 / (400.0 * jnp.sqrt(5.0) * self.variance) * Gint
            + lower_terms / self.variance
        )
