"""Remaining GPy kernel-zoo entries: TruncLinear (trunclinear.py:11), Symmetric
(symmetric.py:6), the explicit basis-function family (basis_funcs.py:10-200),
and IndependentOutputs (independent_outputs.py).

All are degenerate/composed covariances whose reference gradient plumbing
(update_gradients_full einsums) collapses to autodiff here.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..utils.pytree import pytree_dataclass, static_field
from .base import Kernel


@pytree_dataclass
class TruncLinear(Kernel):
    """k(x, y) = sum_i var_i max(0, (x_i - delta_i)(y_i - delta_i))
    (trunclinear.py:11-71)."""

    variances: jnp.ndarray = None
    delta: jnp.ndarray = None

    @classmethod
    def create(cls, input_dim, variances=1.0, delta=0.0, ARD=False,
               active_dims=None):
        shape = (input_dim,) if ARD else (1,)
        return cls(
            input_dim=input_dim,
            active_dims=tuple(active_dims) if active_dims is not None else None,
            variances=jnp.broadcast_to(jnp.asarray(variances, dtype=float), shape),
            delta=jnp.broadcast_to(jnp.asarray(delta, dtype=float), shape),
        )

    def K(self, X, X2=None):
        X = self._slice(X)
        X2c = X if X2 is None else self._slice(X2)
        prod = (X - self.delta)[:, None, :] * (X2c - self.delta)[None, :, :]
        return jnp.sum(self.variances * jnp.maximum(prod, 0.0), axis=-1)

    def Kdiag(self, X):
        X = self._slice(X)
        return jnp.sum(self.variances * jnp.square(X - self.delta), axis=-1)


@pytree_dataclass
class TruncLinearInf(Kernel):
    """Shift-integrated truncated-linear kernel (trunclinear.py:110
    TruncLinear_inf): per-dimension

        k_q(x, y) = |x - y|^3 / 6 + x y (b - a) - (x + y)(b^2 - a^2)/2
                    + (b^3 - a^3)/3

    summed with per-dim variances over the interval (a, b). The reference's
    hand-written einsum gradients (update_gradients_full :176) are autodiff
    here; its gradients_X is broken upstream (references self.delta, which
    TruncLinear_inf never defines) — autodiff of K supersedes it."""

    variances: jnp.ndarray = None
    interval: tuple = static_field(default=(0.0, 1.0))

    @classmethod
    def create(cls, input_dim, interval, variances=1.0, ARD=False,
               active_dims=None):
        shape = (input_dim,) if ARD else (1,)
        return cls(
            input_dim=input_dim,
            active_dims=tuple(active_dims) if active_dims is not None else None,
            variances=jnp.broadcast_to(jnp.asarray(variances, dtype=float), shape),
            interval=(float(interval[0]), float(interval[1])),
        )

    def _product(self, X, X2):
        a, b = self.interval
        diff = X[:, None, :] - X2[None, :, :]
        return (jnp.abs(diff**3) / 6.0
                + X[:, None, :] * X2[None, :, :] * (b - a)
                - (X[:, None, :] + X2[None, :, :]) * (b * b - a * a) / 2.0
                + (b**3 - a**3) / 3.0)

    def K(self, X, X2=None):
        X = self._slice(X)
        X2c = X if X2 is None else self._slice(X2)
        return jnp.sum(self.variances * self._product(X, X2c), axis=-1)

    def Kdiag(self, X):
        X = self._slice(X)
        a, b = self.interval
        tmp = (jnp.square(X) * (b - a) - X * (b * b - a * a)
               + (b**3 - a**3) / 3.0)
        return jnp.sum(self.variances * tmp, axis=-1)


# reference-spelled alias (GPy class name)
TruncLinear_inf = TruncLinearInf


@pytree_dataclass
class Hierarchical(Kernel):
    """Hierarchical covariance (independent_outputs.py:155, Hensman et al 2013):
    kernels[0] is the base, computed everywhere; each further kernel l adds its
    covariance only between rows sharing the same index in column
    base_dim + l - 1. The reference assembles blocks with index_to_slices +
    nested list-comprehension set-items; here each level is one branchless
    equality-masked select (jit/vmap-safe), gradients by autodiff."""

    parts: tuple = ()
    base_dim: int = static_field(default=1)

    @classmethod
    def create(cls, kernels):
        kernels = tuple(kernels)
        assert len(kernels) > 1, "need a base kernel plus >=1 level"
        # reference hard-asserts equal input_dims (independent_outputs.py:173);
        # without it a narrower level kernel would silently compute covariance
        # over ALL base columns (Kernel._slice is identity when active_dims is
        # None)
        assert all(k.input_dim == kernels[0].input_dim for k in kernels), (
            "Hierarchical needs equal input_dim across kernels "
            "(use active_dims for narrower levels)")
        base_dim = max(k.input_dim for k in kernels)
        return cls(input_dim=base_dim + len(kernels) - 1, parts=kernels,
                   base_dim=base_dim)

    def K(self, X, X2=None):
        X2c = X if X2 is None else X2
        Xb, X2b = X[:, : self.base_dim], X2c[:, : self.base_dim]
        out = self.parts[0].K(Xb, X2b)
        for lvl, kern in enumerate(self.parts[1:]):
            idx1 = X[:, self.base_dim + lvl]
            idx2 = X2c[:, self.base_dim + lvl]
            same = idx1[:, None] == idx2[None, :]
            out = out + jnp.where(same, kern.K(Xb, X2b), 0.0)
        return out

    def Kdiag(self, X):
        # a point always shares every level index with itself (reference
        # Kdiag = diag(K(X)), :200)
        Xb = X[:, : self.base_dim]
        return sum(k.Kdiag(Xb) for k in self.parts)


@pytree_dataclass
class Symmetric(Kernel):
    """Even/odd symmetry about the plane described by transform A
    (symmetric.py:6-60): k(x,x') +- k(Ax,x') +- k(x,Ax') + k(Ax,Ax')."""

    base: Kernel = None
    transform: jnp.ndarray = None  # (D, D)
    sign: float = static_field(default=1.0)  # +1 even, -1 odd

    @classmethod
    def create(cls, base_kernel, transform, symmetry_type="even"):
        sign = {"even": 1.0, "odd": -1.0}[symmetry_type]
        A = jnp.asarray(transform, dtype=float)
        return cls(input_dim=A.shape[0], base=base_kernel, transform=A, sign=sign)

    def K(self, X, X2=None):
        X2c = X if X2 is None else X2
        XA = X @ self.transform.T
        X2A = X2c @ self.transform.T
        k = self.base.K
        return (k(X, X2c) + self.sign * k(XA, X2c)
                + self.sign * k(X, X2A) + k(XA, X2A))

    def Kdiag(self, X):
        return self._pairwise_diag(X)  # O(N), single-sourced closed forms


@pytree_dataclass
class BasisFuncKernel(Kernel):
    """Explicit-feature kernel K = phi(X) diag(variance) phi(X2)^T
    (basis_funcs.py:10-100); subclasses define _phi. ARD = one variance per
    basis function."""

    variance: jnp.ndarray = None

    def _phi(self, X):
        raise NotImplementedError

    def phi(self, X):
        return jnp.atleast_2d(self._phi(self._slice(X)))

    def K(self, X, X2=None):
        p1 = self.phi(X)
        p2 = p1 if X2 is None else self.phi(X2)
        return (p1 * self.variance) @ p2.T

    def Kdiag(self, X):
        p = self.phi(X)
        return jnp.sum(self.variance * jnp.square(p), axis=1)


@pytree_dataclass
class PolynomialBasisFuncKernel(BasisFuncKernel):
    """phi = [1, x, x^2, ..., x^degree] (basis_funcs.py:105-112)."""

    degree: int = static_field(default=2)

    @classmethod
    def create(cls, input_dim, degree, variance=1.0, ARD=True, active_dims=None):
        assert input_dim == 1, "basis-function kernels are 1-D (basis_funcs.py:18)"
        shape = (degree + 1,) if ARD else (1,)
        return cls(input_dim=1,
                   active_dims=tuple(active_dims) if active_dims is not None else None,
                   variance=jnp.broadcast_to(jnp.asarray(variance, dtype=float), shape),
                   degree=degree)

    def _phi(self, X):
        return jnp.power(X, jnp.arange(self.degree + 1, dtype=X.dtype)[None, :])


@pytree_dataclass
class LinearSlopeBasisFuncKernel(BasisFuncKernel):
    """Linear between start and stop, constant outside, centered
    (basis_funcs.py:126-146)."""

    start: jnp.ndarray = None
    stop: jnp.ndarray = None

    @classmethod
    def create(cls, input_dim, start, stop, variance=1.0, ARD=False,
               active_dims=None):
        start = jnp.atleast_1d(jnp.asarray(start, dtype=float))
        shape = start.shape if ARD else (1,)
        return cls(input_dim=1,
                   active_dims=tuple(active_dims) if active_dims is not None else None,
                   variance=jnp.broadcast_to(jnp.asarray(variance, dtype=float), shape),
                   start=start,
                   stop=jnp.atleast_1d(jnp.asarray(stop, dtype=float)))

    def _phi(self, X):
        phi = jnp.clip(X, self.start[None, :], self.stop[None, :])
        return phi - (self.stop + self.start) / 2.0


@pytree_dataclass
class ChangePointBasisFuncKernel(BasisFuncKernel):
    """phi = where(X < changepoint, -1, 1) (basis_funcs.py:148-161)."""

    changepoint: jnp.ndarray = None

    @classmethod
    def create(cls, input_dim, changepoint, variance=1.0, active_dims=None):
        return cls(input_dim=1,
                   active_dims=tuple(active_dims) if active_dims is not None else None,
                   variance=jnp.atleast_1d(jnp.asarray(variance, dtype=float)),
                   changepoint=jnp.atleast_1d(jnp.asarray(changepoint, dtype=float)))

    def _phi(self, X):
        return jnp.where(X < self.changepoint[None, :], -1.0, 1.0)


@pytree_dataclass
class DomainKernel(BasisFuncKernel):
    """Constant correlation plateau on (start, stop) (basis_funcs.py:163-175)."""

    start: jnp.ndarray = None
    stop: jnp.ndarray = None

    @classmethod
    def create(cls, input_dim, start, stop, variance=1.0, active_dims=None):
        return cls(input_dim=1,
                   active_dims=tuple(active_dims) if active_dims is not None else None,
                   variance=jnp.atleast_1d(jnp.asarray(variance, dtype=float)),
                   start=jnp.atleast_1d(jnp.asarray(start, dtype=float)),
                   stop=jnp.atleast_1d(jnp.asarray(stop, dtype=float)))

    def _phi(self, X):
        return jnp.where((X > self.start[None, :]) & (X < self.stop[None, :]),
                         1.0, 0.0)


@pytree_dataclass
class LogisticBasisFuncKernel(BasisFuncKernel):
    """Logistic bumps at given centers with trainable slopes
    (basis_funcs.py:177-220)."""

    centers: jnp.ndarray = None
    slope: jnp.ndarray = None

    @classmethod
    def create(cls, input_dim, centers, variance=1.0, slope=1.0, ARD=False,
               active_dims=None):
        centers = jnp.atleast_1d(jnp.asarray(centers, dtype=float)).reshape(-1)
        shape = centers.shape if ARD else (1,)
        return cls(input_dim=1,
                   active_dims=tuple(active_dims) if active_dims is not None else None,
                   variance=jnp.broadcast_to(jnp.asarray(variance, dtype=float), shape),
                   centers=centers,
                   slope=jnp.broadcast_to(jnp.asarray(slope, dtype=float),
                                          centers.shape))

    def _phi(self, X):
        z = (X - self.centers[None, :]) * self.slope[None, :]
        return jax_sigmoid(z)


def jax_sigmoid(z):
    return 1.0 / (1.0 + jnp.exp(-z))


def IndependentOutputs(kernels, output_dim=None):
    """Block-diagonal multi-output: each output gets its own kernel (or copies
    of one), zero cross-covariance (GPy independent_outputs.py). Composed from
    MultioutputKern with no cross entries; index in the last input column."""
    from .split import MultioutputKern

    import dataclasses

    if isinstance(kernels, (list, tuple)):
        ks = list(kernels)
    else:
        assert output_dim is not None, "pass output_dim when sharing one kernel"
        # distinct OBJECTS sharing parameters: MultioutputKern treats identical
        # objects as the SAME latent function (full cross-covariance); the
        # independent-outputs semantics needs distinct functions -> copies
        ks = [dataclasses.replace(kernels) for _ in range(output_dim)]
    return MultioutputKern.create(ks)
