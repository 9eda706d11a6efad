"""Split / changepoint and generic multi-output kernels.

- SplitKern / DEtime (GPy/GPy/kern/src/splitKern.py:10,:80): two-condition
  differential-expression model. Inputs carry a condition index in the LAST
  column; same-condition pairs use the base kernel, cross-condition pairs use
  the conditioned cross-covariance

      k_cross(x, x') = k(x, Xp) k(Xp, x') / k(Xp, Xp)

  (both conditions share the function before the split point Xp). The reference
  assembles blocks with index_to_slices + itertools set-items; here it is one
  branchless masked select over the index column — vmappable and jit-safe —
  with gradients by autodiff (replacing ~120 lines of collate_grads plumbing).

- MultioutputKern (GPy/GPy/kern/src/multioutput_kern.py:22): block covariance
  over (x, output_index) with per-output kernels and optional cross-covariance
  callables; missing cross blocks default to zero (ZeroKern :7). Assembled as a
  masked sum of per-pair covariances.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..utils.pytree import pytree_dataclass, static_field
from .base import Kernel


@pytree_dataclass
class SplitKern(Kernel):
    """Two-condition split kernel (splitKern.py:80 SplitKern + :148 cross)."""

    kern: Kernel = None
    Xp: jnp.ndarray = None  # (1, D) split point

    @classmethod
    def create(cls, kernel, Xp):
        Xp = jnp.atleast_2d(jnp.asarray(Xp, dtype=float))
        return cls(input_dim=kernel.input_dim + 1, kern=kernel, Xp=Xp)

    def _cross(self, Xa, Xb):
        k1 = self.kern.K(Xa, self.Xp)  # (n, 1)
        k2 = self.kern.K(self.Xp, Xb)  # (1, m)
        k3 = self.kern.K(self.Xp, self.Xp)[0, 0]
        return (k1 @ k2) / k3

    def K(self, X, X2=None):
        X2c = X if X2 is None else X2
        idx1 = X[:, -1]
        idx2 = X2c[:, -1]
        Xb, X2b = X[:, :-1], X2c[:, :-1]
        K_same = self.kern.K(Xb, X2b)
        K_cross = self._cross(Xb, X2b)
        same = (idx1[:, None] == idx2[None, :])
        return jnp.where(same, K_same, K_cross)

    def Kdiag(self, X):
        return self.kern.Kdiag(X[:, :-1])


@pytree_dataclass
class DEtime(Kernel):
    """DEtime (splitKern.py:10): SplitKern where the FIRST idx_p points of the
    second condition are replicas of the first condition's points (shared
    'before the split' samples) — the reference copies the corresponding K
    rows/columns; equivalently those points are relabeled to condition 0, which
    is what we do (same covariance, no row surgery)."""

    split: SplitKern = None
    idx_p: int = static_field(default=0)

    @classmethod
    def create(cls, kernel, idx_p, Xp):
        return cls(input_dim=kernel.input_dim + 1,
                   split=SplitKern.create(kernel, Xp), idx_p=idx_p)

    def _relabel(self, X):
        n = X.shape[0]
        if self.idx_p <= 0 or self.idx_p > n / 2:
            return X
        # rows of the second condition start at the first index-1 row; assume
        # the reference's layout (condition blocks contiguous: 0s then 1s)
        idx = X[:, -1]
        n0 = jnp.sum(idx == idx[0]).astype(int)
        pos = jnp.arange(n)
        in_replica = (pos >= n0) & (pos < n0 + self.idx_p)
        new_idx = jnp.where(in_replica, idx[0], idx)
        return jnp.concatenate([X[:, :-1], new_idx[:, None]], axis=1)

    def K(self, X, X2=None):
        assert X2 is None, "DEtime.K is defined for X2=None (splitKern.py:19)"
        return self.split.K(self._relabel(X))

    def Kdiag(self, X):
        return self.split.Kdiag(self._relabel(X))


@pytree_dataclass
class MultioutputKern(Kernel):
    """Generic multi-output block kernel (multioutput_kern.py:22).

    kernels: one per output; cross_fns: {(i, j): callable(Xa, Xb) -> (n, m)}
    — pairs without an entry get the zero cross-covariance (ZeroKern).
    Output index rides in the LAST input column.
    """

    kernels: tuple = ()
    cross_fns: dict = static_field(default=None)

    @classmethod
    def create(cls, kernels, cross_covariances=None):
        kernels = tuple(kernels)
        return cls(input_dim=kernels[0].input_dim + 1, kernels=kernels,
                   cross_fns=dict(cross_covariances or {}))

    def _block(self, i, j, Xa, Xb):
        if i == j or (self.kernels[i] is self.kernels[j]):
            return self.kernels[i].K(Xa, Xb)
        fn = (self.cross_fns or {}).get((i, j))
        if fn is not None:
            return fn(Xa, Xb)
        return jnp.zeros((Xa.shape[0], Xb.shape[0]), dtype=Xa.dtype)

    def K(self, X, X2=None):
        X2c = X if X2 is None else X2
        idx1, idx2 = X[:, -1], X2c[:, -1]
        Xb, X2b = X[:, :-1], X2c[:, :-1]
        out = jnp.zeros((X.shape[0], X2c.shape[0]), dtype=X.dtype)
        nl = len(self.kernels)
        for i in range(nl):
            mi = (idx1 == i).astype(X.dtype)[:, None]
            for j in range(nl):
                mj = (idx2 == j).astype(X.dtype)[None, :]
                out = out + mi * mj * self._block(i, j, Xb, X2b)
        return out

    def Kdiag(self, X):
        idx = X[:, -1]
        Xb = X[:, :-1]
        out = jnp.zeros((X.shape[0],), dtype=X.dtype)
        for i, k in enumerate(self.kernels):
            out = out + (idx == i).astype(X.dtype) * k.Kdiag(Xb)
        return out
