"""Multi-output (coregionalized) GP regression.

Rebuild of GPy's ICM/LCM helpers (GPy/GPy/util/multioutput.py) and
`GPCoregionalizedRegression` (GPy/GPy/models/gp_coregionalized_regression.py): outputs
are stacked with a task-index column; the kernel is K_data(x, x') * B[task, task']
with B = W W^T + diag(kappa) (kernels/other.py Coregionalize — the Cython gather
loops are XLA gathers).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..kernels.other import Coregionalize
from ..kernels.stationary import RBF
from .gp import GPRegression


def build_stacked_XY(X_list, Y_list):
    """Stack per-output datasets with an appended task-index column
    (GPy util/multioutput.build_XY)."""
    Xs, Ys = [], []
    for i, (X, Y) in enumerate(zip(X_list, Y_list)):
        X = np.atleast_2d(np.asarray(X, dtype=float))
        Y = np.asarray(Y, dtype=float).reshape(len(X), 1)
        Xs.append(np.hstack([X, np.full((len(X), 1), float(i))]))
        Ys.append(Y)
    return np.vstack(Xs), np.vstack(Ys)


def icm_kernel(input_dim, num_outputs, base_kernel=None, rank=1, W=None, kappa=None):
    """Intrinsic coregionalization model kernel: K_data * B (GPy util/multioutput.ICM).
    The data kernel acts on dims [0..input_dim-1], the coregionalization on the task
    column input_dim."""
    base = base_kernel or RBF.create(input_dim)
    import dataclasses

    base = dataclasses.replace(base, active_dims=tuple(range(input_dim)))
    coreg = Coregionalize.create(1, output_dim=num_outputs, rank=rank, W=W,
                                 kappa=kappa, active_dims=(input_dim,))
    return base * coreg


class GPCoregionalizedRegression:
    """Convenience wrapper (GPy models/gp_coregionalized_regression.py): fit one GP
    over the stacked data with an ICM kernel; predict(X, task)."""

    def __init__(self, X_list, Y_list, base_kernel=None, rank=1, noise_var=0.1):
        X, Y = build_stacked_XY(X_list, Y_list)
        self.num_outputs = len(X_list)
        self.input_dim = X.shape[1] - 1
        kern = icm_kernel(self.input_dim, self.num_outputs, base_kernel, rank=rank)
        self.model = GPRegression.create(X, Y, kernel=kern, noise_var=noise_var)

    def optimize(self, num_restarts=3, maxiter=300, key=None):
        from . import fit as fit_mod

        self.model, info = fit_mod.fit(self.model, num_restarts=num_restarts,
                                       maxiter=maxiter, key=key)
        return info

    def log_marginal_likelihood(self):
        return self.model.log_marginal_likelihood()

    def predict(self, Xnew, task):
        Xnew = np.atleast_2d(np.asarray(Xnew, dtype=float))
        Xa = np.hstack([Xnew, np.full((len(Xnew), 1), float(task))])
        return self.model.predict(jnp.asarray(Xa))
