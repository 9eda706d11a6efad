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


def lcm_kernel(input_dim, num_outputs, base_kernels, rank=1):
    """Linear coregionalization model: sum of ICM terms, one per base kernel,
    each with its own coregionalization matrix (GPy util/multioutput.LCM:62)."""
    parts = [icm_kernel(input_dim, num_outputs, base_kernel=k, rank=rank)
             for k in base_kernels]
    out = parts[0]
    for p in parts[1:]:
        out = out + p
    return out


def private_kernel(input_dim, num_outputs, base_kernel=None, output=0, kappa=1.0):
    """Output-private ICM term: W = 0 and kappa one-hot at `output`, so the
    base kernel contributes ONLY to that output's block
    (GPy util/multioutput.Private:82 — which fixes B.W to 0 and zeroes the
    other kappas). To keep it private under fitting, pass
    fix=("W", "kappa") through the fitter."""
    W = np.zeros((num_outputs, 1))
    kap = np.zeros((num_outputs,))
    kap[output] = float(kappa)
    return icm_kernel(input_dim, num_outputs, base_kernel=base_kernel, rank=1,
                      W=W, kappa=kap)


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


class SparseGPCoregionalizedRegression:
    """Sparse (VarDTC) coregionalized multi-output regression
    (GPy models/sparse_gp_coregionalized_regression.py:10): stacked per-output
    data + ICM kernel + inducing points stacked per output with a task column.

    The reference fixes the inducing task column (`self['.*inducing'][:,-1]
    .fix()`, :66); here the Coregionalize gather rounds the task column, so its
    gradient is exactly zero and fitting cannot move it — same semantics
    without per-column parameter surgery.
    """

    def __init__(self, X_list, Y_list, Z_list=None, base_kernel=None, rank=1,
                 num_inducing=10, noise_var=0.1, inference="vardtc", seed=0):
        from .sparse import SparseGPRegression

        X, Y = build_stacked_XY(X_list, Y_list)
        self.num_outputs = len(X_list)
        self.input_dim = X.shape[1] - 1
        kern = icm_kernel(self.input_dim, self.num_outputs, base_kernel,
                          rank=rank)
        if Z_list is None:
            rng = np.random.default_rng(seed)
            if np.isscalar(num_inducing):
                num_inducing = [int(num_inducing)] * self.num_outputs
            Z_list = []
            for ni, Xi in zip(num_inducing, X_list):
                Xi = np.atleast_2d(np.asarray(Xi, dtype=float))
                idx = rng.permutation(len(Xi))[:min(ni, len(Xi))]
                Z_list.append(Xi[idx].copy())
        else:
            assert len(Z_list) == self.num_outputs, (
                "Number of outputs does not match length of inducing list")
        Z, _ = build_stacked_XY(Z_list, [np.zeros((len(z), 1)) for z in Z_list])
        self.model = SparseGPRegression.create(
            X, Y, kernel=kern, Z=Z, noise_var=noise_var, inference=inference)

    def optimize(self, num_restarts=1, maxiter=300, key=None):
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


class SparseGPRegressionMD:
    """Missing-data sparse GP regression
    (GPy models/sparse_gp_regression_md.py:13 + inference vardtc_md.py): a
    single column of observations Y with `indexD[n]` naming the output
    dimension each row belongs to; the bound is the sum of per-output VarDTC
    bounds sharing one Kmm factorization (`SparseGPRegression.missing_data_lml`,
    models/sparse.py). Here the ragged per-output rows become a dense (N, P)
    one-hot output mask — the per-output loop is a vmap.
    """

    def __init__(self, X, Y, indexD, kernel=None, Z=None, num_inducing=10,
                 noise_var=None, seed=0):
        from .sparse import SparseGPRegression

        X = np.atleast_2d(np.asarray(X, dtype=float))
        Y = np.asarray(Y, dtype=float).reshape(len(X), 1)
        indexD = np.asarray(indexD).astype(int).reshape(-1)
        assert len(indexD) == len(X)
        self.output_dim = int(indexD.max()) + 1
        self.indexD = indexD
        # per-output stacked columns: Y_md[n, p] = Y[n] where indexD[n] == p
        self.output_mask = np.zeros((len(X), self.output_dim))
        self.output_mask[np.arange(len(X)), indexD] = 1.0
        Y_md = self.output_mask * Y
        if noise_var is None:
            noise_var = float(np.var(Y) * 0.01)  # gpmodel-style default (:56)
        self.model = SparseGPRegression.create(
            X, Y_md, kernel=kernel, Z=Z, num_inducing=num_inducing,
            noise_var=noise_var, seed=seed)

    def log_marginal_likelihood(self):
        return self.model.missing_data_lml(jnp.asarray(self.output_mask))

    def optimize(self, num_restarts=1, maxiter=300, key=None):
        """Fit hyperparameters of the missing-data bound by autodiff (replaces
        the reference's hand-assembled dL_dKdiag/dL_dKnm/dL_dKmm plumbing,
        sparse_gp_regression_md.py:66-78)."""
        import jax

        from .parameters import make_packer

        packer = make_packer(self.model)
        mask = jnp.asarray(self.output_mask)

        def objective(u):
            m = packer.unpack(u)
            return -m.missing_data_lml(mask)

        from ..ops import lbfgs

        u0 = packer.pack(self.model)
        best_u, best_f = u0, float(objective(u0))
        key = key if key is not None else jax.random.PRNGKey(0)
        for r in range(num_restarts):
            if r == 0:
                u_init = u0
            else:
                key, sub = jax.random.split(key)
                z = jax.random.normal(sub, u0.shape, dtype=u0.dtype)
                u_init = packer.map_restart(z)
            res = lbfgs.minimize(objective, u_init, maxiter=maxiter)
            f = float(res.f)
            if np.isfinite(f) and f < best_f:
                best_u, best_f = res.x, f
        self.model = packer.unpack(best_u)
        return {"objective": best_f}

    def predict(self, Xnew, task, include_likelihood=True):
        """Posterior for output `task`: the collapsed VarDTC posterior using
        only that output's observed rows (vardtc_md.py semantics)."""
        from .. import config
        from ..ops import linalg

        m = self.model
        Xnew = jnp.asarray(np.atleast_2d(np.asarray(Xnew, dtype=float)))
        sigma2 = m.likelihood_variance + config.noise_jitter
        Lm, A, Kdiag, Yc, _ = m._factorize()
        mm = m.Z.shape[0]
        w = jnp.asarray(self.output_mask[:, task], dtype=A.dtype)
        Aw = A * w[None, :]
        B = jnp.eye(mm, dtype=A.dtype) + (Aw @ Aw.T) / sigma2
        LB, _, _ = linalg.jitchol(B)
        c = linalg.solve_lower(LB, Aw @ (Yc[:, task] * w)) / sigma2
        Kms = m.kern.K(m.Z, Xnew)
        tmp = linalg.solve_lower(Lm, Kms)
        tmp2 = linalg.solve_lower(LB, tmp)
        mu = tmp2.T @ c
        var = (m.kern.Kdiag(Xnew) - jnp.sum(jnp.square(tmp), 0)
               + jnp.sum(jnp.square(tmp2), 0))
        if include_likelihood:
            var = var + m.likelihood_variance
        return mu[:, None], jnp.clip(var, 1e-15, None)[:, None]
