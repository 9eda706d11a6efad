"""Uncollapsed (SVI) Bayesian GPLVM — minibatch training over N
(GPy/GPy/models/bayesian_gplvm_minibatch.py + core/sparse_gp_minibatch.py +
inference/latent_function_inference/var_dtc_parallel.py VarDTC_minibatch).

The collapsed bound (models/gplvm.py) integrates q(U) out analytically but
couples all N points; this version keeps an explicit Gaussian q(U) = N(m, S)
per output so the data term is a SUM OVER POINTS — minibatchable and
data-parallel (the var_dtc_parallel sufficient-statistics allreduce maps to a
psum over the mesh, as in parallel/sharded.py):

    ELBO = sum_n E_{q(x_n) q(U)}[log N(y_n | f_n, beta^-1)]
           - KL(q(U) || p(U)) - KL(q(X) || N(0, I))

with the standard uncertain-input moments (psi statistics). At the OPTIMAL
q(U) the bound equals the collapsed one exactly — tested in
tests/test_bgplvm_svi.py, the strongest available consistency check.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..kernels.stationary import RBF
from ..ops import linalg
from ..utils.pytree import pytree_dataclass
from .gp import LOG_2_PI
from .gplvm import gaussian_kl, rbf_psi_stats_n
from .lvmogp import _tril_chol


@pytree_dataclass
class BGPLVM_SVI:
    kern: object = None  # RBF (psi statistics)
    likelihood_variance: jnp.ndarray = None
    Z: jnp.ndarray = None  # (M, Q)
    q_mu: jnp.ndarray = None  # (N, Q) latent means
    q_S: jnp.ndarray = None  # (N, Q) latent variances (positive)
    qU_mean: jnp.ndarray = None  # (M, P) one mean per output
    qU_A: jnp.ndarray = None  # free (M, M); shared LS = _tril_chol(qU_A)
    Y: jnp.ndarray = None  # (N, P)

    @classmethod
    def create(cls, Y, input_dim, num_inducing=10, kernel=None, noise_var=0.1,
               seed=0):
        Y = np.asarray(Y, dtype=float)
        n, p = Y.shape
        Yc = Y - Y.mean(0)
        _, _, Vt = np.linalg.svd(Yc, full_matrices=False)
        mu0 = Yc @ Vt[:input_dim].T
        mu0 /= mu0.std(0) + 1e-9
        rng = np.random.default_rng(seed)
        Z0 = mu0[rng.permutation(n)[:num_inducing]].copy()
        M = Z0.shape[0]
        return cls(
            kern=kernel or RBF.create(input_dim, ARD=True),
            likelihood_variance=jnp.asarray(noise_var, dtype=float).reshape(()),
            Z=jnp.asarray(Z0),
            q_mu=jnp.asarray(mu0), q_S=0.5 * jnp.ones((n, input_dim)),
            qU_mean=0.01 * jnp.asarray(rng.standard_normal((M, p))),
            qU_A=jnp.eye(M) * -1.0,
            Y=jnp.asarray(Yc),
        )

    def _factors(self):
        M = self.Z.shape[0]
        Kuu = self.kern.K(self.Z) + 1e-6 * jnp.eye(M)
        Lu, _, _ = linalg.jitchol(Kuu)
        LS = _tril_chol(self.qU_A)
        return Lu, LS

    def data_term(self, idx_Y, idx_mu, idx_S, scale=1.0):
        """sum over the given batch of E[log N(y_n | f_n, beta^-1)], times
        `scale` (= N / batch for minibatches, var_dtc_parallel semantics)."""
        beta = 1.0 / (self.likelihood_variance + 1e-8)
        Lu, LS = self._factors()
        M = self.Z.shape[0]
        p = idx_Y.shape[1]
        nb = idx_Y.shape[0]
        psi0, psi1, psi2n = rbf_psi_stats_n(self.kern, self.Z, idx_mu, idx_S)
        psi0n = jnp.broadcast_to(self.kern.variance, (nb,))
        # whitened quantities
        A = linalg.solve_lower(Lu, psi1.T)  # (M, nb): Lu^-1 psi1^T
        Mw = linalg.solve_lower(Lu, self.qU_mean)  # (M, P)
        LSw = linalg.solve_lower(Lu, LS)  # (M, M)
        Sw = LSw @ LSw.T

        def whiten2(p2):
            return linalg.solve_lower(Lu, linalg.solve_lower(Lu, p2).T).T

        P2n = jax.vmap(whiten2)(psi2n)  # (nb, M, M)
        Ef = A.T @ Mw  # (nb, P): psi1 Kuu^-1 m
        # E[f^2] = tr(P2n (Sw + Mw Mw^T)) per output; cross handled per column
        quad_m = jnp.einsum("nij,ip,jp->np", P2n, Mw, Mw)
        quad_S = jnp.einsum("nij,ij->n", P2n, Sw)[:, None]
        Ef2 = quad_m + quad_S
        resid = psi0n - jnp.einsum("nii->n", P2n)  # E[k_nn] - tr(Kuu^-1 Psi2_n)
        ll = (
            -0.5 * nb * p * (LOG_2_PI - jnp.log(beta))
            - 0.5 * beta * (
                jnp.sum(jnp.square(idx_Y)) - 2.0 * jnp.sum(idx_Y * Ef)
                + jnp.sum(Ef2) + p * jnp.sum(resid)
            )
        )
        return scale * ll

    def kl_u(self):
        """KL(q(U) || p(U)) with shared covariance S across P outputs."""
        Lu, LS = self._factors()
        M = self.Z.shape[0]
        p = self.qU_mean.shape[1]
        Mw = linalg.solve_lower(Lu, self.qU_mean)
        LSw = linalg.solve_lower(Lu, LS)
        tr = jnp.sum(jnp.square(LSw))
        logdet_ratio = 2.0 * (jnp.sum(jnp.log(jnp.diagonal(Lu)))
                              - jnp.sum(jnp.log(jnp.diagonal(LS))))
        return 0.5 * (p * tr + jnp.sum(jnp.square(Mw)) - p * M
                      + p * logdet_ratio)

    def elbo(self):
        return (
            self.data_term(self.Y, self.q_mu, self.q_S)
            - self.kl_u()
            - gaussian_kl(self.q_mu, self.q_S)
        )

    def elbo_minibatch(self, idx):
        """Unbiased minibatch estimate: data term scaled by N/|batch|; the
        latent KL of the batch scaled likewise (sparse_gp_minibatch stochastics)."""
        n = self.Y.shape[0]
        scale = n / idx.shape[0]
        return (
            self.data_term(self.Y[idx], self.q_mu[idx], self.q_S[idx],
                           scale=scale)
            - self.kl_u()
            - scale * gaussian_kl(self.q_mu[idx], self.q_S[idx])
        )

    def log_marginal_likelihood(self):
        return self.elbo()

    def optimal_qU(self):
        """Closed-form optimal q(U) at fixed hyperparameters / q(X): plugging it
        in makes the uncollapsed bound equal the collapsed one (Titsias)."""
        beta = 1.0 / (self.likelihood_variance + 1e-8)
        M = self.Z.shape[0]
        Kuu = self.kern.K(self.Z) + 1e-6 * jnp.eye(M)
        psi0, psi1, psi2n = rbf_psi_stats_n(self.kern, self.Z, self.q_mu, self.q_S)
        psi2 = jnp.sum(psi2n, axis=0)
        Kinv = jnp.linalg.inv(Kuu)
        Sigma_inv = Kinv + beta * Kinv @ psi2 @ Kinv
        S_opt = jnp.linalg.inv(Sigma_inv)
        m_opt = beta * S_opt @ Kinv @ (psi1.T @ self.Y)
        return m_opt, S_opt
