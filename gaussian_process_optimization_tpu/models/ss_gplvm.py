"""Spike-and-Slab GPLVM (GPy/GPy/models/ss_gplvm.py:1-310): Bayesian GPLVM with
a spike-and-slab variational posterior over the latents — per-point, per-dim
inclusion probabilities gamma select the relevant latent dimensions
(automatic dimensionality selection).

Components rebuilt:
- SSRBF psi statistics (``GPy/GPy/kern/src/psi_comp/ssrbf_psi_comp.py:13-90`` —
  a weave C triple loop in the reference): each factor is a two-term
  log-sum-exp mixing the slab (Gaussian q) and spike (x_q = 0) contributions,
  vectorized over (n, m, q) / (n, m1, m2, q);
- the spike-and-slab KL (``core/parameterization/variational.py
  SpikeAndSlabPrior.KL_divergence :52-68`` with prior variance 1):
  sum gamma*log(gamma/pi) + (1-gamma)*log((1-gamma)/(1-pi))
  + 0.5 sum gamma*(mu^2 + S - log S - 1);
- the collapsed bound shared with the Bayesian GPLVM (models/gplvm.py).

When gamma -> 1 everything reduces exactly to the Bayesian GPLVM (tested).
Gradients for (q_mu, q_S, gamma, Z, hyperparameters) come from one autodiff
pass; the reference hand-derives each (psiDerivativecomputations + KL grads).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..kernels.stationary import RBF
from ..utils.pytree import pytree_dataclass, static_field
from .gplvm import collapsed_bound_from_psi


def ssrbf_psi_stats(kern, Z, mu, S, gamma):
    """(psi0, psi1, psi2) of the RBF kernel under the spike-and-slab posterior
    q(x_nq) = gamma_nq N(mu_nq, S_nq) + (1-gamma_nq) delta(x_nq)
    (ssrbf_psi_comp.py:49-88, in stable log-sum-exp form)."""
    var = kern.variance
    Q = mu.shape[1]
    l2 = jnp.broadcast_to(jnp.square(kern.lengthscale), (Q,))
    log_g = jnp.log(jnp.clip(gamma, 1e-12, 1.0))
    log_g1 = jnp.log(jnp.clip(1.0 - gamma, 1e-12, 1.0))

    psi0 = mu.shape[0] * var

    # psi1: factors over q of gamma*exp-slab + (1-gamma)*exp-spike
    denom1 = S + l2[None, :]  # (N, Q)
    log_denom1 = jnp.log1p(S / l2[None, :])
    muZ = mu[:, None, :] - Z[None, :, :]  # (N, M, Q)
    a1 = (log_g[:, None, :]
          - 0.5 * (jnp.square(muZ) / denom1[:, None, :]
                   + log_denom1[:, None, :]))
    a2 = log_g1[:, None, :] - jnp.square(Z)[None, :, :] / (2.0 * l2)
    psi1 = var * jnp.exp(jnp.sum(jnp.logaddexp(a1, a2), axis=2))  # (N, M)

    # psi2: pairwise over (m1, m2)
    denom2 = 2.0 * S + l2[None, :]  # (N, Q)
    log_denom2 = jnp.log1p(2.0 * S / l2[None, :])
    Zbar = 0.5 * (Z[:, None, :] + Z[None, :, :])  # (M, M, Q)
    dZ2 = jnp.square(Z[:, None, :] - Z[None, :, :])  # (M, M, Q)
    Z2sum = (jnp.square(Z)[:, None, :] + jnp.square(Z)[None, :, :])  # (M, M, Q)
    muZhat = mu[:, None, None, :] - Zbar[None, :, :, :]  # (N, M, M, Q)
    b1 = (log_g[:, None, None, :]
          - dZ2[None] / (4.0 * l2)
          - jnp.square(muZhat) / denom2[:, None, None, :]
          - 0.5 * log_denom2[:, None, None, :])
    b2 = log_g1[:, None, None, :] - Z2sum[None] / (2.0 * l2)
    psi2n = jnp.square(var) * jnp.exp(jnp.sum(jnp.logaddexp(b1, b2), axis=3))
    return psi0, psi1, jnp.sum(psi2n, axis=0)


def spike_slab_kl(mu, S, gamma, pi):
    """(variational.py SpikeAndSlabPrior.KL_divergence :52-68, prior var 1)."""
    g = jnp.clip(gamma, 1e-12, 1.0 - 1e-12)
    pi = jnp.clip(jnp.asarray(pi), 1e-12, 1.0 - 1e-12)
    kl_bern = jnp.sum(g * jnp.log(g / pi) + (1 - g) * jnp.log((1 - g) / (1 - pi)))
    kl_gauss = 0.5 * jnp.sum(g * (jnp.square(mu) + S - jnp.log(S) - 1.0))
    return kl_bern + kl_gauss


@pytree_dataclass
class SSGPLVM:
    """Spike-and-Slab GPLVM (ss_gplvm.py SSGPLVM)."""

    kern: object = None  # RBF (SSRBF psi statistics)
    likelihood_variance: jnp.ndarray = None
    Z: jnp.ndarray = None
    q_mu: jnp.ndarray = None  # (N, Q)
    q_S: jnp.ndarray = None  # (N, Q) positive
    q_gamma: jnp.ndarray = None  # (N, Q) in (0, 1)
    Y: jnp.ndarray = None
    pi: float = static_field(default=0.5)  # slab prior inclusion probability

    @classmethod
    def create(cls, Y, input_dim, num_inducing=10, kernel=None, noise_var=0.1,
               pi=0.5, seed=0):
        Y = np.asarray(Y, dtype=float)
        n = Y.shape[0]
        Yc = Y - Y.mean(0)
        _, _, Vt = np.linalg.svd(Yc, full_matrices=False)
        mu0 = Yc @ Vt[:input_dim].T
        mu0 /= mu0.std(0) + 1e-9
        rng = np.random.default_rng(seed)
        Z0 = mu0[rng.permutation(n)[:num_inducing]].copy()
        kernel = kernel or RBF.create(input_dim, ARD=True)
        return cls(
            kern=kernel,
            likelihood_variance=jnp.asarray(noise_var, dtype=float).reshape(()),
            Z=jnp.asarray(Z0),
            q_mu=jnp.asarray(mu0),
            q_S=0.5 * jnp.ones((n, input_dim)),
            q_gamma=0.5 * jnp.ones((n, input_dim)),
            Y=jnp.asarray(Yc),
            pi=float(pi),
        )

    def elbo(self):
        psi0, psi1, psi2 = ssrbf_psi_stats(self.kern, self.Z, self.q_mu, self.q_S,
                                           self.q_gamma)
        bound = collapsed_bound_from_psi(
            self.kern, self.Z, self.likelihood_variance, self.Y, psi0, psi1, psi2
        )
        return bound - spike_slab_kl(self.q_mu, self.q_S, self.q_gamma, self.pi)

    def log_marginal_likelihood(self):
        return self.elbo()

    def relevance(self):
        """Per-dimension mean inclusion probability — the dimensionality
        read-out (ss_gplvm plots gamma)."""
        return jnp.mean(self.q_gamma, axis=0)


@pytree_dataclass
class SSMRD:
    """Spike-and-Slab MRD (GPy/GPy/models/ss_mrd.py): V views share one
    spike-and-slab variational latent; per-view ARD kernels/inducing/noise.
    Objective = sum_v collapsed_bound_v(SS psi stats) - SS KL — the MRD
    composition (models/mrd.py) with the SSRBF statistics."""

    kerns: tuple = ()
    noise_vars: jnp.ndarray = None
    Zs: tuple = ()
    q_mu: jnp.ndarray = None
    q_S: jnp.ndarray = None
    q_gamma: jnp.ndarray = None
    Ys: tuple = ()
    pi: float = static_field(default=0.5)

    @classmethod
    def create(cls, Ys, input_dim, num_inducing=10, noise_var=0.1, pi=0.5, seed=0):
        from .mrd import MRD

        base = MRD.create(Ys, input_dim, num_inducing=num_inducing,
                          noise_var=noise_var, seed=seed)
        return cls(
            kerns=base.kerns, noise_vars=base.noise_vars, Zs=base.Zs,
            q_mu=base.q_mu, q_S=base.q_S,
            q_gamma=0.5 * jnp.ones_like(base.q_S), Ys=base.Ys, pi=float(pi),
        )

    def elbo(self):
        bound = 0.0
        for v, (k, Z, Y) in enumerate(zip(self.kerns, self.Zs, self.Ys)):
            psi0, psi1, psi2 = ssrbf_psi_stats(k, Z, self.q_mu, self.q_S,
                                               self.q_gamma)
            bound = bound + collapsed_bound_from_psi(
                k, Z, self.noise_vars[v], Y, psi0, psi1, psi2
            )
        return bound - spike_slab_kl(self.q_mu, self.q_S, self.q_gamma, self.pi)

    def log_marginal_likelihood(self):
        return self.elbo()


def fit_ssgplvm(model: SSGPLVM, maxiter=300):
    """L-BFGS over hyperparameters, Z, and the variational (mu, S, gamma)."""
    from ..ops import lbfgs
    from ..utils.packing import Packer
    from ..utils.transforms import IDENTITY, POSITIVE, Logistic
    from .fit import make_objective
    from .parameters import POSITIVE_NAMES, _leaf_names

    names = _leaf_names(model)
    transforms, fixed = [], []
    for nm in names:
        if nm == "q_gamma":
            transforms.append(Logistic(lo=1e-6, hi=1.0 - 1e-6))
        elif nm in POSITIVE_NAMES or nm == "q_S":
            transforms.append(POSITIVE)
        else:
            transforms.append(IDENTITY)
        fixed.append(nm == "Y")
    packer = Packer(model, transforms=transforms, fixed=fixed)
    obj = make_objective(packer)
    res = lbfgs.minimize(lambda u: obj(u, model), packer.pack(model),
                         maxiter=maxiter)
    return packer.unpack(res.x, reference=model), res
