"""Classification model wrappers (GPy models zoo):

- GPClassification (GPy/GPy/models/gp_classification.py:10): RBF + Bernoulli
  probit + dense EP inference by default (Laplace selectable).
- SparseGPClassification (GPy/GPy/models/sparse_gp_classification.py:12):
  inducing points + EPDTC.

Thin user-facing wrappers over models/ep.py (and models/laplace.py) with
predict() returning class probabilities via the closed-form probit marginal,
plus a hyperparameter fit loop (EP evidence maximized by L-BFGS in the
alternated style: run EP to convergence, optimize hyperparameters at fixed
sites' evidence, repeat — EPBase ep_mode='alternated', :188).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..kernels.stationary import RBF
from ..ops import linalg
from ..utils.pytree import pytree_dataclass, static_field
from .ep import (
    ep_inference,
    ep_predict,
    epdtc_inference,
    epdtc_predict,
)
from .likelihoods import Bernoulli


def _probit(mu, var):
    return 0.5 * jax.scipy.special.erfc(-(mu / jnp.sqrt(1.0 + var)) / jnp.sqrt(2.0))


@pytree_dataclass
class GPClassification:
    """Dense EP probit classification (gp_classification.py:10)."""

    kern: object = None
    X: jnp.ndarray = None
    Y: jnp.ndarray = None  # (N,) in {-1, +1} (0/1 accepted at create)
    inference_mode: str = static_field(default="parallel")
    max_sweeps: int = static_field(default=60)

    @classmethod
    def create(cls, X, Y, kernel=None, inference_mode="parallel", max_sweeps=60):
        X = jnp.atleast_2d(jnp.asarray(X, dtype=float))
        Y = jnp.asarray(Y, dtype=float).reshape(-1)
        Y = jnp.where(Y > 0, 1.0, -1.0)
        kernel = kernel or RBF.create(X.shape[1])
        return cls(kern=kernel, X=X, Y=Y, inference_mode=inference_mode,
                   max_sweeps=max_sweeps)

    def inference(self):
        K = self.kern.K(self.X)
        return ep_inference(K, self.Y, Bernoulli(), mode=self.inference_mode,
                            max_sweeps=self.max_sweeps)

    def log_marginal_likelihood(self):
        return self.inference().lml

    def predict_latent(self, Xnew, posterior=None):
        post = posterior if posterior is not None else self.inference()
        K = self.kern.K(self.X)
        Ks = self.kern.K(self.X, jnp.atleast_2d(Xnew))
        kss = self.kern.Kdiag(jnp.atleast_2d(Xnew))
        return ep_predict(K, Ks, kss, post)

    def predict(self, Xnew, posterior=None):
        """p(y=1 | x) via the probit predictive (GPML 3.25)."""
        mu, var = self.predict_latent(Xnew, posterior=posterior)
        return _probit(mu, var)

    def optimize(self, rounds=3, maxiter=30):
        """Alternated EP evidence maximization (EPBase ep_mode='alternated'
        :188): run EP to convergence, then L-BFGS the EP evidence w.r.t.
        hyperparameters HOLDING THE SITES FIXED (the EP while_loop is not
        reverse-differentiable; at the fixed point the site-fixed gradient
        equals the total derivative), repeat."""
        from ..ops import lbfgs
        from .ep import _dense_ep_lml, _dense_posterior_from_sites
        from .parameters import make_packer

        model = self
        lik = Bernoulli()
        res = None
        for _ in range(rounds):
            post = model.inference()
            tau = jax.lax.stop_gradient(post.tau_site)
            nu = jax.lax.stop_gradient(post.nu_site)
            packer = make_packer(model)

            def obj(u, model=model, packer=packer, tau=tau, nu=nu):
                m = packer.unpack(u, reference=model)
                K = m.kern.K(m.X)
                mu, Sigma, L, _ = _dense_posterior_from_sites(K, tau, nu)
                return -_dense_ep_lml(lik, m.Y, K, tau, nu, mu, Sigma, L, 1.0)

            res = lbfgs.minimize(obj, packer.pack(model), maxiter=maxiter)
            model = packer.unpack(res.x, reference=model)
        return model, res


def _alternated_epdtc_optimize(model, rounds, maxiter, fix=()):
    """Alternated EP evidence maximization for the sparse EPDTC classifiers
    (reference EPBase ep_mode='alternated', expectation_propagation.py:188, as
    GPClassification.optimize above): converge EP, then L-BFGS the site-fixed
    bound (epdtc_inference(sites=...)) over hyperparameters + Z, repeat."""
    from ..ops import lbfgs
    from .parameters import make_packer

    res = None
    for _ in range(rounds):
        post = model.inference()
        tau = jax.lax.stop_gradient(post.tau_site)
        nu = jax.lax.stop_gradient(post.nu_site)
        packer = make_packer(model, fix=fix)

        def obj(u, model=model, packer=packer, tau=tau, nu=nu):
            m = packer.unpack(u, reference=model)
            return -m._site_fixed_lml(tau, nu)

        res = lbfgs.minimize(obj, packer.pack(model), maxiter=maxiter)
        model = packer.unpack(res.x, reference=model)
    return model, res


@pytree_dataclass
class SparseGPClassification:
    """EPDTC probit classification on inducing points
    (sparse_gp_classification.py:12)."""

    kern: object = None
    Z: jnp.ndarray = None
    X: jnp.ndarray = None
    Y: jnp.ndarray = None
    inference_mode: str = static_field(default="parallel")
    max_sweeps: int = static_field(default=60)

    @classmethod
    def create(cls, X, Y, kernel=None, num_inducing=10, Z=None,
               inference_mode="parallel", max_sweeps=60, seed=0):
        X = jnp.atleast_2d(jnp.asarray(X, dtype=float))
        Y = jnp.asarray(Y, dtype=float).reshape(-1)
        Y = jnp.where(Y > 0, 1.0, -1.0)
        kernel = kernel or RBF.create(X.shape[1])
        if Z is None:
            rng = np.random.default_rng(seed)
            idx = rng.permutation(X.shape[0])[:num_inducing]
            Z = jnp.asarray(np.asarray(X)[idx].copy())
        else:
            Z = jnp.atleast_2d(jnp.asarray(Z, dtype=float))
        return cls(kern=kernel, Z=Z, X=X, Y=Y, inference_mode=inference_mode,
                   max_sweeps=max_sweeps)

    def inference(self):
        Kmm = self.kern.K(self.Z)
        Kmn = self.kern.K(self.Z, self.X)
        Kdiag = self.kern.Kdiag(self.X)
        return epdtc_inference(Kmm, Kmn, Kdiag, self.Y, Bernoulli(),
                               mode=self.inference_mode,
                               max_sweeps=self.max_sweeps)

    def log_marginal_likelihood(self):
        return self.inference().lml

    def _site_fixed_lml(self, tau, nu):
        Kmm = self.kern.K(self.Z)
        Kmn = self.kern.K(self.Z, self.X)
        Kdiag = self.kern.Kdiag(self.X)
        return epdtc_inference(Kmm, Kmn, Kdiag, self.Y, Bernoulli(),
                               mode=self.inference_mode,
                               max_sweeps=self.max_sweeps,
                               sites=(tau, nu)).lml

    def optimize(self, rounds=3, maxiter=30):
        """Alternated EP evidence maximization over hyperparameters AND Z
        (the reference optimizes sparse classification the same alternated
        way via EPBase; see _alternated_epdtc_optimize)."""
        return _alternated_epdtc_optimize(self, rounds, maxiter)

    def predict_latent(self, Xnew, posterior=None):
        post = posterior if posterior is not None else self.inference()
        Kms = self.kern.K(self.Z, jnp.atleast_2d(Xnew))
        kss = self.kern.Kdiag(jnp.atleast_2d(Xnew))
        return epdtc_predict(post.Lm, post.LB, post.c, Kms, kss)

    def predict(self, Xnew, posterior=None):
        mu, var = self.predict_latent(Xnew, posterior=posterior)
        return _probit(mu, var)


@pytree_dataclass
class SparseGPClassificationUncertainInput:
    """Sparse probit classification with Gaussian input uncertainty
    (GPy/GPy/models/sparse_gp_classification.py:103): q(x_n) = N(X_n, X_var_n),
    EPDTC on the RBF psi statistics — Kmn -> psi1.T for the EP sweeps
    (EPDTC.inference :460) and the per-point psi0/psi2n in the final
    heteroscedastic VarDTC bound (parameters_changed :243-248). Test inputs are
    certain, so prediction uses plain K(Z, Xnew) against the converged EP
    factors. RBF kernel only (the psi statistics' closed forms)."""

    kern: object = None
    Z: jnp.ndarray = None
    X: jnp.ndarray = None       # mean of q(X)
    X_variance: jnp.ndarray = None  # (N, D) diagonal variance of q(X)
    Y: jnp.ndarray = None
    inference_mode: str = static_field(default="parallel")
    max_sweeps: int = static_field(default=60)

    @classmethod
    def create(cls, X, X_variance, Y, kernel=None, num_inducing=10, Z=None,
               inference_mode="parallel", max_sweeps=60, seed=0):
        X = jnp.atleast_2d(jnp.asarray(X, dtype=float))
        X_variance = jnp.broadcast_to(
            jnp.asarray(X_variance, dtype=float), X.shape)
        Y = jnp.asarray(Y, dtype=float).reshape(-1)
        Y = jnp.where(Y > 0, 1.0, -1.0)
        kernel = kernel or RBF.create(X.shape[1])
        if Z is None:
            rng = np.random.default_rng(seed)
            idx = rng.permutation(X.shape[0])[:num_inducing]
            Z = jnp.asarray(np.asarray(X)[idx].copy())
        else:
            Z = jnp.atleast_2d(jnp.asarray(Z, dtype=float))
        return cls(kern=kernel, Z=Z, X=X, X_variance=X_variance, Y=Y,
                   inference_mode=inference_mode, max_sweeps=max_sweeps)

    def _psi_stats(self):
        from .gplvm import rbf_psi_stats_n

        _, psi1, psi2n = rbf_psi_stats_n(self.kern, self.Z, self.X,
                                         self.X_variance)
        # per-point psi0_n = <k(x_n, x_n)> = variance for RBF (rbf_psi_comp)
        psi0n = jnp.full((self.X.shape[0],), self.kern.variance)
        return psi0n, psi1, psi2n

    def inference(self):
        psi0n, psi1, psi2n = self._psi_stats()
        Kmm = self.kern.K(self.Z)
        return epdtc_inference(Kmm, psi1.T, psi0n, self.Y, Bernoulli(),
                               mode=self.inference_mode,
                               max_sweeps=self.max_sweeps, psi2n=psi2n)

    def log_marginal_likelihood(self):
        return self.inference().lml

    def _site_fixed_lml(self, tau, nu):
        psi0n, psi1, psi2n = self._psi_stats()
        Kmm = self.kern.K(self.Z)
        return epdtc_inference(Kmm, psi1.T, psi0n, self.Y, Bernoulli(),
                               mode=self.inference_mode,
                               max_sweeps=self.max_sweeps, psi2n=psi2n,
                               sites=(tau, nu)).lml

    def optimize(self, rounds=3, maxiter=30):
        """Alternated EP evidence maximization; X_variance is held fixed (it
        encodes the KNOWN input noise, not a free parameter)."""
        return _alternated_epdtc_optimize(self, rounds, maxiter,
                                          fix=("X_variance",))

    def predict_latent(self, Xnew, posterior=None):
        post = posterior if posterior is not None else self.inference()
        Kms = self.kern.K(self.Z, jnp.atleast_2d(Xnew))
        kss = self.kern.Kdiag(jnp.atleast_2d(Xnew))
        return epdtc_predict(post.Lm, post.LB, post.c, Kms, kss)

    def predict(self, Xnew, posterior=None):
        mu, var = self.predict_latent(Xnew, posterior=posterior)
        return _probit(mu, var)
