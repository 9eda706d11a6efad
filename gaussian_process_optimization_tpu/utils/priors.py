"""Hyperparameter priors (GPy/GPy/core/parameterization/priors.py: Gaussian:40,
Uniform:94, LogGaussian, Gamma:264 with from_EV, InverseGamma, Exponential, StudentT,
HalfT). Priors contribute log-density on *constrained* parameter values; the fit
objective is -logL - logPrior (GPy core/model.py:101-127), with gradients by autodiff.
"""
from __future__ import annotations

import jax.numpy as jnp
from jax.scipy.special import gammaln

from .pytree import pytree_dataclass


@pytree_dataclass
class Prior:
    def lnpdf(self, x):
        raise NotImplementedError


@pytree_dataclass
class GaussianPrior(Prior):
    mu: jnp.ndarray = 0.0
    sigma: jnp.ndarray = 1.0

    def lnpdf(self, x):
        s2 = jnp.square(self.sigma)
        return -0.5 * (jnp.log(2 * jnp.pi * s2) + jnp.square(x - self.mu) / s2)


@pytree_dataclass
class UniformPrior(Prior):
    lower: jnp.ndarray = 0.0
    upper: jnp.ndarray = 1.0

    def lnpdf(self, x):
        inside = jnp.logical_and(x >= self.lower, x <= self.upper)
        return jnp.where(inside, -jnp.log(self.upper - self.lower), -jnp.inf)


@pytree_dataclass
class LogGaussianPrior(Prior):
    mu: jnp.ndarray = 0.0
    sigma: jnp.ndarray = 1.0

    def lnpdf(self, x):
        s2 = jnp.square(self.sigma)
        lx = jnp.log(x)
        return -lx - 0.5 * (jnp.log(2 * jnp.pi * s2) + jnp.square(lx - self.mu) / s2)


@pytree_dataclass
class GammaPrior(Prior):
    """Shape/rate parameterization, matching GPy (priors.py:264)."""

    a: jnp.ndarray = 1.0
    b: jnp.ndarray = 1.0  # rate

    @classmethod
    def from_EV(cls, E, V):
        """Construct from expectation and variance (GPy Gamma.from_EV)."""
        a = jnp.square(E) / V
        b = E / V
        return cls(a=a, b=b)

    def lnpdf(self, x):
        return (
            self.a * jnp.log(self.b)
            - gammaln(self.a)
            + (self.a - 1.0) * jnp.log(x)
            - self.b * x
        )


@pytree_dataclass
class InverseGammaPrior(Prior):
    a: jnp.ndarray = 1.0
    b: jnp.ndarray = 1.0

    def lnpdf(self, x):
        return (
            self.a * jnp.log(self.b)
            - gammaln(self.a)
            - (self.a + 1.0) * jnp.log(x)
            - self.b / x
        )


@pytree_dataclass
class ExponentialPrior(Prior):
    l: jnp.ndarray = 1.0

    def lnpdf(self, x):
        return jnp.log(self.l) - self.l * x


@pytree_dataclass
class StudentTPrior(Prior):
    mu: jnp.ndarray = 0.0
    sigma: jnp.ndarray = 1.0
    nu: jnp.ndarray = 4.0

    def lnpdf(self, x):
        z = (x - self.mu) / self.sigma
        return (
            gammaln((self.nu + 1) / 2)
            - gammaln(self.nu / 2)
            - 0.5 * jnp.log(self.nu * jnp.pi)
            - jnp.log(self.sigma)
            - (self.nu + 1) / 2 * jnp.log1p(jnp.square(z) / self.nu)
        )


@pytree_dataclass
class HalfTPrior(Prior):
    A: jnp.ndarray = 1.0
    nu: jnp.ndarray = 4.0

    def lnpdf(self, x):
        t = StudentTPrior(mu=0.0, sigma=self.A, nu=self.nu)
        return jnp.where(x >= 0, jnp.log(2.0) + t.lnpdf(x), -jnp.inf)


def log_prior(priors, params) -> jnp.ndarray:
    """Sum of prior log-densities. `priors` mirrors the FULL structure of
    `params` leaf-for-leaf: leaves that are Prior instances are applied to the
    corresponding parameter leaf; None leaves contribute 0 (use None to skip a
    parameter, including slots where params itself holds None)."""
    import jax

    if priors is None:
        return jnp.asarray(0.0)
    total = 0.0
    # None IS a valid leaf on BOTH sides: priors uses it as "no prior here",
    # and params trees may hold None slots (e.g. mask=None on a model).
    # Flattening params WITHOUT is_leaf would drop its None nodes while the
    # priors side counts the mirroring None — a spurious count mismatch on
    # exactly the documented usage.
    flat_priors = jax.tree_util.tree_leaves(
        priors, is_leaf=lambda x: x is None or isinstance(x, Prior)
    )
    flat_params = jax.tree_util.tree_leaves(
        params, is_leaf=lambda x: x is None
    )
    if len(flat_priors) != len(flat_params):
        raise ValueError(
            f"priors tree must mirror the params tree leaf-for-leaf "
            f"({len(flat_priors)} vs {len(flat_params)} leaves — use None "
            f"for unpriored slots)")
    for pr, v in zip(flat_priors, flat_params):
        if isinstance(pr, Prior):
            if v is None:
                raise ValueError("a Prior was placed on a None parameter slot")
            total = total + jnp.sum(pr.lnpdf(jnp.asarray(v)))
    return jnp.asarray(total)
