"""Hybrid Monte Carlo over model hyperparameters.

Rebuild of GPy's HMC (``GPy/GPy/inference/mcmc/hmc.py:7``): leapfrog integration in
the *unconstrained* optimizer space (the packed vector of utils/packing, the analog
of paramz's optimizer_array) with identity mass matrix and Metropolis acceptance
(sample:31, _update:62, _computeH:68).

TPU-first: the whole chain is ONE jitted ``lax.scan`` (leapfrog inner loop is a
``fori_loop``); gradients of the potential come from autodiff through the GP
inference instead of the reference's hand-plumbed _transform_gradients.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def hmc_sample(potential_fn, u0, key, num_samples, stepsize=1e-1, leapfrog_steps=20):
    """Sample from exp(-potential). Returns (samples (num_samples, dim), accept_rate).

    potential_fn(u) -> scalar (e.g. -(LML + log prior)); must be autodiff-able.
    Matches GPy HMC semantics: every iteration stores a sample (accepted state or
    the previous one) — the reference stores the pre-update state then overwrites on
    acceptance (hmc.py:41-58).
    """
    dim = u0.shape[0]
    vg = jax.value_and_grad(potential_fn)

    def leapfrog(u, p):
        def body(_, carry):
            u, p = carry
            p = p - 0.5 * stepsize * vg(u)[1]
            u = u + stepsize * p
            p = p - 0.5 * stepsize * vg(u)[1]
            return (u, p)

        return lax.fori_loop(0, leapfrog_steps, body, (u, p))

    def step(carry, key):
        u = carry
        k1, k2 = jax.random.split(key)
        p = jax.random.normal(k1, (dim,), dtype=u.dtype)
        H_old = potential_fn(u) + 0.5 * jnp.dot(p, p)
        u_new, p_new = leapfrog(u, p)
        H_new = potential_fn(u_new) + 0.5 * jnp.dot(p_new, p_new)
        log_accept = H_old - H_new
        accept = jnp.log(jax.random.uniform(k2, dtype=u.dtype)) < jnp.minimum(log_accept, 0.0)
        # NaN-proof: never accept a non-finite proposal
        accept = accept & jnp.all(jnp.isfinite(u_new)) & jnp.isfinite(H_new)
        u = jnp.where(accept, u_new, u)
        return u, (u, accept.astype(u.dtype))

    keys = jax.random.split(key, num_samples)
    _, (samples, accepts) = lax.scan(step, u0, keys)
    return samples, jnp.mean(accepts)
