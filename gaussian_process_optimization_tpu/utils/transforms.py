"""Constraint transforms between unconstrained optimizer space and constrained parameters.

The reference optimizes in unconstrained space via paramz transforms; positivity uses
``Logexp`` (softplus, see paramz transformations — referenced from
``GPy/GPy/kern/src/stationary.py:80-81`` where variance/lengthscale are `Param(..., Logexp())`).
Here the transforms are pure functions, applied *inside* the jitted loss so autodiff chains
through them (replacing paramz's hand-plumbed chain rule).
"""
from __future__ import annotations

import jax.numpy as jnp

from .pytree import pytree_dataclass, static_field

_LIM_VAL = 36.0  # beyond this softplus(x) == x to float64 precision


@pytree_dataclass
class Transform:
    """Base transform: forward maps unconstrained -> constrained."""

    def forward(self, u):
        raise NotImplementedError

    def inverse(self, v):
        raise NotImplementedError

    def random_restart(self, z):
        """Map a standard-normal draw z to an unconstrained restart coordinate.

        paramz `randomize()` sets optimizer_array = N(0,1) directly, which is fine
        for Identity/Logexp (softplus(N(0,1)) ~ [0.3, 1.7]) but pathological for
        wide Logistic bounds, where sigmoid(0) lands mid-range (e.g. noise
        bounded [1e-9, 1e6] restarts at ~5e5 — ADVICE round 1). Default keeps
        paramz parity; bounded transforms override.
        """
        return z

    def log_jacobian(self, v):
        """log |d forward / du| evaluated at the CONSTRAINED value ``v`` (the
        paramz ``Transformation.log_jacobian(model_param)`` signature). Added to
        the log prior of transformed parameters so the optimizer/HMC target in
        unconstrained space is the correctly change-of-variabled density
        (GPy core/parameterization/priorizable.py:57-65)."""
        return jnp.zeros_like(jnp.asarray(v))


@pytree_dataclass
class Identity(Transform):
    def forward(self, u):
        return u

    def inverse(self, v):
        return v


@pytree_dataclass
class Positive(Transform):
    """Softplus, numerically identical to paramz `Logexp` within float precision.

    forward(u) = log(1 + exp(u)); linear above the overflow limit.
    """

    def forward(self, u):
        u = jnp.asarray(u)
        return jnp.where(u > _LIM_VAL, u, jnp.logaddexp(0.0, jnp.minimum(u, _LIM_VAL)))

    def inverse(self, v):
        v = jnp.asarray(v)
        # log(exp(v) - 1), stable: v + log(1 - exp(-v)). The clamp must be
        # f32-representable: 1e-300 underflows to 0 in float32 and inverse(0)
        # becomes -inf, which NaNs the whole packed vector (e.g. a
        # linear-family StateSpaceGP whose t0 rides the 'period' slot at 0).
        # 1e-30 keeps a zero-valued positive leaf at ~0 with a finite pack.
        safe = jnp.maximum(v, 1e-30)
        return jnp.where(
            safe > _LIM_VAL, safe, jnp.log(jnp.expm1(jnp.minimum(safe, _LIM_VAL)))
        )

    def log_jacobian(self, v):
        # theta = softplus(u) => dtheta/du = sigmoid(u) = 1 - exp(-theta), so
        # log|J| = log(1 - e^{-theta}); ~0 for large theta, log(theta) near 0.
        return jnp.log(-jnp.expm1(-jnp.maximum(jnp.asarray(v), 1e-30)))


@pytree_dataclass
class Logistic(Transform):
    """Maps R -> (lo, hi) via a scaled sigmoid. Used for box-bounded parameters
    (e.g. GPyOpt bounds the noise to [1e-9, 1e6] when exact_feval=False,
    GPyOpt/GPyOpt/models/gpmodel.py:72-76)."""

    lo: float = static_field(default=0.0)
    hi: float = static_field(default=1.0)

    def forward(self, u):
        return self.lo + (self.hi - self.lo) / (1.0 + jnp.exp(-jnp.asarray(u)))

    def inverse(self, v):
        v = jnp.asarray(v)
        p = jnp.clip((v - self.lo) / (self.hi - self.lo), 1e-15, 1.0 - 1e-15)
        return jnp.log(p) - jnp.log1p(-p)

    def random_restart(self, z):
        # Restart at a softplus(N(0,1))-magnitude CONSTRAINED value clipped into
        # (lo, hi), mirroring what a positivity-transformed parameter would get,
        # instead of sigmoid-center (mid-range) which for wide bounds is huge.
        v = jnp.clip(POSITIVE.forward(jnp.asarray(z)), self.lo * (1.0 + 1e-6) + 1e-300,
                     self.lo + (self.hi - self.lo) * (1.0 - 1e-6))
        return self.inverse(v)

    def log_jacobian(self, v):
        # theta = lo + (hi-lo)*sigmoid(u) => dtheta/du = (theta-lo)(hi-theta)/(hi-lo)
        v = jnp.asarray(v)
        w = self.hi - self.lo
        eps = 1e-30 * w
        return (jnp.log(jnp.maximum(v - self.lo, eps))
                + jnp.log(jnp.maximum(self.hi - v, eps)) - jnp.log(w))


POSITIVE = Positive()
IDENTITY = Identity()
