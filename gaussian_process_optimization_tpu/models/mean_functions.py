"""Mean functions / mappings (GPy/GPy/mappings/: Constant, Linear, Additive,
Compound, Kernel, MLP, Identity, PiecewiseLinear).

The GP's optional prior mean m(x); GPy calls these Mappings (GPy/GPy/core/mapping.py).
Gradients w.r.t. mapping parameters flow by autodiff through the LML (the
reference hand-plumbs each mapping's update_gradients).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..utils.pytree import pytree_dataclass, static_field


@pytree_dataclass
class Mapping:
    input_dim: int = static_field(default=1)
    output_dim: int = static_field(default=1)

    def f(self, X):
        raise NotImplementedError


@pytree_dataclass
class Constant(Mapping):
    """m(x) = C (GPy mappings/constant.py)."""

    C: jnp.ndarray = None

    @classmethod
    def create(cls, input_dim, output_dim=1, value=0.0):
        return cls(input_dim=input_dim, output_dim=output_dim,
                   C=jnp.full((output_dim,), float(value)))

    def f(self, X):
        return jnp.broadcast_to(self.C, (X.shape[0], self.output_dim))


@pytree_dataclass
class LinearMapping(Mapping):
    """m(x) = X A (GPy mappings/linear.py)."""

    A: jnp.ndarray = None

    @classmethod
    def create(cls, input_dim, output_dim=1, A=None):
        A = jnp.asarray(A, dtype=float) if A is not None else jnp.zeros((input_dim, output_dim))
        return cls(input_dim=input_dim, output_dim=output_dim, A=A)

    def f(self, X):
        return X @ self.A


@pytree_dataclass
class Additive(Mapping):
    """m(x) = m1(x) + m2(x) (GPy mappings/additive.py)."""

    m1: Mapping = None
    m2: Mapping = None

    def f(self, X):
        return self.m1.f(X) + self.m2.f(X)


@pytree_dataclass
class Compound(Mapping):
    """m(x) = m2(m1(x)) (GPy mappings/compound.py)."""

    m1: Mapping = None
    m2: Mapping = None

    def f(self, X):
        return self.m2.f(self.m1.f(X))


@pytree_dataclass
class Identity(Mapping):
    """m(x) = x (GPy mappings/identity.py)."""

    @classmethod
    def create(cls, input_dim, output_dim=None):
        return cls(input_dim=input_dim, output_dim=output_dim or input_dim)

    def f(self, X):
        return X


@pytree_dataclass
class KernelMapping(Mapping):
    """m(x) = K(x, Z) A — kernel basis mapping (GPy mappings/kernel.py:9-48)."""

    kern: object = None
    Z: jnp.ndarray = None
    A: jnp.ndarray = None  # (num_bases, output_dim) — trainable

    @classmethod
    def create(cls, input_dim, output_dim, Z, kernel=None, A=None, seed=0):
        import numpy as np

        from ..kernels.stationary import RBF

        Z = jnp.asarray(Z, dtype=float)
        if kernel is None:
            kernel = RBF.create(input_dim)
        if A is None:
            rng = np.random.default_rng(seed)
            A = jnp.asarray(rng.standard_normal((Z.shape[0], output_dim)))
        return cls(input_dim=input_dim, output_dim=output_dim, kern=kernel,
                   Z=Z, A=jnp.asarray(A, dtype=float))

    def f(self, X):
        return self.kern.K(X, self.Z) @ self.A


@pytree_dataclass
class MLPMapping(Mapping):
    """Single-hidden-layer tanh MLP mean (GPy mappings/mlp.py:9-40):
    m(x) = tanh(x W1 + b1) W2 + b2."""

    W1: jnp.ndarray = None
    b1: jnp.ndarray = None
    W2: jnp.ndarray = None
    b2: jnp.ndarray = None

    @classmethod
    def create(cls, input_dim=1, output_dim=1, hidden_dim=3, seed=0):
        import numpy as np

        rng = np.random.default_rng(seed)
        return cls(
            input_dim=input_dim, output_dim=output_dim,
            W1=jnp.asarray(rng.standard_normal((input_dim, hidden_dim))),
            b1=jnp.asarray(rng.standard_normal(hidden_dim)),
            W2=jnp.asarray(rng.standard_normal((hidden_dim, output_dim))),
            b2=jnp.asarray(rng.standard_normal(output_dim)),
        )

    def f(self, X):
        return jnp.tanh(X @ self.W1 + self.b1) @ self.W2 + self.b2


@pytree_dataclass
class PiecewiseLinear(Mapping):
    """1-D piecewise-linear mean with unit slope outside the breaks
    (GPy mappings/piecewise_linear.py:5-52). Trainable (breaks, values);
    implemented branchlessly with searchsorted-style interpolation so it jits.
    """

    values: jnp.ndarray = None
    breaks: jnp.ndarray = None

    @classmethod
    def create(cls, values, breaks):
        return cls(
            input_dim=1, output_dim=1,
            values=jnp.asarray(values, dtype=float).reshape(-1),
            breaks=jnp.asarray(breaks, dtype=float).reshape(-1),
        )

    def f(self, X):
        x = X.reshape(-1)
        order = jnp.argsort(self.breaks)
        b = self.breaks[order]
        v = self.values[order]
        # interior: segment interpolation (jnp.interp == the reference's
        # per-segment v + (x-low)*grad loop); exterior: unit-slope continuation
        y_in = jnp.interp(x, b, v)
        y_lo = x + v[0] - b[0]
        y_hi = x + v[-1] - b[-1]
        y = jnp.where(x < b[0], y_lo, jnp.where(x > b[-1], y_hi, y_in))
        return y.reshape(-1, 1)
