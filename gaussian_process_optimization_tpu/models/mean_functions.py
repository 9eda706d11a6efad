"""Mean functions / mappings (GPy/GPy/mappings/: Constant, Linear, Additive, Compound).

The GP's optional prior mean m(x); GPy calls these Mappings (GPy/GPy/core/mapping.py).
Gradients w.r.t. mapping parameters flow by autodiff through the LML.
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
