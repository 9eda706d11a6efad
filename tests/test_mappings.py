"""Mapping tail (VERDICT round-1 missing #9): Kernel, MLP, Identity,
PiecewiseLinear mean functions (GPy mappings/{kernel,mlp,identity,
piecewise_linear}.py) — value checks and trainability through the GP LML."""
import jax
import jax.numpy as jnp
import numpy as np

import gaussian_process_optimization_tpu.kernels as kern
from gaussian_process_optimization_tpu.models import (
    Identity,
    KernelMapping,
    MLPMapping,
    PiecewiseLinear,
)
from gaussian_process_optimization_tpu.models.gp import GPRegression


def test_identity_mapping():
    X = jnp.asarray([[1.0, 2.0], [3.0, 4.0]])
    m = Identity.create(2)
    np.testing.assert_allclose(np.asarray(m.f(X)), np.asarray(X))


def test_kernel_mapping_values(rng):
    """m(x) = K(x, Z) A (mappings/kernel.py:44-45)."""
    Z = rng.standard_normal((4, 2))
    A = rng.standard_normal((4, 1))
    k = kern.RBF.create(2, variance=1.5, lengthscale=0.8)
    m = KernelMapping.create(2, 1, Z=Z, kernel=k, A=A)
    X = rng.standard_normal((6, 2))
    expected = np.asarray(k.K(jnp.asarray(X), jnp.asarray(Z))) @ A
    np.testing.assert_allclose(np.asarray(m.f(jnp.asarray(X))), expected, rtol=1e-10)


def test_mlp_mapping_values(rng):
    m = MLPMapping.create(2, 1, hidden_dim=3, seed=1)
    X = rng.standard_normal((5, 2))
    expected = (
        np.tanh(X @ np.asarray(m.W1) + np.asarray(m.b1)) @ np.asarray(m.W2)
        + np.asarray(m.b2)
    )
    np.testing.assert_allclose(np.asarray(m.f(jnp.asarray(X))), expected, rtol=1e-10)


def test_piecewise_linear_values():
    """Interior segments interpolate; exterior continues with unit slope
    (mappings/piecewise_linear.py:37-52)."""
    m = PiecewiseLinear.create(values=[0.0, 2.0, 1.0], breaks=[0.0, 1.0, 2.0])
    X = jnp.asarray([[-1.0], [0.5], [1.5], [3.0]])
    y = np.asarray(m.f(X))[:, 0]
    np.testing.assert_allclose(y, [-1.0, 1.0, 1.5, 2.0], atol=1e-12)


def test_mlp_mean_trains_through_lml(rng):
    """The mapping parameters are pytree leaves: grads through the exact-GP LML
    must be nonzero (autodiff replaces GPy's update_gradients plumbing)."""
    X = rng.uniform(-2, 2, (20, 1))
    Y = (2.0 * X[:, 0] + 0.1 * rng.standard_normal(20))[:, None]
    mf = MLPMapping.create(1, 1, hidden_dim=3, seed=0)
    model = GPRegression.create(X, Y, kernel=kern.RBF.create(1), noise_var=0.1,
                                mean_function=mf)
    lml = float(model.log_marginal_likelihood())
    assert np.isfinite(lml)
    g = jax.grad(lambda m: m.log_marginal_likelihood())(model)
    assert float(jnp.max(jnp.abs(g.mean_function.W1))) > 0
    assert float(jnp.max(jnp.abs(g.mean_function.b2))) > 0
