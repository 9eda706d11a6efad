"""Pallas-vs-jnp consistency tests, mirroring the reference's cython-vs-numpy tests
(GPy/GPy/testing/cython_tests.py:26-45): the fused tile kernel must agree with the
pure path to f32 rounding, including gradients through the custom VJP. Runs the
kernels in interpreter mode on CPU."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gaussian_process_optimization_tpu.kernels as kern
from gaussian_process_optimization_tpu.config import config
from gaussian_process_optimization_tpu.ops import pallas_kernels as pk


@pytest.fixture(autouse=True)
def _interpret_mode():
    old_interpret, old_use = config.pallas_interpret, config.use_pallas
    config.pallas_interpret = True
    config.use_pallas = False  # call the kernel explicitly, keep K() on jnp path
    yield
    config.pallas_interpret = old_interpret
    config.use_pallas = old_use


CASES = [
    (kern.RBF, False), (kern.Matern52, True), (kern.Matern32, False),
    (kern.OU, False), (kern.Exponential, True), (kern.RatQuad, False),
]


@pytest.mark.parametrize("cls,ard", CASES)
def test_pallas_matches_jnp(cls, ard, rng):
    d = 3
    X = jnp.asarray(rng.uniform(-3, 3, size=(70, d)), dtype=jnp.float32)
    Z = jnp.asarray(rng.uniform(-3, 3, size=(40, d)), dtype=jnp.float32)
    kwargs = dict(variance=1.7, lengthscale=np.array([0.5, 1.0, 2.0]) if ard else 0.8,
                  ARD=ard)
    if cls is kern.RatQuad:
        k = cls.create(d, variance=1.7, lengthscale=0.8, power=1.5)
    else:
        k = cls.create(d, **kwargs)
    k = jax.tree_util.tree_map(lambda x: jnp.asarray(x, dtype=jnp.float32), k)

    K_pallas = np.asarray(pk.stationary_K(k, X, Z))
    r = k._scaled_dist(X, Z)
    K_jnp = np.asarray(k.K_of_r(r))
    np.testing.assert_allclose(K_pallas, K_jnp, rtol=2e-5, atol=2e-6)

    # self-covariance: symmetric with exact variance diagonal
    K_self = np.asarray(pk.stationary_K(k, X, None))
    np.testing.assert_allclose(K_self, K_self.T, atol=1e-7)
    np.testing.assert_allclose(np.diag(K_self), float(k.variance), rtol=1e-6)


def test_pallas_gradients_match(rng):
    d = 2
    X = jnp.asarray(rng.uniform(-2, 2, size=(30, d)), dtype=jnp.float32)
    G = jnp.asarray(rng.standard_normal((30, 30)), dtype=jnp.float32)
    k = kern.Matern52.create(d, variance=1.3, lengthscale=np.array([0.7, 1.4]), ARD=True)
    k = jax.tree_util.tree_map(lambda x: jnp.asarray(x, dtype=jnp.float32), k)

    def loss_pallas(kk, Xv):
        return jnp.sum(pk.stationary_K(kk, Xv, None) * G)

    def loss_jnp(kk, Xv):
        return jnp.sum(kk.K_of_r(kk._scaled_dist(Xv)) * G)

    gk_p, gX_p = jax.grad(loss_pallas, argnums=(0, 1))(k, X)
    gk_j, gX_j = jax.grad(loss_jnp, argnums=(0, 1))(k, X)
    np.testing.assert_allclose(np.asarray(gX_p), np.asarray(gX_j), rtol=2e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gk_p.variance), np.asarray(gk_j.variance),
                               rtol=2e-4)
    np.testing.assert_allclose(np.asarray(gk_p.lengthscale), np.asarray(gk_j.lengthscale),
                               rtol=2e-4, atol=1e-4)


def test_supports_gating():
    k32 = kern.RBF.create(2)
    k32f = jax.tree_util.tree_map(lambda x: jnp.asarray(x, dtype=jnp.float32), k32)
    X64 = jnp.zeros((200, 2))
    X32 = jnp.zeros((200, 2), dtype=jnp.float32)
    assert pk.supports(k32f, X32, None)  # interpret mode on
    assert not pk.supports(k32, X64, None)  # f64 -> jnp path
    assert not pk.supports(k32f, X32[:10], None)  # too small
    g = kern.Gower.create(kern.Matern52.create(2), [1.0], (0,), (1,))
    assert not pk.supports(g, X32, None)


def test_full_K_path_uses_pallas(rng):
    """With use_pallas forced on, Kernel.K must route through the fused kernel and
    still match the jnp path."""
    config.use_pallas = True
    try:
        d = 2
        X = jnp.asarray(rng.uniform(-2, 2, size=(150, d)), dtype=jnp.float32)
        k = kern.RBF.create(d, variance=1.1, lengthscale=0.6)
        k = jax.tree_util.tree_map(lambda x: jnp.asarray(x, dtype=jnp.float32), k)
        K1 = np.asarray(k.K(X))
        config.use_pallas = False
        K2 = np.asarray(k.K(X))
        np.testing.assert_allclose(K1, K2, rtol=2e-5, atol=2e-6)
    finally:
        config.use_pallas = False


@pytest.mark.parametrize("cls,ard", CASES + [(kern.Cosine, False)])
def test_pallas_fused_backward_all_families(cls, ard, rng):
    """The fused Pallas backward tile (dX, dZ, dvariance, dlengthscale, dpower
    — the stationary_utils.c contractions in one pass) vs autodiff through the
    jnp path, for every family, ARD and not, rectangular X != Z."""
    d = 3
    X = jnp.asarray(rng.uniform(-2, 2, size=(40, d)), dtype=jnp.float32)
    Z = jnp.asarray(rng.uniform(-2, 2, size=(25, d)), dtype=jnp.float32)
    G = jnp.asarray(rng.standard_normal((40, 25)), dtype=jnp.float32)
    if cls is kern.RatQuad:
        k = cls.create(d, variance=1.7, lengthscale=0.8, power=1.5)
    else:
        k = cls.create(d, variance=1.3,
                       lengthscale=np.array([0.7, 1.4, 0.9]) if ard else 0.8,
                       ARD=ard)
    k = jax.tree_util.tree_map(lambda x: jnp.asarray(x, dtype=jnp.float32), k)

    def loss_pallas(kk, Xv, Zv):
        return jnp.sum(pk.stationary_K(kk, Xv, Zv) * G)

    def loss_jnp(kk, Xv, Zv):
        return jnp.sum(kk.K_of_r(kk._scaled_dist(Xv, Zv)) * G)

    gk_p, gX_p, gZ_p = jax.grad(loss_pallas, argnums=(0, 1, 2))(k, X, Z)
    gk_j, gX_j, gZ_j = jax.grad(loss_jnp, argnums=(0, 1, 2))(k, X, Z)
    np.testing.assert_allclose(np.asarray(gX_p), np.asarray(gX_j),
                               rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(np.asarray(gZ_p), np.asarray(gZ_j),
                               rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(np.asarray(gk_p.variance),
                               np.asarray(gk_j.variance), rtol=3e-4)
    np.testing.assert_allclose(np.asarray(gk_p.lengthscale),
                               np.asarray(gk_j.lengthscale), rtol=3e-4, atol=3e-4)
    if cls is kern.RatQuad:
        np.testing.assert_allclose(np.asarray(gk_p.power),
                                   np.asarray(gk_j.power), rtol=3e-4)
