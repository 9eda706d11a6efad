"""Pallas-vs-jnp consistency tests for the batched diag-block factorization
kernels (ops/pallas_linalg.py), mirroring the reference's cython-vs-numpy genre
(GPy/GPy/testing/cython_tests.py): the one-launch all-lanes kernels must agree
with XLA's Cholesky / triangular_solve to f32 rounding, propagate NaN on
non-PD lanes (the jitter ladder's failure signal), and fold vmap batching into
the lane axis. Runs in interpreter mode on CPU."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussian_process_optimization_tpu.config import config
from gaussian_process_optimization_tpu.ops import pallas_linalg as pli


@pytest.fixture(autouse=True)
def _interpret_mode():
    old = (config.pallas_interpret, config.use_pallas,
           config.pallas_chol_blocks, config.pallas_tri_inv)
    config.pallas_interpret = True
    config.use_pallas = False
    # exercise BOTH call-site routings regardless of the production defaults
    config.pallas_chol_blocks = True
    config.pallas_tri_inv = True
    yield
    (config.pallas_interpret, config.use_pallas,
     config.pallas_chol_blocks, config.pallas_tri_inv) = old


def _spd(rng, G, nb):
    X = rng.standard_normal((G, nb, nb))
    return X @ np.swapaxes(X, -1, -2) + nb * np.eye(nb)


@pytest.mark.parametrize("G,nb", [(1, 32), (5, 64), (3, 128)])
def test_cholesky_blocks_matches_lapack(G, nb, rng):
    A = _spd(rng, G, nb)
    L = np.asarray(pli.cholesky_blocks(jnp.asarray(A, jnp.float32)))
    Lref = np.linalg.cholesky(A)
    np.testing.assert_allclose(L, Lref, rtol=5e-4, atol=5e-4)
    # strict lower-triangularity (the kernel zeroes A's untouched upper part)
    assert np.all(np.triu(L, 1) == 0.0)


@pytest.mark.parametrize("G,nb", [(2, 32), (5, 64), (3, 128)])
def test_tri_inv_blocks_matches_solve(G, nb, rng):
    L = np.linalg.cholesky(_spd(rng, G, nb))
    Li = np.asarray(pli.tri_inv_blocks(jnp.asarray(L, jnp.float32)))
    Liref = np.linalg.inv(L)
    np.testing.assert_allclose(Li, Liref, rtol=5e-4, atol=5e-4)
    assert np.all(np.triu(Li, 1) == 0.0)


def test_nonpd_lane_reports_nonfinite_only_there(rng):
    """The jitter ladder's per-lane finiteness check relies on NaN locality."""
    A = _spd(rng, 3, 64)
    A[1] = -np.eye(64)
    L = np.asarray(pli.cholesky_blocks(jnp.asarray(A, jnp.float32)))
    assert np.all(np.isfinite(L[0])) and np.all(np.isfinite(L[2]))
    assert not np.all(np.isfinite(L[1]))


def test_vmap_folds_into_lane_axis(rng):
    """jax.vmap over the kernels must reach the custom_vmap rule (one launch),
    and match the unbatched results."""
    A = _spd(rng, 6, 64).reshape(2, 3, 64, 64)
    A32 = jnp.asarray(A, jnp.float32)
    Lv = np.asarray(jax.vmap(pli.cholesky_blocks)(A32))
    np.testing.assert_allclose(Lv, np.linalg.cholesky(A), rtol=5e-4, atol=5e-4)
    Li = np.asarray(jax.vmap(pli.tri_inv_blocks)(jnp.asarray(Lv)))
    np.testing.assert_allclose(
        Li, np.linalg.inv(np.linalg.cholesky(A)), rtol=5e-4, atol=5e-4)


def test_unbatched_and_fallback_shapes(rng):
    # 2-D input (no lane axis)
    A = _spd(rng, 1, 32)[0]
    L = np.asarray(pli.cholesky_blocks(jnp.asarray(A, jnp.float32)))
    np.testing.assert_allclose(L, np.linalg.cholesky(A), rtol=5e-4, atol=5e-4)
    # ineligible size (not a multiple of the micro-panel) -> jnp fallback, f64
    B = jnp.asarray(_spd(rng, 2, 17), jnp.float64)
    config.pallas_interpret = False
    L2 = np.asarray(pli.cholesky_blocks(B))
    np.testing.assert_allclose(L2, np.linalg.cholesky(np.asarray(B)), rtol=1e-10)
    Li2 = np.asarray(pli.tri_inv_blocks(jnp.asarray(L2)))
    np.testing.assert_allclose(Li2, np.linalg.inv(L2), rtol=1e-8)


def test_blocked_cholesky_uses_kernel_consistently(rng):
    """End-to-end: ops.linalg.blocked_cholesky (which routes its diagonal
    blocks through cholesky_blocks when eligible) still matches XLA."""
    from gaussian_process_optimization_tpu.ops import linalg as la

    n = 96
    X = rng.standard_normal((2, n, n))
    A = X @ np.swapaxes(X, -1, -2) + n * np.eye(n)
    L = np.asarray(la.blocked_cholesky(jnp.asarray(A, jnp.float32), nb=32))
    np.testing.assert_allclose(L, np.linalg.cholesky(A), rtol=5e-4, atol=5e-4)
