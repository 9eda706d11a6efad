"""SplitKern / DEtime (GPy kern/src/splitKern.py) and MultioutputKern
(multioutput_kern.py): block-structure value checks against a hand-built numpy
assembly, PSD, and conditioning semantics."""
import jax
import jax.numpy as jnp
import numpy as np

import gaussian_process_optimization_tpu.kernels as kern


def _with_index(X, idx):
    return np.hstack([X, np.full((X.shape[0], 1), float(idx))])


def test_splitkern_blocks(rng):
    base = kern.RBF.create(1, variance=1.5, lengthscale=0.8)
    Xp = np.array([[2.0]])
    sk = kern.SplitKern.create(base, Xp)
    X0 = rng.uniform(0, 4, (5, 1))
    X1 = rng.uniform(0, 4, (4, 1))
    X = np.vstack([_with_index(X0, 0), _with_index(X1, 1)])
    K = np.asarray(sk.K(jnp.asarray(X)))

    Kb = lambda A, B: np.asarray(base.K(jnp.asarray(A), jnp.asarray(B)))
    k3 = Kb(Xp, Xp)[0, 0]
    cross = Kb(X0, Xp) @ Kb(Xp, X1) / k3
    np.testing.assert_allclose(K[:5, :5], Kb(X0, X0), rtol=1e-10)
    np.testing.assert_allclose(K[5:, 5:], Kb(X1, X1), rtol=1e-10)
    np.testing.assert_allclose(K[:5, 5:], cross, rtol=1e-10)
    np.testing.assert_allclose(K[5:, :5], cross.T, rtol=1e-8)
    # PSD: the conditioned cross-covariance keeps the joint valid
    assert np.linalg.eigvalsh(K + 1e-10 * np.eye(9)).min() > -1e-8


def test_splitkern_agrees_at_split_point():
    """At the split point itself the two conditions are perfectly correlated:
    k_cross(Xp, Xp) == k(Xp, Xp)."""
    base = kern.Matern32.create(1, variance=2.0, lengthscale=1.0)
    Xp = np.array([[1.0]])
    sk = kern.SplitKern.create(base, Xp)
    X = np.vstack([_with_index(Xp, 0), _with_index(Xp, 1)])
    K = np.asarray(sk.K(jnp.asarray(X)))
    np.testing.assert_allclose(K, K[0, 0] * np.ones((2, 2)), rtol=1e-10)


def test_detime_replicates_prefix(rng):
    """DEtime with idx_p: the first idx_p rows of condition 1 behave as
    condition-0 points (the reference's row/column copy, splitKern.py:28-33)."""
    base = kern.RBF.create(1, variance=1.0, lengthscale=1.0)
    Xp = np.array([[2.0]])
    X0 = rng.uniform(0, 4, (4, 1))
    X1 = np.vstack([X0[:2], rng.uniform(0, 4, (2, 1))])  # first 2 replicate
    X = np.vstack([_with_index(X0, 0), _with_index(X1, 1)])
    de = kern.DEtime.create(base, idx_p=2, Xp=Xp)
    K = np.asarray(de.K(jnp.asarray(X)))
    # replica rows must covariate with condition 0 via the BASE kernel
    Kb = np.asarray(base.K(jnp.asarray(X0), jnp.asarray(X1[:2])))
    np.testing.assert_allclose(K[:4, 4:6], Kb, rtol=1e-10)


def test_multioutput_kern_blocks(rng):
    k0 = kern.RBF.create(1, variance=1.0, lengthscale=0.5)
    k1 = kern.Matern52.create(1, variance=2.0, lengthscale=1.5)
    cross = lambda A, B: 0.5 * np.ones((A.shape[0], B.shape[0]))
    mo = kern.MultioutputKern.create([k0, k1], cross_covariances={(0, 1): cross,
                                                                  (1, 0): cross})
    X0 = rng.uniform(0, 2, (3, 1))
    X1 = rng.uniform(0, 2, (4, 1))
    X = np.vstack([_with_index(X0, 0), _with_index(X1, 1)])
    K = np.asarray(mo.K(jnp.asarray(X)))
    np.testing.assert_allclose(K[:3, :3], np.asarray(k0.K(jnp.asarray(X0))), rtol=1e-10)
    np.testing.assert_allclose(K[3:, 3:], np.asarray(k1.K(jnp.asarray(X1))), rtol=1e-10)
    np.testing.assert_allclose(K[:3, 3:], 0.5)
    # default cross block is ZERO (multioutput_kern.py ZeroKern)
    mo0 = kern.MultioutputKern.create([k0, k1])
    K0 = np.asarray(mo0.K(jnp.asarray(X)))
    np.testing.assert_allclose(K0[:3, 3:], 0.0)
    # Kdiag routes per output
    kd = np.asarray(mo.Kdiag(jnp.asarray(X)))
    np.testing.assert_allclose(kd[:3], 1.0)
    np.testing.assert_allclose(kd[3:], 2.0)


def test_splitkern_gradients_finite(rng):
    base = kern.RBF.create(1, variance=1.0, lengthscale=1.0)
    sk = kern.SplitKern.create(base, np.array([[1.0]]))
    X = np.vstack([_with_index(rng.uniform(0, 2, (3, 1)), 0),
                   _with_index(rng.uniform(0, 2, (3, 1)), 1)])
    g = jax.grad(lambda k: jnp.sum(k.K(jnp.asarray(X))))(sk)
    assert np.isfinite(float(g.kern.variance))
    assert np.isfinite(float(jnp.sum(g.kern.lengthscale)))
