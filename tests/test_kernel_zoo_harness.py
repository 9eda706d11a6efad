"""Zoo-wide kernel contract harness — the GPy Kern_check_model family
(GPy/GPy/testing/kernel_tests.py:23-120) rebuilt for autodiff:

For every recipe-constructible kernel: (1) K symmetric + PSD on random inputs,
(2) Kdiag == diag(K), (3) K(X, X2) == K(X2, X)^T, (4) the weighted-sum
surrogate loss L = sum(W * K(X)) has finite autodiff gradients w.r.t. every
array leaf (the reference's Kern_check_dK_dtheta), and (5) a one-coordinate
finite-difference spot check of that gradient (checkgrad's core assertion).

Kernels with structured inputs (index columns, time windows, ODE outputs) have
dedicated consistency tests in their own files; this harness covers the ones
with plain (n, d) real inputs so no zoo entry ships with an untested contract.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gaussian_process_optimization_tpu.kernels as kern

# name -> (constructor() -> kernel, input builder rng -> X (n, d))
RECIPES = {
    "RBF": (lambda: kern.RBF.create(2, variance=1.3, lengthscale=[0.7, 1.2],
                                    ARD=True),
            lambda rng: rng.standard_normal((7, 2))),
    "Matern52": (lambda: kern.Matern52.create(2, ARD=True),
                 lambda rng: rng.standard_normal((7, 2))),
    "Matern32": (lambda: kern.Matern32.create(2),
                 lambda rng: rng.standard_normal((7, 2))),
    "OU": (lambda: kern.OU.create(2), lambda rng: rng.standard_normal((7, 2))),
    "Exponential": (lambda: kern.Exponential.create(2),
                    lambda rng: rng.standard_normal((7, 2))),
    "RatQuad": (lambda: kern.RatQuad.create(2, power=1.5),
                lambda rng: rng.standard_normal((7, 2))),
    "Cosine": (lambda: kern.Cosine.create(1),
               lambda rng: rng.standard_normal((7, 1))),
    "Sinc": (lambda: kern.Sinc.create(1),
             lambda rng: rng.standard_normal((7, 1))),
    "Linear": (lambda: kern.Linear.create(2, ARD=True),
               lambda rng: rng.standard_normal((7, 2))),
    "LinearFull": (lambda: kern.LinearFull.create(3, 2),
                   lambda rng: rng.standard_normal((7, 3))),
    "MLP": (lambda: kern.MLP.create(2),
            lambda rng: rng.standard_normal((7, 2))),
    "Poly": (lambda: kern.Poly.create(2, order=3),
             lambda rng: rng.standard_normal((7, 2))),
    "Brownian": (lambda: kern.Brownian.create(),
                 lambda rng: rng.uniform(0.1, 3.0, (7, 1))),
    "Spline": (lambda: kern.Spline.create(),
               lambda rng: rng.uniform(0.1, 1.0, (7, 1))),
    "StandardPeriodic": (lambda: kern.StandardPeriodic.create(1),
                         lambda rng: rng.standard_normal((7, 1))),
    "Bias": (lambda: kern.Bias.create(2, variance=0.7),
             lambda rng: rng.standard_normal((7, 2))),
    "White": (lambda: kern.White.create(2, variance=0.5),
              lambda rng: rng.standard_normal((7, 2))),
    "TruncLinear": (lambda: kern.TruncLinear.create(2, ARD=True),
                    lambda rng: rng.standard_normal((7, 2))),
    "TruncLinearInf": (lambda: kern.TruncLinearInf.create(
                           2, interval=(-1.0, 2.0), ARD=True),
                       lambda rng: rng.standard_normal((7, 2))),
    "PeriodicExponential": (lambda: kern.PeriodicExponential.create(),
                            lambda rng: rng.uniform(0, 2, (7, 1))),
    "PeriodicMatern32": (lambda: kern.PeriodicMatern32.create(),
                         lambda rng: rng.uniform(0, 2, (7, 1))),
    "PeriodicMatern52": (lambda: kern.PeriodicMatern52.create(),
                         lambda rng: rng.uniform(0, 2, (7, 1))),
    "PolynomialBasisFunc": (lambda: kern.PolynomialBasisFuncKernel.create(
                                1, degree=2),
                            lambda rng: rng.standard_normal((7, 1))),
    "LogisticBasisFunc": (lambda: kern.LogisticBasisFuncKernel.create(
                              1, centers=[-0.5, 0.5], ARD=True),
                          lambda rng: rng.standard_normal((7, 1))),
    "Add": (lambda: kern.RBF.create(2) + kern.Linear.create(2),
            lambda rng: rng.standard_normal((7, 2))),
    "Prod": (lambda: kern.RBF.create(2) * kern.Linear.create(2),
             lambda rng: rng.standard_normal((7, 2))),
    "Symmetric": (lambda: kern.Symmetric.create(
                      kern.RBF.create(1), -np.eye(1), "even"),
                  lambda rng: rng.uniform(0.2, 2, (7, 1))),
    "Hierarchical": (lambda: kern.Hierarchical.create(
                         [kern.RBF.create(1), kern.RBF.create(1, variance=0.5)]),
                     lambda rng: np.column_stack(
                         [rng.standard_normal(7),
                          rng.integers(0, 2, 7).astype(float)])),
    "Gower": (lambda: kern.Gower.create(
                  kern.Matern52.create(3), ranges=np.array([2.0, 2.0, 1.0]),
                  cont_dims=(0, 1), disc_dims=(2,)),
              lambda rng: np.column_stack(
                  [rng.standard_normal((7, 2)),
                   rng.integers(0, 3, 7).astype(float)])),
}


def _loss(k, X, W):
    return jnp.sum(W * k.K(X))


@pytest.mark.parametrize("name", sorted(RECIPES))
def test_kernel_contract(name, rng):
    make, make_X = RECIPES[name]
    k = make()
    X = jnp.asarray(make_X(rng), dtype=float)
    n = X.shape[0]

    K = np.asarray(k.K(X))
    # symmetric + PSD (kernel_tests.py:47-53 eigenvalue spot check)
    np.testing.assert_allclose(K, K.T, rtol=1e-9, atol=1e-11)
    assert np.linalg.eigvalsh(K).min() > -1e-8 * max(1.0, np.abs(K).max())

    # Kdiag is the diagonal of K — except White, whose Kdiag is the variance
    # while off-sample K(X,X) carries it only on exact-duplicate rows
    # (GPy static.py White semantics)
    kd = np.asarray(k.Kdiag(X))
    np.testing.assert_allclose(kd, np.diag(K), rtol=1e-7, atol=1e-9)

    # cross-covariance transpose symmetry
    X2 = jnp.asarray(make_X(rng), dtype=float)[:5]
    K12 = np.asarray(k.K(X, X2))
    K21 = np.asarray(k.K(X2, X))
    np.testing.assert_allclose(K12, K21.T, rtol=1e-8, atol=1e-10)

    # Kern_check_dK_dtheta: gradients of sum(W * K) finite for every leaf
    W = jnp.asarray(rng.standard_normal((n, n)))
    W = 0.5 * (W + W.T)
    g = jax.grad(lambda kk: _loss(kk, X, W))(k)
    leaves = jax.tree_util.tree_leaves(g)
    assert leaves, f"{name} has no trainable leaves?"
    for leaf in leaves:
        assert np.all(np.isfinite(np.asarray(leaf))), f"{name}: non-finite grad"

    # finite-difference spot check on the first element of the first leaf
    # (checkgrad's core assertion, paramz-style central difference)
    k_leaves, treedef = jax.tree_util.tree_flatten(k)
    eps = 1e-5

    def with_bump(sign):
        bumped = list(k_leaves)
        first = jnp.asarray(bumped[0], dtype=float)
        flat = first.reshape(-1)
        flat = flat.at[0].add(sign * eps)
        bumped[0] = flat.reshape(first.shape)
        return jax.tree_util.tree_unflatten(treedef, bumped)

    fd = (float(_loss(with_bump(+1), X, W)) -
          float(_loss(with_bump(-1), X, W))) / (2 * eps)
    g_leaves = jax.tree_util.tree_leaves(g)
    ad = float(jnp.asarray(g_leaves[0]).reshape(-1)[0])
    np.testing.assert_allclose(ad, fd, rtol=2e-4, atol=1e-6)
