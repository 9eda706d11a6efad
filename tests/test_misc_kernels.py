"""Misc kernel-zoo tail: TruncLinear, Symmetric, basis-function family,
IndependentOutputs (GPy kern/src/{trunclinear,symmetric,basis_funcs,
independent_outputs}.py)."""
import jax
import jax.numpy as jnp
import numpy as np

import gaussian_process_optimization_tpu.kernels as kern


def test_trunclinear_values(rng):
    X = rng.standard_normal((6, 2))
    Y = rng.standard_normal((4, 2))
    k = kern.TruncLinear.create(2, variances=[1.5, 0.5], delta=[0.1, -0.2], ARD=True)
    K = np.asarray(k.K(jnp.asarray(X), jnp.asarray(Y)))
    prod = (X[:, None, :] - [0.1, -0.2]) * (Y[None, :, :] - [0.1, -0.2])
    expected = (np.array([1.5, 0.5]) * np.maximum(prod, 0)).sum(-1)
    np.testing.assert_allclose(K, expected, rtol=1e-10)
    np.testing.assert_allclose(
        np.asarray(k.Kdiag(jnp.asarray(X))),
        (np.array([1.5, 0.5]) * (X - [0.1, -0.2]) ** 2).sum(-1), rtol=1e-10)


def test_symmetric_even_and_odd(rng):
    base = kern.RBF.create(1, variance=1.0, lengthscale=0.8)
    A = -np.eye(1)  # reflection about 0
    X = rng.uniform(0.1, 2, (10, 1))
    for sym, sign in (("even", 1.0), ("odd", -1.0)):
        k = kern.Symmetric.create(base, A, symmetry_type=sym)
        K = np.asarray(k.K(jnp.asarray(X)))
        # samples from this kernel satisfy f(x) = sign * f(-x):
        # Cov[f(x), f(x')] == sign * Cov[f(x), f(-x')]
        K_reflect = np.asarray(k.K(jnp.asarray(X), jnp.asarray(-X)))
        np.testing.assert_allclose(K_reflect, sign * K, atol=1e-10)
        assert np.linalg.eigvalsh(K).min() > -1e-9


def test_basis_func_kernels(rng):
    X = np.linspace(-2, 2, 9)[:, None]
    # polynomial: K = phi diag(v) phi^T with phi = [1, x, x^2]
    k = kern.PolynomialBasisFuncKernel.create(1, degree=2, variance=[1.0, 2.0, 0.5])
    phi = np.column_stack([np.ones(9), X[:, 0], X[:, 0] ** 2])
    expected = (phi * [1.0, 2.0, 0.5]) @ phi.T
    np.testing.assert_allclose(np.asarray(k.K(jnp.asarray(X))), expected, rtol=1e-10)
    # changepoint: rank-1 with +-1 feature
    kc = kern.ChangePointBasisFuncKernel.create(1, changepoint=0.0, variance=2.0)
    Kc = np.asarray(kc.K(jnp.asarray(X)))
    s = np.where(X[:, 0] < 0, -1.0, 1.0)
    np.testing.assert_allclose(Kc, 2.0 * np.outer(s, s), rtol=1e-10)
    # domain: plateau indicator
    kd = kern.DomainKernel.create(1, start=-1.0, stop=1.0)
    ind = ((X[:, 0] > -1) & (X[:, 0] < 1)).astype(float)
    np.testing.assert_allclose(np.asarray(kd.K(jnp.asarray(X))),
                               np.outer(ind, ind), rtol=1e-10)
    # logistic: PSD + trainable slope gradient
    kl = kern.LogisticBasisFuncKernel.create(1, centers=[-0.5, 0.5], ARD=True)
    Kl = np.asarray(kl.K(jnp.asarray(X)))
    assert np.linalg.eigvalsh(Kl).min() > -1e-10
    g = jax.grad(lambda kk: jnp.sum(kk.K(jnp.asarray(X))))(kl)
    assert np.all(np.isfinite(np.asarray(g.slope)))
    # linear slope: constant outside [start, stop]
    ks = kern.LinearSlopeBasisFuncKernel.create(1, start=-1.0, stop=1.0)
    phi_s = np.asarray(ks.phi(jnp.asarray(X)))
    np.testing.assert_allclose(phi_s[0], phi_s[1])  # both below start


def test_independent_outputs_blocks(rng):
    base = kern.RBF.create(1, variance=1.3, lengthscale=0.6)
    mo = kern.IndependentOutputs(base, output_dim=2)
    t = rng.uniform(0, 2, (4, 1))
    X = np.vstack([np.hstack([t, np.zeros((4, 1))]), np.hstack([t, np.ones((4, 1))])])
    K = np.asarray(mo.K(jnp.asarray(X)))
    Kb = np.asarray(base.K(jnp.asarray(t)))
    np.testing.assert_allclose(K[:4, :4], Kb, rtol=1e-10)
    np.testing.assert_allclose(K[4:, 4:], Kb, rtol=1e-10)
    np.testing.assert_allclose(K[:4, 4:], 0.0)  # independent functions
