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


def test_trunclinear_inf_values(rng):
    """TruncLinear_inf vs an independent numpy twin of the reference formula
    (trunclinear.py:153-160): |x-y|^3/6 + xy(b-a) - (x+y)(b^2-a^2)/2
    + (b^3-a^3)/3, variance-weighted sum over dims."""
    a, b = -0.5, 1.5
    v = np.array([1.2, 0.7])
    X = rng.standard_normal((6, 2))
    Y = rng.standard_normal((4, 2))
    k = kern.TruncLinearInf.create(2, interval=(a, b), variances=v, ARD=True)

    def twin(A, B):
        d = A[:, None, :] - B[None, :, :]
        tmp = (np.abs(d**3) / 6 + np.einsum("nq,mq->nmq", A, B) * (b - a)
               - (A[:, None, :] + B[None, :, :]) * (b * b - a * a) / 2
               + (b**3 - a**3) / 3)
        return (v * tmp).sum(-1)

    np.testing.assert_allclose(np.asarray(k.K(jnp.asarray(X), jnp.asarray(Y))),
                               twin(X, Y), rtol=1e-10)
    # Kdiag consistency with the full matrix
    np.testing.assert_allclose(np.asarray(k.Kdiag(jnp.asarray(X))),
                               np.diag(twin(X, X)), rtol=1e-9)
    # hyperparameter gradients flow
    g = jax.grad(lambda kk: jnp.sum(kk.K(jnp.asarray(X))))(k)
    assert np.all(np.isfinite(np.asarray(g.variances)))


def test_linear_full_values(rng):
    """LinearFull vs the reference einsum (linear.py:190-192):
    K = X (W W^T + diag(kappa)) X2^T."""
    D, R = 3, 2
    W = rng.standard_normal((D, R))
    kappa = rng.uniform(0.5, 2.0, D)
    X = rng.standard_normal((5, D))
    Y = rng.standard_normal((4, D))
    k = kern.LinearFull.create(D, R, W=W, kappa=kappa)
    P = W @ W.T + np.diag(kappa)
    np.testing.assert_allclose(np.asarray(k.K(jnp.asarray(X), jnp.asarray(Y))),
                               np.einsum("ij,jk,lk->il", X, P, Y), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(k.Kdiag(jnp.asarray(X))),
                               np.einsum("ij,jk,ik->i", X, P, X), rtol=1e-10)
    # PSD (P is PSD by construction) + gradients to both parameters
    ev = np.linalg.eigvalsh(np.asarray(k.K(jnp.asarray(X))))
    assert ev.min() > -1e-9
    g = jax.grad(lambda kk: jnp.sum(kk.K(jnp.asarray(X))))(k)
    assert np.all(np.isfinite(np.asarray(g.W)))
    assert np.all(np.isfinite(np.asarray(g.kappa)))


def test_hierarchical_block_structure(rng):
    """Hierarchical (independent_outputs.py:155) vs an explicit numpy
    block-assembly twin: base kernel everywhere + per-level same-index blocks."""
    base = kern.RBF.create(1, variance=1.0, lengthscale=0.7)
    lvl1 = kern.RBF.create(1, variance=0.5, lengthscale=0.3)
    lvl2 = kern.Matern32.create(1, variance=0.8, lengthscale=1.1)
    k = kern.Hierarchical.create([base, lvl1, lvl2])
    assert k.input_dim == 3  # base col + 2 index cols

    t = rng.uniform(0, 2, (8, 1))
    i1 = rng.integers(0, 2, 8).astype(float)[:, None]   # replicate index
    i2 = rng.integers(0, 3, 8).astype(float)[:, None]   # cluster index
    X = np.hstack([t, i1, i2])

    K = np.asarray(k.K(jnp.asarray(X)))
    expected = np.asarray(base.K(jnp.asarray(t)))
    for kk, idx in ((lvl1, i1[:, 0]), (lvl2, i2[:, 0])):
        Kl = np.asarray(kk.K(jnp.asarray(t)))
        mask = idx[:, None] == idx[None, :]
        expected = expected + np.where(mask, Kl, 0.0)
    np.testing.assert_allclose(K, expected, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(k.Kdiag(jnp.asarray(X))),
                               np.diag(expected), rtol=1e-9)
    # PSD: masked same-index blocks are block-diagonal under permutation
    assert np.linalg.eigvalsh(K).min() > -1e-9
    # cross-covariance path (X2 different points/indices)
    t2 = rng.uniform(0, 2, (5, 1))
    X2 = np.hstack([t2, np.zeros((5, 1)), np.ones((5, 1))])
    K12 = np.asarray(k.K(jnp.asarray(X), jnp.asarray(X2)))
    expected12 = np.asarray(base.K(jnp.asarray(t), jnp.asarray(t2)))
    for kk, idx, idx2 in ((lvl1, i1[:, 0], np.zeros(5)),
                          (lvl2, i2[:, 0], np.ones(5))):
        Kl = np.asarray(kk.K(jnp.asarray(t), jnp.asarray(t2)))
        mask = idx[:, None] == idx2[None, :]
        expected12 = expected12 + np.where(mask, Kl, 0.0)
    np.testing.assert_allclose(K12, expected12, rtol=1e-9)
