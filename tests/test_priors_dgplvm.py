"""MultivariateGaussian + DGPLVM prior family vs independent numpy twins
(GPy core/parameterization/priors.py:188 MultivariateGaussian, :388 DGPLVM_KFDA,
:535 DGPLVM, :749 DGPLVM_Lamda, :994 DGPLVM_T).

The twins re-implement the reference's per-class python loops verbatim-style in
numpy; the package versions are vectorized one-hot contractions with autodiff
gradients, so agreement here checks both the restructuring and (via the
hand-gradient twin + FD) that autodiff reproduces the reference's lnpdf_grad.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import stats

from gaussian_process_optimization_tpu.kernels import stationary as kern
from gaussian_process_optimization_tpu.utils import priors as pr


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _onehot(labels, C):
    out = np.zeros((len(labels), C))
    out[np.arange(len(labels)), labels] = 1.0
    return out


# ------------------------------------------------- MultivariateGaussian (:188)
def test_multivariate_gaussian_lnpdf_rows(rng):
    d = 3
    A = rng.standard_normal((d, d))
    var = A @ A.T + d * np.eye(d)
    mu = rng.standard_normal(d)
    x = rng.standard_normal((7, d))
    p = pr.MultivariateGaussianPrior(mu=jnp.asarray(mu), var=jnp.asarray(var))
    ours = np.asarray(p.lnpdf(jnp.asarray(x)))
    want = stats.multivariate_normal.logpdf(x, mu, var)
    np.testing.assert_allclose(ours, want, rtol=1e-10)


def test_multivariate_gaussian_grad_matches_reference_formula(rng):
    """autodiff d lnpdf/dx == -Sigma^{-1} d per row (priors.py:231-233)."""
    d = 4
    A = rng.standard_normal((d, d))
    var = A @ A.T + d * np.eye(d)
    mu = rng.standard_normal(d)
    x = rng.standard_normal((5, d))
    p = pr.MultivariateGaussianPrior(mu=jnp.asarray(mu), var=jnp.asarray(var))
    g = jax.grad(lambda xx: jnp.sum(p.lnpdf(xx)))(jnp.asarray(x))
    want = -np.linalg.solve(var, (x - mu).T).T
    np.testing.assert_allclose(np.asarray(g), want, rtol=1e-9, atol=1e-12)


# ---------------------------------------------------- numpy twin of the loops
def _twin_scatter(x, labels, C):
    """Reference compute_cls/compute_Mi/compute_Sb/compute_Sw loops
    (priors.py:566-631), independent implementation."""
    n, dim = x.shape
    cls = {}
    for j in range(n):
        cls.setdefault(labels[j], []).append(x[j])
    M0 = x.mean(axis=0)
    Mi = {i: np.mean(cls[i], axis=0) for i in cls}
    Sb = np.zeros((dim, dim))
    Sw = np.zeros((dim, dim))
    for i in cls:
        B = (Mi[i] - M0).reshape(dim, 1)
        Sb += (len(cls[i]) / n) * (B @ B.T)
        WWT = np.zeros((dim, dim))
        for xk in cls[i]:
            w = xk - Mi[i]
            WWT += np.outer(w, w)
        Sw += (1.0 / n) * WWT
    return Sb, Sw


def _twin_dgplvm_lnpdf(x, labels, C, sigma2, ridge):
    Sb, Sw = _twin_scatter(x, labels, C)
    inv = np.linalg.inv(Sb + np.eye(Sb.shape[0]) * ridge)
    return (-1.0 / sigma2) * np.trace(inv @ Sw)


def _twin_dgplvm_grad(x, labels, C, sigma2, ridge):
    """Reference hand gradient DPx_Dx (priors.py:699-727), loop-for-loop."""
    n, dim = x.shape
    Sb, Sw = _twin_scatter(x, labels, C)
    M0 = x.mean(axis=0)
    idx = {}
    for j in range(n):
        idx.setdefault(labels[j], []).append(j)
    Mi = {i: x[idx[i]].mean(axis=0) for i in idx}
    # Sig_beta_B_i_all (priors.py:634-653)
    SigB = np.zeros((n, dim))
    for k in range(n):
        for i in idx:
            Ni = float(len(idx[i]))
            beta = (1.0 / Ni - 1.0 / n) if k in idx[i] else (-1.0 / n)
            SigB[k] += (Ni / n) * beta * (Mi[i] - M0)
    SigB = SigB.T
    # W_i and Sig_alpha_W (priors.py:657-682)
    W = np.zeros((n, dim))
    for i in idx:
        for j in idx[i]:
            W[j] = x[j] - Mi[i]
    SigA = np.zeros((n, dim))
    for i in idx:
        Ni = float(len(idx[i]))
        for k in idx[i]:
            for j in idx[i]:
                alpha = (1.0 - 1.0 / Ni) if k == j else (-1.0 / Ni)
                SigA[k] += alpha * W[j]
    SigA = SigA.T / n
    inv = np.linalg.inv(Sb + np.eye(dim) * ridge)
    DJ = 2 * ((-inv.T) @ Sw.T @ inv.T @ SigB + inv.T @ SigA)
    return ((-1.0 / sigma2) * DJ).T


def test_dgplvm_lnpdf_matches_loop_twin(rng):
    for C in (2, 3):
        n, dim = 18, 3
        labels = rng.integers(0, C, n)
        labels[:C] = np.arange(C)  # every class non-empty
        x = rng.standard_normal((n, dim))
        p = pr.DGPLVMPrior(lbl=jnp.asarray(_onehot(labels, C)), sigma2=0.7)
        ours = float(p.lnpdf(jnp.asarray(x)))
        want = _twin_dgplvm_lnpdf(x, labels, C, 0.7, 0.1)
        np.testing.assert_allclose(ours, want, rtol=1e-9)
        # flat x (the reference reshapes, priors.py:686)
        np.testing.assert_allclose(
            float(p.lnpdf(jnp.asarray(x.ravel()))), want, rtol=1e-9)


def test_dgplvm_autodiff_matches_reference_hand_gradient(rng):
    """jax.grad through the vectorized lnpdf == the reference's hand chain
    (priors.py:699-727) == finite differences."""
    n, dim, C = 14, 2, 2
    labels = rng.integers(0, C, n)
    labels[:C] = np.arange(C)
    x = rng.standard_normal((n, dim))
    p = pr.DGPLVMPrior(lbl=jnp.asarray(_onehot(labels, C)), sigma2=1.3)
    g = np.asarray(jax.grad(lambda xx: p.lnpdf(xx))(jnp.asarray(x)))
    hand = _twin_dgplvm_grad(x, labels, C, 1.3, 0.1)
    np.testing.assert_allclose(g, hand, rtol=1e-7, atol=1e-10)
    # FD spot-check a few entries
    f = lambda xx: _twin_dgplvm_lnpdf(xx, labels, C, 1.3, 0.1)
    eps = 1e-6
    for (i, j) in [(0, 0), (5, 1), (n - 1, 0)]:
        xp = x.copy(); xp[i, j] += eps
        xm = x.copy(); xm[i, j] -= eps
        np.testing.assert_allclose(g[i, j], (f(xp) - f(xm)) / (2 * eps),
                                   rtol=1e-4, atol=1e-8)


def test_dgplvm_lamda_prior(rng):
    """X' = X diag(lamda), ridge 0.9 (priors.py:916-928); lamda gradient by
    autodiff replaces the linked-Param hand gradient (priors.py:973)."""
    n, dim, C = 12, 3, 2
    labels = rng.integers(0, C, n)
    labels[:C] = np.arange(C)
    x = rng.standard_normal((n, dim))
    lam = np.array([0.5, 1.5, 0.9])
    p = pr.DGPLVMLamdaPrior(lbl=jnp.asarray(_onehot(labels, C)),
                            lamda=jnp.asarray(lam), sigma2=0.8)
    ours = float(p.lnpdf(jnp.asarray(x)))
    want = _twin_dgplvm_lnpdf(x @ np.diag(lam), labels, C, 0.8, 0.9)
    np.testing.assert_allclose(ours, want, rtol=1e-9)
    # d/d lamda via autodiff == FD on the twin
    glam = np.asarray(jax.grad(
        lambda l: pr.DGPLVMLamdaPrior(
            lbl=jnp.asarray(_onehot(labels, C)), lamda=l,
            sigma2=0.8).lnpdf(jnp.asarray(x)))(jnp.asarray(lam)))
    eps = 1e-6
    for k in range(dim):
        lp = lam.copy(); lp[k] += eps
        lm = lam.copy(); lm[k] -= eps
        fd = (_twin_dgplvm_lnpdf(x @ np.diag(lp), labels, C, 0.8, 0.9)
              - _twin_dgplvm_lnpdf(x @ np.diag(lm), labels, C, 0.8, 0.9)) / (2 * eps)
        np.testing.assert_allclose(glam[k], fd, rtol=1e-4, atol=1e-8)


def test_dgplvm_t_prior(rng):
    """X' = X @ vec, ridge 0.1 (priors.py:1154-1169)."""
    n, dim, C = 12, 3, 3
    labels = rng.integers(0, C, n)
    labels[:C] = np.arange(C)
    x = rng.standard_normal((n, dim))
    vec = rng.standard_normal((dim, 2))
    p = pr.DGPLVMTPrior(lbl=jnp.asarray(_onehot(labels, C)),
                        vec=jnp.asarray(vec), sigma2=1.1)
    ours = float(p.lnpdf(jnp.asarray(x)))
    want = _twin_dgplvm_lnpdf(x @ vec, labels, C, 1.1, 0.1)
    np.testing.assert_allclose(ours, want, rtol=1e-9)


# ----------------------------------------------------------- KFDA (:388-510)
def _twin_kfda_lnpdf(K, labels, lambdaa, sigma2):
    """Reference compute_a/compute_A + lnpdf (priors.py:466-497) on
    class-sorted data (class 0 rows first), positional like the reference."""
    n = K.shape[0]
    n0 = int(np.sum(labels == 0))
    n1 = n - n0
    a = np.ones((n, 1))
    a[:n0] *= 1.0 / n0
    a[n0:] *= -1.0 / n1
    A = np.zeros((n, n))
    idx = 0
    for Ni in (n0, n1):
        B = (1.0 / np.sqrt(Ni)) * (np.eye(Ni) - np.ones((Ni, Ni)) / Ni)
        A[idx:idx + Ni, idx:idx + Ni] = B
        idx += Ni
    paran = lambdaa * np.eye(n) + A @ K @ A
    inv = np.linalg.inv(paran)
    J = a.T @ K @ a - a.T @ K @ A @ inv @ A @ K @ a
    return float(((-1.0 / sigma2) * (J / lambdaa))[0, 0])


def test_kfda_prior_matches_loop_twin(rng):
    n0, n1, dim = 7, 9, 2
    labels = np.array([0] * n0 + [1] * n1)  # class-sorted, like the reference
    x = rng.standard_normal((n0 + n1, dim))
    k = kern.RBF.create(dim)
    p = pr.DGPLVMKFDAPrior(lbl=jnp.asarray(_onehot(labels, 2)), kern=k,
                           lambdaa=0.05, sigma2=0.6)
    ours = float(p.lnpdf(jnp.asarray(x)))
    K = np.asarray(k.K(jnp.asarray(x)))
    want = _twin_kfda_lnpdf(K, labels, 0.05, 0.6)
    np.testing.assert_allclose(ours, want, rtol=1e-8)
    # order-invariance: shuffling rows (and labels) leaves lnpdf unchanged
    perm = rng.permutation(n0 + n1)
    p2 = pr.DGPLVMKFDAPrior(lbl=jnp.asarray(_onehot(labels[perm], 2)), kern=k,
                            lambdaa=0.05, sigma2=0.6)
    np.testing.assert_allclose(float(p2.lnpdf(jnp.asarray(x[perm]))), want,
                               rtol=1e-8)


def test_kfda_prior_gradient_fd(rng):
    n0, n1, dim = 5, 6, 2
    labels = np.array([0] * n0 + [1] * n1)
    x = rng.standard_normal((n0 + n1, dim))
    k = kern.RBF.create(dim)
    p = pr.DGPLVMKFDAPrior(lbl=jnp.asarray(_onehot(labels, 2)), kern=k,
                           lambdaa=0.1, sigma2=1.0)
    g = np.asarray(jax.grad(lambda xx: p.lnpdf(xx))(jnp.asarray(x)))
    f = lambda xx: float(p.lnpdf(jnp.asarray(xx)))
    eps = 1e-6
    for (i, j) in [(0, 0), (4, 1), (10, 0)]:
        xp = x.copy(); xp[i, j] += eps
        xm = x.copy(); xm[i, j] -= eps
        np.testing.assert_allclose(g[i, j], (f(xp) - f(xm)) / (2 * eps),
                                   rtol=2e-4, atol=1e-8)


# --------------------------------------------------- GPLVM integration (:535)
def test_dgplvm_prior_improves_class_separation(rng):
    """Fitting GPLVM with the DGPLVM prior on two-class data yields latents
    with a higher between/within scatter ratio than the unpriored fit (the
    point of the discriminative prior — DGPLVM paper criterion)."""
    from gaussian_process_optimization_tpu.models.gplvm import (fit_gplvm,
                                                                make_gplvm)

    n_per, D, Q, C = 10, 6, 2, 2
    centers = np.stack([np.full(D, -1.5), np.full(D, 1.5)])
    Y = np.concatenate([
        centers[c] + 0.8 * rng.standard_normal((n_per, D)) for c in range(C)])
    labels = np.repeat(np.arange(C), n_per)
    lbl = _onehot(labels, C)

    def ratio(X):
        Sb, Sw = _twin_scatter(np.asarray(X), labels, C)
        return np.trace(Sb) / np.trace(Sw)

    m0 = make_gplvm(Y, Q, init="random", seed=3)  # random init: no PCA head start
    plain, _ = fit_gplvm(m0, maxiter=150)
    prior = pr.DGPLVMPrior(lbl=jnp.asarray(lbl), sigma2=0.01)
    disc, _ = fit_gplvm(m0, maxiter=150, priors={"X": prior})
    assert ratio(disc.X) > ratio(plain.X)
