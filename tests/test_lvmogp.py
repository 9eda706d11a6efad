"""LVMOGP (GPy gp_multiout_regression.py + vardtc_svi_multiout.py): the ELBO
and predictive moments are validated against an INDEPENDENT dense-Kronecker
numpy oracle (matrix-variate q(U), Nystrom residuals), in the deterministic-
row limit where the psi statistics collapse to plain kernel evaluations."""
import jax.numpy as jnp
import numpy as np
import pytest

import gaussian_process_optimization_tpu.kernels as kern
from gaussian_process_optimization_tpu.models.lvmogp import LVMOGP, fit_lvmogp


def _small_model(rng, N=6, D=4, Mc=3, Mr=2, Qc=2, Qr=2, S_h=1e-7):
    X = rng.uniform(-1, 1, (N, Qc))
    Y = rng.standard_normal((N, D))
    m = LVMOGP.create(X, Y, Xr_dim=Qr, num_inducing=(Mc, Mr), noise_var=0.3,
                      seed=0)
    # deterministic-row limit + non-trivial q(U)
    m = type(m)(
        kern_c=m.kern_c, kern_r=m.kern_r,
        likelihood_variance=m.likelihood_variance, Zc=m.Zc, Zr=m.Zr,
        q_Hmu=m.q_Hmu, q_HS=jnp.full(m.q_HS.shape, S_h),
        qU_mean=jnp.asarray(rng.standard_normal((Mc, Mr)) * 0.3),
        qU_Ac=jnp.asarray(rng.standard_normal((Mc, Mc)) * 0.2 - np.eye(Mc)),
        qU_Ar=jnp.asarray(rng.standard_normal((Mr, Mr)) * 0.2 - np.eye(Mr)),
        X=m.X, Y=m.Y,
    )
    return m


def _oracle(m):
    """Dense numpy oracle: ELBO and predictive moments with deterministic rows."""
    from gaussian_process_optimization_tpu.models.lvmogp import _tril_chol

    np_ = np
    X = np.asarray(m.X)
    Y = np.asarray(m.Y)
    H = np.asarray(m.q_Hmu)
    Zc, Zr = np.asarray(m.Zc), np.asarray(m.Zr)
    Mc, Mr = Zc.shape[0], Zr.shape[0]
    N, D = Y.shape
    beta = 1.0 / (float(m.likelihood_variance) + 1e-8)

    Kc = np.asarray(m.kern_c.K(m.Zc)) + 1e-6 * np.eye(Mc)
    Kr = np.asarray(m.kern_r.K(m.Zr)) + 1e-6 * np.eye(Mr)
    kc_n = np.asarray(m.kern_c.K(m.X, m.Zc))  # (N, Mc)
    kr_d = np.asarray(m.kern_r.K(jnp.asarray(H), m.Zr))  # (D, Mr)
    kc_diag = np.asarray(m.kern_c.Kdiag(m.X))
    kr_diag = np.asarray(m.kern_r.Kdiag(jnp.asarray(H)))

    M = np.asarray(m.qU_mean)
    LSc = np.asarray(_tril_chol(m.qU_Ac))
    LSr = np.asarray(_tril_chol(m.qU_Ar))
    Sc = LSc @ LSc.T
    Sr = LSr @ LSr.T

    Kci = np.linalg.inv(Kc)
    Kri = np.linalg.inv(Kr)
    Ac = Kci @ kc_n.T  # (Mc, N)
    Ar = Kri @ kr_d.T  # (Mr, D)

    mu = Ac.T @ M @ Ar  # (N, D)
    qc = np.einsum("in,ij,jn->n", Ac, Kc, Ac)  # kc^T Kc^-1 kc
    qr = np.einsum("id,ij,jd->d", Ar, Kr, Ar)
    vu = np.einsum("in,ij,jn->n", Ac, Sc, Ac)[:, None] \
        * np.einsum("id,ij,jd->d", Ar, Sr, Ar)[None, :]
    vres = kc_diag[:, None] * kr_diag[None, :] - qc[:, None] * qr[None, :]

    data = (-0.5 * N * D * np.log(2 * np.pi / beta)
            - 0.5 * beta * (np.sum((Y - mu) ** 2) + vu.sum() + vres.sum()))

    # KL(q(U) || p(U)) with Cov[vec U] = Sc (x) Sr (C-order flatten of (Mc,Mr))
    P = np.kron(Kc, Kr)
    S = np.kron(Sc, Sr)
    mvec = M.reshape(-1)
    Pi = np.linalg.inv(P)
    kl_u = 0.5 * (np.trace(Pi @ S) + mvec @ Pi @ mvec - Mc * Mr
                  + np.linalg.slogdet(P)[1] - np.linalg.slogdet(S)[1])

    # KL(q(H) || N(0,I)) — same formula as the model's (sanity, not independent)
    S_h = np.asarray(m.q_HS)
    kl_h = 0.5 * np.sum(H**2 + S_h - np.log(S_h) - 1.0)
    return data - kl_u - kl_h, mu, vu + vres


def test_elbo_matches_dense_oracle(rng):
    m = _small_model(rng)
    ours = float(m.elbo())
    oracle, _, _ = _oracle(m)
    # deterministic-row limit: psi-stat error ~ S_h; KLs are large-ish numbers
    np.testing.assert_allclose(ours, oracle, rtol=1e-5)


def test_predict_matches_dense_oracle(rng):
    m = _small_model(rng)
    _, mu_o, var_o = _oracle(m)
    mu, var = m.predict(m.X, include_likelihood=False)
    np.testing.assert_allclose(np.asarray(mu), mu_o, rtol=1e-4, atol=1e-7)
    np.testing.assert_allclose(np.asarray(var), var_o, rtol=1e-3, atol=1e-6)


def test_lvmogp_md_equals_grid_on_complete_data(rng):
    """Missing-data LVMOGP on a COMPLETE grid must equal the grid model's bound
    exactly (vardtc_svi_multiout_miss vs vardtc_svi_multiout identity)."""
    from gaussian_process_optimization_tpu.models.lvmogp import LVMOGP_MD

    m = _small_model(rng, S_h=0.3)  # genuinely uncertain rows
    N, D = m.Y.shape
    X = np.asarray(m.X)
    Xs = np.repeat(X, D, axis=0)
    out_idx = np.tile(np.arange(D), N)
    ys = np.asarray(m.Y).reshape(-1)
    md = LVMOGP_MD(
        kern_c=m.kern_c, kern_r=m.kern_r,
        likelihood_variance=m.likelihood_variance, Zc=m.Zc, Zr=m.Zr,
        q_Hmu=m.q_Hmu, q_HS=m.q_HS, qU_mean=m.qU_mean, qU_Ac=m.qU_Ac,
        qU_Ar=m.qU_Ar, X=jnp.asarray(Xs), out_idx=jnp.asarray(out_idx),
        Y=jnp.asarray(ys),
    )
    np.testing.assert_allclose(float(md.elbo()), float(m.elbo()), rtol=1e-8)


def test_lvmogp_md_ragged_finite(rng):
    from gaussian_process_optimization_tpu.models.lvmogp import LVMOGP_MD

    # each of 3 outputs observed at its own inputs
    X = np.concatenate([rng.uniform(0, 3, (8, 1)), rng.uniform(0, 3, (5, 1)),
                        rng.uniform(0, 3, (11, 1))])
    out_idx = np.concatenate([np.zeros(8), np.ones(5), np.full(11, 2)])
    Y = np.sin(X[:, 0]) + 0.1 * rng.standard_normal(24) + 0.3 * out_idx
    md = LVMOGP_MD.create(X, out_idx, Y, D=3, Xr_dim=2, num_inducing=(6, 2),
                          noise_var=0.2, seed=0)
    e = float(md.elbo())
    assert np.isfinite(e)
    import jax as _jax

    # out_idx is an integer leaf -> allow_int (fitters fix it via the packer)
    g = _jax.grad(lambda mm: mm.elbo(), allow_int=True)(md)
    assert np.isfinite(float(jnp.sum(g.q_Hmu)))


def test_lvmogp_fit_improves_and_predicts(rng):
    """Correlated outputs toy: shared latent function bank, D=6 outputs from a
    2-D embedding; fitting must raise the ELBO and track the signal."""
    N, D = 40, 6
    X = np.linspace(0, 4, N)[:, None]
    t = np.linspace(0, 2 * np.pi, D)
    W = np.stack([np.sin(t), np.cos(t)], 1)  # output embedding
    F = np.stack([np.sin(1.5 * X[:, 0]), np.cos(1.5 * X[:, 0])], 1)  # (N, 2)
    Y = F @ W.T + 0.05 * rng.standard_normal((N, D))
    m = LVMOGP.create(X, Y, Xr_dim=2, num_inducing=(12, 4), noise_var=0.1, seed=0)
    e0 = float(m.elbo())
    fitted, res = fit_lvmogp(m, maxiter=200)
    e1 = float(fitted.elbo())
    assert np.isfinite(e1) and e1 > e0, (e0, e1)
    mu, var = fitted.predict(X)
    rmse = float(np.sqrt(np.mean((np.asarray(mu) - Y) ** 2)))
    assert rmse < 0.3, rmse
    assert np.all(np.asarray(var) > 0)
