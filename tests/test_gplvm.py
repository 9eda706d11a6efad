"""GPLVM family tests: psi statistics vs Monte Carlo, BGPLVM bound consistency in the
deterministic limit, point-GPLVM latent recovery."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gaussian_process_optimization_tpu.kernels as kern
from gaussian_process_optimization_tpu.models.gplvm import (
    BayesianGPLVM,
    fit_gplvm,
    make_gplvm,
    rbf_psi_stats,
)


def test_psi_stats_vs_monte_carlo(rng):
    """psi1/psi2 closed forms vs Monte-Carlo Gaussian expectations."""
    n, m, d = 5, 4, 2
    mu = rng.standard_normal((n, d))
    S = rng.uniform(0.1, 0.5, size=(n, d))
    Z = rng.standard_normal((m, d))
    k = kern.RBF.create(d, variance=1.4, lengthscale=np.array([0.8, 1.3]), ARD=True)

    psi0, psi1, psi2 = rbf_psi_stats(k, jnp.asarray(Z), jnp.asarray(mu), jnp.asarray(S))
    np.testing.assert_allclose(float(psi0), n * 1.4, rtol=1e-10)

    S_mc = 200_000
    samples = mu[:, None, :] + np.sqrt(S)[:, None, :] * rng.standard_normal((n, S_mc, d))
    K_mc = np.asarray(
        k.K(jnp.asarray(samples.reshape(-1, d)), jnp.asarray(Z))
    ).reshape(n, S_mc, m)
    psi1_mc = K_mc.mean(1)
    np.testing.assert_allclose(np.asarray(psi1), psi1_mc, rtol=0.02, atol=5e-4)

    psi2_mc = np.einsum("nsm,nsk->mk", K_mc, K_mc) / S_mc
    np.testing.assert_allclose(np.asarray(psi2), psi2_mc, rtol=0.05, atol=2e-3)


def test_bgplvm_deterministic_limit(rng):
    """With q(X) collapsed (S -> 0) at the true inputs, the uncertain-input bound
    equals the deterministic VarDTC bound (minus the mu KL)."""
    from gaussian_process_optimization_tpu.models.sparse import SparseGPRegression
    import dataclasses

    n, d = 30, 2
    X = rng.standard_normal((n, d))
    Y = np.sin(X[:, :1]) + 0.1 * rng.standard_normal((n, 1))
    k = kern.RBF.create(d, variance=1.0, lengthscale=1.0, ARD=True)

    bg = BayesianGPLVM.create(Y, input_dim=d, num_inducing=8, kernel=k, noise_var=0.05)
    Z = np.asarray(bg.Z)
    bg = dataclasses.replace(
        bg, q_mu=jnp.asarray(X), q_S=jnp.full((n, d), 1e-10),
        Y=jnp.asarray(Y - Y.mean(0)),
    )
    sp = SparseGPRegression.create(X, Y - Y.mean(0), kernel=k, Z=Z, noise_var=0.05)
    bound_det = float(sp.log_marginal_likelihood())
    # remove the KL that remains for the deterministic q (S->0 log S blows up, so
    # compare elbo + KL == the VarDTC data term)
    kl = 0.5 * float(np.sum(X**2 + 1e-10 - np.log(1e-10) - 1.0))
    np.testing.assert_allclose(float(bg.elbo()) + kl, bound_det, rtol=1e-4)


def test_gplvm_fit_recovers_structure(rng):
    """Point GPLVM on data generated from a 1-D latent: fitting should improve the
    LML substantially and order the latents consistently with the generator."""
    n = 30
    t = np.sort(rng.uniform(-2, 2, n))
    Y = np.stack([np.sin(t), np.cos(t), t, 0.5 * t**2], axis=1)
    Y += 0.05 * rng.standard_normal(Y.shape)

    m = make_gplvm(Y, input_dim=1)
    lml0 = float(m.log_marginal_likelihood())
    fitted, res = fit_gplvm(m, maxiter=300)
    lml1 = float(fitted.log_marginal_likelihood())
    assert lml1 > lml0 + 5.0
    # latent ordering should correlate with t (up to sign)
    x_latent = np.asarray(fitted.X)[:, 0]
    corr = abs(np.corrcoef(x_latent, t)[0, 1])
    assert corr > 0.9


def test_bgplvm_predict_matches_sparse_in_deterministic_limit(rng):
    """BayesianGPLVM.predict (decode; GPy inherits SparseGP.predict) must match
    SparseGPRegression's predictive when q(X) collapses onto the true inputs."""
    import dataclasses

    from gaussian_process_optimization_tpu.models.sparse import SparseGPRegression

    n, d = 25, 2
    X = rng.standard_normal((n, d))
    Y = np.sin(X[:, :1]) + 0.1 * rng.standard_normal((n, 1))
    k = kern.RBF.create(d, variance=1.0, lengthscale=1.0, ARD=True)
    bg = BayesianGPLVM.create(Y, input_dim=d, num_inducing=8, kernel=k,
                              noise_var=0.05)
    Z = np.asarray(bg.Z)
    bg = dataclasses.replace(bg, q_mu=jnp.asarray(X),
                             q_S=jnp.full((n, d), 1e-12),
                             Y=jnp.asarray(Y - Y.mean(0)))
    sp = SparseGPRegression.create(X, Y - Y.mean(0), kernel=k, Z=Z,
                                   noise_var=0.05)
    Xs = rng.standard_normal((7, d))
    mu_b, v_b = bg.predict(jnp.asarray(Xs))
    mu_s, v_s = sp.predict(jnp.asarray(Xs))
    np.testing.assert_allclose(np.asarray(mu_b), np.asarray(mu_s),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(v_b), np.asarray(v_s),
                               rtol=1e-3, atol=1e-6)
    # full_cov diagonal agrees with the marginal variances
    _, C = bg.predict(jnp.asarray(Xs), full_cov=True)
    np.testing.assert_allclose(np.diag(np.asarray(C)),
                               np.asarray(v_b)[:, 0], rtol=1e-6)
