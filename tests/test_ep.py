"""EP tests: sequential-vs-parallel consistency, EPDTC (sparse EP) vs dense EP,
and moment-matching correctness (exact closed forms vs Gauss-Hermite quadrature).

Mirrors GPy/GPy/testing/ep_likelihood_tests.py's role: EP classification must
produce the same posterior regardless of update schedule, and sparse EP with
Z == X must recover dense EP.
"""
import jax.numpy as jnp
import numpy as np
import pytest

import gaussian_process_optimization_tpu.kernels as kern
import gaussian_process_optimization_tpu.models.likelihoods as lik
from gaussian_process_optimization_tpu.models.ep import (
    ep_inference,
    ep_predict,
    epdtc_inference,
    epdtc_predict,
)


def _toy_classification(rng, n=24):
    X = np.concatenate([rng.uniform(-2, -0.3, n // 2), rng.uniform(0.3, 2, n // 2)])[:, None]
    y = np.where(X[:, 0] > 0, 1.0, -1.0)
    k = kern.RBF.create(1, variance=2.0, lengthscale=1.0)
    K = k.K(jnp.asarray(X))
    return X, y, k, K


def test_moments_quadrature_matches_exact_probit(rng):
    """The generic GH fallback must agree with the closed-form probit moments."""
    b = lik.Bernoulli()
    y = jnp.asarray(rng.choice([-1.0, 1.0], size=12))
    tau_cav = jnp.asarray(rng.uniform(0.3, 3.0, 12))
    v_cav = jnp.asarray(rng.standard_normal(12))
    logZ_e, mu_e, s2_e = b.moments_match_ep(y, tau_cav, v_cav)
    logZ_q, mu_q, s2_q = lik.Likelihood.moments_match_ep(b, y, tau_cav, v_cav,
                                                         gh_points=64)
    np.testing.assert_allclose(np.asarray(logZ_q), np.asarray(logZ_e), atol=1e-6)
    np.testing.assert_allclose(np.asarray(mu_q), np.asarray(mu_e), atol=1e-6)
    np.testing.assert_allclose(np.asarray(s2_q), np.asarray(s2_e), atol=1e-6)


def test_moments_quadrature_matches_exact_gaussian(rng):
    g = lik.GaussianLik.create(0.3)
    y = jnp.asarray(rng.standard_normal(8))
    tau_cav = jnp.asarray(rng.uniform(0.5, 2.0, 8))
    v_cav = jnp.asarray(rng.standard_normal(8))
    logZ_e, mu_e, s2_e = g.moments_match_ep(y, tau_cav, v_cav)
    logZ_q, mu_q, s2_q = lik.Likelihood.moments_match_ep(g, y, tau_cav, v_cav,
                                                         gh_points=64)
    np.testing.assert_allclose(np.asarray(logZ_q), np.asarray(logZ_e), atol=1e-6)
    np.testing.assert_allclose(np.asarray(mu_q), np.asarray(mu_e), atol=1e-6)
    np.testing.assert_allclose(np.asarray(s2_q), np.asarray(s2_e), atol=1e-6)


def test_sequential_matches_parallel_probit(rng):
    """Both schedules must converge to the same EP fixed point
    (GPy EP sequential :337 vs parallel_updates=True)."""
    X, y, k, K = _toy_classification(rng)
    b = lik.Bernoulli()
    post_p = ep_inference(K, jnp.asarray(y), b, mode="parallel", max_sweeps=100,
                          epsilon=1e-12)
    post_s = ep_inference(K, jnp.asarray(y), b, mode="sequential", max_sweeps=100,
                          epsilon=1e-12)
    np.testing.assert_allclose(np.asarray(post_s.tau_site), np.asarray(post_p.tau_site),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(post_s.nu_site), np.asarray(post_p.nu_site),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(post_s.mu), np.asarray(post_p.mu),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(float(post_s.lml), float(post_p.lml), rtol=1e-6)


def test_ep_gaussian_likelihood_matches_exact(rng):
    """With a Gaussian likelihood EP is exact in ONE sweep: its lml must equal the
    exact GP marginal and the sites must be (tau, nu) = (1/s2, y/s2)."""
    from gaussian_process_optimization_tpu.models.gp import GPRegression

    X = rng.uniform(-2, 2, (16, 1))
    Y = np.sin(X[:, 0]) + 0.1 * rng.standard_normal(16)
    noise = 0.2
    k = kern.Matern52.create(1, variance=1.5, lengthscale=0.9)
    K = k.K(jnp.asarray(X))
    post = ep_inference(K, jnp.asarray(Y), lik.GaussianLik.create(noise),
                        mode="sequential", max_sweeps=10, epsilon=1e-14)
    np.testing.assert_allclose(np.asarray(post.tau_site), 1.0 / noise, rtol=1e-8)
    mex = GPRegression.create(X, Y[:, None], kernel=k, noise_var=noise)
    # exact path adds a 1e-8 noise-floor jitter -> slightly looser tolerance
    np.testing.assert_allclose(float(post.lml),
                               float(mex.log_marginal_likelihood()), rtol=1e-6)


def test_epdtc_with_all_inducing_matches_dense(rng):
    """EPDTC with Z == X must recover dense EP (Qnn == Knn): same sites, same
    predictions, lml close (collapsed-bound form vs dense form)."""
    X, y, k, K = _toy_classification(rng, n=20)
    b = lik.Bernoulli()
    Kmn = K  # Z == X
    Kdiag = k.Kdiag(jnp.asarray(X))
    post_d = ep_inference(K, jnp.asarray(y), b, mode="parallel", max_sweeps=200,
                          epsilon=1e-13)
    post_s = epdtc_inference(K, Kmn, Kdiag, jnp.asarray(y), b, mode="parallel",
                             max_sweeps=200, epsilon=1e-13)
    np.testing.assert_allclose(np.asarray(post_s.tau_site),
                               np.asarray(post_d.tau_site), rtol=5e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(post_s.nu_site),
                               np.asarray(post_d.nu_site), rtol=5e-3, atol=1e-5)
    np.testing.assert_allclose(float(post_s.lml), float(post_d.lml), rtol=1e-3)

    Xs = np.array([[-1.5], [0.0], [1.5]])
    Ks = k.K(jnp.asarray(X), jnp.asarray(Xs))
    kss = k.Kdiag(jnp.asarray(Xs))
    mu_d, var_d = ep_predict(K, Ks, kss, post_d)
    mu_s, var_s = epdtc_predict(post_s.Lm, post_s.LB, post_s.c, Ks, kss)
    np.testing.assert_allclose(np.asarray(mu_s), np.asarray(mu_d), rtol=5e-3,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(var_s), np.asarray(var_d), rtol=5e-3,
                               atol=1e-4)


@pytest.mark.parametrize("mode", ["parallel", "sequential"])
def test_epdtc_subset_inducing_classifies(mode, rng):
    """Sparse EP with m << n inducing points must still separate the classes."""
    X, y, k, K = _toy_classification(rng, n=40)
    Z = np.linspace(-2, 2, 8)[:, None]
    Kmm = k.K(jnp.asarray(Z))
    Kmn = k.K(jnp.asarray(Z), jnp.asarray(X))
    Kdiag = k.Kdiag(jnp.asarray(X))
    post = epdtc_inference(Kmm, Kmn, Kdiag, jnp.asarray(y), lik.Bernoulli(),
                           mode=mode, max_sweeps=60)
    assert bool(jnp.isfinite(post.lml))
    Xs = np.array([[-1.5], [1.5]])
    Kms = k.K(jnp.asarray(Z), jnp.asarray(Xs))
    mu, var = epdtc_predict(post.Lm, post.LB, post.c, Kms, k.Kdiag(jnp.asarray(Xs)))
    assert float(mu[0]) < -0.3 and float(mu[1]) > 0.3
    assert np.all(np.asarray(var) > 0)


def test_epdtc_sequential_matches_parallel(rng):
    X, y, k, K = _toy_classification(rng, n=24)
    Z = np.linspace(-2, 2, 6)[:, None]
    Kmm = k.K(jnp.asarray(Z))
    Kmn = k.K(jnp.asarray(Z), jnp.asarray(X))
    Kdiag = k.Kdiag(jnp.asarray(X))
    post_p = epdtc_inference(Kmm, Kmn, Kdiag, jnp.asarray(y), lik.Bernoulli(),
                             mode="parallel", max_sweeps=200, epsilon=1e-13)
    post_s = epdtc_inference(Kmm, Kmn, Kdiag, jnp.asarray(y), lik.Bernoulli(),
                             mode="sequential", max_sweeps=200, epsilon=1e-13)
    np.testing.assert_allclose(np.asarray(post_s.tau_site),
                               np.asarray(post_p.tau_site), rtol=1e-3, atol=1e-6)
    np.testing.assert_allclose(float(post_s.lml), float(post_p.lml), rtol=1e-5)
