"""Spike-and-Slab GPLVM (GPy models/ss_gplvm.py + psi_comp/ssrbf_psi_comp.py):
gamma -> 1 reduces exactly to the Bayesian GPLVM; dimensionality selection
smoke test."""
import jax.numpy as jnp
import numpy as np

import gaussian_process_optimization_tpu.kernels as kern
from gaussian_process_optimization_tpu.models.gplvm import (
    BayesianGPLVM,
    rbf_psi_stats,
)
from gaussian_process_optimization_tpu.models.ss_gplvm import (
    SSGPLVM,
    fit_ssgplvm,
    spike_slab_kl,
    ssrbf_psi_stats,
)


def test_ssrbf_psi_reduces_to_rbf_at_gamma_one(rng):
    k = kern.RBF.create(3, variance=1.4, lengthscale=np.array([0.7, 1.1, 0.9]),
                        ARD=True)
    Z = rng.standard_normal((6, 3))
    mu = rng.standard_normal((8, 3))
    S = rng.uniform(0.2, 1.0, (8, 3))
    gamma = np.ones((8, 3)) - 1e-13
    p0s, p1s, p2s = ssrbf_psi_stats(k, jnp.asarray(Z), jnp.asarray(mu),
                                    jnp.asarray(S), jnp.asarray(gamma))
    p0, p1, p2 = rbf_psi_stats(k, jnp.asarray(Z), jnp.asarray(mu), jnp.asarray(S))
    np.testing.assert_allclose(float(p0s), float(p0), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(p1s), np.asarray(p1), rtol=1e-7)
    np.testing.assert_allclose(np.asarray(p2s), np.asarray(p2), rtol=1e-7)


def test_ssrbf_psi_spike_zeroes_dimension(rng):
    """gamma -> 0 in a dimension is equivalent to clamping that latent to 0."""
    k = kern.RBF.create(2, variance=1.0, lengthscale=1.0)
    Z = rng.standard_normal((5, 2))
    mu = rng.standard_normal((6, 2))
    S = rng.uniform(0.2, 1.0, (6, 2))
    gamma = np.column_stack([np.ones(6) - 1e-13, np.full(6, 1e-13)])
    _, p1s, _ = ssrbf_psi_stats(k, jnp.asarray(Z), jnp.asarray(mu),
                                jnp.asarray(S), jnp.asarray(gamma))
    mu0 = mu.copy()
    mu0[:, 1] = 0.0
    S0 = S.copy()
    S0[:, 1] = 1e-13
    _, p1, _ = rbf_psi_stats(k, jnp.asarray(Z), jnp.asarray(mu0), jnp.asarray(S0))
    np.testing.assert_allclose(np.asarray(p1s), np.asarray(p1), rtol=1e-5)


def test_ss_elbo_reduces_to_bgplvm(rng):
    t = np.linspace(0, 2 * np.pi, 25)
    Y = np.stack([np.sin(t), np.cos(t), np.sin(2 * t)], 1) \
        + 0.05 * rng.standard_normal((25, 3))
    ss = SSGPLVM.create(Y, input_dim=2, num_inducing=8, noise_var=0.1,
                        pi=1.0 - 1e-9, seed=0)
    ss = type(ss)(kern=ss.kern, likelihood_variance=ss.likelihood_variance,
                  Z=ss.Z, q_mu=ss.q_mu, q_S=ss.q_S,
                  q_gamma=jnp.ones_like(ss.q_gamma) - 1e-12, Y=ss.Y,
                  pi=1.0 - 1e-9)
    bg = BayesianGPLVM(kern=ss.kern, likelihood_variance=ss.likelihood_variance,
                       Z=ss.Z, q_mu=ss.q_mu, q_S=ss.q_S, Y=ss.Y)
    np.testing.assert_allclose(float(ss.elbo()), float(bg.elbo()), rtol=1e-5)


def test_kl_nonnegative_and_zero_at_prior():
    mu = jnp.zeros((4, 2))
    S = jnp.ones((4, 2))
    g = jnp.full((4, 2), 0.3)
    kl = float(spike_slab_kl(mu, S, g, pi=0.3))
    np.testing.assert_allclose(kl, 0.0, atol=1e-9)
    kl2 = float(spike_slab_kl(mu + 0.5, S, g, pi=0.3))
    assert kl2 > 0


def test_ssgplvm_selection_pressure(rng):
    """The spike-and-slab bound must PREFER switching off an uninformative
    latent dimension: elbo(junk dim off) > elbo(junk dim on). This tests the
    model's selection pressure directly (the reference's reason for existing)
    without depending on optimizer dynamics."""
    t = np.linspace(0, 2 * np.pi, 30)
    Y = np.stack([np.sin(t), np.cos(t)], 1) + 0.05 * rng.standard_normal((30, 2))
    m = SSGPLVM.create(Y, input_dim=2, num_inducing=10, noise_var=0.05, pi=0.5,
                       seed=0)
    # dim 0 = informative (circle phase), dim 1 = pure noise
    q_mu = np.stack([np.sin(t) * 1.2, rng.standard_normal(30)], 1)
    base = dict(kern=m.kern, likelihood_variance=m.likelihood_variance, Z=m.Z,
                q_mu=jnp.asarray(q_mu), q_S=m.q_S, Y=m.Y, pi=0.5)
    on_on = SSGPLVM(q_gamma=jnp.asarray(np.column_stack(
        [np.full(30, 1 - 1e-6), np.full(30, 1 - 1e-6)])), **base)
    on_off = SSGPLVM(q_gamma=jnp.asarray(np.column_stack(
        [np.full(30, 1 - 1e-6), np.full(30, 1e-6)])), **base)
    off_on = SSGPLVM(q_gamma=jnp.asarray(np.column_stack(
        [np.full(30, 1e-6), np.full(30, 1 - 1e-6)])), **base)
    e_on_on, e_on_off, e_off_on = (float(x.elbo()) for x in (on_on, on_off, off_on))
    assert e_on_off > e_on_on, (e_on_off, e_on_on)  # junk dim off beats on
    assert e_on_off > e_off_on, (e_on_off, e_off_on)  # keep the informative dim


def test_ssmrd_single_view_matches_ssgplvm(rng):
    """SSMRD with one view == SSGPLVM (same composition identity as MRD/BGPLVM)."""
    from gaussian_process_optimization_tpu.models.ss_gplvm import SSMRD

    t = np.linspace(0, 2 * np.pi, 20)
    Y = np.stack([np.sin(t), np.cos(t)], 1) + 0.05 * rng.standard_normal((20, 2))
    mm = SSMRD.create([Y], input_dim=2, num_inducing=6, noise_var=0.1, pi=0.4,
                      seed=0)
    ss = SSGPLVM(kern=mm.kerns[0], likelihood_variance=mm.noise_vars[0],
                 Z=mm.Zs[0], q_mu=mm.q_mu, q_S=mm.q_S, q_gamma=mm.q_gamma,
                 Y=mm.Ys[0], pi=0.4)
    np.testing.assert_allclose(float(mm.elbo()), float(ss.elbo()), rtol=1e-10)


def test_ssgplvm_fit_improves_elbo(rng):
    t = np.linspace(0, 2 * np.pi, 30)
    Y = np.stack([np.sin(t), np.cos(t), 0.5 * np.sin(t) + 0.5 * np.cos(t)], 1)
    Y += 0.05 * rng.standard_normal(Y.shape)
    m = SSGPLVM.create(Y, input_dim=3, num_inducing=10, noise_var=0.1, pi=0.5,
                       seed=0)
    e0 = float(m.elbo())
    fitted, res = fit_ssgplvm(m, maxiter=100)
    e1 = float(fitted.elbo())
    assert np.isfinite(e1) and e1 > e0
    rel = np.asarray(fitted.relevance())
    assert np.all(rel >= 0) and np.all(rel <= 1)
