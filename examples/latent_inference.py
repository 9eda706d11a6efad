"""Round-3 feature tour: latent-X inference for new observations (infer_newX)
on GPLVM / Bayesian GPLVM — including missing data — and the MCMC samplers tail
(Metropolis-Hastings with Gelman adaptive tuning, HMC with the shortcut test).

Run: python examples/latent_inference.py
"""
import numpy as np


def _spiral(n=40, seed=3):
    rng = np.random.default_rng(seed)
    t = np.sort(rng.uniform(-2, 2, n))
    Y = np.stack([np.sin(t), np.cos(t), t, 0.5 * t**2], axis=1)
    return t, Y + 0.03 * rng.standard_normal(Y.shape)


def infer_newx_demo(n=40, seed=3, maxiter=300):
    """Train a point GPLVM, then locate held-out observations in latent space
    (GPy infer_newX) — one vmapped L-BFGS over all rows. Also: a row with a
    missing (NaN) dimension, which the reference only supports one row at a
    time (inferenceX.py:47)."""
    import jax.numpy as jnp

    from gaussian_process_optimization_tpu.models.gplvm import fit_gplvm, make_gplvm
    from gaussian_process_optimization_tpu.models.inference_x import infer_newX

    _, Y = _spiral(n, seed)
    train = np.arange(n) % 5 != 0
    model, _ = fit_gplvm(make_gplvm(Y[train], input_dim=1), maxiter=maxiter)

    Y_new = Y[~train].copy()
    Y_new[0, 1] = np.nan  # a partially-observed row
    x_star, info = infer_newX(model, jnp.asarray(Y_new), maxiter=maxiter)
    y_rec, _ = model.predict(x_star)
    valid = ~np.isnan(Y_new)
    rmse = float(np.sqrt(np.mean(
        np.square((np.asarray(y_rec) - np.where(valid, Y_new, 0.0))[valid]))))
    return rmse


def mcmc_tail_demo(num_samples=2000, seed=0):
    """The MCMC samplers tail on a correlated Gaussian target: random-walk MH
    with Gelman tuning (samplers.py:18) and HMC with the shortcut trajectory
    test (hmc.py:70) must agree on the posterior moments."""
    import jax
    import jax.numpy as jnp

    from gaussian_process_optimization_tpu.models.hmc import (
        hmc_shortcut_sample,
        metropolis_hastings,
    )

    mu = jnp.asarray([1.0, -2.0])
    prec = jnp.asarray([[2.0, 0.3], [0.3, 1.0]])

    def logpost(u):
        d = u - mu
        return -0.5 * d @ prec @ d

    s_mh, rate, _, _ = metropolis_hastings(
        logpost, jnp.zeros(2), jax.random.PRNGKey(seed),
        num_samples=num_samples, burnin=num_samples // 5, thin=4)
    s_hmc, _ = hmc_shortcut_sample(
        lambda u: -logpost(u), jnp.zeros(2), jax.random.PRNGKey(seed + 1),
        num_samples=num_samples // 2, stepsize_range=(1e-3, 0.5),
        leapfrog_steps=10)
    m_mh = np.asarray(s_mh).mean(0)
    m_hmc = np.asarray(s_hmc[num_samples // 8:]).mean(0)
    return m_mh, m_hmc, float(rate)


if __name__ == "__main__":
    rmse = infer_newx_demo()
    print(f"infer_newX held-out reconstruction RMSE (incl. a NaN dim): {rmse:.4f}")
    m_mh, m_hmc, rate = mcmc_tail_demo()
    print(f"MH posterior mean {np.round(m_mh, 2)} (accept {rate:.2f}); "
          f"HMC-shortcut mean {np.round(m_hmc, 2)}; target [1, -2]")
