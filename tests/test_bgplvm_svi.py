"""Uncollapsed SVI Bayesian GPLVM (GPy bayesian_gplvm_minibatch.py /
sparse_gp_minibatch.py / VarDTC_minibatch): at the OPTIMAL q(U) the uncollapsed
bound must EQUAL the collapsed Titsias bound — the strongest consistency check
available — plus unbiased-minibatch and Adam-training smoke tests."""
import jax
import jax.numpy as jnp
import numpy as np

from gaussian_process_optimization_tpu.models.bgplvm_svi import BGPLVM_SVI
from gaussian_process_optimization_tpu.models.gplvm import BayesianGPLVM


def _toy(rng, n=30, p=4):
    t = np.linspace(0, 2 * np.pi, n)
    W = rng.standard_normal((2, p))
    Y = np.stack([np.sin(t), np.cos(t)], 1) @ W + 0.05 * rng.standard_normal((n, p))
    return Y


def test_optimal_qU_recovers_collapsed_bound(rng):
    Y = _toy(rng)
    m = BGPLVM_SVI.create(Y, input_dim=2, num_inducing=8, noise_var=0.1, seed=0)
    m_opt, S_opt = m.optimal_qU()
    # write the optimal q(U) back (qU_A must produce chol(S_opt))
    LS = np.linalg.cholesky(np.asarray(S_opt))
    # invert the _tril_chol parameterization: softplus(diag(A)) = diag(LS)
    A = np.tril(LS, -1) + np.diag(np.log(np.expm1(np.diag(LS) - 1e-8)))
    m_star = type(m)(kern=m.kern, likelihood_variance=m.likelihood_variance,
                     Z=m.Z, q_mu=m.q_mu, q_S=m.q_S,
                     qU_mean=jnp.asarray(m_opt), qU_A=jnp.asarray(A), Y=m.Y)
    collapsed = BayesianGPLVM(kern=m.kern,
                              likelihood_variance=m.likelihood_variance,
                              Z=m.Z, q_mu=m.q_mu, q_S=m.q_S, Y=m.Y)
    e_unc = float(m_star.elbo())
    e_col = float(collapsed.elbo())
    np.testing.assert_allclose(e_unc, e_col, rtol=1e-6)
    # and any OTHER q(U) must be strictly below the collapsed bound
    assert float(m.elbo()) < e_col


def test_minibatch_estimate_unbiased(rng):
    Y = _toy(rng, n=24)
    m = BGPLVM_SVI.create(Y, input_dim=2, num_inducing=6, noise_var=0.1, seed=0)
    full = float(m.elbo())
    # average the minibatch estimator over all disjoint batches == full bound
    idxs = np.arange(24).reshape(4, 6)
    ests = [float(m.elbo_minibatch(jnp.asarray(ix))) for ix in idxs]
    np.testing.assert_allclose(np.mean(ests), full, rtol=1e-8)


def test_adam_minibatch_training_improves(rng):
    import optax

    from gaussian_process_optimization_tpu.models.parameters import (
        POSITIVE_NAMES,
        _leaf_names,
    )
    from gaussian_process_optimization_tpu.utils.packing import Packer
    from gaussian_process_optimization_tpu.utils.transforms import IDENTITY, POSITIVE

    Y = _toy(rng, n=32)
    m = BGPLVM_SVI.create(Y, input_dim=2, num_inducing=8, noise_var=0.1, seed=0)
    names = _leaf_names(m)
    transforms = [POSITIVE if nm in POSITIVE_NAMES or nm == "q_S" else IDENTITY
                  for nm in names]
    fixed = [nm == "Y" for nm in names]
    packer = Packer(m, transforms=transforms, fixed=fixed)
    u = packer.pack(m)
    opt = optax.adam(1e-2)
    state = opt.init(u)

    @jax.jit
    def step(u, state, idx):
        def loss(uu):
            mm = packer.unpack(uu, reference=m)
            return -mm.elbo_minibatch(idx)

        val, g = jax.value_and_grad(loss)(u)
        updates, state = opt.update(g, state)
        return optax.apply_updates(u, updates), state, val

    e0 = float(m.elbo())
    key = np.random.default_rng(0)
    for it in range(120):
        idx = jnp.asarray(key.permutation(32)[:8])
        u, state, _ = step(u, state, idx)
    fitted = packer.unpack(u, reference=m)
    e1 = float(fitted.elbo())
    assert np.isfinite(e1) and e1 > e0, (e0, e1)
