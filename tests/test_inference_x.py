"""infer_newX — latent-X inference for new observations (VERDICT r2 missing #1).

Mirrors GPy's InferenceXTestCase (GPy/GPy/testing/inference_tests.py:14-52):
after training a (B)GPLVM, inferring latents for the TRAINING Y must land near
the trained latents; and inferred latents for held-out rows must reconstruct
their observations through the trained decoder.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gaussian_process_optimization_tpu.kernels as kern
from gaussian_process_optimization_tpu.models.gplvm import (
    BayesianGPLVM,
    fit_gplvm,
    make_gplvm,
)
from gaussian_process_optimization_tpu.models.inference_x import (
    NormalLatentPosterior,
    infer_newX,
)


def _gen(n=40, seed=1111):
    rng = np.random.default_rng(seed)
    t = np.sort(rng.uniform(-2, 2, n))
    Y = np.stack([np.sin(t), np.cos(t), t, 0.5 * t**2, np.sin(2 * t)], axis=1)
    Y += 0.03 * rng.standard_normal(Y.shape)
    return t, Y


def test_infer_newx_gplvm_recovers_training_latents():
    """Point GPLVM (inference_tests.py:40-52): infer_newX(m, m.Y) ~= m.X."""
    _, Y = _gen()
    m = make_gplvm(Y, input_dim=1)
    fitted, _ = fit_gplvm(m, maxiter=400)

    x_inf, info = infer_newX(fitted, fitted.Y, optimize=True, maxiter=300)
    x_train = np.asarray(fitted.X)
    err = np.abs(np.asarray(x_inf) - x_train)
    scale = np.std(x_train)
    assert err.max() < 0.1 * scale, err.max()
    assert np.all(np.isfinite(np.asarray(info["objective"])))


def test_infer_newx_gplvm_heldout_reconstructs():
    """Held-out rows: the inferred latent must decode back to the observation
    (functional recovery — the 'where is this new Y*?' capability itself)."""
    t, Y = _gen(n=50)
    train = np.arange(50) % 5 != 0
    m = make_gplvm(Y[train], input_dim=1)
    fitted, _ = fit_gplvm(m, maxiter=400)

    Y_new = jnp.asarray(Y[~train])
    x_inf, _ = infer_newX(fitted, Y_new, optimize=True, maxiter=300)
    y_rec, _ = fitted.predict(x_inf)
    rmse = float(np.sqrt(np.mean(np.square(np.asarray(y_rec) - np.asarray(Y_new)))))
    assert rmse < 0.15, rmse
    # the nearest-neighbour init alone must be beaten by the optimization
    x0, info0 = infer_newX(fitted, Y_new, optimize=False)
    y0, _ = fitted.predict(x0)
    rmse0 = float(np.sqrt(np.mean(np.square(np.asarray(y0) - np.asarray(Y_new)))))
    assert rmse <= rmse0 + 1e-9


def test_infer_newx_bgplvm_recovers_training_latents():
    """Bayesian GPLVM (inference_tests.py:22-37): infer_newX(m, m.Y) recovers
    the variational means (and the objective is row-decomposed correctly)."""
    from gaussian_process_optimization_tpu.models import fit as fit_mod
    from gaussian_process_optimization_tpu.models.parameters import make_packer
    from gaussian_process_optimization_tpu.ops import lbfgs

    # genuinely 2-D latent so BOTH latent dims are identified (a noise dim has a
    # flat bound and its per-point posterior is arbitrary)
    rng = np.random.default_rng(7)
    T = rng.uniform(-2, 2, size=(30, 2))
    Y = np.stack([np.sin(T[:, 0]), np.cos(T[:, 0]) + T[:, 1], T[:, 0] * T[:, 1],
                  0.5 * T[:, 1] ** 2, np.sin(T[:, 1]), T[:, 0]], axis=1)
    Y += 0.03 * rng.standard_normal(Y.shape)
    bg = BayesianGPLVM.create(Y, input_dim=2, num_inducing=12, noise_var=0.05)
    packer = make_packer(bg)
    obj = fit_mod.make_objective(packer)
    res = lbfgs.minimize(lambda u: obj(u, bg), packer.pack(bg), maxiter=400)
    bg = packer.unpack(res.x, reference=bg)

    q, info = infer_newX(bg, bg.Y, optimize=True, maxiter=300)
    assert isinstance(q, NormalLatentPosterior)
    mu_t = np.asarray(bg.q_mu)
    err = np.abs(np.asarray(q.mean) - mu_t)
    assert err.max() < 0.25 * np.std(mu_t) + 0.05, err.max()
    assert np.all(np.asarray(q.variance) > 0)
    assert np.all(np.isfinite(np.asarray(info["objective"])))


def test_infer_newx_init_modes():
    """'L2' / 'NCC' / 'rand' init dispatch (inferenceX.py:87-106) and the
    optimize=False fast path returning the seeded latents."""
    _, Y = _gen(n=20)
    m = make_gplvm(Y, input_dim=1)
    for init in ("L2", "NCC", "rand"):
        x0, info = infer_newX(m, Y[:4], optimize=False, init=init,
                              key=jax.random.PRNGKey(0))
        assert x0.shape == (4, 1)
        assert np.all(np.isfinite(np.asarray(info["objective"])))
    # L2 with the exact training rows seeds with the matching latents
    x0, _ = infer_newX(m, m.Y[:4], optimize=False, init="L2")
    np.testing.assert_allclose(np.asarray(x0), np.asarray(m.X[:4]), rtol=1e-12)
    with pytest.raises(ValueError):
        infer_newX(m, Y[:2], init="bogus")
    with pytest.raises(TypeError):
        infer_newX(object(), Y[:2])


def test_infer_newx_missing_data():
    """Missing-data path (inferenceX.py:46-52,90-96,125-133): NaN dims are
    ignored in both the nearest-neighbour init and the objective. The reference
    supports one row at a time; the branchless mask handles a batch."""
    t, Y = _gen(n=50)
    m = make_gplvm(Y, input_dim=1)
    fitted, _ = fit_gplvm(m, maxiter=400)

    Y_new = np.asarray(fitted.Y[:6]).copy()
    Y_new[0, 2] = np.nan          # one missing dim
    Y_new[3, :3] = np.nan         # most dims missing
    x_full, _ = infer_newX(fitted, fitted.Y[:6], optimize=True, maxiter=200)
    x_miss, info = infer_newX(fitted, jnp.asarray(Y_new), optimize=True,
                              maxiter=200)
    assert np.all(np.isfinite(np.asarray(info["objective"])))
    # rows with a single missing dim still land near the full-data solution
    d = np.abs(np.asarray(x_miss) - np.asarray(x_full))[:, 0]
    scale = float(np.std(np.asarray(fitted.X)))
    assert d[0] < 0.15 * scale
    assert d[1] < 1e-6 and d[2] < 1e-6  # untouched rows identical
