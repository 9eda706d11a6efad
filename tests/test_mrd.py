"""MRD (GPy models/mrd.py): two-view toy — shared + private latent recovery
via per-view ARD relevance, plus ELBO consistency with BayesianGPLVM."""
import jax.numpy as jnp
import numpy as np

from gaussian_process_optimization_tpu.models.gplvm import BayesianGPLVM
from gaussian_process_optimization_tpu.models.mrd import MRD, fit_mrd


def _two_view_toy(n=48, seed=0):
    rng = np.random.default_rng(seed)
    t = np.linspace(0, 2 * np.pi, n)
    shared = np.sin(t)
    priv1 = np.cos(3 * t)
    priv2 = rng.standard_normal(n).cumsum() / np.sqrt(n)
    priv2 = (priv2 - priv2.mean()) / priv2.std()

    def view(latents, p, seed):
        r = np.random.default_rng(seed)
        W = r.standard_normal((latents.shape[1], p))
        return latents @ W + 0.05 * r.standard_normal((latents.shape[0], p))

    Y1 = view(np.stack([shared, priv1], 1), 6, 1)
    Y2 = view(np.stack([shared, priv2], 1), 6, 2)
    return Y1, Y2


def test_mrd_elbo_finite_and_single_view_matches_bgplvm():
    """With ONE view, MRD's objective is exactly the Bayesian-GPLVM ELBO."""
    Y1, _ = _two_view_toy()
    m = MRD.create([Y1], input_dim=3, num_inducing=8, noise_var=0.1, seed=0)
    bg = BayesianGPLVM.create(Y1, input_dim=3, num_inducing=8, noise_var=0.1, seed=0)
    # align the shared initializations
    bg = type(bg)(
        kern=m.kerns[0], likelihood_variance=m.noise_vars[0], Z=m.Zs[0],
        q_mu=m.q_mu, q_S=m.q_S, Y=m.Ys[0],
    )
    np.testing.assert_allclose(float(m.elbo()), float(bg.elbo()), rtol=1e-10)


def test_mrd_two_views_recover_shared_and_private():
    Y1, Y2 = _two_view_toy()
    m = MRD.create([Y1, Y2], input_dim=4, num_inducing=12, noise_var=0.1, seed=0)
    e0 = float(m.elbo())
    # 400 iters: at 200 the ARD relevances are not yet separated (private dims
    # sit just under the 0.3 bar); by 400 the split is unambiguous and keeps
    # sharpening (checked to 800) — the assertion is about structure recovery,
    # not a particular optimizer trajectory
    fitted, res = fit_mrd(m, maxiter=400)
    e1 = float(fitted.elbo())
    assert np.isfinite(e1) and e1 > e0, (e0, e1)

    rel = np.asarray(fitted.relevance())  # (2, Q)
    rel = rel / rel.max(axis=1, keepdims=True)  # per-view normalized
    # shared structure: at least one latent dimension relevant (>30%) to BOTH views
    both = np.where((rel[0] > 0.3) & (rel[1] > 0.3))[0]
    assert len(both) >= 1, rel
    # private structure: each view also leans on a dimension the other ignores
    only1 = np.where((rel[0] > 0.3) & (rel[1] < 0.15))[0]
    only2 = np.where((rel[1] > 0.3) & (rel[0] < 0.15))[0]
    assert len(only1) >= 1 or len(only2) >= 1, rel
