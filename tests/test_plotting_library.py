"""Backend-switchable plotting abstraction + injected gpy_plot family
(VERDICT round-1 item 6; GPy plotting/__init__.py change_plotting_library :8,
inject_plotting :41, gpy_plot/gp_plots.py)."""
import os

import numpy as np
import pytest

import gaussian_process_optimization_tpu.kernels as kern
from gaussian_process_optimization_tpu.models.gp import GPRegression
from gaussian_process_optimization_tpu.utils import plotting_library as pl


@pytest.fixture
def model(rng):
    X = rng.uniform(-2, 2, (15, 1))
    Y = np.sin(X) + 0.1 * rng.standard_normal((15, 1))
    return GPRegression.create(X, Y, kernel=kern.RBF.create(1), noise_var=0.05)


@pytest.fixture(autouse=True)
def _restore_backend():
    yield
    pl.change_plotting_library("matplotlib")


def test_injected_plot_family_writes_images(model, tmp_path):
    for name in ("plot", "plot_data", "plot_mean", "plot_confidence",
                 "plot_samples", "plot_density"):
        fn = tmp_path / f"{name}.png"
        getattr(model, name)(filename=str(fn))
        assert fn.exists() and os.path.getsize(fn) > 1000, name


def test_none_backend_is_noop(model, tmp_path):
    pl.change_plotting_library("none")
    fn = tmp_path / "nothing.png"
    out = model.plot(filename=str(fn))
    assert out is None
    assert not fn.exists()


def test_plotly_backend_gated_cleanly():
    """plotly is not bundled in this environment: selecting the backend must
    raise a clear ImportError at switch time (or work, if plotly is present)."""
    try:
        import plotly  # noqa: F401

        have_plotly = True
    except ImportError:
        have_plotly = False
    if have_plotly:
        lib = pl.change_plotting_library("plotly")
        assert lib.name == "plotly"
    else:
        with pytest.raises(ImportError, match="plotly"):
            pl.change_plotting_library("plotly")


def test_unknown_backend_rejected():
    with pytest.raises(ValueError, match="unknown plotting library"):
        pl.change_plotting_library("ascii-art")


def test_backend_switch_roundtrip(model, tmp_path):
    pl.change_plotting_library("none")
    assert pl.plotting_library().name == "none"
    pl.change_plotting_library("matplotlib")
    assert pl.plotting_library().name == "matplotlib"
    fn = tmp_path / "after_switch.png"
    model.plot_mean(filename=str(fn))
    assert fn.exists()


def test_latent_plot_family(tmp_path, rng):
    """Latent plots (gpy_plot/latent_plots.py family): scatter over the two
    most ARD-relevant dims, magnification map via jacfwd, inducing overlay."""
    from gaussian_process_optimization_tpu.models.gplvm import (
        BayesianGPLVM, make_gplvm)

    t = np.sort(rng.uniform(-2, 2, 25))
    Y = np.stack([np.sin(t), np.cos(t), t], axis=1)

    m = make_gplvm(Y, input_dim=2)
    f = tmp_path / "latent_gplvm.png"
    m.plot_latent(labels=(t > 0).astype(int), filename=str(f))
    assert f.exists() and f.stat().st_size > 0

    bg = BayesianGPLVM.create(Y, input_dim=2, num_inducing=5)
    f2 = tmp_path / "latent_bgplvm.png"
    bg.plot_latent(filename=str(f2))
    assert f2.exists() and f2.stat().st_size > 0
    _, M = bg.plot_magnification(resolution=8)
    assert M.shape == (8, 8) and np.all(np.isfinite(M)) and np.all(M >= 0)


def test_plot_f_and_errorbars_trainset(model, tmp_path):
    """plot_f (latent f, no likelihood noise — gp_plots.py:357) and
    plot_errorbars_trainset (data_plots.py:199) render; the f band is strictly
    inside the likelihood-inclusive band."""
    f1 = tmp_path / "f.png"
    model.plot_f(filename=str(f1))
    assert f1.exists() and os.path.getsize(f1) > 1000
    f2 = tmp_path / "errb.png"
    model.plot_errorbars_trainset(filename=str(f2))
    assert f2.exists() and os.path.getsize(f2) > 1000


def test_plot_errorbars_heteroscedastic(tmp_path, rng):
    """Heteroscedastic model: errorbars use each training row's own noise."""
    from gaussian_process_optimization_tpu.models.zoo import (
        GPHeteroscedasticRegression,
    )

    X = np.linspace(-2, 2, 12)[:, None]
    Y = np.sin(X) + 0.05 * rng.standard_normal((12, 1))
    m = GPHeteroscedasticRegression(
        X, Y, kernel=kern.RBF.create(1),
        noise_vars=np.linspace(0.01, 0.5, 12))
    fn = tmp_path / "het_errb.png"
    m.plot_errorbars_trainset(filename=str(fn))
    assert fn.exists() and os.path.getsize(fn) > 1000


def test_plot_inducing_dataspace(tmp_path, rng):
    """Sparse-model inducing inputs in data space (data_plots.py:161)."""
    from gaussian_process_optimization_tpu.models.sparse import (
        SparseGPRegression,
    )

    X = rng.uniform(-2, 2, (20, 1))
    Y = np.sin(X) + 0.1 * rng.standard_normal((20, 1))
    m = SparseGPRegression.create(X, Y, kernel=kern.RBF.create(1),
                                  num_inducing=6, noise_var=0.05)
    fn = tmp_path / "inducing.png"
    m.plot_inducing(filename=str(fn))
    assert fn.exists() and os.path.getsize(fn) > 1000


def test_plot_ard_and_covariance(tmp_path):
    """Kernel plots (kernel_plots.py plot_ARD:36, plot_covariance:86):
    stacked sensitivities match input_sensitivity sums; 1-D covariance slice
    equals direct K evaluation."""
    k1 = kern.RBF.create(3, variance=2.0, lengthscale=[1.0, 2.0, 4.0], ARD=True)
    k2 = kern.Linear.create(3, variances=[0.5, 0.1, 0.2], ARD=True)
    k = k1 + k2
    fn = tmp_path / "ard.png"
    fig, total = k.plot_ARD(filename=str(fn))
    assert fn.exists() and os.path.getsize(fn) > 1000
    expect = np.asarray(k1.input_sensitivity()) + np.asarray(k2.input_sensitivity())
    np.testing.assert_allclose(total, expect, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(k.input_sensitivity()), expect,
                               rtol=1e-12)

    k1d = kern.RBF.create(1, variance=1.5, lengthscale=0.7)
    fn2 = tmp_path / "cov1d.png"
    fig, K = k1d.plot_covariance(filename=str(fn2), resolution=64)
    assert fn2.exists()
    xs = np.linspace(-3, 3, 64)[:, None]
    np.testing.assert_allclose(
        K, np.asarray(k1d.K(xs, np.zeros((1, 1))))[:, 0], rtol=1e-10)

    k2d = kern.Matern52.create(2)
    fn3 = tmp_path / "cov2d.png"
    _, K2 = k2d.plot_covariance(filename=str(fn3), resolution=16)
    assert K2.shape == (16, 16) and fn3.exists()
    with pytest.raises(ValueError):
        kern.RBF.create(3).plot_covariance()


def test_plot_steepest_gradient_map(tmp_path, rng):
    """Steepest-output-gradient latent map (latent_plots.py:305): argmax
    labels pick the output with the largest mean-gradient norm."""
    from gaussian_process_optimization_tpu.models.gplvm import make_gplvm

    t = np.sort(rng.uniform(-2, 2, 20))
    Y = np.stack([np.sin(t), 3.0 * t], axis=1)
    m = make_gplvm(Y, input_dim=2)
    fn = tmp_path / "steepest.png"
    fig, steep, arg = m.plot_steepest_gradient_map(
        resolution=6, filename=str(fn), output_labels=["sin", "lin"])
    assert fn.exists() and os.path.getsize(fn) > 1000
    assert steep.shape == (6, 6) and arg.shape == (6, 6)
    assert np.all(steep >= 0) and np.all((arg == 0) | (arg == 1))


def test_plot_optimizer(tmp_path):
    """plot_optimizer (inference_plots.py:10): renders an LBFGSResult trace;
    returns None (with a message) when no trace was recorded."""
    import jax.numpy as jnp

    from gaussian_process_optimization_tpu.ops import lbfgs

    res = lbfgs.minimize(lambda x: jnp.sum((x - 2.0) ** 2),
                         jnp.zeros(3), maxiter=30, trace=True)
    fn = tmp_path / "opt.png"
    fig = pl.plot_optimizer(res, filename=str(fn))
    assert fn.exists() and os.path.getsize(fn) > 1000
    assert pl.plot_optimizer(lbfgs.minimize(
        lambda x: jnp.sum(x ** 2), jnp.ones(2), maxiter=5)) is None


def test_latent_plots_reject_1d_latent():
    """A 1-D latent space cannot render the two-dim latent plots: raise a
    clear error instead of silently plotting X[:,0] against itself."""
    from gaussian_process_optimization_tpu.models.gplvm import make_gplvm

    Y = np.stack([np.sin(np.linspace(0, 3, 12)),
                  np.cos(np.linspace(0, 3, 12))], axis=1)
    m = make_gplvm(Y, input_dim=1)
    with pytest.raises(ValueError, match="2 latent dim"):
        m.plot_latent_scatter()
    with pytest.raises(ValueError, match="distinct"):
        m.plot_magnification(which_indices=(0, 0))


def test_fixed_inputs_helper(rng):
    """Pinned to GPy/testing/util_tests.py:53-100 (median/mean/zero routines;
    unfixed dim absent; BayesianGPLVM uses q_mu like NormalPosterior.mean)."""
    X = rng.standard_normal((10, 3))
    Y = np.sin(X[:, :1]) + 1e-3 * rng.standard_normal((10, 1))
    m = GPRegression.create(X, Y, kernel=kern.RBF.create(3), noise_var=0.05)
    for routine, fn in (("median", np.median), ("mean", np.mean),
                        ("zero", lambda c: 0.0)):
        fixed = pl.fixed_inputs(m, [1], fix_routine=routine)
        assert (0, fn(X[:, 0])) in fixed
        assert (2, fn(X[:, 2])) in fixed
        assert not [t for t in fixed if t[0] == 1]
    with pytest.raises(ValueError, match="fix_routine"):
        pl.fixed_inputs(m, [1], fix_routine="mode")

    from gaussian_process_optimization_tpu.models.gplvm import BayesianGPLVM
    b = BayesianGPLVM.create(np.asarray(Y @ np.ones((1, 4))), input_dim=2,
                             num_inducing=5)
    fixed = pl.fixed_inputs(b, [0], fix_routine="median")
    assert fixed == [(1, float(np.median(np.asarray(b.q_mu)[:, 1])))]


def test_sliced_plot_family_on_3d_model(rng, tmp_path):
    """visible_dims + fixed_inputs slice a 3-D model to a 1-D section
    (gpy_plot/plot_util.py:103-126); without them a 3-D model cannot build a
    1-D grid and must raise."""
    X = rng.uniform(-2, 2, (20, 3))
    Y = np.sin(X[:, :1]) + 0.3 * X[:, 1:2]
    m = GPRegression.create(X, Y, kernel=kern.RBF.create(3), noise_var=0.05)
    fixed = pl.fixed_inputs(m, [0], fix_routine="median")
    for name in ("plot", "plot_mean", "plot_confidence", "plot_samples",
                 "plot_density", "plot_f"):
        fn = tmp_path / f"sliced_{name}.png"
        getattr(m, name)(filename=str(fn), visible_dims=[0],
                         fixed_inputs=fixed)
        assert fn.exists() and os.path.getsize(fn) > 1000, name
    with pytest.raises(ValueError, match="one free dim"):
        m.plot_mean(visible_dims=[0, 1, 2])
    # the grid really holds the fixed values: a sliced mean at x1=median must
    # equal predict() on an explicitly built grid
    import jax.numpy as jnp

    grid, d0 = pl._grid_1d(m, resolution=7, visible_dims=[0],
                           fixed_inputs=fixed)
    assert d0 == 0
    np.testing.assert_allclose(grid[:, 1], fixed[0][1])
    np.testing.assert_allclose(grid[:, 2], fixed[1][1])
    mu, _ = m.predict(jnp.asarray(grid))
    assert np.all(np.isfinite(np.asarray(mu)))
