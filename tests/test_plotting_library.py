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
