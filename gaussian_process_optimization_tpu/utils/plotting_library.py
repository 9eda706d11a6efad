"""Backend-switchable plotting abstraction + the gpy_plot family.

Rebuild of GPy's plotting layer (``GPy/GPy/plotting/__init__.py:8``
``change_plotting_library``, ``abstract_plotting_library.py``, the
``gpy_plot/`` generic plots and ``inject_plotting`` (:41) that attaches
``m.plot*`` methods onto models):

- ``change_plotting_library(name)`` / ``plotting_library()`` — global backend
  switch. Backends: 'matplotlib' (default, Agg), 'none' (all plot calls become
  no-ops returning None, as GPy supports), 'plotly' (registered; raises a clear
  ImportError if the plotly package is absent — it is not shipped in this
  environment and installs are disallowed, so the backend is gated not vendored).
- the generic plot family, written against the small backend-primitive interface
  (``AbstractPlottingLibrary``): ``plot_data``, ``plot_mean``,
  ``plot_confidence``, ``plot_samples``, ``plot_density``, and the composite
  ``plot`` — injected as methods on the GP model classes by
  ``inject_plotting()`` (called at models package import, like GPy's).

All model math stays in the model; backends only receive numpy arrays.
"""
from __future__ import annotations

import numpy as np

# --------------------------------------------------------------------- backends


class AbstractPlottingLibrary:
    """Primitive interface the generic plots are written against
    (GPy plotting/abstract_plotting_library.py)."""

    name = "abstract"

    def figure(self, rows=1, cols=1, figsize=None):
        raise NotImplementedError

    def plot(self, ax, x, y, color=None, label=None, linewidth=None, marker=None,
             alpha=None):
        raise NotImplementedError

    def scatter(self, ax, x, y, color=None, label=None, marker="x", s=None):
        raise NotImplementedError

    def fill_between(self, ax, x, lower, upper, color=None, alpha=0.3, label=None):
        raise NotImplementedError

    def contour(self, ax, X1, X2, Z, levels=30):
        raise NotImplementedError

    def legend(self, ax):
        raise NotImplementedError

    def set_labels(self, ax, xlabel=None, ylabel=None, title=None):
        raise NotImplementedError

    def save(self, fig, filename):
        raise NotImplementedError


class MatplotlibBackend(AbstractPlottingLibrary):
    """(GPy plotting/matplot_dep/)."""

    name = "matplotlib"

    def _plt(self):
        import matplotlib

        matplotlib.use("Agg", force=False)
        import matplotlib.pyplot as plt

        return plt

    def figure(self, rows=1, cols=1, figsize=None):
        plt = self._plt()
        fig, axes = plt.subplots(rows, cols, figsize=figsize or (6 * cols, 4.5 * rows))
        return fig, np.atleast_1d(axes)

    def plot(self, ax, x, y, color=None, label=None, linewidth=None, marker=None,
             alpha=None):
        ax.plot(x, y, color=color, label=label, linewidth=linewidth, marker=marker,
                alpha=alpha)

    def scatter(self, ax, x, y, color=None, label=None, marker="x", s=None):
        ax.scatter(x, y, color=color or "k", label=label, marker=marker, s=s)

    def fill_between(self, ax, x, lower, upper, color=None, alpha=0.3, label=None):
        ax.fill_between(x, lower, upper, color=color, alpha=alpha, label=label)

    def contour(self, ax, X1, X2, Z, levels=30):
        c = ax.contourf(X1, X2, Z, levels)
        ax.figure.colorbar(c, ax=ax)

    def legend(self, ax):
        ax.legend(loc="best")

    def set_labels(self, ax, xlabel=None, ylabel=None, title=None):
        if xlabel:
            ax.set_xlabel(xlabel)
        if ylabel:
            ax.set_ylabel(ylabel)
        if title:
            ax.set_title(title)

    def save(self, fig, filename):
        fig.savefig(filename, bbox_inches="tight")
        import matplotlib.pyplot as plt

        plt.close(fig)


class NoneBackend(AbstractPlottingLibrary):
    """Disables plotting (GPy supports library 'none'): every call is a no-op."""

    name = "none"

    def figure(self, rows=1, cols=1, figsize=None):
        return None, [None] * (rows * cols)

    def plot(self, *a, **k):
        return None

    def scatter(self, *a, **k):
        return None

    def fill_between(self, *a, **k):
        return None

    def contour(self, *a, **k):
        return None

    def legend(self, *a, **k):
        return None

    def set_labels(self, *a, **k):
        return None

    def save(self, *a, **k):
        return None


class PlotlyBackend(AbstractPlottingLibrary):
    """Gated plotly backend (GPy plotting/plotly_dep/): requires the plotly
    package, which is not bundled here — selecting it without plotly installed
    raises ImportError at switch time, not at plot time."""

    name = "plotly"

    def __init__(self):
        try:
            import plotly  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "the 'plotly' plotting backend requires the plotly package, "
                "which is not installed in this environment; use "
                "change_plotting_library('matplotlib') or 'none'"
            ) from e
        import plotly.graph_objects as go

        self._go = go

    def figure(self, rows=1, cols=1, figsize=None):
        from plotly.subplots import make_subplots

        fig = make_subplots(rows=rows, cols=cols)
        axes = [(fig, r + 1, c + 1) for r in range(rows) for c in range(cols)]
        return fig, axes

    def plot(self, ax, x, y, color=None, label=None, linewidth=None, marker=None,
             alpha=None):
        fig, r, c = ax
        fig.add_trace(
            self._go.Scatter(x=np.asarray(x).ravel(), y=np.asarray(y).ravel(),
                             mode="lines", name=label,
                             line=dict(color=color, width=linewidth),
                             opacity=alpha if alpha is not None else 1.0),
            row=r, col=c,
        )

    def scatter(self, ax, x, y, color=None, label=None, marker="x", s=None):
        fig, r, c = ax
        fig.add_trace(
            self._go.Scatter(x=np.asarray(x).ravel(), y=np.asarray(y).ravel(),
                             mode="markers", name=label,
                             marker=dict(color=color, size=s or 8)),
            row=r, col=c,
        )

    def fill_between(self, ax, x, lower, upper, color=None, alpha=0.3, label=None):
        fig, r, c = ax
        x = np.asarray(x).ravel()
        fig.add_trace(
            self._go.Scatter(
                x=np.concatenate([x, x[::-1]]),
                y=np.concatenate([np.asarray(upper).ravel(),
                                  np.asarray(lower).ravel()[::-1]]),
                fill="toself", name=label, opacity=alpha, mode="none",
            ),
            row=r, col=c,
        )

    def contour(self, ax, X1, X2, Z, levels=30):
        fig, r, c = ax
        fig.add_trace(
            self._go.Contour(x=X1[0], y=X2[:, 0], z=Z, ncontours=levels),
            row=r, col=c,
        )

    def legend(self, ax):
        return None  # plotly shows legends by default

    def set_labels(self, ax, xlabel=None, ylabel=None, title=None):
        fig, r, c = ax
        fig.update_xaxes(title_text=xlabel, row=r, col=c)
        fig.update_yaxes(title_text=ylabel, row=r, col=c)
        if title:
            fig.update_layout(title=title)

    def save(self, fig, filename):
        fig.write_html(str(filename) + (".html" if not str(filename).endswith(".html") else ""))


_BACKENDS = {
    "matplotlib": MatplotlibBackend,
    "none": NoneBackend,
    "plotly": PlotlyBackend,
}
_current: AbstractPlottingLibrary = MatplotlibBackend()


def change_plotting_library(name: str):
    """(GPy plotting/__init__.py:8)"""
    global _current
    if name not in _BACKENDS:
        raise ValueError(f"unknown plotting library {name!r}; options: {sorted(_BACKENDS)}")
    _current = _BACKENDS[name]()
    return _current


def plotting_library() -> AbstractPlottingLibrary:
    return _current


# ------------------------------------------------------------- gpy_plot family


def _model_xy(model):
    X = np.asarray(model.X)
    Y = np.asarray(model.Y)
    if getattr(model, "mask", None) is not None:
        keep = np.asarray(model.mask) > 0
        X, Y = X[keep], Y[keep]
    return X, Y


def _grid_1d(model, resolution=200, bounds=None):
    if bounds is not None:
        lo, hi = bounds[0]
        return np.linspace(lo, hi, resolution)[:, None]
    X, _ = _model_xy(model)
    lo, hi = X[:, 0].min(), X[:, 0].max()
    pad = 0.1 * (hi - lo + 1e-9)
    return np.linspace(lo - pad, hi + pad, resolution)[:, None]


def _predict_np(model, xs):
    import jax.numpy as jnp

    v = getattr(model, "likelihood_variance", None)
    if v is not None and getattr(v, "ndim", 0) > 0:
        # heteroscedastic: mean per-point variance (pre-round-3 implicit default)
        mu, var = model.predict(jnp.asarray(xs), noise_at_test="mean")
    else:
        mu, var = model.predict(jnp.asarray(xs))
    return np.asarray(mu)[:, 0], np.sqrt(np.asarray(var))[:, 0]


def plot_data(model, ax=None, filename=None):
    """(gpy_plot/data_plots.py)"""
    pl = plotting_library()
    fig, axes = pl.figure() if ax is None else (None, [ax])
    X, Y = _model_xy(model)
    pl.scatter(axes[0], X[:, 0], Y[:, 0], label="data")
    if filename and fig is not None:
        pl.save(fig, filename)
    return fig


def plot_mean(model, ax=None, resolution=200, filename=None, bounds=None,
              precomputed=None):
    """(gpy_plot/gp_plots.py plot_mean). `precomputed=(xs, mu, sd)` lets the
    composite plot() share one posterior inference across layers."""
    pl = plotting_library()
    fig, axes = pl.figure() if ax is None else (None, [ax])
    if precomputed is None:
        xs = _grid_1d(model, resolution, bounds)
        mu, _ = _predict_np(model, xs)
    else:
        xs, mu, _ = precomputed
    pl.plot(axes[0], xs[:, 0], mu, color="b", label="mean")
    if filename and fig is not None:
        pl.save(fig, filename)
    return fig


def plot_confidence(model, ax=None, resolution=200, lower=2.5, upper=97.5,
                    filename=None, bounds=None, precomputed=None):
    """(gpy_plot/gp_plots.py plot_confidence): central credible band."""
    from scipy.stats import norm

    pl = plotting_library()
    fig, axes = pl.figure() if ax is None else (None, [ax])
    if precomputed is None:
        xs = _grid_1d(model, resolution, bounds)
        mu, sd = _predict_np(model, xs)
    else:
        xs, mu, sd = precomputed
    zl, zu = norm.ppf(lower / 100.0), norm.ppf(upper / 100.0)
    pl.fill_between(axes[0], xs[:, 0], mu + zl * sd, mu + zu * sd, alpha=0.3,
                    label=f"{upper - lower:.0f}% CI")
    if filename and fig is not None:
        pl.save(fig, filename)
    return fig


def plot_samples(model, ax=None, resolution=200, samples=3, key=None,
                 filename=None, bounds=None):
    """(gpy_plot/gp_plots.py plot_samples): posterior function draws."""
    import jax
    import jax.numpy as jnp

    pl = plotting_library()
    fig, axes = pl.figure() if ax is None else (None, [ax])
    xs = _grid_1d(model, resolution, bounds)
    key = key if key is not None else jax.random.PRNGKey(0)
    S = np.asarray(model.posterior_samples_f(jnp.asarray(xs), samples, key))
    for i in range(S.shape[1]):
        pl.plot(axes[0], xs[:, 0], S[:, i], linewidth=0.8, alpha=0.7)
    if filename and fig is not None:
        pl.save(fig, filename)
    return fig


def plot_density(model, ax=None, resolution=200, levels=32, filename=None):
    """(gpy_plot/gp_plots.py plot_density): predictive density as stacked
    translucent quantile bands."""
    from scipy.stats import norm

    pl = plotting_library()
    fig, axes = pl.figure() if ax is None else (None, [ax])
    xs = _grid_1d(model, resolution)
    mu, sd = _predict_np(model, xs)
    qs = np.linspace(0.02, 0.98, levels)
    for lo_q, hi_q in zip(qs[:-1], qs[1:]):
        zl, zu = norm.ppf(lo_q), norm.ppf(hi_q)
        pl.fill_between(axes[0], xs[:, 0], mu + zl * sd, mu + zu * sd,
                        alpha=1.5 / levels, color="b")
    if filename and fig is not None:
        pl.save(fig, filename)
    return fig


def plot(model, ax=None, resolution=200, samples=0, filename=None, title=None,
         bounds=None, n_samples=None, key=None):
    """Composite m.plot(): data + mean + confidence (+ samples)
    (gpy_plot/gp_plots.py plot). `bounds`/`n_samples` kept for compatibility
    with the round-1 plot_gp signature."""
    if n_samples:
        samples = n_samples
    X, _ = _model_xy(model)
    if X.shape[1] != 1:
        # 2-D (contour) plots keep the round-1 plot_gp renderer
        from .plotting import plot_gp

        return plot_gp(model, bounds=bounds, filename=filename,
                       resolution=resolution, n_samples=samples, title=title)
    pl = plotting_library()
    fig, axes = pl.figure() if ax is None else (None, [ax])
    a = axes[0]
    # one posterior inference for both layers (each used to re-run predict,
    # i.e. a fresh Cholesky per layer for uncached models)
    xs = _grid_1d(model, resolution, bounds)
    mu, sd = _predict_np(model, xs)
    plot_confidence(model, ax=a, precomputed=(xs, mu, sd))
    plot_mean(model, ax=a, precomputed=(xs, mu, sd))
    if samples:
        plot_samples(model, ax=a, resolution=resolution, samples=samples,
                     bounds=bounds, key=key)
    plot_data(model, ax=a)
    pl.legend(a)
    pl.set_labels(a, xlabel="x", ylabel="f(x)", title=title)
    if filename and fig is not None:
        pl.save(fig, filename)
    return fig


def inject_plotting():
    """Attach the plot family as model methods (GPy plotting/__init__.py
    inject_plotting :41). Idempotent."""
    from ..models.gp import GPRegression
    from ..models.sparse import SparseGPRegression

    for cls in (GPRegression, SparseGPRegression):
        cls.plot = plot
        cls.plot_data = plot_data
        cls.plot_mean = plot_mean
        cls.plot_confidence = plot_confidence
        cls.plot_density = plot_density
        if hasattr(cls, "posterior_samples_f"):
            cls.plot_samples = plot_samples
