"""GPyOpt ``util/general.py`` helper tail — named equivalents for the small
host-side utilities migrating users reach for (reference
``GPyOpt/util/general.py:9-230``). The hot-path pieces already live elsewhere
(``get_quantiles`` in ``bo/acquisitions.py:31`` as a jax function; 'stats'
normalization in ``utils/normalizer.py``); these are numpy conveniences.
"""
from __future__ import annotations

import numpy as np


def reshape(x, input_dim):
    """Reshape x into a matrix with input_dim columns (general.py:76)."""
    x = np.asarray(x, dtype=float)
    if x.size == input_dim:
        x = x.reshape((1, input_dim))
    return x


def _train_X(model):
    """Training inputs of a surrogate: works on both the BOModel wrappers
    (which hold a padded inner .model + mask) and bare models with .X."""
    inner = getattr(model, "model", model)
    X = np.asarray(inner.X, dtype=float)
    mask = getattr(inner, "mask", None)
    if mask is not None:
        X = X[np.asarray(mask) > 0]
    return X


def get_moments(model, x):
    """(mean, sd, fmin-at-train-X) of a surrogate at x (general.py:86).
    The wrappers' predict already returns sd (GPyOpt convention); bare GP
    models return variance — detected via the wrapper's get_fmin marker."""
    X = _train_X(model)
    x = reshape(x, X.shape[1])
    if hasattr(model, "get_fmin"):  # BOModel wrapper: predict -> (mean, sd)
        fmin = float(model.get_fmin())
        m, s = model.predict(x)
        return np.asarray(m, dtype=float), np.asarray(s, dtype=float), fmin
    fmin = float(np.min(np.asarray(model.predict(X)[0])))
    m, v = model.predict(x)
    s = np.sqrt(np.clip(np.asarray(v, dtype=float), 0.0, np.inf))
    return np.asarray(m, dtype=float), s, fmin


def get_d_moments(model, x):
    """Gradients of (mean, sd) wrt x (general.py:98). The BOModel wrappers'
    predict_withGradients already returns (m, s, dmdx, dsdx); bare models go
    through predictive_gradients with dsdx = dvdx / (2 s)."""
    x = reshape(x, _train_X(model).shape[1])
    if hasattr(model, "predict_withGradients"):
        _, _, dmdx, dsdx = model.predict_withGradients(x)
        return np.asarray(dmdx, dtype=float), np.asarray(dsdx, dtype=float)
    _, v = model.predict(x)
    dmdx, dvdx = model.predictive_gradients(x)
    dmdx = np.asarray(dmdx, dtype=float)[:, :, 0]
    dsdx = np.asarray(dvdx, dtype=float) / (
        2.0 * np.sqrt(np.clip(np.asarray(v, dtype=float), 1e-20, np.inf)))
    return dmdx, dsdx


def best_value(Y, sign=1):
    """Running best: component i = min (sign=1) or max of Y[:i+1]
    (general.py:131 — the convergence-plot series)."""
    Y = np.asarray(Y, dtype=float).reshape(-1)
    return (np.minimum if sign == 1 else np.maximum).accumulate(Y)


def best_guess(f, X):
    """Running best of f over growing prefixes of X (general.py:49)."""
    ff = np.asarray(f(np.asarray(X)), dtype=float).reshape(-1)
    return np.minimum.accumulate(ff)


def samples_multidimensional_uniform(bounds, num_data, rng=None):
    """Uniform box samples (general.py:63). `rng`: numpy Generator (the
    reference used global numpy state)."""
    rng = np.random.default_rng() if rng is None else rng
    lo = np.asarray([b[0] for b in bounds], dtype=float)
    hi = np.asarray([b[1] for b in bounds], dtype=float)
    return rng.uniform(lo, hi, size=(num_data, len(bounds)))


def values_to_array(input_values):
    """int/float/tuple/array -> 2-D numpy array (general.py:168; bandit-domain
    plumbing)."""
    if isinstance(input_values, tuple):
        return np.array(input_values, dtype=float).reshape(-1, 1)
    if isinstance(input_values, np.ndarray):
        return np.atleast_2d(input_values)
    if isinstance(input_values, (int, float, np.integer, np.floating)):
        return np.atleast_2d(np.array(input_values, dtype=float))
    raise TypeError(f"cannot convert {type(input_values).__name__} to array")


def merge_values(values1, values2):
    """All row combinations of two arrays (general.py:183; builds bandit
    domains as cross products)."""
    a1, a2 = values_to_array(values1), values_to_array(values2)
    if a1.size == 0:
        return a2
    if a2.size == 0:
        return a1
    rows = [np.hstack((r1, r2)) for r1 in a1 for r2 in a2]
    return np.atleast_2d(rows)


def normalize(Y, normalization_type="stats"):
    """1-D 'stats' (zero mean, unit sd) or 'maxmin' (into [0,1]) normalization
    (general.py:203)."""
    Y = np.asarray(Y, dtype=float)
    if np.max(Y.shape) != Y.size:
        raise NotImplementedError("Only 1-dimensional arrays are supported.")
    shape = Y.shape
    Y = Y.reshape(-1)
    if normalization_type == "stats":
        Y_norm = Y - Y.mean()
        std = Y.std()
        if std > 0:
            Y_norm = Y_norm / std
    elif normalization_type == "maxmin":
        Y_norm = Y - Y.min()
        y_range = np.ptp(Y)
        if y_range > 0:
            Y_norm = Y_norm / y_range
    else:
        raise ValueError(f"Unknown normalization type: {normalization_type}")
    return Y_norm.reshape(shape)


def compute_integrated_acquisition(acquisition, x):
    """MCMC-integrated acquisition value: mean over the hyperparameter samples
    carried by the acquisition's model (general.py:9).

    Design note: GPyOpt loops `model.set_model_parameters(sample)` and
    re-evaluates — a mutation pattern that is an anti-idiom here. The MCMC
    acquisitions (``bo/acquisitions_mcmc.py``) already integrate over the
    stacked chain in ONE vmapped program, so for them this helper is exactly
    ``acquisition_function``; for a point-estimate acquisition the "chain"
    has one sample and the mean is the value itself. Same signature + result
    as the reference, minus the mutation."""
    return acquisition.acquisition_function(x)


def compute_integrated_acquisition_withGradients(acquisition, x):
    """Like :func:`compute_integrated_acquisition`, also averaging the
    gradients (general.py:26) — the vmapped chain average of
    ``acquisition_function_withGradients``."""
    return acquisition.acquisition_function_withGradients(x)
