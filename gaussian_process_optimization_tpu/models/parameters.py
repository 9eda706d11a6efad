"""Default parameterization rules: which model leaves are trainable and under which
constraint transform.

Plays the role of paramz's per-Param constraints (GPy kernels declare
``Param('variance', v, Logexp())`` etc., stationary.py:80-81) — here derived from
field names when flattening the model pytree.
"""
from __future__ import annotations

import jax

from ..utils.packing import Packer
from ..utils.transforms import IDENTITY, POSITIVE, Logistic

# Field names that are positivity-constrained in the reference stack.
POSITIVE_NAMES = {
    "variance",
    "variances",
    "lengthscale",
    "likelihood_variance",
    "power",
    "weight_variance",
    "bias_variance",
    "kappa",
    "period",
    "noise_variance",  # StateSpaceGP's observation noise (Kalman filter logs it)
    "tau",  # IBP Beta stick parameters (models/ibp_lfm.py)
    # warping parameters: TanhWarp a/b/d, KumarWarp a/b (GPy constrains all positive)
    "a",
    "b",
    "d",
}

# Data / derived buffers — never trainable.
DATA_NAMES = {
    "X", "Y", "mask", "ranges", "fixed_K", "mean", "std",
    "L", "alpha", "jitter", "ok", "lml",
    "lo", "hi", "num_data",
    "jitter_hint",  # jitchol ladder warm start — state, not a parameter
}


def _leaf_names(tree):
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    names = []
    for path, _leaf in flat:
        name = None
        for entry in reversed(path):
            if isinstance(entry, jax.tree_util.GetAttrKey):
                name = entry.name
                break
            if isinstance(entry, jax.tree_util.DictKey):
                name = str(entry.key)
                break
        names.append(name or "")
    return names


def make_packer(
    model,
    fix: tuple = (),
    train_only: tuple | None = None,
    transform_overrides: dict | None = None,
) -> Packer:
    """Build a Packer for `model` with reference-matching defaults.

    fix: extra field names to freeze (e.g. ('likelihood_variance',) for
         GPyOpt exact_feval semantics, gpmodel.py:72-76).
    train_only: if given, only these field names are trainable.
    transform_overrides: field name -> Transform (e.g. noise bounded to
         [1e-9, 1e6] via Logistic, gpmodel.py:74-76).
    """
    names = _leaf_names(model)
    overrides = transform_overrides or {}
    transforms = []
    fixed = []
    for name in names:
        if name in overrides:
            transforms.append(overrides[name])
        elif name in POSITIVE_NAMES:
            transforms.append(POSITIVE)
        else:
            transforms.append(IDENTITY)
        if train_only is not None:
            fixed.append(name not in train_only)
        else:
            fixed.append(name in DATA_NAMES or name in set(fix))
    return Packer(model, transforms=transforms, fixed=fixed)


def bounded_noise_transform(lo=1e-9, hi=1e6):
    """GPyOpt's noise bound when exact_feval=False (gpmodel.py:74-76)."""
    return Logistic(lo=lo, hi=hi)
