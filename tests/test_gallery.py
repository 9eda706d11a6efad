"""Smoke-run the examples/gallery package — the reference's
GPy/GPy/testing/examples_tests.py genre: introspect every public demo
function in each gallery module and run it (optimize=False where accepted —
construction + inference; a curated subset ALSO runs with optimization to
guard the fit paths)."""
import inspect
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from examples import gallery  # noqa: E402


def _public_functions(module):
    return [f for name, f in inspect.getmembers(module, inspect.isfunction)
            if not name.startswith("_") and f.__module__ == module.__name__]


def _call_unoptimized(fn):
    kwargs = {}
    params = inspect.signature(fn).parameters
    if "optimize" in params:
        kwargs["optimize"] = False
    if "plot" in params:
        kwargs["plot"] = False
    return fn(**kwargs)


ALL_DEMOS = [(m.__name__.split(".")[-1], f.__name__, f)
             for m in gallery.MODULES for f in _public_functions(m)]


def test_gallery_covers_reference_breadth():
    """The gallery must keep the reference's module structure and a comparable
    demo count per module (GPy examples: 20/7/19-public/2/1)."""
    by_module = {}
    for mod, name, _ in ALL_DEMOS:
        by_module.setdefault(mod, []).append(name)
    assert set(by_module) == {"regression", "classification",
                              "dimensionality_reduction", "non_gaussian",
                              "state_space"}
    assert len(by_module["regression"]) >= 18
    assert len(by_module["classification"]) >= 7
    assert len(by_module["dimensionality_reduction"]) >= 14
    assert len(by_module["non_gaussian"]) >= 2
    assert len(by_module["state_space"]) >= 1


@pytest.mark.parametrize("mod,name,fn", ALL_DEMOS,
                         ids=[f"{m}.{n}" for m, n, _ in ALL_DEMOS])
def test_gallery_demo_runs(mod, name, fn, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)  # plots (if any) land in tmp
    out = _call_unoptimized(fn)
    assert out is not None


# Curated optimized subset — one per model family, small iteration budgets,
# guarding that the demos' FIT paths run (the unoptimized sweep only builds).
OPTIMIZED = [
    ("regression", "toy_rbf_1d", dict(max_iters=30)),
    ("regression", "sparse_GP_regression_1D",
     dict(num_samples=40, max_iters=20)),
    ("regression", "warped_gp_cubic_sine", dict(max_iters=20)),
    ("classification", "toy_linear_1d_classification", {}),
    ("dimensionality_reduction", "gplvm_simulation", dict(max_iters=30)),
    ("non_gaussian", "student_t_approx", dict(max_iters=15)),
    ("state_space", "state_space_example", dict(max_iters=15, n=120)),
]


@pytest.mark.slow
@pytest.mark.parametrize("mod,name,kwargs", OPTIMIZED,
                         ids=[f"{m}.{n}" for m, n, _ in OPTIMIZED])
def test_gallery_demo_optimizes(mod, name, kwargs, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    module = dict(zip(["regression", "classification",
                       "dimensionality_reduction", "non_gaussian",
                       "state_space"], gallery.MODULES))[mod]
    fn = getattr(module, name)
    out = fn(optimize=True, **kwargs)
    assert out is not None
