"""Examples gallery — mirrors GPy/GPy/examples/ (regression, classification,
dimensionality_reduction, non_gaussian, state_space), smoke-run by
tests/test_gallery.py exactly as the reference's testing/examples_tests.py
introspects and runs its gallery. Dataset-backed demos use synthetic
stand-ins (zero-egress environment); every demo exercises the same model
family and inference path as its reference namesake.
"""
from . import (  # noqa: F401
    classification,
    dimensionality_reduction,
    non_gaussian,
    regression,
    state_space,
)

MODULES = [regression, classification, dimensionality_reduction, non_gaussian,
           state_space]
