"""Native C++ engine tests: properties (LHS stratification, representation
constraints, Sobol equidistribution) must hold and the designs layer must produce
identical-structure output with the engine on or off — mirroring the reference's
cython-vs-numpy consistency discipline."""
import numpy as np
import pytest

from gaussian_process_optimization_tpu.utils import native

pytestmark = pytest.mark.skipif(not native.available(), reason="no native build")


def test_maximin_lhs_properties():
    X = native.maximin_lhs(25, 3, 30, 123)
    assert X.shape == (25, 3)
    assert X.min() >= 0 and X.max() <= 1
    for j in range(3):
        strata = np.floor(X[:, j] * 25).astype(int)
        assert len(set(strata.tolist())) == 25  # one point per stratum
    # maximin beats a single random LHS on average
    X1 = native.maximin_lhs(25, 3, 1, 7)
    assert native.min_pairwise_dist(X) >= native.min_pairwise_dist(X1) * 0.8


def test_discrete_lhs_representation():
    n = 20
    H, ok = native.discrete_lhs(n, [4, 3], 30, 10, 0.8, 99)
    assert ok
    for j, L in enumerate([4, 3]):
        lv = np.floor(H[:, j] * L).astype(int)
        counts = np.bincount(lv, minlength=L)
        assert counts.min() >= max(np.floor(0.8 * n / L), 1)


def test_sobol_equidistribution():
    S = native.sobol_points(256, 8)
    assert S.shape == (256, 8)
    for j in range(8):
        counts = np.bincount(np.floor(S[:, j] * 16).astype(int), minlength=16)
        assert np.all(counts == 16)


def test_designs_native_vs_fallback(monkeypatch):
    """The designs layer must satisfy the same contracts with the engine disabled."""
    from gaussian_process_optimization_tpu.bo import designs
    from gaussian_process_optimization_tpu.bo.space import DesignSpace

    space = DesignSpace([
        {"name": "xc", "type": "continuous", "domain": (0.0, 2.0)},
        {"name": "xd", "type": "discrete", "domain": (0, 1, 2)},
    ])
    X_native = designs.latin_mixed_design(space, 15, seed=3)

    monkeypatch.setattr(native, "_LIB", None)
    monkeypatch.setattr(native, "_TRIED", True)
    assert not native.available()
    X_py = designs.latin_mixed_design(space, 15, seed=3)

    for X in (X_native, X_py):
        assert X.shape == (15, 2)
        assert set(np.unique(X[:, 1])).issubset({0.0, 1.0, 2.0})
        counts = np.bincount(X[:, 1].astype(int), minlength=3)
        assert counts.min() >= np.floor(0.8 * 15 / 3)
