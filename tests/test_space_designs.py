"""Design space + experiment design tests (GPyOpt core/task/space.py and
experiment_design/ semantics)."""
import numpy as np
import pytest

from gaussian_process_optimization_tpu.bo import designs, objectives
from gaussian_process_optimization_tpu.bo.space import DesignSpace, bounds_to_space
from gaussian_process_optimization_tpu.bo.variables import InvalidConfigError

MIXED = [
    {"name": "xc", "type": "continuous", "domain": (0.0, 4.0)},
    {"name": "xd", "type": "discrete", "domain": (0, 1, 2)},
    {"name": "xk", "type": "categorical", "domain": (0, 1, 2, 3)},
]


def test_space_dimensions_and_bounds():
    s = DesignSpace(MIXED)
    assert s.objective_dimensionality == 3
    assert s.model_dimensionality == 1 + 1 + 4  # categorical one-hot
    assert s.get_bounds() == [(0.0, 4.0), (0, 2)] + [(0.0, 1.0)] * 4
    assert s.get_continuous_dims() == [0]
    assert s.get_discrete_dims() == [1]
    assert s.has_discrete() and s.has_continuous()
    assert s.lengthscales() == [4.0]


def test_zip_unzip_roundtrip():
    s = DesignSpace(MIXED)
    X = np.array([[1.5, 2.0, 3.0], [0.0, 0.0, 0.0]])
    Xm = s.unzip_inputs(X)
    assert Xm.shape == (2, 6)
    np.testing.assert_allclose(Xm[0], [1.5, 2.0, 0, 0, 0, 1])
    np.testing.assert_allclose(Xm[1], [0.0, 0.0, 1, 0, 0, 0])
    np.testing.assert_allclose(s.zip_inputs(Xm), X)


def test_round_optimum():
    s = DesignSpace(MIXED)
    x = np.array([4.7, 1.4, 0.1, 0.9, 0.3, 0.2])
    r = s.round_optimum(x)[0]
    np.testing.assert_allclose(r, [4.0, 1.0, 0, 1, 0, 0])


def test_constraints_indicator():
    s = DesignSpace(
        bounds_to_space([(0, 1), (0, 1)]),
        constraints=[{"name": "c1", "constraint": "x[:,0]+x[:,1]-1"}],
    )
    X = np.array([[0.2, 0.3], [0.9, 0.9]])
    np.testing.assert_allclose(s.indicator_constraints(X).flatten(), [1.0, 0.0])
    s2 = DesignSpace(
        bounds_to_space([(0, 1), (0, 1)]),
        constraints=[{"name": "c1", "constraint": lambda x: x[:, 0] + x[:, 1] - 1}],
    )
    np.testing.assert_allclose(s2.indicator_constraints(X).flatten(), [1.0, 0.0])


def test_zero_start_shifts():
    s = DesignSpace([{"name": "a", "type": "continuous", "domain": (2.0, 5.0)},
                     {"name": "b", "type": "discrete", "domain": (10, 20, 30)}])
    assert s.zeroStart_shifted_bounds() == [(0, 3.0), (0, 20)]
    X = np.array([[3.0, 20.0]])
    shifted = s.fit_to_zeroStart_shifted_bounds(X)
    np.testing.assert_allclose(shifted, [[1.0, 10.0]])
    np.testing.assert_allclose(s.revert_from_zeroStart_shifted_bounds(shifted), X)


def test_discrete_grid():
    s = DesignSpace([{"name": "a", "type": "discrete", "domain": (0, 1)},
                     {"name": "b", "type": "discrete", "domain": (5, 6, 7)}])
    g = s.get_discrete_grid()
    assert g.shape == (6, 2)


@pytest.mark.parametrize("name", ["random", "latin", "latin_mixed", "sobol", "hammersley"])
def test_designs_in_bounds(name):
    s = DesignSpace(MIXED)
    X = designs.initial_design(name, s, 20, seed=0)
    assert X.shape == (20, 3)
    assert np.all(X[:, 0] >= 0) and np.all(X[:, 0] <= 4)
    assert set(np.unique(X[:, 1])).issubset({0.0, 1.0, 2.0})
    assert set(np.unique(X[:, 2])).issubset({0.0, 1.0, 2.0, 3.0})


def test_latin_mixed_representation():
    """Every discrete level must appear >= floor(0.8*n/levels) times
    (latin_mixed_design.py:63-88)."""
    s = DesignSpace([
        {"name": "xc", "type": "continuous", "domain": (0.0, 1.0)},
        {"name": "xd", "type": "discrete", "domain": (0, 1, 2, 3)},
    ])
    n = 20
    X = designs.latin_mixed_design(s, n, seed=1)
    _, counts = np.unique(X[:, 1], return_counts=True)
    assert len(counts) == 4
    assert counts.min() >= np.floor(0.8 * n / 4)


def test_latin_is_stratified():
    s = DesignSpace(bounds_to_space([(0.0, 1.0)]))
    X = designs.latin_design(s, 10, seed=0)
    # 'center' criterion: each of the 10 strata midpoints appears exactly once
    expected = np.sort((np.arange(10) + 0.5) / 10)
    np.testing.assert_allclose(np.sort(X[:, 0]), expected)


def test_grid_design():
    s = DesignSpace(bounds_to_space([(0.0, 1.0), (0.0, 2.0)]))
    X = designs.grid_design(s, 10, seed=0)
    assert X.shape == (9, 2)  # 3^2 <= 10


def test_random_with_constraints():
    s = DesignSpace(
        bounds_to_space([(0, 1), (0, 1)]),
        constraints=[{"name": "c", "constraint": "x[:,0]+x[:,1]-1"}],
    )
    X = designs.random_design(s, 30, seed=0)
    assert X.shape == (30, 2)
    assert np.all(X.sum(1) <= 1.0)


def test_bandit_space():
    arms = np.array([[0.0, 0.0], [1.0, 0.5], [2.0, 1.0]])
    s = DesignSpace([{"name": "arm", "type": "bandit", "domain": arms}])
    assert s.objective_dimensionality == 2
    X = designs.random_design(s, 10, seed=0)
    for row in X:
        assert any(np.allclose(row, a) for a in arms)
    r = s.round_optimum(np.array([0.9, 0.45]))[0]
    np.testing.assert_allclose(r, [1.0, 0.5])


def test_objective_minima():
    import jax.numpy as jnp

    for f in [objectives.forrester, objectives.branin, objectives.sixhumpcamel,
              objectives.mccormick, objectives.goldstein, objectives.hartmann6,
              objectives.rosenbrock]:
        vals = np.asarray(f(jnp.asarray(f.xmin)))
        np.testing.assert_allclose(vals, f.fmin, atol=2e-3)
    assert float(objectives.ackley(jnp.zeros((1, 4)))[0, 0]) == pytest.approx(0.0, abs=1e-10)
    assert float(objectives.alpine1(jnp.zeros((1, 3)))[0, 0]) == 0.0
