"""Entropy search, ensemble sampler, pool selection, serialization tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gaussian_process_optimization_tpu.kernels as kern
from gaussian_process_optimization_tpu.bo import objectives
from gaussian_process_optimization_tpu.bo.space import DesignSpace, bounds_to_space
from gaussian_process_optimization_tpu.models.bo_models import GPModel


@pytest.fixture
def fitted_model(rng):
    X = rng.uniform(0, 1, size=(12, 1))
    Y = np.asarray(objectives.forrester(X))
    m = GPModel(exact_feval=True, optimize_restarts=1, max_iters=100)
    m.updateModel(X, Y)
    return m, X, Y


def test_ensemble_sampler_gaussian(rng):
    from gaussian_process_optimization_tpu.bo.mcmc_sampler import ensemble_sample

    lower = jnp.asarray([-5.0, -5.0])
    upper = jnp.asarray([5.0, 5.0])

    def log_p(x):
        return -0.5 * jnp.sum(jnp.square((x - jnp.asarray([1.0, -0.5])) / 0.7), -1)

    chain, walkers = ensemble_sample(log_p, lower, upper, 64, 300, jax.random.PRNGKey(0))
    s = np.asarray(chain[150:]).reshape(-1, 2)
    np.testing.assert_allclose(s.mean(0), [1.0, -0.5], atol=0.1)
    np.testing.assert_allclose(s.std(0), [0.7, 0.7], atol=0.12)


def test_sampler_gpyopt_wrapper(fitted_model):
    from gaussian_process_optimization_tpu.bo.mcmc_sampler import (
        AffineInvariantEnsembleSampler,
    )

    m, X, Y = fitted_model
    space = DesignSpace(bounds_to_space([(0.0, 1.0)]))
    sampler = AffineInvariantEnsembleSampler(space)
    samples, logp = sampler.get_samples(10, lambda x: -np.sum((x - 0.5) ** 2, -1), 30)
    assert samples.shape == (10, 1) and logp.shape == (10, 1)
    assert np.all((samples >= 0) & (samples <= 1))


def test_entropy_search_acquisition(fitted_model):
    from gaussian_process_optimization_tpu.bo.entropy_search import (
        AcquisitionEntropySearch,
    )
    from gaussian_process_optimization_tpu.bo.optimizer import AcquisitionOptimizer

    m, X, Y = fitted_model
    space = DesignSpace(bounds_to_space([(0.0, 1.0)]))
    opt = AcquisitionOptimizer(space, num_samples=100, num_anchor=3)
    es = AcquisitionEntropySearch(m, space, opt, num_representer_points=20,
                                  burn_in_steps=20, num_samples=120)
    vals = es._compute_acq(np.linspace(0.05, 0.95, 6)[:, None])
    assert vals.shape == (6, 1)
    assert np.all(np.isfinite(vals))
    # information gain should be non-negative on average (MC noise allowed per point)
    assert vals.mean() > -0.05
    x, fx = es.optimize()
    assert x.shape == (1, 1) and 0 <= x[0, 0] <= 1


def test_pool_selection_lp(fitted_model):
    from gaussian_process_optimization_tpu.bo.acquisitions import (
        AcquisitionEI,
        AcquisitionLP,
    )
    from gaussian_process_optimization_tpu.bo.optimizer import AcquisitionOptimizer
    from gaussian_process_optimization_tpu.bo.pool import metamodel_rmse, suggest_from_pool

    m, X, Y = fitted_model
    space = DesignSpace(bounds_to_space([(0.0, 1.0)]))
    opt = AcquisitionOptimizer(space)
    ei = AcquisitionEI(m, space, opt)
    lp = AcquisitionLP(m, space, opt, ei)

    pool = np.linspace(0, 1, 50)[:, None]
    idx, picks = suggest_from_pool(lp, pool, space, batch_size=4)
    assert len(idx) == 4 and len(set(idx.tolist())) == 4  # distinct picks
    # LP should spread the batch: pairwise distances nonzero
    d = np.abs(picks[:, 0][:, None] - picks[:, 0][None, :]) + np.eye(4)
    assert d.min() > 0.01

    # exclude mask respected
    mask = np.zeros(50, dtype=bool)
    mask[idx] = True
    idx2, _ = suggest_from_pool(ei, pool, space, batch_size=2, exclude_mask=mask)
    assert not set(idx2.tolist()) & set(idx.tolist())

    rmse = metamodel_rmse(m, X, Y)
    assert rmse < 0.5  # exact_feval fit should interpolate well


def test_serialization_roundtrip(rng, tmp_path):
    from gaussian_process_optimization_tpu.models.gp import GPRegression
    from gaussian_process_optimization_tpu.utils import serialization as ser

    X = rng.uniform(-1, 1, size=(10, 2))
    Y = np.sin(X[:, :1])
    k = kern.Matern52.create(2, variance=1.4, lengthscale=[0.5, 2.0], ARD=True)
    m = GPRegression.create(X, Y, kernel=k, noise_var=0.07, max_points=16)

    d = ser.to_dict(m)
    m2 = ser.from_dict(d)
    np.testing.assert_allclose(
        float(m.log_marginal_likelihood()), float(m2.log_marginal_likelihood()), rtol=1e-12
    )

    path = tmp_path / "model.json.gz"
    ser.save_model(m, path)
    m3 = ser.load_model(path)
    Xs = rng.uniform(-1, 1, size=(4, 2))
    np.testing.assert_allclose(
        np.asarray(m.predict(jnp.asarray(Xs))[0]),
        np.asarray(m3.predict(jnp.asarray(Xs))[0]), rtol=1e-12,
    )


def test_bo_state_roundtrip(fitted_model, tmp_path):
    from gaussian_process_optimization_tpu.bo import BayesianOptimization
    from gaussian_process_optimization_tpu.utils import serialization as ser

    m, X, Y = fitted_model
    bo = BayesianOptimization(
        f=None, domain=[{"name": "x", "type": "continuous", "domain": (0.0, 1.0)}],
        X=X, Y=Y, exact_feval=True,
    )
    bo.suggest_next_locations()
    path = tmp_path / "state.npz"
    ser.save_bo_state(bo, path)
    X2, Y2, params = ser.load_bo_state(path)
    np.testing.assert_allclose(X2, X)
    np.testing.assert_allclose(Y2, Y)
    # resume: new BO from saved history suggests a valid point
    bo2 = BayesianOptimization(
        f=None, domain=[{"name": "x", "type": "continuous", "domain": (0.0, 1.0)}],
        X=X2, Y=Y2, exact_feval=True,
    )
    x_next = bo2.suggest_next_locations()
    assert 0 <= x_next[0, 0] <= 1


def test_shuffle_indices_roundtrip():
    """shuffle/unshuffle_indices (run.py:192-218): bijective per-dimension
    relabeling of discrete levels, identity on continuous dims."""
    import numpy as np

    from gaussian_process_optimization_tpu.bo.pool import (
        shuffle_indices,
        unshuffle_indices,
    )

    variables = [
        {"name": "x", "type": "continuous", "domain": (0.0, 1.0)},
        {"name": "a", "type": "discrete", "domain": (0, 1, 2, 3)},
        {"name": "b", "type": "discrete", "domain": (10, 20, 30)},
    ]
    rng = np.random.default_rng(0)
    X = np.column_stack([
        rng.uniform(0, 1, 12),
        rng.choice([0, 1, 2, 3], 12).astype(float),
        rng.choice([10, 20, 30], 12).astype(float),
    ])
    Xs, patterns = shuffle_indices(X, variables, rng=np.random.default_rng(7))
    # continuous column untouched; discrete columns stay within their levels
    np.testing.assert_array_equal(Xs[:, 0], X[:, 0])
    assert set(Xs[:, 1]) <= {0.0, 1.0, 2.0, 3.0}
    assert set(Xs[:, 2]) <= {10.0, 20.0, 30.0}
    # a relabeling is a bijection: unshuffle restores the original exactly
    Xr = unshuffle_indices(Xs, variables, patterns)
    np.testing.assert_array_equal(Xr, X)
    # the input was not mutated (reference mutates in place; we do not)
    assert X[0, 1] in {0.0, 1.0, 2.0, 3.0}
