"""Multi-chip sharding tests on the virtual 8-device CPU mesh: sharded programs must
match their single-device twins exactly (the psum'd sufficient statistics are the
reference's var_dtc_parallel allreduce analog)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gaussian_process_optimization_tpu.kernels as kern
from gaussian_process_optimization_tpu.models.gp import GPRegression
from gaussian_process_optimization_tpu.models.sparse import SparseGPRegression
from gaussian_process_optimization_tpu.models.svgp import SVGP
from gaussian_process_optimization_tpu.parallel import sharded


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8, "conftest should provide 8 virtual CPU devices"
    return sharded.make_mesh(8, ("data",))


@pytest.fixture
def data(rng):
    X = rng.uniform(-2, 2, size=(64, 2))
    Y = np.sin(X[:, :1]) * np.cos(X[:, 1:]) + 0.05 * rng.standard_normal((64, 1))
    return X, Y


def test_sharded_exact_lml_matches(data, mesh):
    X, Y = data
    k = kern.Matern52.create(2, variance=1.3, lengthscale=0.9)
    m = GPRegression.create(X, Y, kernel=k, noise_var=0.05, max_points=64)
    lml_ref = float(m.log_marginal_likelihood())
    lml_fn = sharded.make_sharded_exact_lml(mesh)
    lml, (_, _, ok) = jax.jit(lml_fn)(
        k, m.X, m.Y, m.likelihood_variance, m.mask
    )
    assert bool(ok)
    np.testing.assert_allclose(float(lml), lml_ref, rtol=1e-9)


def test_sharded_vardtc_matches(data, mesh):
    X, Y = data
    k = kern.RBF.create(2, variance=1.0, lengthscale=0.8)
    s = SparseGPRegression.create(X, Y, kernel=k, num_inducing=12, noise_var=0.05,
                                  max_points=64)
    ref = float(s.log_marginal_likelihood())
    bound_fn = sharded.make_sharded_vardtc_lml(mesh)
    val = jax.jit(bound_fn)(k, s.Z, s.X, s.Y, s.likelihood_variance, s.mask)
    np.testing.assert_allclose(float(val), ref, rtol=1e-8)


def test_sharded_svgp_step_matches_local(data, mesh):
    X, Y = data
    m = SVGP.create(X, Y, kernel=kern.RBF.create(2), num_inducing=8, noise_var=0.05)
    packer, init, step = sharded.make_sharded_svgp_step(m, mesh, learning_rate=1e-2)
    u0, opt_state = init(m)
    u1, _, val = step(u0, opt_state, m, jnp.asarray(X), jnp.asarray(Y))
    # loss value equals the single-device -ELBO
    elbo_local = float(m.elbo(jnp.asarray(X), jnp.asarray(Y)))
    np.testing.assert_allclose(float(val), -elbo_local, rtol=1e-8)
    # a step must change parameters and decrease the loss after a few more steps
    assert not np.allclose(np.asarray(u1), np.asarray(u0))
    u, st = u1, opt_state
    for _ in range(20):
        u, st, val2 = step(u, st, m, jnp.asarray(X), jnp.asarray(Y))
    assert float(val2) < float(val)


def test_sharded_sweep_matches_vmap(data, mesh):
    X, Y = data
    k = kern.RBF.create(2)
    m = GPRegression.create(X, Y, kernel=k, noise_var=0.05, max_points=64)
    post = m.inference()

    def score(state, Xc):
        mdl, p = state
        mu, v = mdl.predict(Xc, posterior=p)
        return (mu[:, 0] - 2.0 * jnp.sqrt(v[:, 0]))

    sweep = sharded.make_sharded_sweep(score, mesh)
    Xc = jnp.asarray(np.random.default_rng(1).uniform(-2, 2, size=(800, 2)))
    vals = sweep((m, post), Xc)
    ref = score((m, post), Xc)
    np.testing.assert_allclose(np.asarray(vals), np.asarray(ref), rtol=1e-8)
