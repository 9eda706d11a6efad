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


def test_sharded_multistart_fit_matches_single_device(data, mesh):
    X, Y = data
    k = kern.RBF.create(2, ARD=True)
    m = GPRegression.create(X, Y, kernel=k, noise_var=0.1, max_points=64)

    from gaussian_process_optimization_tpu.models import fit as fit_mod

    key = jax.random.PRNGKey(3)
    run = sharded.make_sharded_multistart_fit(m, mesh, restarts_per_device=1,
                                              maxiter=40, tol=0.0)
    fitted_sh, (us, fs) = run(m, key)
    assert us.shape[0] == 8 and np.all(np.isfinite(np.asarray(fs)))

    # same total restart count + same key => identical start points; the
    # single-device Fitter vmaps the 8 chains on one device, the sharded run
    # puts one chain per device — per-lane results must agree (batched
    # while_loop masks finished lanes, it does not change their math)
    fitter = fit_mod.Fitter(m, num_restarts=8, maxiter=40, tol=0.0)
    fitted_local, res = fitter(m, key)
    np.testing.assert_allclose(float(jnp.min(fs)), float(jnp.min(res.f)),
                               rtol=1e-6)
    np.testing.assert_allclose(
        float(fitted_sh.log_marginal_likelihood()),
        float(fitted_local.log_marginal_likelihood()), rtol=1e-6)


def test_sharded_acq_argmax_matches_unsharded(data, mesh):
    X, Y = data
    k = kern.RBF.create(2)
    m = GPRegression.create(X, Y, kernel=k, noise_var=0.05, max_points=64)
    post = m.inference()

    def neg_lcb(state, Xc):
        mdl, p = state
        mu, v = mdl.predict(Xc, posterior=p)
        return (mu[:, 0] - 2.0 * jnp.sqrt(v[:, 0]))

    lo, hi = -2.0 * jnp.ones(2), 2.0 * jnp.ones(2)
    argmax = sharded.make_sharded_acq_argmax(
        neg_lcb, mesh, lo, hi, num_samples=800, anchors_per_device=1,
        maxiter=30)
    key = jax.random.PRNGKey(7)
    x_best, f_best = argmax((m, post), key)
    assert x_best.shape == (2,)
    assert np.all(np.asarray(x_best) >= -2.0) and np.all(np.asarray(x_best) <= 2.0)

    # unsharded replay of the same two phases with the same key
    from gaussian_process_optimization_tpu.ops import lbfgs

    cands = jax.random.uniform(key, (800, 2), minval=lo, maxval=hi,
                               dtype=lo.dtype)
    scores = neg_lcb((m, post), cands)
    anchors = cands[jnp.argsort(scores)[:8]]

    def solve(a):
        res = lbfgs.minimize(lambda x: neg_lcb((m, post), x[None, :])[0], a,
                             lower=lo, upper=hi, maxiter=30, carry_vjp=False)
        return res.x, res.f

    xs, fs = jax.vmap(solve)(anchors)
    np.testing.assert_allclose(float(f_best), float(jnp.min(fs)), rtol=1e-8)
    # the polished point must beat every raw sweep candidate
    assert float(f_best) <= float(jnp.min(scores)) + 1e-10


def test_bo_loop_on_mesh(mesh):
    """End-to-end BayesianOptimization with mesh= : restart-parallel surrogate
    fits + sharded acquisition sweep/polish, on the virtual 8-device CPU mesh."""
    from gaussian_process_optimization_tpu.bo import (BayesianOptimization,
                                                      bounds_to_space, objectives)

    bo = BayesianOptimization(
        f=lambda x: np.asarray(objectives.forrester(x)),
        domain=bounds_to_space(objectives.forrester.bounds),
        acquisition_type="EI", initial_design_numdata=4,
        initial_design_type="latin", exact_feval=True, seed=0,
        mesh=mesh, anchor_points_samples=160, anchor_points_num=4,
        max_iters=60,
    )
    bo.run_optimization(max_iter=6, eps=-1)
    assert bo.Y.shape[0] == 10  # all iterations ran (no fit failures)
    assert float(bo.fx_opt) < -5.5  # forrester fmin = -6.02


def test_distributed_cholesky_matches_lapack(mesh, rng):
    """The row-sharded blocked factorization (factor never replicated) must
    reproduce LAPACK's Cholesky exactly up to f64 round-off — the distributed
    analog of GPy util/linalg.py:56 potrf, strictly beyond the reference's
    only distributed inference (sparse reduceArrays)."""
    n, nb = 256, 16  # 8 devices x 2 blocks/device
    Xr = rng.standard_normal((n, n))
    A = Xr @ Xr.T + n * np.eye(n)
    chol_fn = sharded.make_distributed_cholesky(mesh, nb=nb)
    L = np.asarray(jax.jit(chol_fn)(jnp.asarray(A)))
    np.testing.assert_allclose(L, np.linalg.cholesky(A), rtol=1e-9, atol=1e-9)
    assert np.all(np.triu(L, 1) == 0.0)


def test_distributed_exact_lml_value_and_grad(data, mesh):
    """Distributed exact-GP LML (sharded Gram + sharded Cholesky + sharded
    logdet) matches the gather-then-factor sharded LML and its kernel-parameter
    gradients on the same data."""
    X, Y = data
    k = kern.Matern52.create(2, variance=1.3, lengthscale=0.9)
    m = GPRegression.create(X, Y, kernel=k, noise_var=0.05, max_points=64)
    ref_fn = sharded.make_sharded_exact_lml(mesh)
    lml_ref, _ = ref_fn(k, m.X, m.Y, m.likelihood_variance, m.mask)
    dist_fn = sharded.make_distributed_exact_lml(mesh, nb=8)  # 64 = 8 dev x 8

    def val(kp, noise):
        return dist_fn(kp, m.X, m.Y, noise)

    lml = jax.jit(val)(k, m.likelihood_variance)
    np.testing.assert_allclose(float(lml), float(lml_ref), rtol=1e-9)

    g_dist = jax.jit(jax.grad(val, argnums=(0, 1)))(k, m.likelihood_variance)

    def val_ref(kp, noise):
        v, _ = ref_fn(kp, m.X, m.Y, noise, m.mask)
        return v

    g_ref = jax.jit(jax.grad(val_ref, argnums=(0, 1)))(k, m.likelihood_variance)
    for a, b in zip(jax.tree_util.tree_leaves(g_dist),
                    jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-7, atol=1e-10)
