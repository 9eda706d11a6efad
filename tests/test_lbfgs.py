"""L-BFGS unit tests: convergence on standard problems, box constraints, vmap,
NaN-robustness (the reference relies on scipy fmin_l_bfgs_b; parity is statistical,
SURVEY §7 'L-BFGS parity')."""
import jax
import jax.numpy as jnp
import numpy as np

from gaussian_process_optimization_tpu.ops import lbfgs


def rosenbrock(x):
    return jnp.sum(100.0 * (x[1:] - x[:-1] ** 2) ** 2 + (1 - x[:-1]) ** 2)


def test_rosenbrock():
    x0 = jnp.zeros(4)
    res = lbfgs.minimize(rosenbrock, x0, maxiter=500)
    np.testing.assert_allclose(np.asarray(res.x), np.ones(4), atol=1e-5)
    assert float(res.f) < 1e-10


def test_quadratic_exact():
    A = jnp.asarray(np.diag([1.0, 10.0, 100.0]))
    b = jnp.asarray([1.0, -2.0, 3.0])
    f = lambda x: 0.5 * x @ A @ x - b @ x
    # tol drives the projected-gradient stop; x-accuracy ~ tol / lambda_min, so
    # asserting atol=1e-6 on x needs tol well below 1e-6
    res = lbfgs.minimize(f, jnp.zeros(3), maxiter=200, tol=1e-9)
    np.testing.assert_allclose(np.asarray(res.x), np.linalg.solve(np.asarray(A), b), atol=1e-6)


def test_box_constrained():
    # minimum of (x-2)^2 over [0,1] is at x=1
    f = lambda x: jnp.sum((x - 2.0) ** 2)
    res = lbfgs.minimize(f, jnp.asarray([0.5]), lower=jnp.asarray([0.0]),
                         upper=jnp.asarray([1.0]), maxiter=100)
    np.testing.assert_allclose(np.asarray(res.x), [1.0], atol=1e-8)


def test_vmap_multistart():
    f = lambda x: jnp.sum((x - 3.0) ** 2) * 0.5
    starts = jnp.asarray(np.random.default_rng(0).standard_normal((6, 2)))
    res = jax.vmap(lambda x0: lbfgs.minimize(f, x0, maxiter=100))(starts)
    np.testing.assert_allclose(np.asarray(res.x), 3.0 * np.ones((6, 2)), atol=1e-6)


def test_nan_objective_returns_start():
    f = lambda x: jnp.where(jnp.sum(x) > -1e9, jnp.nan, 0.0)  # always NaN
    x0 = jnp.asarray([1.0, 2.0])
    res = lbfgs.minimize(f, x0, maxiter=50)
    np.testing.assert_allclose(np.asarray(res.x), [1.0, 2.0])


def test_nan_region_avoided():
    # objective NaN for x<0; optimum at boundary-ish; line search must back off
    f = lambda x: jnp.where(jnp.all(x > 0), jnp.sum((x - 0.5) ** 2) + jnp.sum(jnp.log(x)) * 0.0, jnp.nan)
    res = lbfgs.minimize(f, jnp.asarray([2.0, 2.0]), maxiter=100)
    np.testing.assert_allclose(np.asarray(res.x), [0.5, 0.5], atol=1e-6)


def test_under_jit():
    f = lambda x: jnp.sum((x + 1.0) ** 4)
    run = jax.jit(lambda x0: lbfgs.minimize(f, x0, maxiter=200).x)
    # quartic minimum: gradient vanishes cubically, so convergence is loose
    np.testing.assert_allclose(np.asarray(run(jnp.asarray([2.0]))), [-1.0], atol=5e-2)


def test_trace_records_monotone_objective():
    """minimize(trace=True) returns the per-iteration objective (the GPy
    optimizer `.trace` analog, inference_plots.py:10); default path returns
    None so the fit-loop carry is untouched."""
    import numpy as np

    def rosen(x):
        return jnp.sum(100.0 * (x[1:] - x[:-1] ** 2) ** 2 + (1 - x[:-1]) ** 2)

    x0 = jnp.asarray([-1.2, 1.0, 0.7])
    res = lbfgs.minimize(rosen, x0, maxiter=60, trace=True)
    assert res.trace is not None and res.trace.shape == (61,)
    t = np.asarray(res.trace)
    n = int(res.num_iters)
    assert np.all(np.isfinite(t[: n + 1]))
    assert np.all(np.isnan(t[n + 1:]))
    np.testing.assert_allclose(t[0], float(rosen(x0)), rtol=1e-12)
    # same final answer as the default (untraced) path
    res0 = lbfgs.minimize(rosen, x0, maxiter=60)
    assert res0.trace is None
    np.testing.assert_allclose(float(res.f), float(res0.f), rtol=1e-12)
    # the best-seen objective is the trace minimum
    np.testing.assert_allclose(float(res.f), np.nanmin(t), rtol=1e-12)


def test_nonmonotone_matches_monotone_optimum():
    """Zhang-Hager nonmonotone Armijo (nonmonotone_eta > 0) must reach the same
    minimizer as the monotone line search on a hard curved valley, with no more
    line-search trials (the mode exists to CUT the backtrack tail the vmapped
    restart batch pays at max-over-lanes)."""
    x0 = jnp.asarray([-1.2, 1.0])
    res_m = lbfgs.minimize(rosenbrock, x0, maxiter=200, tol=1e-8)
    res_nm = lbfgs.minimize(rosenbrock, x0, maxiter=200, tol=1e-8,
                            nonmonotone_eta=0.5)
    np.testing.assert_allclose(np.asarray(res_nm.x), [1.0, 1.0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(res_nm.f), 0.0, atol=1e-10)
    # no per-step trial blowup (nonmonotone may take a few more OUTER steps on
    # a solo run; its win is fewer backtracks per step, which is what the
    # vmapped restart batch pays at max-over-lanes)
    per_step_m = float(res_m.num_ls) / float(res_m.num_iters)
    per_step_nm = float(res_nm.num_ls) / float(res_nm.num_iters)
    assert per_step_nm <= per_step_m + 0.05

    # vmapped multistart with the fit-path settings (carry_vjp default)
    starts = jnp.asarray([[-1.2, 1.0], [2.0, 2.0], [0.0, 0.5]])
    res = jax.vmap(lambda u: lbfgs.minimize(rosenbrock, u, maxiter=300, tol=1e-8,
                                            nonmonotone_eta=0.5))(starts)
    np.testing.assert_allclose(np.asarray(res.x),
                               np.ones((3, 2)), atol=1e-4)


def test_grow_backtracked_hold_policy():
    """grow_backtracked=1.0 (hold) must reach the same optimum as the default
    growth policy, and never spend MORE line-search trials on an objective
    whose curvature forces a persistent sub-unit step (the grow->fail->
    re-backtrack oscillation the hold policy removes)."""
    import jax.numpy as jnp
    import numpy as np

    from gaussian_process_optimization_tpu.ops import lbfgs

    # ill-scaled quartic: unit steps overshoot along the stiff coordinate
    def f(x):
        return 50.0 * x[0] ** 4 + (x[1] - 1.0) ** 2 + 0.5 * x[0] ** 2

    x0 = jnp.asarray([2.0, -1.0])
    res_grow = lbfgs.minimize(f, x0, maxiter=40, tol=0.0, grow_backtracked=2.0)
    res_hold = lbfgs.minimize(f, x0, maxiter=40, tol=0.0, grow_backtracked=1.0)
    np.testing.assert_allclose(float(res_hold.f), float(res_grow.f),
                               rtol=1e-3, atol=1e-6)
    assert int(res_hold.num_ls) <= int(res_grow.num_ls)


def test_aux_channel_threads_accepted_state():
    """aux0 mode: fun(x, aux) -> (f, aux_out); each call receives the aux of
    the LAST ACCEPTED evaluation and result.aux holds the final one. The
    solution must match the plain path exactly (aux is inert to the math)."""
    A = jnp.asarray(np.diag([1.0, 10.0, 100.0]))
    b = jnp.asarray([1.0, -2.0, 3.0])

    def f_plain(x):
        return 0.5 * x @ A @ x - b @ x

    def f_aux(x, aux):
        # aux counts accepted-evaluation generations: every call sees the
        # previous ACCEPTED value and returns it + 1
        return f_plain(x), aux + 1.0

    res_p = lbfgs.minimize(f_plain, jnp.zeros(3), maxiter=200, tol=1e-9)
    res_a = lbfgs.minimize(f_aux, jnp.zeros(3), maxiter=200, tol=1e-9,
                           aux0=jnp.zeros(()))
    np.testing.assert_allclose(np.asarray(res_a.x), np.asarray(res_p.x))
    np.testing.assert_allclose(float(res_a.f), float(res_p.f))
    # the chain grows by exactly one per ACCEPTED evaluation: the init call +
    # one per outer iteration (the accepted trial) — rejected trials' aux is
    # dropped with the trial
    assert float(res_a.aux) == float(res_a.num_iters) + 1.0
    assert res_p.aux is None


def test_aux_channel_under_vmap():
    def f_aux(x, aux):
        return jnp.sum((x - 1.0) ** 2), aux + 1.0

    x0s = jnp.stack([jnp.zeros(2), jnp.full(2, 3.0)])
    res = jax.vmap(
        lambda x0: lbfgs.minimize(f_aux, x0, maxiter=100, tol=1e-9,
                                  aux0=jnp.zeros(()))
    )(x0s)
    np.testing.assert_allclose(np.asarray(res.x), np.ones((2, 2)), atol=1e-6)
    assert res.aux.shape == (2,)
    np.testing.assert_allclose(np.asarray(res.aux),
                               np.asarray(res.num_iters, dtype=float) + 1.0)
