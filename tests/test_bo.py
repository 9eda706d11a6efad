"""End-to-end BO tests: the de-facto integration tests of the stack, mirroring the
role of /root/reference/test.py (mixed-space Gower + LP batch pipeline) and the
GPyOpt-on-Branin/Forrester regression pattern."""
import numpy as np
import pytest

from gaussian_process_optimization_tpu.bo import (
    BayesianOptimization,
    bounds_to_space,
)
from gaussian_process_optimization_tpu.bo import objectives


def np_forrester(x):
    return np.asarray(objectives.forrester(x))


def np_branin(x):
    return np.asarray(objectives.branin(x))


def test_bo_forrester_sequential_ei():
    bo = BayesianOptimization(
        f=np_forrester,
        domain=[{"name": "x", "type": "continuous", "domain": (0.0, 1.0)}],
        acquisition_type="EI",
        initial_design_numdata=4,
        initial_design_type="latin",
        exact_feval=True,
        seed=0,
    )
    bo.run_optimization(max_iter=10, eps=-1)  # eps=-1: never stop on distance
    assert bo.Y.shape[0] >= 8
    # Forrester fmin ~= -6.0207; BO should get close within 10 iterations
    assert bo.fx_opt < -5.5
    assert 0.6 < bo.x_opt[0] < 0.9


def test_bo_branin_lcb():
    bo = BayesianOptimization(
        f=np_branin,
        domain=bounds_to_space(objectives.branin.bounds),
        acquisition_type="LCB",
        initial_design_numdata=5,
        initial_design_type="latin",
        exact_feval=True,
        seed=1,
    )
    bo.run_optimization(max_iter=10, eps=-1)
    # regret after 10 iters should be modest (fmin = 0.397887)
    assert bo.fx_opt < 3.0


def test_bo_ask_tell():
    """f=None ask-tell mode (run.py pattern, bo.py:55 suggest_next_locations)."""
    rng = np.random.default_rng(0)
    X = rng.uniform(0, 1, size=(6, 1))
    Y = np_forrester(X)
    bo = BayesianOptimization(
        f=None,
        domain=[{"name": "x", "type": "continuous", "domain": (0.0, 1.0)}],
        X=X, Y=Y,
        acquisition_type="EI",
        exact_feval=True,
    )
    x_next = bo.suggest_next_locations()
    assert x_next.shape == (1, 1)
    assert 0.0 <= x_next[0, 0] <= 1.0
    # tell: augment and re-ask
    X2 = np.vstack([X, x_next])
    Y2 = np.vstack([Y, np_forrester(x_next)])
    bo2 = BayesianOptimization(
        f=None, domain=[{"name": "x", "type": "continuous", "domain": (0.0, 1.0)}],
        X=X2, Y=Y2, acquisition_type="EI", exact_feval=True,
    )
    x_next2 = bo2.suggest_next_locations()
    assert x_next2.shape == (1, 1)


def test_bo_mixed_space_gower_lp_batch():
    """The reference test.py pipeline: mixed continuous+discrete space, Gower kernel,
    EI + local_penalization batch of 3, de-duplication (test.py:439-508)."""

    def balance(x):
        x = np.atleast_2d(x)
        cont, disc = x[:, 0:1], x[:, 1:2]
        return (cont - disc) ** 2 + 0.1 * np.sin(5 * cont)

    domain = [
        {"name": "xc", "type": "continuous", "domain": (0.0, 4.0)},
        {"name": "xd", "type": "discrete", "domain": (0, 1, 2, 3, 4)},
    ]
    # ask-tell: f=None requires X AND Y at construction (the reference raises
    # InvalidConfigError otherwise, bayesian_optimization.py:187 — so do we)
    from gaussian_process_optimization_tpu.bo.space import DesignSpace
    from gaussian_process_optimization_tpu.bo.designs import initial_design

    X = initial_design("latin_mixed", DesignSpace(domain), 8, seed=3)
    bo = BayesianOptimization(
        f=None,
        domain=domain,
        X=X,
        Y=balance(X),
        model_type="GP",
        acquisition_type="EI",
        evaluator_type="local_penalization",
        batch_size=3,
        initial_design_numdata=8,
        initial_design_type="latin_mixed",
        Gower=True,
        exact_feval=False,
        noise_var=1e-4,
        de_duplication=True,
        seed=3,
    )
    batch = bo.suggest_next_locations()
    assert batch.shape == (3, 2)
    # discrete column must hold allowed values
    assert set(np.unique(batch[:, 1])).issubset({0.0, 1.0, 2.0, 3.0, 4.0})
    # batch points are distinct (LP + dedup)
    assert len({tuple(row) for row in np.round(batch, 6)}) == 3
    # Gower kernel was actually used
    from gaussian_process_optimization_tpu.kernels import Gower

    assert isinstance(bo.model.model.kern, Gower)

    # regression (round 4): the LP Lipschitz programs are module-level jits
    # taking (gp, post) as ARGUMENTS — a second ask-tell call with same-shape
    # data must hit the jit cache, not re-trace/re-compile (the per-call
    # closure version baked the posterior arrays into the HLO as constants and
    # paid a full XLA recompile every suggest call)
    from gaussian_process_optimization_tpu.bo import evaluators as ev

    sweep_size = ev._grad_norm_sweep._cache_size()
    refine_size = ev._grad_norm_refine._cache_size()
    assert sweep_size >= 1 and refine_size >= 1  # LP path exercised them
    bo.Y = bo.Y + 0.01  # same shapes, new values
    batch2 = bo.suggest_next_locations()
    assert batch2.shape == (3, 2)
    assert ev._grad_norm_sweep._cache_size() == sweep_size
    assert ev._grad_norm_refine._cache_size() == refine_size


def test_bo_with_constraints_and_context():
    def f(x):
        x = np.atleast_2d(x)
        return ((x[:, 0:1] - 0.2) ** 2 + (x[:, 1:2] - 0.3) ** 2)

    domain = bounds_to_space([(0.0, 1.0), (0.0, 1.0)])
    bo = BayesianOptimization(
        f=f,
        domain=domain,
        constraints=[{"name": "c", "constraint": "x[:,0]+x[:,1]-1.2"}],
        acquisition_type="EI",
        initial_design_numdata=5,
        exact_feval=True,
        seed=0,
    )
    bo.run_optimization(max_iter=3, eps=-1)
    # all evaluated points feasible
    assert np.all(bo.X.sum(1) <= 1.2 + 1e-9)

    # context fixes the first variable
    x_next = bo.suggest_next_locations(context={"var_1": 0.5})
    assert x_next[0, 0] == pytest.approx(0.5)


def test_bo_maximize():
    def g(x):
        return -np_forrester(x)  # max of g == min of forrester

    bo = BayesianOptimization(
        f=g,
        domain=[{"name": "x", "type": "continuous", "domain": (0.0, 1.0)}],
        maximize=True,
        initial_design_numdata=4,
        exact_feval=True,
        seed=0,
    )
    bo.run_optimization(max_iter=8, eps=-1)
    # internal Y is -g = forrester (sign flip wiring)
    np.testing.assert_allclose(bo.Y, np_forrester(bo.X), rtol=1e-10)
    # best should make progress toward the forrester minimum (-6.02)
    assert bo.fx_opt < -4.0


def test_bo_reports(tmp_path):
    bo = BayesianOptimization(
        f=np_forrester,
        domain=[{"name": "x", "type": "continuous", "domain": (0.0, 1.0)}],
        initial_design_numdata=4,
        exact_feval=True,
        seed=0,
    )
    rep = tmp_path / "report.txt"
    ev = tmp_path / "evals.txt"
    mo = tmp_path / "models.txt"
    bo.run_optimization(max_iter=2, eps=-1, report_file=str(rep),
                        evaluations_file=str(ev), models_file=str(mo))
    assert rep.exists() and ev.exists() and mo.exists()
    lines = ev.read_text().strip().split("\n")
    assert lines[0].startswith("Iteration")
    assert len(lines) == bo.Y.shape[0] + 1


def test_bo_random_and_thompson_batches():
    for ev_type in ["random", "thompson_sampling"]:
        bo = BayesianOptimization(
            f=None,
            domain=bounds_to_space([(0.0, 1.0)]),
            X=np.linspace(0.05, 0.95, 6)[:, None],
            Y=np_forrester(np.linspace(0.05, 0.95, 6)[:, None]),
            acquisition_type="EI",
            evaluator_type=ev_type,
            batch_size=3,
            exact_feval=True,
            de_duplication=True,
        )
        batch = bo.suggest_next_locations()
        assert batch.shape[0] == 3


def test_bo_cost_model_evaluation_time():
    """cost_withGradients='evaluation_time': a GP over log cost divides the
    acquisition (GPyOpt core/task/cost.py)."""
    import time as _time

    def slow_left(x):
        x = np.atleast_2d(x)
        _time.sleep(0.01)
        return (x[:, 0:1] - 0.7) ** 2

    bo = BayesianOptimization(
        f=slow_left,
        domain=bounds_to_space([(0.0, 1.0)]),
        cost_withGradients="evaluation_time",
        acquisition_type="EI",
        initial_design_numdata=4,
        exact_feval=True,
        seed=0,
    )
    bo.run_optimization(max_iter=3, eps=-1)
    assert bo.Y.shape[0] == 7
    assert bo.cost.cost_type == "evaluation_time"
    c, dc = bo.cost.cost_withGradients(np.array([[0.5]]))
    assert c.shape == (1, 1) and float(c[0, 0]) > 0


def test_bo_bandit_space():
    arms = np.array([[0.0, 0.0], [0.5, 1.0], [1.0, 0.0], [1.5, 1.0], [2.0, 0.5]])

    def f(x):
        x = np.atleast_2d(x)
        return ((x[:, 0:1] - 1.0) ** 2 + (x[:, 1:2] - 0.5) ** 2)

    bo = BayesianOptimization(
        f=f,
        domain=[{"name": "arm", "type": "bandit", "domain": arms}],
        acquisition_type="EI",
        initial_design_numdata=4,
        exact_feval=True,
        de_duplication=True,
        seed=0,
    )
    bo.run_optimization(max_iter=1, eps=-1)
    # every evaluated point must be an arm
    for row in bo.X:
        assert any(np.allclose(row, a) for a in arms)
    # once all 5 arms are explored, suggesting more must raise (the reference's
    # FullyExploredOptimizationDomainError, anchor_points_generator.py:51)
    from gaussian_process_optimization_tpu.bo import FullyExploredOptimizationDomainError

    if len({tuple(r) for r in np.round(bo.X, 9)}) == len(arms):
        with pytest.raises(FullyExploredOptimizationDomainError):
            bo.suggest_next_locations()
