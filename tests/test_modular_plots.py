"""ModularBayesianOptimization (bring-your-own-components) + plotting surfaces."""
import numpy as np
import pytest

import gaussian_process_optimization_tpu.kernels as kern
from gaussian_process_optimization_tpu.bo import (
    AcquisitionEI,
    AcquisitionOptimizer,
    DesignSpace,
    ModularBayesianOptimization,
    Sequential,
    SingleObjective,
    bounds_to_space,
    objectives,
)
from gaussian_process_optimization_tpu.models.bo_models import GPModel


def test_modular_bo(rng):
    """Assemble every component by hand (methods/modular_bayesian_optimization.py)."""
    space = DesignSpace(bounds_to_space([(0.0, 1.0)]))
    objective = SingleObjective(lambda x: np.asarray(objectives.forrester(x)))
    model = GPModel(exact_feval=True, optimize_restarts=2, max_iters=200)
    opt = AcquisitionOptimizer(space, num_samples=300, num_anchor=3)
    acq = AcquisitionEI(model, space, opt, jitter=0.01)
    evaluator = Sequential(acq)
    X0 = rng.uniform(0, 1, size=(5, 1))
    Y0 = np.asarray(objectives.forrester(X0))

    bo = ModularBayesianOptimization(model, space, objective, acq, evaluator,
                                     X_init=X0, Y_init=Y0)
    bo.run_optimization(max_iter=5, eps=-1)
    assert bo.Y.shape[0] == 10
    assert bo.fx_opt <= Y0.min()


def test_plot_surfaces(tmp_path, rng):
    import jax

    from gaussian_process_optimization_tpu.bo import BayesianOptimization
    from gaussian_process_optimization_tpu.models.gp import GPRegression

    # 1-D GP plot with samples
    X = rng.uniform(0, 1, size=(10, 1))
    Y = np.asarray(objectives.forrester(X))
    m = GPRegression.create(X, Y, kernel=kern.RBF.create(1), noise_var=0.1)
    assert m.plot(bounds=[(0, 1)], filename=str(tmp_path / "gp1d.png"), n_samples=2)
    assert (tmp_path / "gp1d.png").exists()

    # 2-D GP plot
    X2 = rng.uniform(-1, 1, size=(15, 2))
    Y2 = (X2**2).sum(1, keepdims=True)
    m2 = GPRegression.create(X2, Y2, kernel=kern.RBF.create(2), noise_var=0.05)
    assert m2.plot(filename=str(tmp_path / "gp2d.png"))
    assert (tmp_path / "gp2d.png").exists()

    # BO acquisition plots, 1-D and 2-D
    bo = BayesianOptimization(
        f=lambda x: np.asarray(objectives.forrester(x)),
        domain=bounds_to_space([(0.0, 1.0)]),
        initial_design_numdata=4, exact_feval=True, seed=0)
    bo.run_optimization(max_iter=1, eps=-1)
    assert bo.plot_acquisition(filename=str(tmp_path / "acq1d.png"))

    bo2 = BayesianOptimization(
        f=lambda x: np.asarray(objectives.branin(x)),
        domain=bounds_to_space(objectives.branin.bounds),
        initial_design_numdata=5, exact_feval=True, seed=0)
    bo2.run_optimization(max_iter=1, eps=-1)
    assert bo2.plot_acquisition(filename=str(tmp_path / "acq2d.png"))
    assert (tmp_path / "acq2d.png").exists()
