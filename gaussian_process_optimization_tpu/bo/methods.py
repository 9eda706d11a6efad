"""User API (GPyOpt/GPyOpt/methods/bayesian_optimization.py:24 `BayesianOptimization`,
modular_bayesian_optimization.py:6 `ModularBayesianOptimization`) and the kwargs-driven
component assembly (GPyOpt/GPyOpt/util/arguments_manager.py:9 `ArgumentsManager`):
model chooser (:80), acquisition chooser (:42, jitter=0.01, LCB weight=2), evaluator
chooser (:17), with the reference author's `Gower` kwarg plumbed through (:96-110).
"""
from __future__ import annotations

import numpy as np

from ..models.bo_models import GPModel
from .acquisitions import (
    AcquisitionEI,
    AcquisitionLCB,
    AcquisitionLP,
    AcquisitionMPI,
)
from .bo_loop import BO
from .cost import CostModel
from .designs import initial_design
from .evaluators import LocalPenalization, RandomBatch, Sequential, ThompsonBatch
from .objective import SingleObjective
from .optimizer import AcquisitionOptimizer
from .space import DesignSpace
from .variables import InvalidConfigError


class ArgumentsManager:
    """kwargs -> concrete components (util/arguments_manager.py:9)."""

    def __init__(self, kwargs):
        self.kwargs = kwargs

    def model_creator(self, model_type, exact_feval, space):
        """(arguments_manager.py:80): 'GP' | 'sparseGP' | 'GP_MCMC' | 'warpedGP' |
        'input_warped_GP' | 'RF'."""
        model_type = model_type
        kernel = self.kwargs.get("kernel")
        ARD = self.kwargs.get("ARD", False)
        Gower = self.kwargs.get("Gower", False)
        verbosity_model = self.kwargs.get("verbosity_model", False)
        noise_var = self.kwargs.get("noise_var")
        optimizer = self.kwargs.get("optimizer", "lbfgs")
        max_iters = self.kwargs.get("max_iters", 1000)
        optimize_restarts = self.kwargs.get("optimize_restarts", 5)

        if model_type == "GP":
            return GPModel(
                kernel=kernel, noise_var=noise_var, exact_feval=exact_feval,
                optimizer=optimizer, max_iters=max_iters,
                optimize_restarts=optimize_restarts, verbose=verbosity_model,
                ARD=ARD, Gower=Gower, space=space,
                mesh=self.kwargs.get("mesh"),
            )
        if model_type == "sparseGP":
            from ..models.sparse_bo_model import SparseGPModel

            num_inducing = self.kwargs.get("num_inducing", 10)
            return SparseGPModel(
                kernel=kernel, noise_var=noise_var, exact_feval=exact_feval,
                optimizer=optimizer, max_iters=max_iters,
                optimize_restarts=optimize_restarts, verbose=verbosity_model,
                ARD=ARD, num_inducing=num_inducing,
            )
        if model_type == "GP_MCMC":
            from ..models.mcmc_bo_model import GPModel_MCMC

            return GPModel_MCMC(
                kernel=kernel, noise_var=noise_var, exact_feval=exact_feval,
                n_samples=self.kwargs.get("n_samples", 10),
                n_burnin=self.kwargs.get("n_burnin", 100),
                subsample_interval=self.kwargs.get("subsample_interval", 10),
                step_size=self.kwargs.get("step_size", 1e-1),
                leapfrog_steps=self.kwargs.get("leapfrog_steps", 20),
                verbose=verbosity_model,
            )
        if model_type == "warpedGP":
            from ..models.warped_bo_model import WarpedGPModel

            return WarpedGPModel(
                kernel=kernel, noise_var=noise_var, exact_feval=exact_feval,
                optimizer=optimizer, max_iters=max_iters,
                optimize_restarts=optimize_restarts, verbose=verbosity_model, ARD=ARD,
            )
        if model_type == "input_warped_GP":
            from ..models.warped_bo_model import InputWarpedGPModel

            return InputWarpedGPModel(
                space, kernel=kernel, noise_var=noise_var, exact_feval=exact_feval,
                optimizer=optimizer, max_iters=max_iters,
                optimize_restarts=optimize_restarts, verbose=verbosity_model, ARD=ARD,
            )
        if model_type == "RF":
            from ..models.rf_model import RFModel

            return RFModel(verbose=verbosity_model)
        raise InvalidConfigError(f"unknown model type {model_type!r}")

    def acquisition_creator(self, acquisition_type, model, space,
                            acquisition_optimizer, cost_withGradients):
        """(arguments_manager.py:42): EI/MPI/LCB (+_MCMC), jitter=0.01, LCB w=2."""
        acquisition_type = acquisition_type or "EI"
        jitter = self.kwargs.get("acquisition_jitter", 0.01)
        weight = self.kwargs.get("acquisition_weight", 2)

        if acquisition_type == "EI":
            return AcquisitionEI(model, space, acquisition_optimizer, cost_withGradients, jitter)
        if acquisition_type == "MPI":
            return AcquisitionMPI(model, space, acquisition_optimizer, cost_withGradients, jitter)
        if acquisition_type == "LCB":
            return AcquisitionLCB(model, space, acquisition_optimizer, None, weight)
        if acquisition_type in ("EI_MCMC", "MPI_MCMC", "LCB_MCMC"):
            from .acquisitions_mcmc import (
                AcquisitionEI_MCMC,
                AcquisitionLCB_MCMC,
                AcquisitionMPI_MCMC,
            )

            table = {
                "EI_MCMC": lambda: AcquisitionEI_MCMC(model, space, acquisition_optimizer, cost_withGradients, jitter),
                "MPI_MCMC": lambda: AcquisitionMPI_MCMC(model, space, acquisition_optimizer, cost_withGradients, jitter),
                "LCB_MCMC": lambda: AcquisitionLCB_MCMC(model, space, acquisition_optimizer, None, weight),
            }
            return table[acquisition_type]()
        if acquisition_type == "ES":
            from .entropy_search import AcquisitionEntropySearch

            return AcquisitionEntropySearch(model, space, acquisition_optimizer,
                                            cost_withGradients=cost_withGradients)
        if acquisition_type == "ES_EPMGP":
            # the reference's exact estimator (ES.py + util/epmgp.py)
            from .entropy_search import AcquisitionEntropySearchEPMGP

            return AcquisitionEntropySearchEPMGP(
                model, space, acquisition_optimizer,
                cost_withGradients=cost_withGradients,
            )
        raise InvalidConfigError(f"unknown acquisition type {acquisition_type!r}")

    def evaluator_creator(self, evaluator_type, acquisition, batch_size, model_type,
                          model, space, acquisition_optimizer):
        """(arguments_manager.py:17): sequential / random / thompson_sampling /
        local_penalization (wraps the acquisition in AcquisitionLP)."""
        evaluator_type = evaluator_type or "sequential"
        if batch_size == 1 or evaluator_type == "sequential":
            return Sequential(acquisition)
        if evaluator_type in ("random", "random_batch"):
            return RandomBatch(acquisition, batch_size)
        if evaluator_type == "thompson_sampling":
            return ThompsonBatch(acquisition, batch_size)
        if evaluator_type == "local_penalization":
            if not isinstance(acquisition, AcquisitionLP):
                acquisition = AcquisitionLP(
                    model, space, acquisition_optimizer, acquisition,
                    transform=self.kwargs.get("transform", "none"),
                )
            return LocalPenalization(acquisition, batch_size)
        raise InvalidConfigError(f"unknown evaluator type {evaluator_type!r}")


class BayesianOptimization(BO):
    """One-stop BO driver (methods/bayesian_optimization.py:24).

    f may be None for ask-tell operation (pass X/Y instead and use
    suggest_next_locations, bo.py:55).
    """

    def __init__(
        self,
        f,
        domain=None,
        constraints=None,
        cost_withGradients=None,
        model_type="GP",
        X=None,
        Y=None,
        initial_design_numdata=5,
        initial_design_type="random",
        acquisition_type="EI",
        normalize_Y=True,
        exact_feval=False,
        acquisition_optimizer_type="lbfgs",
        model_update_interval=1,
        evaluator_type="sequential",
        batch_size=1,
        num_cores=1,
        verbosity=False,
        verbosity_model=False,
        maximize=False,
        de_duplication=False,
        seed=None,
        **kwargs,
    ):
        self.initial_iter = True
        self.verbosity = verbosity
        self.verbosity_model = verbosity_model
        self.modular_optimization = False
        self.de_duplication = de_duplication
        self.kwargs = kwargs
        self._arguments_mng = ArgumentsManager(kwargs)

        # space and objective (:90-110)
        self.constraints = constraints
        self.space = DesignSpace(domain, constraints)

        self.maximize = maximize
        self.f = self._sign(f)
        self.objective_name = kwargs.get("objective_name", "no_name")
        self.batch_size = batch_size
        self.num_cores = num_cores
        if f is not None:
            self.objective = SingleObjective(self.f, num_cores, self.objective_name)
        else:
            self.objective = None

        self.cost = CostModel(cost_withGradients)

        # initial design (:181-196)
        self.initial_design_numdata = initial_design_numdata
        self.initial_design_type = initial_design_type
        X, Y = self._init_design_chooser(X, Y, seed)

        # model (:130)
        self.model_type = model_type
        self.exact_feval = exact_feval
        self.model = self._arguments_mng.model_creator(
            model_type, exact_feval, self.space
        )

        # acquisition optimizer (:140)
        self.acquisition_optimizer_type = acquisition_optimizer_type
        self.acquisition_optimizer = AcquisitionOptimizer(
            self.space, acquisition_optimizer_type, model=self.model,
            design_type=kwargs.get("anchor_points_design", "random"),
            num_samples=kwargs.get("anchor_points_samples", 1000),
            num_anchor=kwargs.get("anchor_points_num", 5),
            mesh=kwargs.get("mesh"),  # multi-chip: sweep + anchor polish shard
        )

        # acquisition (:150)
        self.acquisition_type = acquisition_type
        self.acquisition = self._arguments_mng.acquisition_creator(
            acquisition_type, self.model, self.space, self.acquisition_optimizer,
            self.cost.cost_withGradients,
        )

        # evaluator (:160)
        self.evaluator_type = evaluator_type
        self.evaluator = self._arguments_mng.evaluator_creator(
            evaluator_type, self.acquisition, batch_size, model_type, self.model,
            self.space, self.acquisition_optimizer,
        )

        super().__init__(
            model=self.model,
            space=self.space,
            objective=self.objective,
            acquisition=self.evaluator.acquisition,
            evaluator=self.evaluator,
            X_init=X,
            Y_init=Y,
            cost=self.cost,
            normalize_Y=normalize_Y,
            model_update_interval=model_update_interval,
            de_duplication=de_duplication,
        )

    def _sign(self, f):
        """Negate f for maximization (bayesian_optimization.py:198)."""
        if f is None:
            return None
        if not self.maximize:
            return f
        return lambda x: -np.asarray(f(x))

    def _init_design_chooser(self, X, Y, seed=None):
        """Sample the initial design if X/Y not given (:181-196). Initial evaluation
        costs feed the 'evaluation_time' cost model right away."""
        if self.f is None and (X is None or Y is None):
            from .variables import InvalidConfigError

            # bayesian_optimization.py:187 — without an objective there is
            # nothing to evaluate the sampled design with
            raise InvalidConfigError(
                "Initial data for both X and Y is required when objective "
                "function is not provided")
        cost_values = None
        if X is None:
            X = initial_design(
                self.initial_design_type, self.space, self.initial_design_numdata,
                seed=seed,
            )
            if self.objective is not None:
                Y, cost_values = self.objective.evaluate(X)
        elif Y is None:
            if self.objective is not None:
                Y, cost_values = self.objective.evaluate(X)
        if cost_values is not None and self.cost.cost_type == "evaluation_time":
            self.cost.update_cost_model(X, cost_values)
        return X, Y


class ModularBayesianOptimization(BO):
    """Bring-your-own-components BO (methods/modular_bayesian_optimization.py:6)."""

    def __init__(self, model, space, objective, acquisition, evaluator, X_init,
                 Y_init=None, cost=None, normalize_Y=True, model_update_interval=1,
                 de_duplication=False):
        self.initial_iter = True
        self.modular_optimization = True
        super().__init__(
            model=model, space=space, objective=objective, acquisition=acquisition,
            evaluator=evaluator, X_init=X_init, Y_init=Y_init, cost=cost,
            normalize_Y=normalize_Y, model_update_interval=model_update_interval,
            de_duplication=de_duplication,
        )
