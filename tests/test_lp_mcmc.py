"""Regression (round-2 review): local-penalization over STATEFUL acquisitions.

AcquisitionLP used to drop the wrapped acquisition's device state (the stacked
hyperparameter samples of the *_MCMC variants), crashing LP + any MCMC
acquisition — a combination the reference supports (GPyOpt LP.py over EI_mcmc).
Also covers the LCB_MCMC softplus transform mapping (LP.py:33-34).
"""
import numpy as np

from gaussian_process_optimization_tpu.bo import BayesianOptimization


def _f(x):
    x = np.atleast_2d(x)
    return np.sum(np.square(x - 0.3), axis=1, keepdims=True)


DOMAIN = [{"name": "x0", "type": "continuous", "domain": (-1.0, 1.0)},
          {"name": "x1", "type": "continuous", "domain": (-1.0, 1.0)}]


def test_lp_over_mcmc_acquisition():
    bo = BayesianOptimization(
        f=_f, domain=DOMAIN, model_type="GP_MCMC", acquisition_type="EI_MCMC",
        evaluator_type="local_penalization", batch_size=2,
        initial_design_numdata=4, exact_feval=True, seed=0,
        n_samples=8, n_burnin=10,
    )
    bo.run_optimization(max_iter=1, eps=-1)
    assert bo.Y.shape[0] >= 5 and np.all(np.isfinite(bo.Y))


def test_lp_lcb_mcmc_softplus_transform():
    from gaussian_process_optimization_tpu.bo.acquisitions import (AcquisitionLCB,
                                                                   AcquisitionLP)
    from gaussian_process_optimization_tpu.bo.acquisitions_mcmc import (
        AcquisitionLCB_MCMC)

    for cls in (AcquisitionLCB, AcquisitionLCB_MCMC):
        lcb = cls.__new__(cls)  # transform selection only inspects the type
        lp = AcquisitionLP(None, None, None, lcb)
        assert lp.transform == "softplus", cls.__name__
