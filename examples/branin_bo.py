"""Bayesian optimization of Branin with EI (BASELINE config 3): the one-stop
BayesianOptimization driver, convergence + acquisition plots, TSV reports."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

from gaussian_process_optimization_tpu.bo import BayesianOptimization, bounds_to_space
from gaussian_process_optimization_tpu.bo import objectives


def main(max_iter=25, seed=0, plot=True):
    bo = BayesianOptimization(
        f=lambda x: np.asarray(objectives.branin(x)),
        domain=bounds_to_space(objectives.branin.bounds),
        acquisition_type="EI",
        initial_design_numdata=5,
        initial_design_type="latin",
        exact_feval=True,
        seed=seed,
    )
    bo.run_optimization(max_iter=max_iter, eps=-1,
                        report_file="branin_report.txt",
                        evaluations_file="branin_evaluations.txt")
    print(f"best f = {bo.fx_opt:.5f} (true fmin = {objectives.branin.fmin}) "
          f"at x = {bo.x_opt}")
    if plot:
        bo.plot_convergence("branin_convergence.png")
        bo.plot_acquisition("branin_acquisition.png")
        print("wrote branin_convergence.png, branin_acquisition.png")
    return bo


if __name__ == "__main__":
    main()
