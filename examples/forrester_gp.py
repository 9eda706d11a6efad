"""Exact GP regression on the Forrester function: fit, predict, plot.
(BASELINE config 1.)"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import numpy as np

import gaussian_process_optimization_tpu.kernels as kern
from gaussian_process_optimization_tpu.bo import objectives
from gaussian_process_optimization_tpu.models import fit as fit_mod
from gaussian_process_optimization_tpu.models.gp import GPRegression


def main(n=25, out="forrester_gp.png", seed=0, plot=True):
    rng = np.random.default_rng(seed)
    X = rng.uniform(0, 1, size=(n, 1))
    Y = np.asarray(objectives.forrester(X)) + 0.2 * rng.standard_normal((n, 1))

    model = GPRegression.create(X, Y, kernel=kern.RBF.create(1), noise_var=0.5,
                                normalizer=True)
    print(f"initial LML: {float(model.log_marginal_likelihood()):.3f}")
    model, _ = fit_mod.fit(model, num_restarts=5, maxiter=500,
                           key=jax.random.PRNGKey(seed))
    print(f"fitted  LML: {float(model.log_marginal_likelihood()):.3f}")
    print(f"lengthscale: {float(model.kern.lengthscale):.4f}  "
          f"variance: {float(model.kern.variance):.4f}  "
          f"noise: {float(model.likelihood_variance):.5f}")
    if plot:
        model.plot(bounds=[(0, 1)], filename=out, n_samples=3,
                   title="GP on Forrester")
        print(f"wrote {out}")
    return model


if __name__ == "__main__":
    main()
