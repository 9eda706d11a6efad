"""Predictive-uncertainty tour: quantile bands, predictive density scoring,
posterior derivatives, and non-Gaussian predictive quantiles.

Exercises the GPy core/gp.py:384-714 user-API tail and the likelihood
sampling contract (likelihoods/likelihood.py:757,769) on four model families:
exact GP, Student-t process, warped GP (positive targets), and a Poisson SVGP.
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import numpy as np

import gaussian_process_optimization_tpu.kernels as kern
from gaussian_process_optimization_tpu.models import fit as fit_mod
from gaussian_process_optimization_tpu.models import likelihoods as lik
from gaussian_process_optimization_tpu.models.gp import GPRegression
from gaussian_process_optimization_tpu.models.svgp import SVGP, fit_svgp
from gaussian_process_optimization_tpu.models.tp import TPRegression
from gaussian_process_optimization_tpu.models.warped import LogWarp, WarpedGP


def main(seed=0):
    rng = np.random.default_rng(seed)
    X = rng.uniform(-2, 2, (40, 1))
    f = np.sin(2 * X)
    Xs = np.linspace(-2, 2, 9)[:, None]

    # --- exact GP: quantile bands + held-out log predictive density ---
    Y = f + 0.15 * rng.standard_normal(X.shape)
    m, _ = fit_mod.fit(GPRegression.create(X, Y, kernel=kern.RBF.create(1)),
                       num_restarts=2, maxiter=200, key=jax.random.PRNGKey(seed))
    lo, med, hi = m.predict_quantiles(Xs, quantiles=(2.5, 50, 97.5))
    lpd = m.log_predictive_density(Xs, np.sin(2 * Xs))
    print("GP   95% band width:", np.round(np.asarray(hi - lo).ravel(), 2))
    print("GP   mean held-out LPD:", float(np.mean(np.asarray(lpd))))

    # posterior derivative: where is the fitted surface steep/uncertain?
    mean_jac, var_jac = m.predict_jacobian(Xs)
    print("GP   E[df/dx]:", np.round(np.asarray(mean_jac)[:, 0, 0], 2))
    print("GP   sd[df/dx]:", np.round(np.sqrt(np.asarray(var_jac)[:, 0, 0]), 2))

    # --- Student-t process: heavier predictive tails than the GP ---
    # TP has no separate Gaussian noise term (GPy tp_regression.py likewise);
    # add a White kernel so the predictive floor matches the GP's noise
    mt = TPRegression.create(
        X, Y, kernel=m.kern + kern.White.create(1, variance=float(m.likelihood_variance)),
        deg_free=4.0)
    tlo, thi = mt.predict_quantiles(Xs)
    print("TP   95% vs GP band ratio:",
          np.round(np.asarray(thi - tlo).ravel()
                   / np.asarray(hi - lo).ravel(), 3))

    # --- warped GP on positive targets: bands respect the support ---
    Ypos = np.exp(0.8 * f) * (1 + 0.1 * rng.standard_normal(X.shape))
    mw = WarpedGP.create(X, Ypos, kernel=kern.RBF.create(1), noise_var=0.05,
                         warping_function=LogWarp())
    wlo, whi = mw.predict_quantiles(Xs)
    print("Warp lower band min (must be > 0):", float(np.min(np.asarray(wlo))))

    # --- Poisson SVGP: count quantiles via the sampling fallback ---
    Yc = rng.poisson(np.exp(1.2 * f)).astype(float)
    sv = SVGP.create(X, Yc, Z=X[::5], kernel=kern.RBF.create(1),
                     likelihood=lik.Poisson())
    sv, _ = fit_svgp(sv, X, Yc, num_steps=200, key=jax.random.PRNGKey(seed))
    q10, q90 = sv.predict_quantiles(Xs, quantiles=(10, 90),
                                    key=jax.random.PRNGKey(1))
    print("Pois 10/90% count band:",
          list(zip(np.asarray(q10).ravel(), np.asarray(q90).ravel())))
    return m, mt, mw, sv


if __name__ == "__main__":
    main()
