"""SparseGPCoregionalizedRegression + SparseGPRegressionMD wrappers
(GPy models/sparse_gp_coregionalized_regression.py:10,
 models/sparse_gp_regression_md.py:13).

Consistency: (1) sparse coregionalized with Z = all training inputs equals the
dense coregionalized GP (VarDTC is exact at Z=X); (2) the missing-data model's
bound equals the SUM of independent per-output VarDTC bounds sharing kernel,
noise and Z (that is its definition); predictions match the per-output models.
"""
import jax.numpy as jnp
import numpy as np

import gaussian_process_optimization_tpu.kernels as kern
from gaussian_process_optimization_tpu.models.multioutput import (
    GPCoregionalizedRegression,
    SparseGPCoregionalizedRegression,
    SparseGPRegressionMD,
)
from gaussian_process_optimization_tpu.models.sparse import SparseGPRegression


def _two_output_data(rng, n1=14, n2=11):
    X1 = np.sort(rng.uniform(0, 4, n1))[:, None]
    X2 = np.sort(rng.uniform(0, 4, n2))[:, None]
    Y1 = np.sin(X1) + 0.05 * rng.standard_normal((n1, 1))
    Y2 = 0.7 * np.sin(X2 + 0.3) + 0.05 * rng.standard_normal((n2, 1))
    return [X1, X2], [Y1, Y2]


def test_sparse_coreg_with_full_inducing_matches_dense(rng):
    X_list, Y_list = _two_output_data(rng)
    dense = GPCoregionalizedRegression(X_list, Y_list, rank=1, noise_var=0.1)
    sparse = SparseGPCoregionalizedRegression(
        X_list, Y_list, Z_list=[x.copy() for x in X_list], rank=1,
        noise_var=0.1)
    lml_d = float(dense.log_marginal_likelihood())
    lml_s = float(sparse.log_marginal_likelihood())
    # VarDTC at Z=X: trace term vanishes, bound == exact LML (up to jitter)
    np.testing.assert_allclose(lml_s, lml_d, rtol=1e-5)
    Xs = np.linspace(0.3, 3.7, 6)[:, None]
    for task in (0, 1):
        mu_d, var_d = dense.predict(Xs, task)
        mu_s, var_s = sparse.predict(Xs, task)
        np.testing.assert_allclose(np.asarray(mu_s), np.asarray(mu_d),
                                   atol=2e-4)
        np.testing.assert_allclose(np.asarray(var_s), np.asarray(var_d),
                                   rtol=2e-3)


def test_sparse_coreg_optimize_improves(rng):
    X_list, Y_list = _two_output_data(rng)
    m = SparseGPCoregionalizedRegression(X_list, Y_list, num_inducing=8,
                                         noise_var=0.3, seed=1)
    before = float(m.log_marginal_likelihood())
    m.optimize(num_restarts=1, maxiter=60)
    after = float(m.log_marginal_likelihood())
    assert after >= before - 1e-6
    # inducing task column must stay on its integer values (zero-grad rounding)
    taskcol = np.asarray(m.model.Z[:, -1])
    np.testing.assert_allclose(taskcol, np.rint(taskcol), atol=1e-9)


def test_md_bound_is_sum_of_per_output_bounds(rng):
    n, d = 24, 2
    X = rng.uniform(0, 3, (n, d))
    indexD = (np.arange(n) % 3).astype(int)
    Y = np.sin(X[:, :1]) + 0.1 * rng.standard_normal((n, 1))
    k = kern.RBF.create(d, variance=1.2, lengthscale=0.9)
    Zi = rng.uniform(0, 3, (6, d))
    md = SparseGPRegressionMD(X, Y, indexD, kernel=k, Z=Zi, noise_var=0.07)
    lml_md = float(md.log_marginal_likelihood())

    total = 0.0
    for p in range(3):
        sel = indexD == p
        sp = SparseGPRegression.create(X[sel], Y[sel], kernel=k, Z=Zi,
                                       noise_var=0.07)
        total += float(sp.log_marginal_likelihood())
    np.testing.assert_allclose(lml_md, total, rtol=1e-7)


def test_md_predict_matches_per_output_model(rng):
    n, d = 20, 1
    X = np.sort(rng.uniform(0, 3, n))[:, None]
    indexD = (np.arange(n) % 2).astype(int)
    Y = np.sin(2 * X) + 0.1 * rng.standard_normal((n, 1))
    k = kern.Matern52.create(d, variance=1.0, lengthscale=0.8)
    Zi = np.linspace(0.2, 2.8, 7)[:, None]
    md = SparseGPRegressionMD(X, Y, indexD, kernel=k, Z=Zi, noise_var=0.05)
    Xs = np.linspace(0.4, 2.6, 5)[:, None]
    for p in range(2):
        sel = indexD == p
        sp = SparseGPRegression.create(X[sel], Y[sel], kernel=k, Z=Zi,
                                       noise_var=0.05)
        mu_ref, var_ref = sp.predict(jnp.asarray(Xs))
        mu_md, var_md = md.predict(Xs, p)
        np.testing.assert_allclose(np.asarray(mu_md), np.asarray(mu_ref),
                                   atol=1e-8)
        np.testing.assert_allclose(np.asarray(var_md), np.asarray(var_ref),
                                   rtol=1e-7)


def test_md_optimize_improves(rng):
    n, d = 30, 1
    X = np.sort(rng.uniform(0, 3, n))[:, None]
    indexD = (np.arange(n) % 2).astype(int)
    Y = np.sin(2 * X) + 0.1 * rng.standard_normal((n, 1))
    md = SparseGPRegressionMD(X, Y, indexD, num_inducing=8, noise_var=0.2,
                              seed=2)
    before = float(md.log_marginal_likelihood())
    md.optimize(num_restarts=1, maxiter=60)
    after = float(md.log_marginal_likelihood())
    assert after >= before - 1e-6


def test_lcm_and_private_kernels(rng):
    """LCM = sum of per-kernel ICM blocks; Private contributes only to its
    output's block (GPy util/multioutput.py LCM:62, Private:82)."""
    import gaussian_process_optimization_tpu.kernels as kern
    from gaussian_process_optimization_tpu.models.multioutput import (
        build_stacked_XY, icm_kernel, lcm_kernel, private_kernel)

    X_list = [rng.uniform(-1, 1, (6, 2)), rng.uniform(-1, 1, (5, 2))]
    Y_list = [rng.standard_normal((6, 1)), rng.standard_normal((5, 1))]
    X, _ = build_stacked_XY(X_list, Y_list)
    X = jnp.asarray(X)

    k1 = kern.RBF.create(2)
    k2 = kern.Matern32.create(2)
    lcm = lcm_kernel(2, 2, [k1, k2])
    K_lcm = np.asarray(lcm.K(X))
    K_sum = np.asarray(icm_kernel(2, 2, base_kernel=k1).K(X)) \
        + np.asarray(icm_kernel(2, 2, base_kernel=k2).K(X))
    np.testing.assert_allclose(K_lcm, K_sum, rtol=1e-10)

    priv = private_kernel(2, 2, base_kernel=k1, output=1, kappa=0.7)
    K_priv = np.asarray(priv.K(X))
    # output-0 block (first 6 rows/cols) must be exactly zero
    np.testing.assert_allclose(K_priv[:6, :6], 0.0, atol=1e-12)
    np.testing.assert_allclose(K_priv[:6, 6:], 0.0, atol=1e-12)
    # output-1 block = kappa * base kernel on those inputs
    base = np.asarray(k1.K(jnp.asarray(np.asarray(X)[6:, :2])))
    np.testing.assert_allclose(K_priv[6:, 6:], 0.7 * base, rtol=1e-8)
