"""DIRECT / CMA-ES optimizer tests + Student-t process + PEP bound."""
import jax.numpy as jnp
import numpy as np
import pytest

import gaussian_process_optimization_tpu.kernels as kern


def _branin_np(X):
    from gaussian_process_optimization_tpu.bo import objectives

    return np.asarray(objectives.branin(X)).flatten()


def test_direct_on_branin():
    from gaussian_process_optimization_tpu.ops.direct import direct_minimize

    x, fx = direct_minimize(_branin_np, np.array([-5.0, 1.0]), np.array([10.0, 15.0]),
                            max_evals=600)
    assert fx < 1.5  # fmin = 0.3979, DIRECT should get close


def test_cma_on_branin():
    from gaussian_process_optimization_tpu.ops.cmaes import cma_minimize

    x, fx = cma_minimize(_branin_np, np.array([2.0, 7.0]), np.array([-5.0, 1.0]),
                         np.array([10.0, 15.0]), max_evals=800, seed=1)
    assert fx < 1.0


def test_bo_with_direct_and_cma(rng):
    """Acquisition optimizer modes 'DIRECT'/'CMA' (GPyOpt choose_optimizer parity)."""
    from gaussian_process_optimization_tpu.bo import BayesianOptimization, bounds_to_space
    from gaussian_process_optimization_tpu.bo import objectives

    X = rng.uniform(0, 1, size=(8, 1))
    Y = np.asarray(objectives.forrester(X))
    for opt_name in ["DIRECT", "CMA"]:
        bo = BayesianOptimization(
            f=None, domain=bounds_to_space([(0.0, 1.0)]), X=X, Y=Y,
            acquisition_type="EI", acquisition_optimizer_type=opt_name,
            exact_feval=True, anchor_points_num=1,
        )
        x_next = bo.suggest_next_locations()
        assert x_next.shape == (1, 1) and 0 <= x_next[0, 0] <= 1


def test_tp_regression(rng):
    from gaussian_process_optimization_tpu.models.gp import GPRegression
    from gaussian_process_optimization_tpu.models.tp import TPRegression

    X = rng.uniform(-2, 2, size=(20, 1))
    Y = np.sin(X) + 0.05 * rng.standard_normal((20, 1))
    k = kern.RBF.create(1, variance=1.0, lengthscale=0.8)
    tp = TPRegression.create(X, Y, kernel=k, deg_free=8.0)
    lml = float(tp.log_marginal_likelihood())
    assert np.isfinite(lml)
    Xs = np.linspace(-2, 2, 9)[:, None]
    mu_t, var_t = tp.predict(jnp.asarray(Xs))
    # nu -> inf recovers the GP: compare against the noiseless-GP predictions
    tp_big = TPRegression.create(X, Y, kernel=k, deg_free=1e6)
    gp = GPRegression.create(X, Y, kernel=k, noise_var=0.0)
    mu_g, var_g = gp.predict_noiseless(jnp.asarray(Xs))
    mu_b, var_b = tp_big.predict(jnp.asarray(Xs))
    np.testing.assert_allclose(np.asarray(mu_b), np.asarray(mu_g), rtol=1e-5, atol=1e-7)
    # variances here are ~1e-8..1e-5 (noiseless interpolation): absolute tolerance
    # dominated by the jitter floors of the two paths
    np.testing.assert_allclose(np.asarray(var_b), np.asarray(var_g), rtol=1e-2, atol=1e-4)
    assert np.all(np.isfinite(np.asarray(mu_t)))


def test_pep_interpolates(rng):
    from gaussian_process_optimization_tpu.models.sparse import SparseGPRegression

    X = rng.uniform(-3, 3, size=(40, 1))
    Y = np.sin(X) + 0.1 * rng.standard_normal((40, 1))
    k = kern.RBF.create(1)
    Z = X[::4]
    kw = dict(kernel=k, Z=Z, noise_var=0.05)
    fitc = float(SparseGPRegression.create(X, Y, inference="fitc", **kw).log_marginal_likelihood())
    vardtc = float(SparseGPRegression.create(X, Y, inference="vardtc", **kw).log_marginal_likelihood())
    import dataclasses

    pep_hi = SparseGPRegression.create(X, Y, inference="pep", **kw)
    pep_hi = dataclasses.replace(pep_hi, pep_alpha=0.999)
    pep_lo = dataclasses.replace(pep_hi, pep_alpha=0.001)
    v_hi = float(pep_hi.log_marginal_likelihood())
    v_lo = float(pep_lo.log_marginal_likelihood())
    np.testing.assert_allclose(v_hi, fitc, rtol=5e-3)  # alpha -> 1: FITC
    np.testing.assert_allclose(v_lo, vardtc, rtol=5e-3)  # alpha -> 0: VarDTC
    # and exact equality at alpha == 1
    pep_one = dataclasses.replace(pep_hi, pep_alpha=1.0)
    np.testing.assert_allclose(float(pep_one.log_marginal_likelihood()), fitc, rtol=1e-10)
