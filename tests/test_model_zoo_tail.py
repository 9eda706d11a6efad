"""Model-zoo tail wrappers (GPy models/: gp_heteroscedastic_regression,
gp_kronecker_gaussian_regression, gp_var_gauss, one_vs_all_classification,
sparse_gplvm, gp_offset_regression)."""
import jax.numpy as jnp
import numpy as np

import gaussian_process_optimization_tpu.kernels as kern
from gaussian_process_optimization_tpu.models import zoo


def test_heteroscedastic_regression(rng):
    X = np.linspace(0, 4, 25)[:, None]
    noise = np.where(X[:, 0] < 2, 0.01, 0.4)
    Y = (np.sin(X[:, 0]) + np.sqrt(noise) * rng.standard_normal(25))[:, None]
    m = zoo.GPHeteroscedasticRegression(X, Y, kernel=kern.RBF.create(1),
                                        noise_vars=noise)
    assert np.isfinite(float(m.log_marginal_likelihood()))
    # predictive noise reflects the per-point variances at train X (explicit
    # noise_at_test — the GPy Y_metadata output_index analog)
    mu, var = m.predict(jnp.asarray(X), noise_at_test=jnp.asarray(noise))
    assert np.asarray(var)[0, 0] < np.asarray(var)[-1, 0]


def test_kronecker_regression_matches_dense(rng):
    """kron(K2, K1) + s2 I == dense GP on the cartesian product."""
    from gaussian_process_optimization_tpu.models.gp import GPRegression

    x1 = np.linspace(0, 1, 5)[:, None]
    x2 = np.linspace(0, 2, 4)[:, None]
    Y = rng.standard_normal((5, 4))
    k1 = kern.RBF.create(1, variance=1.0, lengthscale=0.5)
    k2 = kern.Matern52.create(1, variance=0.8, lengthscale=0.9)
    m = zoo.GPKroneckerGaussianRegression(x1, x2, Y, k1, k2, noise_var=0.1)

    # dense equivalent: product kernel over the grid points
    XX = np.array([[a[0], b[0]] for a in x1 for b in x2])
    kp = kern.Prod(parts=(
        kern.RBF.create(1, variance=1.0, lengthscale=0.5, active_dims=(0,)),
        kern.Matern52.create(1, variance=0.8, lengthscale=0.9, active_dims=(1,)),
    ))
    kp = type(kp)(parts=kp.parts, input_dim=2)
    dense = GPRegression.create(XX, Y.reshape(-1, 1), kernel=kp, noise_var=0.1)
    np.testing.assert_allclose(
        float(m.log_marginal_likelihood()),
        float(dense.log_marginal_likelihood()), rtol=1e-6,
    )


def test_var_gauss_model_facade(rng):
    from gaussian_process_optimization_tpu.models import likelihoods as lik

    X = rng.uniform(-2, 2, (15, 1))
    Y = np.sin(X[:, 0]) + 0.1 * rng.standard_normal(15)
    m = zoo.GPVariationalGaussianApproximation.create(
        X, Y, kernel=kern.RBF.create(1), likelihood=lik.GaussianLik.create(0.05)
    )
    assert np.isfinite(float(m.log_marginal_likelihood()))
    mu, var = m.predict_latent(np.array([[0.0]]))
    assert np.isfinite(float(mu[0])) and float(var[0]) > 0


def test_one_vs_all_classification(rng):
    X = np.concatenate([rng.normal(-2, 0.4, 12), rng.normal(0, 0.4, 12),
                        rng.normal(2, 0.4, 12)])[:, None]
    Y = np.repeat([0, 1, 2], 12)
    clf = zoo.OneVsAllClassification(X, Y, kernel=kern.RBF.create(1, variance=3.0))
    pred = clf.predict(np.array([[-2.0], [0.0], [2.0]]))
    np.testing.assert_array_equal(pred, [0, 1, 2])
    proba = clf.predict_proba(np.array([[-2.0]]))
    np.testing.assert_allclose(proba.sum(), 1.0, rtol=1e-8)


def test_sparse_gplvm_improves_bound(rng):
    t = np.linspace(0, 2 * np.pi, 40)
    latents = np.stack([np.sin(t), np.cos(t)], 1)
    W = rng.standard_normal((2, 5))
    Y = latents @ W + 0.05 * rng.standard_normal((40, 5))
    fitted, res = zoo.fit_sparse_gplvm(Y, input_dim=2, num_inducing=10,
                                       maxiter=100, seed=0)
    assert np.isfinite(float(res.f))
    assert bool(res.num_iters > 0)


def test_bcgplvm_improves_lml(rng):
    t = np.linspace(0, 2 * np.pi, 30)
    Y = np.stack([np.sin(t), np.cos(t), np.sin(2 * t)], 1) \
        + 0.05 * rng.standard_normal((30, 3))
    gp, mapping, res = zoo.fit_bcgplvm(Y, input_dim=2, maxiter=80, seed=0)
    assert np.isfinite(float(res.f))
    # latents come from the mapping and have the requested dimensionality
    X = np.asarray(mapping.f(jnp.asarray(Y - Y.mean(0))))
    assert X.shape == (30, 2)
    assert np.isfinite(float(gp.log_marginal_likelihood()))


def test_one_vs_all_sparse(rng):
    X = np.concatenate([rng.normal(-2, 0.4, 15), rng.normal(2, 0.4, 15)])[:, None]
    Y = np.repeat([0, 1], 15)
    clf = zoo.OneVsAllSparseClassification(
        X, Y, kernel=kern.RBF.create(1, variance=3.0), num_inducing=6)
    pred = clf.predict(np.array([[-2.0], [2.0]]))
    np.testing.assert_array_equal(pred, [0, 1])


def test_gp_offset_regression_recovers_offset(rng):
    """Two clusters of the same function shifted by 0.7: the trainable offset
    must recover ~0.7 (gp_offset_regression.py semantics)."""
    true_offset = 0.7
    x0 = np.sort(rng.uniform(0, 4, 25))
    x1 = np.sort(rng.uniform(0, 4, 25))
    f = lambda x: np.sin(1.5 * x)
    X = np.vstack([
        np.column_stack([x0, np.zeros_like(x0)]),
        np.column_stack([x1, np.ones_like(x1)]),
    ])
    Y = np.concatenate([f(x0), f(x1 + true_offset)])
    Y += 0.02 * rng.standard_normal(Y.shape)
    m = zoo.GPOffsetRegression.create(X, Y, kernel=kern.RBF.create(1),
                                      noise_var=0.01)
    fitted, _ = m.optimize(maxiter=100)
    got = float(fitted.offset[0])
    assert abs(got - true_offset) < 0.15, got
