"""Sparse GP and SVGP tests, mirroring the reference genres (GPy model_tests /
svgp_tests): bound <= exact LML, bound tightness when Z=X, predict sanity, SVGP
ELBO training improvement and agreement with exact GP on small data."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gaussian_process_optimization_tpu.kernels as kern
from gaussian_process_optimization_tpu.models import fit as fit_mod
from gaussian_process_optimization_tpu.models.gp import GPRegression
from gaussian_process_optimization_tpu.models.sparse import SparseGPRegression
from gaussian_process_optimization_tpu.models.svgp import SVGP, fit_svgp


@pytest.fixture
def data(rng):
    X = rng.uniform(-3, 3, size=(60, 1))
    Y = np.sin(X) + 0.1 * rng.standard_normal((60, 1))
    return X, Y


def test_vardtc_bound_below_exact_and_tight_at_Z_eq_X(data):
    X, Y = data
    k = kern.RBF.create(1, variance=1.0, lengthscale=1.0)
    exact = GPRegression.create(X, Y, kernel=k, noise_var=0.05)
    lml_exact = float(exact.log_marginal_likelihood())

    sparse = SparseGPRegression.create(X, Y, kernel=k, num_inducing=15, noise_var=0.05)
    bound = float(sparse.log_marginal_likelihood())
    assert bound <= lml_exact + 1e-6  # it is a lower bound

    # Z = X makes the Titsias bound tight (trace term -> 0, Q = K)
    tight = SparseGPRegression.create(X, Y, kernel=k, Z=X, noise_var=0.05)
    bound_tight = float(tight.log_marginal_likelihood())
    np.testing.assert_allclose(bound_tight, lml_exact, rtol=1e-4)


def test_dtc_fitc_variants(data):
    X, Y = data
    k = kern.RBF.create(1)
    for inf in ["dtc", "fitc"]:
        m = SparseGPRegression.create(X, Y, kernel=k, num_inducing=12, noise_var=0.05,
                                      inference=inf)
        lml = float(m.log_marginal_likelihood())
        assert np.isfinite(lml)
        mu, v = m.predict(jnp.asarray(X[:5]))
        assert np.all(np.isfinite(np.asarray(mu))) and np.all(np.asarray(v) > 0)


def test_sparse_predict_close_to_exact(data):
    X, Y = data
    k = kern.RBF.create(1, variance=1.0, lengthscale=1.0)
    Xs = np.linspace(-3, 3, 11)[:, None]
    exact = GPRegression.create(X, Y, kernel=k, noise_var=0.05)
    mu_e, v_e = exact.predict(jnp.asarray(Xs))
    sparse = SparseGPRegression.create(X, Y, kernel=k, Z=X[::2], noise_var=0.05)
    mu_s, v_s = sparse.predict(jnp.asarray(Xs))
    np.testing.assert_allclose(np.asarray(mu_s), np.asarray(mu_e), atol=0.05)
    np.testing.assert_allclose(np.asarray(v_s), np.asarray(v_e), atol=0.05)


def test_sparse_fit_trains_Z_and_hypers(data):
    X, Y = data
    m = SparseGPRegression.create(X, Y, kernel=kern.RBF.create(1), num_inducing=10,
                                  noise_var=0.5)
    lml0 = float(m.log_marginal_likelihood())
    fitted, _ = fit_mod.fit(m, num_restarts=1, maxiter=150, key=jax.random.PRNGKey(0))
    lml1 = float(fitted.log_marginal_likelihood())
    assert lml1 > lml0 + 1.0
    # Z must have moved (it is trainable, GPy sparse_gp.py)
    assert not np.allclose(np.asarray(fitted.Z), np.asarray(m.Z))


def test_sparse_padding_invariance(data):
    X, Y = data
    k = kern.RBF.create(1)
    a = SparseGPRegression.create(X, Y, kernel=k, Z=X[::4], noise_var=0.05)
    b = SparseGPRegression.create(X, Y, kernel=k, Z=X[::4], noise_var=0.05, max_points=80)
    np.testing.assert_allclose(
        float(a.log_marginal_likelihood()), float(b.log_marginal_likelihood()), rtol=1e-8
    )
    Xs = np.linspace(-2, 2, 5)[:, None]
    np.testing.assert_allclose(
        np.asarray(a.predict(jnp.asarray(Xs))[0]),
        np.asarray(b.predict(jnp.asarray(Xs))[0]), rtol=1e-8,
    )


def test_svgp_elbo_below_exact_and_training_improves(data):
    X, Y = data
    k = kern.RBF.create(1, variance=1.0, lengthscale=1.0)
    exact = GPRegression.create(X, Y, kernel=k, noise_var=0.05)
    lml_exact = float(exact.log_marginal_likelihood())

    m = SVGP.create(X, Y, kernel=k, num_inducing=20, noise_var=0.05)
    elbo0 = float(m.elbo(jnp.asarray(X), jnp.asarray(Y)))
    assert elbo0 <= lml_exact

    fitted, losses = fit_svgp(m, X, Y, num_steps=300, batch_size=30,
                              learning_rate=5e-2, key=jax.random.PRNGKey(0))
    elbo1 = float(fitted.elbo(jnp.asarray(X), jnp.asarray(Y)))
    assert elbo1 > elbo0 + 5.0
    # still a lower bound on the exact LML *at the fitted hyperparameters*
    exact_at_fitted = GPRegression.create(
        X, Y, kernel=fitted.kern, noise_var=float(fitted.likelihood_variance)
    )
    assert elbo1 <= float(exact_at_fitted.log_marginal_likelihood()) + 1e-3

    mu, v = fitted.predict(jnp.asarray(X[:10]))
    mu_e, v_e = exact.predict(jnp.asarray(X[:10]))
    np.testing.assert_allclose(np.asarray(mu), np.asarray(mu_e), atol=0.3)


def test_choleskies_roundtrip(rng):
    from gaussian_process_optimization_tpu.ops import choleskies

    m, p = 6, 2
    Ls = np.tril(rng.standard_normal((p, m, m)))
    flat = choleskies.triang_to_flat(jnp.asarray(Ls))
    assert flat.shape == (m * (m + 1) // 2, p)
    back = choleskies.flat_to_triang(flat, m)
    np.testing.assert_allclose(np.asarray(back), Ls)

    # backprop_gradient vs autodiff through cholesky
    A = rng.standard_normal((m, m))
    A = A @ A.T + m * np.eye(m)
    L = np.linalg.cholesky(A)
    dL = np.tril(rng.standard_normal((m, m)))
    g1 = choleskies.backprop_gradient(jnp.asarray(dL), jnp.asarray(L))
    g2 = jax.grad(lambda a: jnp.sum(jnp.linalg.cholesky(a) * dL))(jnp.asarray(A))
    np.testing.assert_allclose(np.asarray(g1), np.asarray(0.5 * (g2 + g2.T)), rtol=1e-8, atol=1e-10)


def test_vardtc_missing_data(rng):
    """Missing-data bound == sum of per-output VarDTC bounds on the observed subsets
    (with shared Z), GPy vardtc_md semantics."""
    X = rng.uniform(-3, 3, size=(30, 1))
    Y = np.hstack([np.sin(X), np.cos(X)]) + 0.05 * rng.standard_normal((30, 2))
    mask = np.ones((30, 2))
    mask[::3, 0] = 0  # output 0 misses every 3rd row
    mask[1::4, 1] = 0
    k = kern.RBF.create(1, variance=1.0, lengthscale=1.0)
    Z = X[::4]
    m = SparseGPRegression.create(X, Y, kernel=k, Z=Z, noise_var=0.05)
    val = float(m.missing_data_lml(mask))

    ref = 0.0
    for p in range(2):
        rows = mask[:, p] > 0
        mp = SparseGPRegression.create(X[rows], Y[rows, p], kernel=k, Z=Z,
                                       noise_var=0.05)
        ref += float(mp.log_marginal_likelihood())
    np.testing.assert_allclose(val, ref, rtol=1e-8)


def test_kmm_init(rng):
    """kmm_init (GPy util/misc.py:96): returns m rows of X and, with
    distance-squared sampling, reliably covers well-separated clusters
    (a plain random subset of 3 from 90 points misses one cluster ~30% of
    the time; note the faithful quirk — sampling may re-pick a point, so
    no min-pairwise-distance guarantee exists)."""
    import numpy as np
    from gaussian_process_optimization_tpu.models.sparse import kmm_init

    X = np.vstack([rng.normal(c, 0.05, (30, 2)) for c in (-3, 0, 3)])
    Z = kmm_init(X, m=6, rng=np.random.default_rng(0))
    assert Z.shape == (6, 2)
    # every row is an actual data row
    d = np.linalg.norm(Z[:, None, :] - X[None], axis=-1).min(1)
    np.testing.assert_allclose(d, 0, atol=1e-12)

    def clusters_hit(A):
        return len(set(np.round(A[:, 0] / 3).astype(int).tolist()))

    r = np.random.default_rng(1)
    hits = [clusters_hit(kmm_init(X, 6, rng=r)) for _ in range(30)]
    assert np.mean(hits) > 2.5, hits
