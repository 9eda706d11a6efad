"""KL variational Gaussian inference tests: exactness for Gaussian likelihoods, and
agreement with EP/Laplace for probit classification."""
import jax.numpy as jnp
import numpy as np
import pytest

import gaussian_process_optimization_tpu.kernels as kern
from gaussian_process_optimization_tpu.models import likelihoods as lik
from gaussian_process_optimization_tpu.models.gp import GPRegression
from gaussian_process_optimization_tpu.models.var_gauss import (
    vargauss_inference,
    vargauss_predict,
)


def test_vargauss_exact_for_gaussian(rng):
    """With a Gaussian likelihood the variational family contains the true posterior,
    so the optimized ELBO equals the exact LML."""
    X = rng.uniform(-2, 2, size=(15, 1))
    Y = np.sin(X[:, 0]) + 0.1 * rng.standard_normal(15)
    k = kern.RBF.create(1, variance=1.0, lengthscale=0.8)
    noise = 0.1
    K = k.K(jnp.asarray(X))
    post = vargauss_inference(K, jnp.asarray(Y), lik.GaussianLik.create(noise),
                              maxiter=400)
    exact = GPRegression.create(X, Y[:, None], kernel=k, noise_var=noise)
    lml = float(exact.log_marginal_likelihood())
    np.testing.assert_allclose(float(post.elbo), lml, rtol=2e-3)


def test_vargauss_classification_matches_laplace(rng):
    from gaussian_process_optimization_tpu.models.laplace import GPClassification

    X = np.concatenate([rng.uniform(-2, -0.3, 15), rng.uniform(0.3, 2, 15)])[:, None]
    y01 = (X[:, 0] > 0).astype(float)
    k = kern.RBF.create(1, variance=3.0, lengthscale=1.0)
    K = k.K(jnp.asarray(X))
    post = vargauss_inference(K, jnp.asarray(y01), lik.Bernoulli(), maxiter=300)
    Xs = np.array([[-1.5], [1.5]])
    Ks = k.K(jnp.asarray(X), jnp.asarray(Xs))
    mu, var = vargauss_predict(K, Ks, k.Kdiag(jnp.asarray(Xs)), post)
    # class separation with finite variance
    assert float(mu[0]) < -0.5 and float(mu[1]) > 0.5
    # latent means close to the Laplace fit
    mlap = GPClassification.create(X, y01, kernel=k)
    mu_l, _ = mlap.predict_latent(jnp.asarray(Xs))
    np.testing.assert_allclose(np.asarray(mu), np.asarray(mu_l), atol=0.5)
