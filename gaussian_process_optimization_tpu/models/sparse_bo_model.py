"""Sparse-GP BO surrogate (GPyOpt model_type='sparseGP': arguments_manager.py:80
routes to GPModel(sparse=True, num_inducing), gpmodel.py:66-69 uses
GPy.models.SparseGPRegression)."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import config
from ..kernels.stationary import Matern52
from ..utils.transforms import Logistic
from .bo_models import BOModel, _bucket
from .fit import Fitter
from .sparse import SparseGPRegression


@jax.jit
def _sparse_inference_device(m):
    # jitted per-refit posterior factorization (see bo_models._inference_device)
    return m.inference_state()


class SparseGPModel(BOModel):
    analytical_gradient_prediction = True

    def __init__(self, kernel=None, noise_var=None, exact_feval=False,
                 optimizer="lbfgs", max_iters=1000, optimize_restarts=5,
                 num_inducing=10, verbose=False, ARD=False, inference="vardtc", seed=0):
        self.kernel_template = kernel
        self.noise_var = noise_var
        self.exact_feval = exact_feval
        self.max_iters = max_iters
        self.optimize_restarts = optimize_restarts
        self.num_inducing = num_inducing
        self.verbose = verbose
        self.ARD = ARD
        self.inference = inference
        self.model: SparseGPRegression | None = None
        self.posterior = None
        self._fitters = {}
        self._key = jax.random.PRNGKey(seed)

    def updateModel(self, X_all, Y_all, X_new=None, Y_new=None):
        X_all = np.atleast_2d(np.asarray(X_all, dtype=float))
        Y_all = np.asarray(Y_all, dtype=float).reshape(len(X_all), -1)
        bucket = _bucket(X_all.shape[0])
        if self.model is None:
            noise = self.noise_var if self.noise_var is not None else float(np.var(Y_all)) * 0.01
            noise = 1e-6 if self.exact_feval else noise
            kern = self.kernel_template or Matern52.create(X_all.shape[1], ARD=self.ARD)
            self.model = SparseGPRegression.create(
                X_all, Y_all, kernel=kern, num_inducing=min(self.num_inducing, len(X_all)),
                noise_var=noise, inference=self.inference, max_points=bucket,
            )
        else:
            self.model = self.model.with_data(X_all, Y_all, max_points=bucket)
        if bucket not in self._fitters:
            if self.exact_feval:
                fix, overrides = ("likelihood_variance",), None
            else:
                fix, overrides = (), {"likelihood_variance": Logistic(lo=1e-9, hi=1e6)}
            self._fitters[bucket] = Fitter(
                self.model, num_restarts=self.optimize_restarts,
                maxiter=self.max_iters, fix=fix, transform_overrides=overrides,
            )
        self._key, sub = jax.random.split(self._key)
        self.model, _ = self._fitters[bucket](self.model, sub)
        self.posterior = _sparse_inference_device(self.model)
        self._fmin = None

    def predict(self, X):
        from .bo_models import _predict_mean_std

        mu, s = _predict_mean_std(self.model, self.posterior,
                                  jnp.asarray(np.atleast_2d(X), dtype=float),
                                  config.variance_floor)
        return np.asarray(mu), np.asarray(s)

    def predict_withGradients(self, X):
        from .bo_models import _predict_with_gradients

        X = jnp.asarray(np.atleast_2d(X), dtype=float)
        mu, s, dm, ds = _predict_with_gradients(self.model, self.posterior, X,
                                                config.variance_floor)
        return np.asarray(mu), np.asarray(s), np.asarray(dm), np.asarray(ds)

    def get_fmin(self):
        if getattr(self, "_fmin", None) is None:
            from .bo_models import _fmin_device

            self._fmin = float(_fmin_device(self.model, self.posterior))
        return self._fmin

    def Y_min(self):
        Y = np.asarray(self.model.Y)
        if self.model.mask is not None:
            Y = Y[np.asarray(self.model.mask) > 0]
        return float(Y.min())

    def get_model_parameters(self):
        leaves = jax.tree_util.tree_leaves((self.model.kern, self.model.likelihood_variance))
        return np.atleast_2d(np.concatenate([np.ravel(np.asarray(l)) for l in leaves]))

    def get_model_parameters_names(self):
        from .parameters import _leaf_names

        return _leaf_names((self.model.kern, self.model.likelihood_variance))

    def device_state(self):
        return self.model, self.posterior, jnp.asarray(self.get_fmin())
