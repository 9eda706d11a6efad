"""Small model-zoo wrappers completing GPy's models/ directory parity:

- GPHeteroscedasticRegression (gp_heteroscedastic_regression.py:11) — exact GP
  with one trainable noise variance per datum.
- GPKroneckerGaussianRegression (gp_kronecker_gaussian_regression.py, Stegle et
  al. 2011) — matrix-variate GP with K = kron(K2, K1) + iid noise; delegates to
  the general Kronecker grid model (models/gp_grid.py), which implements the
  same eigendecomposition algebra for any number of factors.
- GPVariationalGaussianApproximation (gp_var_gauss.py:10) — KL-variational
  Gaussian inference (models/var_gauss.py) behind a model facade.
- OneVsAllClassification (one_vs_all_classification.py:8) — a probit EP
  classifier per class.
- SparseGPLVM (sparse_gplvm.py:9) — point-estimate GPLVM with inducing-point
  (VarDTC) inference: the sparse bound optimized over hyperparameters AND X.
- GPOffsetRegression (gp_offset_regression.py:11) — per-cluster input offsets
  (last X column = cluster index), offsets trainable through the LML by
  autodiff (the reference hand-derives dr/doffset).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..kernels.stationary import RBF
from ..utils.pytree import pytree_dataclass, static_field
from .gp import GPRegression
from .gp_grid import GPGridRegression


def GPHeteroscedasticRegression(X, Y, kernel=None, noise_vars=None):
    """Exact GP with per-datum noise (gp_heteroscedastic_regression.py:11):
    GPRegression already accepts a vector likelihood_variance; this wrapper
    fixes the construction defaults (one noise per row, init 1.0)."""
    X = np.atleast_2d(np.asarray(X, dtype=float))
    n = X.shape[0]
    if noise_vars is None:
        noise_vars = np.ones(n)
    kernel = kernel or RBF.create(X.shape[1])
    return GPRegression.create(X, Y, kernel=kernel, noise_var=np.asarray(noise_vars))


def GPKroneckerGaussianRegression(X1, X2, Y, kern1, kern2, noise_var=1.0):
    """K = kron(K2, K1) + s2 I over the X1 x X2 grid
    (gp_kronecker_gaussian_regression.py; Y[i, j] = y(X1[i], X2[j]))."""
    return GPGridRegression.create([X1, X2], Y, kernels=[kern1, kern2],
                                   noise_var=noise_var)


@pytree_dataclass
class GPVariationalGaussianApproximation:
    """KL-variational Gaussian model facade (gp_var_gauss.py:10) over
    models/var_gauss.py (Opper & Archambeau 2009)."""

    kern: object = None
    X: jnp.ndarray = None
    Y: jnp.ndarray = None
    likelihood: object = None

    @classmethod
    def create(cls, X, Y, kernel=None, likelihood=None):
        from .likelihoods import GaussianLik

        X = jnp.atleast_2d(jnp.asarray(X, dtype=float))
        Y = jnp.asarray(Y, dtype=float).reshape(-1)
        return cls(kern=kernel or RBF.create(X.shape[1]), X=X, Y=Y,
                   likelihood=likelihood or GaussianLik.create(1.0))

    def inference(self, maxiter=200):
        from .var_gauss import vargauss_inference

        K = self.kern.K(self.X)
        return vargauss_inference(K, self.Y, self.likelihood, maxiter=maxiter)

    def log_marginal_likelihood(self):
        return self.inference().elbo

    def predict_latent(self, Xnew, posterior=None):
        from .var_gauss import vargauss_predict

        post = posterior if posterior is not None else self.inference()
        K = self.kern.K(self.X)
        Ks = self.kern.K(self.X, jnp.atleast_2d(Xnew))
        kss = self.kern.Kdiag(jnp.atleast_2d(Xnew))
        return vargauss_predict(K, Ks, kss, post)


class OneVsAllClassification:
    """One probit EP classifier per class (one_vs_all_classification.py:8)."""

    def __init__(self, X, Y, kernel=None, **kw):
        from .classification import GPClassification

        Y = np.asarray(Y).reshape(-1)
        self.classes_ = np.unique(Y)
        self.models = {}
        for c in self.classes_:
            yc = np.where(Y == c, 1.0, -1.0)
            self.models[c] = GPClassification.create(
                X, yc, kernel=kernel or RBF.create(np.atleast_2d(X).shape[1]), **kw
            )

    def predict_proba(self, Xnew):
        """(n, n_classes) normalized one-vs-all probabilities."""
        ps = np.column_stack(
            [np.asarray(self.models[c].predict(Xnew)) for c in self.classes_]
        )
        return ps / ps.sum(axis=1, keepdims=True)

    def predict(self, Xnew):
        return self.classes_[np.argmax(self.predict_proba(Xnew), axis=1)]


class OneVsAllSparseClassification:
    """Sparse (EPDTC) one-vs-all (one_vs_all_sparse_classification.py:8)."""

    def __init__(self, X, Y, kernel=None, num_inducing=10, **kw):
        from .classification import SparseGPClassification

        Y = np.asarray(Y).reshape(-1)
        self.classes_ = np.unique(Y)
        self.models = {}
        for c in self.classes_:
            yc = np.where(Y == c, 1.0, -1.0)
            self.models[c] = SparseGPClassification.create(
                X, yc, kernel=kernel or RBF.create(np.atleast_2d(X).shape[1]),
                num_inducing=num_inducing, **kw
            )

    def predict_proba(self, Xnew):
        ps = np.column_stack(
            [np.asarray(self.models[c].predict(Xnew)) for c in self.classes_]
        )
        return ps / ps.sum(axis=1, keepdims=True)

    def predict(self, Xnew):
        return self.classes_[np.argmax(self.predict_proba(Xnew), axis=1)]


def fit_bcgplvm(Y, input_dim, mapping=None, kernel=None, noise_var=0.1,
                maxiter=300, hidden_dim=5, seed=0):
    """Back-constrained GPLVM (GPy models/bcgplvm.py:10): the latents are a
    parametric function of the data, X = g(Y), and the MAPPING's parameters are
    optimized through the GP LML (preserves local distances; Lawrence &
    Quinonero-Candela 2006). Default mapping: one-hidden-layer MLP."""
    from ..ops import lbfgs
    from ..utils.packing import Packer
    from ..utils.transforms import IDENTITY, POSITIVE
    from .mean_functions import MLPMapping
    from .parameters import DATA_NAMES, POSITIVE_NAMES, _leaf_names

    Y = np.asarray(Y, dtype=float)
    Yc = Y - Y.mean(0)
    mapping = mapping or MLPMapping.create(Y.shape[1], input_dim,
                                           hidden_dim=hidden_dim, seed=seed)
    kernel = kernel or RBF.create(input_dim, ARD=True)
    base = GPRegression.create(np.zeros((Y.shape[0], input_dim)), Yc,
                               kernel=kernel, noise_var=noise_var)

    carrier = {"map": mapping, "gp": base}
    names = _leaf_names(carrier)
    transforms = [POSITIVE if nm in POSITIVE_NAMES else IDENTITY for nm in names]
    fixed = [nm in DATA_NAMES for nm in names]  # gp.X fixed (recomputed), Y fixed
    packer = Packer(carrier, transforms=transforms, fixed=fixed)
    Yj = jnp.asarray(Yc)

    def obj(u):
        c = packer.unpack(u, reference=carrier)
        X = c["map"].f(Yj)
        gp = GPRegression(
            kern=c["gp"].kern, likelihood_variance=c["gp"].likelihood_variance,
            X=X, Y=c["gp"].Y, mask=None, mean_function=None, normalizer=None,
        )
        return -gp.log_marginal_likelihood()

    res = lbfgs.minimize(obj, packer.pack(carrier), maxiter=maxiter)
    fitted = packer.unpack(res.x, reference=carrier)
    X_final = fitted["map"].f(Yj)
    gp = GPRegression(
        kern=fitted["gp"].kern,
        likelihood_variance=fitted["gp"].likelihood_variance,
        X=X_final, Y=fitted["gp"].Y, mask=None, mean_function=None,
        normalizer=None,
    )
    return gp, fitted["map"], res


def fit_sparse_gplvm(Y, input_dim, num_inducing=10, kernel=None, noise_var=0.1,
                     maxiter=300, seed=0):
    """Point-estimate sparse GPLVM (sparse_gplvm.py:9): the VarDTC collapsed
    bound optimized over hyperparameters, Z, AND the latent X (PCA init)."""
    from ..ops import lbfgs
    from ..utils.packing import Packer
    from ..utils.transforms import IDENTITY, POSITIVE
    from .fit import make_objective
    from .parameters import DATA_NAMES, POSITIVE_NAMES, _leaf_names
    from .sparse import SparseGPRegression

    Y = np.asarray(Y, dtype=float)
    n = Y.shape[0]
    Yc = Y - Y.mean(0)
    _, _, Vt = np.linalg.svd(Yc, full_matrices=False)
    X0 = Yc @ Vt[:input_dim].T
    X0 /= X0.std(0) + 1e-9
    model = SparseGPRegression.create(
        X0, Yc, kernel=kernel or RBF.create(input_dim, ARD=True),
        num_inducing=num_inducing, noise_var=noise_var, seed=seed,
    )
    names = _leaf_names(model)
    transforms = [POSITIVE if nm in POSITIVE_NAMES else IDENTITY for nm in names]
    fixed = [nm in (DATA_NAMES - {"X"}) for nm in names]  # X trainable
    packer = Packer(model, transforms=transforms, fixed=fixed)
    obj = make_objective(packer)
    res = lbfgs.minimize(lambda u: obj(u, model), packer.pack(model),
                         maxiter=maxiter)
    return packer.unpack(res.x, reference=model), res


@pytree_dataclass
class GPOffsetRegression:
    """Per-cluster input offsets (gp_offset_regression.py:11): the last X column
    indexes a cluster; cluster c's inputs are shifted by a trainable offset[c]
    (offset[0] == 0) before the kernel. Offsets train through the LML by
    autodiff."""

    kern: object = None
    likelihood_variance: jnp.ndarray = None
    offset: jnp.ndarray = None  # (num_clusters - 1,)
    X: jnp.ndarray = None  # (N, D) actual inputs (index column removed)
    sel: jnp.ndarray = None  # (N,) int cluster index
    Y: jnp.ndarray = None

    @classmethod
    def create(cls, X, Y, kernel=None, noise_var=1.0):
        X = np.atleast_2d(np.asarray(X, dtype=float))
        assert X.shape[1] > 1, "last X column must be the cluster index"
        sel = X[:, -1].astype(int)
        Xb = X[:, :-1]
        Y = np.asarray(Y, dtype=float)
        if Y.ndim == 1:
            Y = Y[:, None]
        kernel = kernel or RBF.create(Xb.shape[1])
        return cls(
            kern=kernel,
            likelihood_variance=jnp.asarray(noise_var, dtype=float).reshape(()),
            offset=jnp.zeros((int(sel.max()),)),
            X=jnp.asarray(Xb), sel=jnp.asarray(sel), Y=jnp.asarray(Y),
        )

    def _shifted(self):
        full = jnp.concatenate([jnp.zeros((1,), self.offset.dtype), self.offset])
        return self.X + full[self.sel][:, None]

    def _gp(self):
        Xs = self._shifted()
        return GPRegression(
            kern=self.kern, likelihood_variance=self.likelihood_variance,
            X=Xs, Y=self.Y, mask=None, normalizer=None, mean_function=None,
        )

    def log_marginal_likelihood(self):
        return self._gp().log_marginal_likelihood()

    def predict(self, Xnew, cluster=0):
        Xnew = jnp.atleast_2d(jnp.asarray(Xnew, dtype=float))
        full = jnp.concatenate([jnp.zeros((1,), self.offset.dtype), self.offset])
        Xs = Xnew + full[cluster]
        return self._gp().predict(Xs)

    def optimize(self, maxiter=100):
        from ..ops import lbfgs
        from .fit import make_objective
        from .parameters import make_packer

        packer = make_packer(self, fix=("sel",))
        obj = make_objective(packer)
        res = lbfgs.minimize(lambda u: obj(u, self), packer.pack(self),
                             maxiter=maxiter)
        return packer.unpack(res.x, reference=self), res
