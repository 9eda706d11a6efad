"""SymbolicKernel (GPy kern/src/symbolic.py): user-expression covariance with
autodiff in place of sympy derivatives. Consistency: an RBF written as an
expression must match the built-in RBF in values AND hyperparameter gradients,
and must fit inside GPRegression."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gaussian_process_optimization_tpu.kernels as kern


def _rbf_expr(x, z, p):
    r2 = jnp.sum(jnp.square((x - z) / p["lengthscale"]))
    return p["variance"] * jnp.exp(-0.5 * r2)


def test_symbolic_matches_builtin_rbf(rng):
    X = rng.uniform(-2, 2, (9, 3))
    k_sym = kern.SymbolicKernel.create(
        3, _rbf_expr, params={"variance": 1.3, "lengthscale": 0.8})
    k_ref = kern.RBF.create(3, variance=1.3, lengthscale=0.8)
    np.testing.assert_allclose(np.asarray(k_sym.K(jnp.asarray(X))),
                               np.asarray(k_ref.K(jnp.asarray(X))), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(k_sym.Kdiag(jnp.asarray(X))),
                               np.asarray(k_ref.Kdiag(jnp.asarray(X))),
                               rtol=1e-12)

    # hyperparameter gradients agree (autodiff == "symbolic" differentiation)
    def tr_sym(v, l):
        k = kern.SymbolicKernel.create(
            3, _rbf_expr, params={"variance": v, "lengthscale": l})
        return jnp.sum(k.K(jnp.asarray(X)))

    def tr_ref(v, l):
        k = kern.RBF.create(3, variance=v, lengthscale=l)
        return jnp.sum(k.K(jnp.asarray(X)))

    gs = jax.grad(tr_sym, argnums=(0, 1))(1.3, 0.8)
    gr = jax.grad(tr_ref, argnums=(0, 1))(1.3, 0.8)
    for a, b in zip(gs, gr):
        np.testing.assert_allclose(float(a), float(b), rtol=1e-9)


def test_symbolic_kernel_fits_in_gp(rng):
    from gaussian_process_optimization_tpu.models import fit as fit_mod
    from gaussian_process_optimization_tpu.models.gp import GPRegression

    X = np.sort(rng.uniform(0, 4, 20))[:, None]
    Y = np.sin(X) + 0.1 * rng.standard_normal((20, 1))
    k = kern.SymbolicKernel.create(
        1, _rbf_expr, params={"variance": 1.0, "lengthscale": 1.0})
    m = GPRegression.create(X, Y, kernel=k, noise_var=0.2)
    before = float(m.log_marginal_likelihood())
    fitted, _ = fit_mod.fit(m, num_restarts=1, maxiter=60)
    assert float(fitted.log_marginal_likelihood()) > before


def test_from_sympy():
    """With sympy available, a sympy RBF expression lambdified to jnp matches
    the built-in (the reference's actual usage mode, symbolic.py:8)."""
    sympy = pytest.importorskip("sympy")
    x1, z1, v, l = sympy.symbols("x1 z1 v l")
    expr = v * sympy.exp(-((x1 - z1) ** 2) / (2 * l ** 2))
    k = kern.SymbolicKernel.from_sympy(1, expr, [x1], [z1], [v, l],
                                       params={"v": 1.3, "l": 0.8})
    rng = np.random.default_rng(0)
    X = rng.uniform(-1, 1, (6, 1))
    k_ref = kern.RBF.create(1, variance=1.3, lengthscale=0.8)
    np.testing.assert_allclose(np.asarray(k.K(jnp.asarray(X))),
                               np.asarray(k_ref.K(jnp.asarray(X))),
                               rtol=1e-12)
