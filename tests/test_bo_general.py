"""GPyOpt util/general.py helper tail (general.py:49-230)."""
import numpy as np
import jax
import pytest

import gaussian_process_optimization_tpu.kernels as kern
from gaussian_process_optimization_tpu.bo import general as g
from gaussian_process_optimization_tpu.bo.acquisitions import AcquisitionEI
from gaussian_process_optimization_tpu.bo.space import DesignSpace
from gaussian_process_optimization_tpu.models.bo_models import GPModel


def test_best_value_and_guess():
    Y = np.asarray([3.0, 1.0, 2.0, 0.5, 4.0])
    np.testing.assert_allclose(g.best_value(Y), [3, 1, 1, 0.5, 0.5])
    np.testing.assert_allclose(g.best_value(Y, sign=-1), [3, 3, 3, 3, 4])
    np.testing.assert_allclose(g.best_guess(lambda X: X[:, 0] ** 2,
                                            np.asarray([[2.], [-1.], [3.]])),
                               [4, 1, 1])


def test_reshape_and_uniform():
    assert g.reshape([1.0, 2.0], 2).shape == (1, 2)
    assert g.reshape(np.zeros((3, 2)), 2).shape == (3, 2)
    S = g.samples_multidimensional_uniform([(-1, 1), (5, 6)], 200,
                                           rng=np.random.default_rng(0))
    assert S.shape == (200, 2)
    assert S[:, 0].min() >= -1 and S[:, 0].max() <= 1
    assert S[:, 1].min() >= 5 and S[:, 1].max() <= 6


def test_values_to_array_and_merge():
    np.testing.assert_allclose(g.values_to_array((1, 2, 3)), [[1], [2], [3]])
    np.testing.assert_allclose(g.values_to_array(4.0), [[4.0]])
    m = g.merge_values((1, 2), (10, 20))
    np.testing.assert_allclose(m, [[1, 10], [1, 20], [2, 10], [2, 20]])


def test_normalize():
    Y = np.asarray([1.0, 2.0, 3.0, 4.0])
    s = g.normalize(Y)
    np.testing.assert_allclose(s.mean(), 0, atol=1e-12)
    np.testing.assert_allclose(s.std(), 1, atol=1e-12)
    mm = g.normalize(Y, "maxmin")
    np.testing.assert_allclose([mm.min(), mm.max()], [0, 1])
    with pytest.raises(ValueError):
        g.normalize(Y, "bogus")
    with pytest.raises(NotImplementedError):
        g.normalize(np.zeros((2, 2)))


def test_get_moments_and_d_moments(rng):
    X = rng.uniform(-2, 2, (20, 2))
    Y = np.sin(X[:, :1])
    wrapper = GPModel(kernel=kern.RBF.create(2), exact_feval=True,
                      optimize_restarts=1, max_iters=50)
    wrapper.updateModel(X, Y, None, None)
    x = np.asarray([0.3, -0.7])
    m, s, fmin = g.get_moments(wrapper, x)
    mu, sd = wrapper.predict(x.reshape(1, -1))
    np.testing.assert_allclose(m, np.asarray(mu), rtol=1e-7)
    np.testing.assert_allclose(s, np.asarray(sd), rtol=1e-7)
    assert fmin == pytest.approx(wrapper.get_fmin(), rel=1e-7)
    dmdx, dsdx = g.get_d_moments(wrapper, x)
    # FD twin on the sd gradient (general.py:110: dsdx = dvdx / (2 s))
    eps = 1e-4
    for d in range(2):
        dx = np.zeros((1, 2)); dx[0, d] = eps
        _, sp = wrapper.predict(x.reshape(1, -1) + dx)
        _, sm = wrapper.predict(x.reshape(1, -1) - dx)
        fd = (np.asarray(sp) - np.asarray(sm)) / (2 * eps)
        np.testing.assert_allclose(dsdx[0, d], fd.ravel()[0], rtol=2e-3, atol=1e-7)


def test_integrated_acquisition_delegates(rng):
    X = rng.uniform(-2, 2, (15, 1))
    Y = np.sin(X)
    wrapper = GPModel(kernel=kern.RBF.create(1), exact_feval=True,
                      optimize_restarts=1, max_iters=30)
    wrapper.updateModel(X, Y, None, None)
    space = DesignSpace([{"name": "x", "type": "continuous", "domain": (-2, 2)}])
    acq = AcquisitionEI(wrapper, space)
    x = np.asarray([[0.1], [0.5]])
    np.testing.assert_allclose(
        np.asarray(g.compute_integrated_acquisition(acq, x)),
        np.asarray(acq.acquisition_function(x)))
    a, da = g.compute_integrated_acquisition_withGradients(acq, x)
    a2, da2 = acq.acquisition_function_withGradients(x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(a2))
    np.testing.assert_allclose(np.asarray(da), np.asarray(da2))


def test_objective_tail_values():
    """Reference-formula spot checks for the round-4 objective tail
    (experiments2d.py beale:79/dropwave:110/cosines:141/powers:333,
    experimentsNd.py alpine2:39)."""
    import numpy as np

    from gaussian_process_optimization_tpu.bo import objectives as obj

    x = np.array([[0.3, -0.4]])
    # beale (reference body = negated Rosenbrock)
    np.testing.assert_allclose(
        float(obj.beale(x)[0, 0]),
        -(100 * (-0.4 - 0.09) ** 2 + (0.3 - 1) ** 2), rtol=1e-6)
    # dropwave (reference returns the positive well)
    r2 = 0.09 + 0.16
    np.testing.assert_allclose(
        float(obj.dropwave(x)[0, 0]),
        (1 + np.cos(12 * np.sqrt(r2))) / (0.5 * r2 + 2), rtol=1e-6)
    # cosines: value at the reference's minimizer equals its fmin (:152-153)
    np.testing.assert_allclose(
        float(obj.cosines(obj.cosines.xmin)[0, 0]), obj.cosines.fmin, atol=1e-6)
    # powers
    np.testing.assert_allclose(float(obj.powers(x)[0, 0]),
                               0.3**2 + 0.4**3, rtol=1e-6)
    # alpine2: fmin = -2.808^d at x ~= 7.917 per dim (experimentsNd.py:53)
    d = 3
    xa = np.full((1, d), 7.917)
    np.testing.assert_allclose(float(obj.alpine2(xa)[0, 0]),
                               -2.808**d, rtol=1e-3)
    # dropwave's recorded minimizer achieves its fmin
    np.testing.assert_allclose(
        float(obj.dropwave(obj.dropwave.xmin)[0, 0]), obj.dropwave.fmin,
        atol=1e-9)


def test_updatemodel_posterior_rung_verified_minimal(rng):
    """While GPModel fits with jitter_greedy=True (line-search trials accept
    the first rung that factors from the hint), the once-per-refit POSTERIOR
    must factor with the verified minimal-rung ladder and re-anchor the hint
    (ADVICE r4). Duplicated rows + exact_feval(1e-6) force a nonzero rung."""
    from dataclasses import replace

    import jax.numpy as jnp

    X = rng.uniform(-2, 2, (12, 1))
    X = np.vstack([X, X[:6] + 1e-9])  # near-duplicate rows: ill-conditioned K
    Y = np.sin(X)
    wrapper = GPModel(kernel=kern.RBF.create(1), exact_feval=True,
                      optimize_restarts=1, max_iters=20)
    # stale-HIGH hint: greedy fit trials would accept this overshoot as-is
    wrapper.updateModel(X, Y, None, None)
    assert wrapper.model.jitter_greedy is True
    # posterior rung == the verified minimal rung for the fitted params
    verified = replace(wrapper.model, jitter_greedy=False,
                       jitter_hint=jnp.zeros((), jnp.float32)).inference()
    assert int(wrapper.posterior.rung) == int(verified.rung)
    # and the hint was re-anchored to that verified rung
    np.testing.assert_allclose(float(wrapper.model.jitter_hint),
                               float(verified.rung))
    # even seeding a deliberately-overshooting hint, the next refit's
    # posterior descends back to minimal
    wrapper.model = replace(wrapper.model,
                            jitter_hint=jnp.asarray(5.0, jnp.float32))
    wrapper.updateModel(X, Y, None, None)
    verified = replace(wrapper.model, jitter_greedy=False,
                       jitter_hint=jnp.zeros((), jnp.float32)).inference()
    assert int(wrapper.posterior.rung) == int(verified.rung)
