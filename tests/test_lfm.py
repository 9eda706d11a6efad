"""EQ_ODE1 (first-order latent force model, GPy kern/src/eq_ode1.py): the
closed-form covariances are pinned against NUMERICAL QUADRATURE of the defining
ODE integrals y(t) = w int_0^t e^{-d(t-s)} u(s) ds — the independent-
implementation policy; plus PSD and a GP-regression smoke test."""
import jax.numpy as jnp
import numpy as np
import pytest

from gaussian_process_optimization_tpu.kernels.lfm import EQ_ODE1


def _k_eq(s, sp, l):
    return np.exp(-((s - sp) ** 2) / l**2)


def test_k_fu_matches_quadrature():
    l, d, w = 0.7, 1.3, 1.0
    k = EQ_ODE1.create(output_dim=1, rank=1, W=[[w]], lengthscale=[l], decay=[d])
    n = 4000
    for t in (0.5, 1.2, 2.5):
        for tp in (0.3, 1.0, 2.0):
            s = np.linspace(0, t, n)
            num = w * np.trapezoid(np.exp(-d * (t - s)) * _k_eq(s, tp, l), s)
            got = float(k._k_fu(jnp.asarray(t), jnp.asarray(d), jnp.asarray(tp),
                                jnp.asarray(l))) * w
            np.testing.assert_allclose(got, num, rtol=2e-3, atol=1e-6)


def test_k_ff_matches_double_quadrature():
    l, d1, d2 = 0.6, 1.1, 0.8
    k = EQ_ODE1.create(output_dim=2, rank=1, W=[[1.0], [1.0]],
                       lengthscale=[l], decay=[d1, d2])
    n = 700
    for t in (0.8, 1.6):
        for tp in (0.5, 2.0):
            s = np.linspace(0, t, n)
            sp = np.linspace(0, tp, n)
            S, SP = np.meshgrid(s, sp, indexing="ij")
            integ = np.exp(-d1 * (t - S)) * np.exp(-d2 * (tp - SP)) * _k_eq(S, SP, l)
            num = np.trapezoid(np.trapezoid(integ, sp, axis=1), s)
            got = float(k._k_ff(jnp.asarray(t), jnp.asarray(d1), jnp.asarray(tp),
                                jnp.asarray(d2), jnp.asarray(l)))
            np.testing.assert_allclose(got, num, rtol=5e-3, atol=1e-6)


def test_full_K_block_structure_and_psd(rng):
    k = EQ_ODE1.create(output_dim=2, rank=1, W=[[0.8], [1.2]],
                       lengthscale=[0.7], decay=[1.0, 0.5])
    t = np.sort(rng.uniform(0.1, 3, 8))
    # rows: output 0, output 1, latent (index 2)
    X = np.vstack([
        np.column_stack([t, np.zeros_like(t)]),
        np.column_stack([t, np.ones_like(t)]),
        np.column_stack([t, np.full_like(t, 2.0)]),
    ])
    K = np.asarray(k.K(jnp.asarray(X)))
    np.testing.assert_allclose(K, K.T, atol=1e-8)
    assert np.linalg.eigvalsh(K).min() > -1e-7
    # latent-latent block is the plain EQ kernel
    np.testing.assert_allclose(K[16:, 16:], _k_eq(t[:, None], t[None, :], 0.7),
                               rtol=1e-8)


def test_wofz_and_cerf_match_scipy(rng):
    from scipy.special import erf as serf
    from scipy.special import wofz as swofz

    from gaussian_process_optimization_tpu.ops.special import cerf, wofz

    z = rng.standard_normal(100) * 3 + 1j * np.abs(rng.standard_normal(100)) * 3
    np.testing.assert_allclose(np.asarray(wofz(jnp.asarray(z))), swofz(z),
                               atol=1e-12)
    zr = rng.standard_normal(60) * 4
    np.testing.assert_allclose(np.asarray(cerf(jnp.asarray(zr + 0j))), serf(zr),
                               atol=1e-12)


def _green2(ts, alpha, omega):
    """Second-order Green's function e^{-alpha t} sin(omega t)/omega (works for
    complex omega via numpy complex math)."""
    om = complex(omega)
    return np.real(np.exp(-alpha * ts) * np.sin(om * ts) / om)


@pytest.mark.parametrize("C,B", [(1.0, 3.0), (3.0, 1.0)])  # under/over-damped
def test_eq_ode2_k_fu_matches_quadrature(C, B):
    from gaussian_process_optimization_tpu.kernels.lfm import EQ_ODE2

    l = 0.7
    k = EQ_ODE2.create(output_dim=1, rank=1, W=[[1.0]], lengthscale=[l],
                       C=[C], B=[B])
    alpha = C / 2.0
    omega = np.sqrt(complex(B - alpha**2))
    n = 4000
    for t in (0.6, 1.5, 2.5):
        for tp in (0.4, 1.2):
            s = np.linspace(0, t, n)
            num = np.trapezoid(_green2(t - s, alpha, omega) * _k_eq(s, tp, l), s)
            X = np.array([[t, 0.0]])
            X2 = np.array([[tp, 1.0]])
            got = float(k.K(jnp.asarray(X), jnp.asarray(X2))[0, 0])
            np.testing.assert_allclose(got, num, rtol=3e-3, atol=1e-7)


@pytest.mark.parametrize("C,B", [(1.0, 3.0), (3.0, 1.0)])
def test_eq_ode2_k_ff_matches_double_quadrature(C, B):
    from gaussian_process_optimization_tpu.kernels.lfm import EQ_ODE2

    l = 0.6
    C2, B2 = 0.8, 2.0
    k = EQ_ODE2.create(output_dim=2, rank=1, W=[[1.0], [1.0]], lengthscale=[l],
                       C=[C, C2], B=[B, B2])
    a1, o1 = C / 2.0, np.sqrt(complex(B - C**2 / 4))
    a2, o2 = C2 / 2.0, np.sqrt(complex(B2 - C2**2 / 4))
    n = 600
    for t in (0.9, 1.8):
        for tp in (0.5, 1.4):
            s = np.linspace(0, t, n)
            sp = np.linspace(0, tp, n)
            S, SP = np.meshgrid(s, sp, indexing="ij")
            integ = (_green2(t - S, a1, o1) * _green2(tp - SP, a2, o2)
                     * _k_eq(S, SP, l))
            num = np.trapezoid(np.trapezoid(integ, sp, axis=1), s)
            X = np.array([[t, 0.0]])
            X2 = np.array([[tp, 1.0]])
            got = float(k.K(jnp.asarray(X), jnp.asarray(X2))[0, 0])
            np.testing.assert_allclose(got, num, rtol=1e-2, atol=1e-7)


def test_eq_ode2_full_K_psd(rng):
    from gaussian_process_optimization_tpu.kernels.lfm import EQ_ODE2

    k = EQ_ODE2.create(output_dim=2, rank=1, W=[[0.9], [1.1]], lengthscale=[0.8],
                       C=[1.0, 2.5], B=[3.0, 1.0])
    t = np.sort(rng.uniform(0.1, 3, 7))
    X = np.vstack([
        np.column_stack([t, np.zeros_like(t)]),
        np.column_stack([t, np.ones_like(t)]),
        np.column_stack([t, np.full_like(t, 2.0)]),
    ])
    K = np.asarray(k.K(jnp.asarray(X)))
    np.testing.assert_allclose(K, K.T, atol=1e-8)
    assert np.linalg.eigvalsh(K).min() > -1e-7
    assert np.all(np.isfinite(K))


def test_lfm_gp_regression_smoke(rng):
    """Joint GP over (outputs, latent): inferring the latent force from output
    observations must correlate with the truth."""
    from gaussian_process_optimization_tpu.models.gp import GPRegression

    l, d = 0.8, 1.0
    t = np.linspace(0.05, 4, 35)
    # simulate: u = sin(2 pi t / 2), y = int e^{-d(t-s)} u(s) ds
    s_grid = np.linspace(0, 4, 2001)
    u_true = np.sin(np.pi * s_grid)
    y_true = np.array([
        np.trapezoid(np.exp(-d * (ti - s_grid[s_grid <= ti]))
                     * u_true[s_grid <= ti], s_grid[s_grid <= ti])
        for ti in t
    ])
    k = EQ_ODE1.create(output_dim=1, rank=1, W=[[1.0]], lengthscale=[l], decay=[d])
    X = np.column_stack([t, np.zeros_like(t)])
    m = GPRegression.create(X, y_true[:, None], kernel=k, noise_var=1e-4)
    # predict the LATENT at a grid (index 1)
    tq = np.linspace(0.2, 3.8, 25)
    Xq = np.column_stack([tq, np.ones_like(tq)])
    mu, _ = m.predict(jnp.asarray(Xq), include_likelihood=False)
    corr = np.corrcoef(np.asarray(mu)[:, 0], np.sin(np.pi * tq))[0, 1]
    assert corr > 0.95, corr


def test_eq_ode1_large_nu_no_overflow():
    """Regression (round-2 review): the naive exp(nu^2)*[erf+erf] forms overflow
    at nu = d*l/2 ~ 9+ (f32) and NaN-poison gradients even of masked entries;
    the lnDifErf-style _exp_diferf forms must stay finite and match quadrature.
    """
    import jax

    k = EQ_ODE1.create(output_dim=2, rank=1, lengthscale=[5.0], decay=[4.0, 10.0],
                       W=np.asarray([[1.0], [0.7]]))
    t = np.linspace(0.0, 20.0, 8)
    X = np.stack([np.concatenate([t, t]),
                  np.concatenate([np.zeros(8), np.ones(8)])], axis=1)
    K = np.asarray(k.K(jnp.asarray(X)))
    assert np.all(np.isfinite(K)), K
    # PSD-ish: symmetric; diagonal positive for t > 0 (y(0) = 0 in the SIM ODE)
    np.testing.assert_allclose(K, K.T, atol=1e-8)
    d = np.diag(K)
    assert np.all(d >= 0) and np.all(d[np.concatenate([t, t]) > 0] > 0)

    # gradients through a masked assembly must be finite too
    def loss(kern):
        return jnp.sum(jnp.square(kern.K(jnp.asarray(X))))

    g = jax.grad(loss)(k)
    for leaf in jax.tree_util.tree_leaves(g):
        assert np.all(np.isfinite(np.asarray(leaf)))

    # value check vs quadrature for one k_fu entry in the big-nu regime
    from scipy.integrate import quad

    d, l = 4.0, 5.0
    tt, tp = 6.0, 2.0
    expected = quad(lambda s: np.exp(-d * (tt - s)) * np.exp(-((s - tp) ** 2) / l**2),
                    0.0, tt)[0]
    got = float(k._k_fu(jnp.asarray(tt), jnp.asarray(d), jnp.asarray(tp),
                        jnp.asarray(l)))
    np.testing.assert_allclose(got, expected, rtol=1e-6)
