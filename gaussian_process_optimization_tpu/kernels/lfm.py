"""First-order latent force model kernel (GPy/GPy/kern/src/eq_ode1.py:11
EQ_ODE1; Lawrence, Sanguinetti & Rattray 2007 "SIM"):

    dy_j/dt + d_j y_j(t) = sum_r w_{jr} u_r(t),   u_r ~ GP(0, exp(-(t-t')^2/l_r^2))

so y_j(t) = sum_r w_{jr} int_0^t e^{-d_j (t-s)} u_r(s) ds and all covariances are
closed-form in erf:

    k_fu^{(r)}(t, t')  = w_{jr} (sqrt(pi) l_r / 2) e^{nu^2} e^{-d_j(t-t')}
                         [erf((t-t')/l_r - nu) + erf(t'/l_r + nu)],  nu = d_j l_r/2
    k_ff(t, t')        = sum_r w_{jr} w_{kr} (sqrt(pi) l_r / 2)
                         [h(t', t; d_k, d_j) + h(t, t'; d_j, d_k)]
    h(t, t'; d_j, d_k) = e^{nu_k^2}/(d_j + d_k) * ( e^{-d_k(t-t')}
                         [erf((t-t')/l - nu_k) + erf(t'/l + nu_k)]
                         - e^{-(d_k t + d_j t')} [erf(t/l - nu_k) + erf(nu_k)] )

Inputs carry (time, function index) with index < output_dim selecting output j
and index >= output_dim selecting latent r = index - output_dim (the reference's
layout, eq_ode1.py:84-122). The reference evaluates per-index slices with
erfcx/lnDifErf guards (eq_ode1.py:633); here the blocks are branchless masked
assemblies and every exp*erf product goes through `_exp_diferf`, the branchless
equivalent of lnDifErf — the naive exp(nu^2)*[erf+erf] forms overflow to
inf*0=NaN once nu = d*l/2 exceeds ~9 in f32, and a NaN anywhere poisons
gradients of masked entries too (0*NaN in the where-VJP). Quadrature tests in
tests/test_lfm.py pin k_fu and k_ff against numerical integration of the
defining ODE integrals.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.pytree import pytree_dataclass, static_field
from .base import Kernel

_SQPI = 1.7724538509055159


def _erf(x):
    return jax.scipy.special.erf(x)


def _erfcx(x):
    """Scaled complementary error function erfcx(x) = exp(x^2) erfc(x) for real
    x, via the Faddeeva function: erfcx(x) = Re[wofz(i x)]."""
    from ..ops.special import wofz

    return jnp.real(wofz(1j * x))


def _exp_diferf(c, z1, z2):
    """exp(c) * (erf(z2) - erf(z1)) without intermediate overflow — the
    branchless analog of the reference's lnDifErf (eq_ode1.py:633-649).

    Three regimes, each with the exponent already cancelled:
    - z1 > 0:               exp(c - z1^2) (erfcx(z1) - erfcx(z2) e^{z1^2-z2^2})
    - z2 < 0 (mirror):      same formula on (-z2, -z1) (erf is odd)
    - z1 <= 0 <= z2:        the erf difference is O(1) and, for every exponent
                            this kernel produces, c <= 0 here (shown per term
                            at the call sites) — plain exp(c)*(erf2-erf1).
    Unused lanes get safe dummy arguments so the where-VJP stays finite."""
    c, z1, z2 = jnp.broadcast_arrays(c, z1, z2)
    inA = z1 > 0.0
    inB = (~inA) & (z2 < 0.0)

    def regimeA(cm, a1, a2):
        return jnp.exp(cm - jnp.square(a1)) * (
            _erfcx(a1) - _erfcx(a2) * jnp.exp(jnp.square(a1) - jnp.square(a2))
        )

    # the exponent must be masked in UNUSED lanes too: a where() only masks the
    # value, and inf in a dead branch becomes NaN in the where-VJP
    vA = regimeA(jnp.where(inA, c, 0.0),
                 jnp.where(inA, z1, 1.0), jnp.where(inA, z2, 2.0))
    vB = regimeA(jnp.where(inB, c, 0.0),
                 jnp.where(inB, -z2, 1.0), jnp.where(inB, -z1, 2.0))
    safe_c = jnp.where(inA | inB, 0.0, jnp.minimum(c, 80.0))
    vC = jnp.exp(safe_c) * (_erf(z2) - _erf(z1))
    return jnp.where(inA, vA, jnp.where(inB, vB, vC))


@pytree_dataclass
class EQ_ODE1(Kernel):
    """First-order LFM / SIM kernel (eq_ode1.py)."""

    W: jnp.ndarray = None  # (output_dim, rank) sensitivities
    lengthscale: jnp.ndarray = None  # (rank,)
    decay: jnp.ndarray = None  # (output_dim,)
    output_dim: int = static_field(default=1)
    rank: int = static_field(default=1)

    @classmethod
    def create(cls, output_dim=1, rank=1, W=None, lengthscale=None, decay=None,
               seed=0):
        import numpy as np

        rng = np.random.default_rng(seed)
        if lengthscale is None:
            lengthscale = 0.5 + rng.random(rank)
        if W is None:
            W = 0.5 * rng.standard_normal((output_dim, rank)) / np.sqrt(rank)
        if decay is None:
            decay = np.ones(output_dim)
        return cls(
            input_dim=2,
            W=jnp.asarray(W, dtype=float).reshape(output_dim, rank),
            lengthscale=jnp.broadcast_to(
                jnp.asarray(lengthscale, dtype=float).reshape(-1), (rank,)),
            decay=jnp.broadcast_to(
                jnp.asarray(decay, dtype=float).reshape(-1), (output_dim,)),
            output_dim=output_dim, rank=rank,
        )

    # ---- closed forms (one latent r at a time; scalars broadcast over grids) --
    def _k_uu(self, t, t2, l):
        return jnp.exp(-jnp.square(t - t2) / jnp.square(l))

    def _k_fu(self, t, d, t2, l):
        """Cov[y_j(t), u(t')] for decay d, latent lengthscale l.

        = (sqrt(pi) l/2) exp(nu^2 - d(t-t')) [erf((t-t')/l - nu) + erf(t'/l + nu)]
        via _exp_diferf with z1 = nu - (t-t')/l, z2 = t'/l + nu. Regime-C safety:
        z1 <= 0 means nu <= (t-t')/l, so c = nu^2 - 2 nu (t-t')/l <= -nu^2 <= 0."""
        nu = d * l / 2.0
        tau = t - t2
        c = jnp.square(nu) - d * tau
        return (_SQPI * l / 2.0) * _exp_diferf(c, nu - tau / l, t2 / l + nu)

    def _h(self, t, t2, dj, dk, l):
        """h(t, t'; d_j, d_k) (Lawrence et al. 2007 eq. 7-style), stabilized.

        Both terms go through _exp_diferf; the second term's regime-C exponent
        c2 = nu^2 - dk t - dj t' = -t^2/l^2 - dj t' + (z1-regime corrections)
        is <= 0 whenever z1 = nu - t/l <= 0 and t' >= 0."""
        nu = dk * l / 2.0
        tau = t - t2
        term1 = _exp_diferf(jnp.square(nu) - dk * tau, nu - tau / l, t2 / l + nu)
        term2 = _exp_diferf(jnp.square(nu) - (dk * t + dj * t2), nu - t / l,
                            nu * jnp.ones_like(t - t2))
        return (term1 - term2) / (dj + dk)

    def _k_ff(self, t, dj, t2, dk, l):
        # derived by integrating k_fu once more against e^{-dj(t-s)}:
        # k_ff = (sqrt(pi) l/2) [h(t', t; dj, dk) + h(t, t'; dk, dj)] where the
        # LAST decay argument of h carries the nu (see _h)
        return (_SQPI * l / 2.0) * (
            self._h(t2, t, dj, dk, l) + self._h(t, t2, dk, dj, l)
        )

    # ---- assembly over the (time, index) layout ---------------------------
    def K(self, X, X2=None):
        X2c = X if X2 is None else X2
        t1, i1 = X[:, 0], jnp.rint(X[:, -1]).astype(int)
        t2, i2 = X2c[:, 0], jnp.rint(X2c[:, -1]).astype(int)
        P = self.output_dim
        is_out1 = (i1 < P)[:, None]
        is_out2 = (i2 < P)[None, :]
        # gathered per-row output params (clipped indices; masked out when latent)
        j1 = jnp.clip(i1, 0, P - 1)
        j2 = jnp.clip(i2, 0, P - 1)
        d1 = self.decay[j1][:, None]
        d2 = self.decay[j2][None, :]
        r1 = jnp.clip(i1 - P, 0, self.rank - 1)
        r2 = jnp.clip(i2 - P, 0, self.rank - 1)

        T1 = t1[:, None]
        T2 = t2[None, :]
        out = jnp.zeros((X.shape[0], X2c.shape[0]), dtype=X.dtype)
        for r in range(self.rank):
            l = self.lengthscale[r]
            w1 = self.W[j1, r][:, None]
            w2 = self.W[j2, r][None, :]
            # output-output
            ff = w1 * w2 * self._k_ff(T1, d1, T2, d2, l)
            out = out + jnp.where(is_out1 & is_out2, ff, 0.0)
            # output-latent r (only when the latent column IS latent r)
            lat2_is_r = (i2 == P + r)[None, :]
            fu = w1 * self._k_fu(T1, d1, T2, l)
            out = out + jnp.where(is_out1 & lat2_is_r, fu, 0.0)
            lat1_is_r = (i1 == P + r)[:, None]
            uf = w2 * self._k_fu(T2.T, d2.T, T1.T, l).T
            out = out + jnp.where(lat1_is_r & is_out2, uf, 0.0)
            # latent-latent (same latent only)
            uu = self._k_uu(T1, T2, l)
            out = out + jnp.where(lat1_is_r & lat2_is_r, uu, 0.0)
        return out

    def Kdiag(self, X):
        return self._pairwise_diag(X)  # O(N), single-sourced closed forms


# ----------------------------------------------------------- second-order LFM


def _wofz_any(z):
    """Faddeeva on the whole plane: w(z) = 2 exp(-z^2) - w(-z) for Im(z) < 0
    (the exponent stays bounded for this kernel's argument ranges)."""
    from ..ops.special import wofz

    lower = jnp.imag(z) < 0
    zs = jnp.where(lower, -z, z)
    w_up = wofz(zs)
    return jnp.where(lower, 2.0 * jnp.exp(-(z**2)) - w_up, w_up)


def _upsilon(g, l, t, t2):
    """Stable Upsilon(g; t, t') = e^{nu^2 - g(t-t')}[erf((t-t')/l - nu)
    + erf(t'/l + nu)], nu = g l/2, for COMPLEX decay g — rewritten so every
    exponent has bounded real part (the exp(nu^2) erf(...) products overflow
    in their naive form; same device as Alvarez's LFM implementations and the
    reference's eq_ode2.py wofz usage)."""
    nu = g * l / 2.0
    tau = t - t2
    term1 = 2.0 * jnp.exp(nu**2 - g * tau)
    term2 = jnp.exp(-((tau / l) ** 2)) * _wofz_any(1j * (tau / l - nu))
    term3 = jnp.exp(-g * t - (t2 / l) ** 2) * _wofz_any(1j * (t2 / l + nu))
    return term1 - term2 - term3


def _upsilon0(gk, gj, l, t, t2):
    """Stable e^{nu_k^2 - gk t - gj t'} [erf(t/l - nu_k) + erf(nu_k)]."""
    from ..ops.special import wofz

    nu = gk * l / 2.0
    term1 = 2.0 * jnp.exp(nu**2 - gk * t - gj * t2)
    term2 = jnp.exp(-((t / l) ** 2) - gj * t2) * _wofz_any(1j * (t / l - nu))
    term3 = jnp.exp(-gk * t - gj * t2) * wofz(1j * nu)
    return term1 - term2 - term3


def _h_complex(t, t2, gj, gk, l):
    """First-order h-function at complex decays (cf. EQ_ODE1._h), stable form."""
    return (_upsilon(gk, l, t, t2) - _upsilon0(gk, gj, l, t, t2)) / (gj + gk)


def _kff1_complex(t, gj, t2, gk, l):
    """First-order double-integral covariance at complex decays
    (cf. EQ_ODE1._k_ff; includes the sqrt(pi) l / 2 factor)."""
    return (_SQPI * l / 2.0) * (
        _h_complex(t2, t, gj, gk, l) + _h_complex(t, t2, gk, gj, l)
    )


@pytree_dataclass
class EQ_ODE2(Kernel):
    """Second-order latent force model (GPy/GPy/kern/src/eq_ode2.py; Alvarez,
    Luengo & Lawrence LFM):

        d2y_j/dt2 + C_j dy_j/dt + B_j y_j = sum_r w_{jr} u_r(t),
        u_r ~ GP(0, exp(-(t-t')^2 / l_r^2)).

    The Green's function e^{-alpha t} sin(omega t)/omega (alpha = C/2,
    omega = sqrt(B - C^2/4), COMPLEX for overdamped systems) splits into two
    complex-decay first-order responses gamma = alpha -+ i omega, so every
    covariance is a signed combination of the (already quadrature-validated)
    first-order closed forms evaluated at complex decays — the reference's
    1370 lines of per-block loops and case splits become one complex-arithmetic
    expression. Same (time, function-index) input layout as EQ_ODE1.
    """

    W: jnp.ndarray = None  # (output_dim, rank)
    lengthscale: jnp.ndarray = None  # (rank,)
    C: jnp.ndarray = None  # (output_dim,) damping
    B: jnp.ndarray = None  # (output_dim,) spring
    output_dim: int = static_field(default=1)
    rank: int = static_field(default=1)

    @classmethod
    def create(cls, output_dim=1, rank=1, W=None, lengthscale=None, C=None,
               B=None, seed=0):
        import numpy as np

        rng = np.random.default_rng(seed)
        if lengthscale is None:
            lengthscale = 0.5 + rng.random(rank)
        if W is None:
            W = 0.5 * rng.standard_normal((output_dim, rank)) / np.sqrt(rank)
        if C is None:
            C = np.ones(output_dim)
        if B is None:
            B = np.ones(output_dim)
        return cls(
            input_dim=2,
            W=jnp.asarray(W, dtype=float).reshape(output_dim, rank),
            lengthscale=jnp.broadcast_to(
                jnp.asarray(lengthscale, dtype=float).reshape(-1), (rank,)),
            C=jnp.broadcast_to(jnp.asarray(C, dtype=float).reshape(-1),
                               (output_dim,)),
            B=jnp.broadcast_to(jnp.asarray(B, dtype=float).reshape(-1),
                               (output_dim,)),
            output_dim=output_dim, rank=rank,
        )

    def _gammas(self):
        alpha = self.C / 2.0
        omega = jnp.sqrt(self.B.astype(jnp.complex128) - alpha**2)
        g1 = alpha + 1j * omega  # pairs with sign -1 in the Green's function
        g2 = alpha - 1j * omega  # sign +1
        return g1, g2, omega

    def _k_uu(self, t, t2, l):
        return jnp.exp(-jnp.square(t - t2) / jnp.square(l))

    @staticmethod
    def _fu_grid(g1, g2, om, l, T_out, T_lat):
        """Cov[y(t_out), u(t_lat)] with pre-broadcast complex decay grids:
        Re{ (sqrt(pi) l/2) [Upsilon(g2) - Upsilon(g1)] / (2 i omega) }."""
        up = _upsilon(g2, l, T_out, T_lat) - _upsilon(g1, l, T_out, T_lat)
        return jnp.real((_SQPI * l / 2.0) * up / (2j * om))

    @staticmethod
    def _ff_grid(a1, a2, oj, b1, b2, ok, l, T1, T2):
        """Signed 2x2 combination of complex first-order double integrals,
        divided by (2 i omega_j)(2 i omega_k) = -4 omega_j omega_k."""
        num = (_kff1_complex(T1, a2, T2, b2, l) - _kff1_complex(T1, a2, T2, b1, l)
               - _kff1_complex(T1, a1, T2, b2, l) + _kff1_complex(T1, a1, T2, b1, l))
        return jnp.real(num / (-4.0 * oj * ok))

    def K(self, X, X2=None):
        X2c = X if X2 is None else X2
        t1, i1 = X[:, 0], jnp.rint(X[:, -1]).astype(int)
        t2, i2 = X2c[:, 0], jnp.rint(X2c[:, -1]).astype(int)
        P = self.output_dim
        is_out1 = (i1 < P)[:, None]
        is_out2 = (i2 < P)[None, :]
        j1 = jnp.clip(i1, 0, P - 1)
        j2 = jnp.clip(i2, 0, P - 1)
        g1, g2, omega = self._gammas()
        a1, a2, oj = g1[j1][:, None], g2[j1][:, None], omega[j1][:, None]
        b1, b2, ok = g1[j2][None, :], g2[j2][None, :], omega[j2][None, :]
        T1 = t1[:, None]
        T2 = t2[None, :]
        out = jnp.zeros((X.shape[0], X2c.shape[0]), dtype=X.dtype)
        for r in range(self.rank):
            l = self.lengthscale[r]
            w1 = self.W[j1, r][:, None]
            w2 = self.W[j2, r][None, :]
            ff = w1 * w2 * self._ff_grid(a1, a2, oj, b1, b2, ok, l, T1, T2)
            out = out + jnp.where(is_out1 & is_out2, ff, 0.0)
            lat2_is_r = (i2 == P + r)[None, :]
            fu = w1 * self._fu_grid(a1, a2, oj, l, T1, T2)
            out = out + jnp.where(is_out1 & lat2_is_r, fu, 0.0)
            lat1_is_r = (i1 == P + r)[:, None]
            # rows are the latent times, columns the outputs
            uf = w2 * self._fu_grid(b1, b2, ok, l, T2, T1)
            out = out + jnp.where(lat1_is_r & is_out2, uf, 0.0)
            uu = self._k_uu(T1, T2, l)
            out = out + jnp.where(lat1_is_r & lat2_is_r, uu, 0.0)
        return out

    def Kdiag(self, X):
        return self._pairwise_diag(X)  # O(N), single-sourced closed forms

    def Kdiag_per_force(self, X):
        """Per-latent-force diagonal decomposition for OUTPUT rows:
        Kdiag(x_n) = sum_r out[n, r] with out[n, r] = w_{d_n r}^2 k^{(r)}_ff(t_n, t_n).
        Latent rows get the indicator of their own force (k_uu(t,t) = 1).
        This is the reference's `kern._Kdiag` consumed by the IBP-LFM psi-0
        statistic (GPy models/ibp_lfm.py:62,80: `psi0 = kern._Kdiag(X)`,
        `psi0_full += np.sum(psi0 * Zp[indX, :])`)."""
        t1 = X[:, 0]
        i1 = jnp.rint(X[:, -1]).astype(int)
        P = self.output_dim
        is_out = i1 < P
        j = jnp.clip(i1, 0, P - 1)
        g1, g2, omega = self._gammas()
        a1, a2, oj = g1[j], g2[j], omega[j]
        cols = []
        for r in range(self.rank):
            l = self.lengthscale[r]
            w = self.W[j, r]
            ff = w * w * self._ff_grid(a1, a2, oj, a1, a2, oj, l, t1, t1)
            lat_is_r = (i1 == P + r)
            cols.append(jnp.where(is_out, ff, jnp.where(lat_is_r, 1.0, 0.0)))
        return jnp.stack(cols, axis=1)
