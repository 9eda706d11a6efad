"""State-space (Kalman) form of 1-D GPs — linear-time exact inference.

Rebuild of ``GPy/GPy/models/state_space_main.py`` (3622 LoC) +
``state_space_cython.pyx`` (1001 LoC of Cython filter/smoother loops): many 1-D
kernels are exactly (or to spectral order) Markovian SDEs, so LML and prediction
are a Kalman filter / RTS smoother — O(N) instead of O(N^3). The Cython time
loops become ``lax.scan`` (SURVEY 'native component summary' item 5).

Supported forms:
- Matern-1/2 (OU/Exponential), Matern-3/2, Matern-5/2 — exact SDEs
  (``GPy/GPy/kern/src/sde_matern.py``), state dims 1/2/3;
- 'periodic' — the standard periodic kernel as a truncated harmonic expansion
  (Solin & Sarkka 2014; ``GPy/GPy/kern/src/sde_standard_periodic.py:72-120``):
  K(tau) ~= sum_j q_j^2 cos(j w0 tau) with q_j^2 = 2 sigma^2 e^{-1/l^2} I_j(1/l^2)
  (halved at j=0), each harmonic a 2-D rotation block with Q_c = 0;
- 'quasiperiodic_matern12' / 'quasiperiodic_matern32' — periodic x Matern
  products via the Kronecker-sum composition F = F_p (+) F_m,
  P_inf = P_p (x) P_m, H = H_p (x) H_m (``state_space_main.py`` kernel products);
- 'white' / 'bias' — static kernels (``GPy/GPy/kern/src/sde_static.py:13,61``):
  white is the degenerate F=-inf process (A=0, Q=P_inf per step), bias a frozen
  random constant (F=0, Q=0);
- 'brownian' — Brownian motion (``sde_brownian.py:13``): F=0, Qc=sigma^2, P0=0,
  time origin at t=0 (non-stationary);
- 'linear' — Bayesian linear regression (``sde_linear.py:12``): integrator state
  [f, f'], Qc=0, P0 = sigma^2 [[t0^2, t0],[t0, 1]], time origin at t=0;
- 'rbf' — the RBF/ExpQuad kernel to spectral order N
  (``sde_stationary.py:20-166``): Taylor expansion of the spectral density,
  companion F from the stable roots (unit-lengthscale roots are static
  constants, lengthscale scaling is exact so the form stays differentiable),
  P_inf from a vectorized Lyapunov solve, diagonally balanced
  (``state_space_main.py balance_ss_model`` analog);
- SUMS of any of the above: family passed as a tuple -> block-diagonal stacking
  (``state_space_main.py`` AddKalman-style combination), per-component
  variance/lengthscale/period vectors.

Discretization: stationary forms use A = expm(F dt), Q = P_inf - A P_inf A^T
(exact); non-stationary forms (brownian/linear) use the Van Loan block-expm
Q = Phi_12 A^T with the filter clock started at t=0.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..utils.pytree import pytree_dataclass, static_field

LOG_2_PI = math.log(2 * math.pi)


def _bessel_iv_series(orders, z, terms=40):
    """Modified Bessel I_j(z) for j = 0..orders-1 by the ascending series
    I_j(z) = sum_m (z/2)^{2m+j} / (m! (m+j)!) — differentiable, accurate for the
    moderate z = 1/lengthscale^2 regime where the periodic SDE is valid (the
    reference warns lengthscale < 0.2 is unusable, sde_standard_periodic.py:76)."""
    j = jnp.arange(orders, dtype=z.dtype)[:, None]  # (J, 1)
    m = jnp.arange(terms, dtype=z.dtype)[None, :]  # (1, M)
    # log term = (2m + j) log(z/2) - lgamma(m+1) - lgamma(m+j+1)
    logz2 = jnp.log(z / 2.0)
    log_t = (2 * m + j) * logz2 - jax.scipy.special.gammaln(m + 1.0) \
        - jax.scipy.special.gammaln(m + j + 1.0)
    return jnp.sum(jnp.exp(log_t), axis=1)  # (J,)


def _matern_blocks(family, variance, lengthscale, dtype):
    """Exact SDE (F, P_inf, H) for the Matern family (sde_matern.py)."""
    if family == "matern12":
        lam = 1.0 / lengthscale
        F = -lam * jnp.eye(1, dtype=dtype)
        P_inf = jnp.eye(1, dtype=dtype) * variance
        H = jnp.asarray([[1.0]], dtype=dtype)
    elif family == "matern32":
        lam = jnp.sqrt(3.0) / lengthscale
        F = jnp.zeros((2, 2), dtype=dtype)
        F = F.at[0, 1].set(1.0).at[1, 0].set(-lam**2).at[1, 1].set(-2 * lam)
        P_inf = jnp.zeros((2, 2), dtype=dtype)
        P_inf = P_inf.at[0, 0].set(variance).at[1, 1].set(variance * lam**2)
        H = jnp.asarray([[1.0, 0.0]], dtype=dtype)
    elif family == "matern52":
        lam = jnp.sqrt(5.0) / lengthscale
        F = jnp.zeros((3, 3), dtype=dtype)
        F = F.at[0, 1].set(1.0).at[1, 2].set(1.0)
        F = F.at[2, 0].set(-lam**3).at[2, 1].set(-3 * lam**2).at[2, 2].set(-3 * lam)
        kappa = variance * lam**2 / 3.0
        P_inf = jnp.zeros((3, 3), dtype=dtype)
        P_inf = (
            P_inf.at[0, 0].set(variance)
            .at[1, 1].set(kappa)
            .at[0, 2].set(-kappa)
            .at[2, 0].set(-kappa)
            .at[2, 2].set(variance * lam**4)
        )
        H = jnp.asarray([[1.0, 0.0, 0.0]], dtype=dtype)
    else:
        raise ValueError(f"unsupported Matern state-space family {family!r}")
    return F, P_inf, H


def _periodic_blocks(variance, lengthscale, period, order, dtype):
    """Harmonic expansion of the standard periodic kernel
    (sde_standard_periodic.py:72-120). Our StandardPeriodic uses
    exp(-0.5 sin^2(pi tau/T)/l^2) == Solin-Sarkka with l_ss = 2 l."""
    l_ss = 2.0 * lengthscale
    z = 1.0 / jnp.square(l_ss)
    w0 = 2.0 * jnp.pi / period
    q2 = 2.0 * variance * jnp.exp(-z) * _bessel_iv_series(order + 1, z)
    q2 = q2.at[0].multiply(0.5)
    js = jnp.arange(order + 1, dtype=dtype)
    # F = blkdiag_j [[0, -j w0], [j w0, 0]]; P_inf = blkdiag_j q_j^2 I_2
    d = 2 * (order + 1)
    F = jnp.zeros((d, d), dtype=dtype)
    F = F.at[0::2, 1::2].set(jnp.diag(-js * w0))
    F = F.at[1::2, 0::2].set(jnp.diag(js * w0))
    P_inf = jnp.diag(jnp.repeat(q2, 2))
    H = jnp.tile(jnp.asarray([[1.0, 0.0]], dtype=dtype), (1, order + 1))
    return F, P_inf, H


import functools


@functools.lru_cache(maxsize=None)
def _rbf_companion_constants(order):
    """Unit-lengthscale stable-root companion coefficients for the RBF spectral
    approximation (sde_stationary.py:93-120). The Taylor polynomial
    sum_n N! (4 kappa)^{N-n} / n! (-1)^n x^{2(N-n)} has roots x_i = y_i / l where
    y_i are the (static) unit-lengthscale roots, so the monic coefficient a_j
    scales exactly as l^{-j}; only these constants need host numpy."""
    N = int(order)
    fn = math.factorial(N)
    pp = np.zeros(2 * N + 1)
    for n in range(N + 1):
        # at l=1: kappa = 1/2 -> (4 kappa)^(N-n) = 2^(N-n)
        pp[2 * (N - n)] = fn * (2.0 ** (N - n)) / math.factorial(n) * (-1.0) ** n
    roots = np.roots(pp)
    neg = roots[np.round(roots.real, 6) < 0]
    if len(neg) != N:
        raise ValueError(f"rbf SDE order {N}: expected {N} stable roots, "
                         f"got {len(neg)}")
    aa = np.poly(neg)
    if not np.allclose(aa.imag, 0.0, atol=1e-8):
        raise ValueError("rbf SDE companion coefficients not real")
    return aa.real  # monic, descending powers, length N+1


def _rbf_blocks(variance, lengthscale, order, dtype):
    """RBF/ExpQuad kernel to spectral order N (sde_stationary.py:73-166):
    companion F from the stable spectral roots, Qc = sigma^2 sqrt(2 pi)
    l^(1-2N) N! 2^N, P_inf from the Lyapunov equation F P + P F^T = -L Qc L^T
    (solved as a vectorized N^2 linear system — differentiable), then diagonal
    balancing D = sqrt(diag P_inf) (the balance_ss_model analog,
    state_space_main.py) so P_inf has unit diagonal — essential in f32."""
    N = int(order)
    aa = _rbf_companion_constants(N)
    # F[-1, j] = -a_{N-j} * l^{-(N-j)}
    a_tail = jnp.asarray(aa[1:][::-1], dtype=dtype)  # [a_N, ..., a_1] at l=1
    powers = jnp.arange(N, 0, -1, dtype=dtype)
    last_row = -a_tail * lengthscale ** (-powers)
    F = jnp.zeros((N, N), dtype=dtype)
    F = F.at[jnp.arange(N - 1), jnp.arange(1, N)].set(1.0)
    F = F.at[N - 1, :].set(last_row)
    qc = (variance * jnp.sqrt(2.0 * jnp.pi) * lengthscale ** (1 - 2 * N)
          * math.factorial(N) * (2.0 ** N))
    rhs = jnp.zeros((N, N), dtype=dtype).at[N - 1, N - 1].set(-qc)
    eye = jnp.eye(N, dtype=dtype)
    M = jnp.kron(F, eye) + jnp.kron(eye, F)  # row-major vec(F P + P F^T)
    P = jnp.linalg.solve(M, rhs.reshape(-1)).reshape(N, N)
    P = 0.5 * (P + P.T)
    H = jnp.zeros((1, N), dtype=dtype).at[0, 0].set(1.0)
    # diagonal balancing
    d = jnp.sqrt(jnp.clip(jnp.diag(P), 1e-30, None))
    F_b = F * (d[None, :] / d[:, None])
    P_b = P / (d[:, None] * d[None, :])
    H_b = H * d[None, :]
    return F_b, P_b, H_b


def _kron_product(Fa, Pa, Ha, Fb, Pb, Hb):
    """State-space form of the PRODUCT kernel k_a * k_b: Kronecker sum for F,
    Kronecker products for P_inf and H (state_space_main.py kernel products)."""
    da, db = Fa.shape[0], Fb.shape[0]
    Ia = jnp.eye(da, dtype=Fa.dtype)
    Ib = jnp.eye(db, dtype=Fb.dtype)
    F = jnp.kron(Fa, Ib) + jnp.kron(Ia, Fb)
    P = jnp.kron(Pa, Pb)
    H = jnp.kron(Ha, Hb)
    return F, P, H


def _kernel_to_spec(k):
    """One kernel object -> (family, variance, lengthscale, period, ls_damp).
    The sde_* API surface (GPy kern/src/sde_matern.py sde_Matern32.sde() etc.):
    the reference wraps each kernel class in an sde_ subclass exposing its
    state-space matrices; here a dispatcher reads the plain kernel objects."""
    from ..kernels.base import Prod
    from ..kernels.linear import Linear
    from ..kernels.other import Brownian, StandardPeriodic
    from ..kernels.static import Bias, White
    from ..kernels.stationary import OU, RBF, Exponential, Matern32, Matern52

    one = 1.0
    if isinstance(k, (OU, Exponential)):
        return ("matern12", k.variance, k.lengthscale, one, one)
    if isinstance(k, Matern32):
        return ("matern32", k.variance, k.lengthscale, one, one)
    if isinstance(k, Matern52):
        return ("matern52", k.variance, k.lengthscale, one, one)
    if isinstance(k, StandardPeriodic):
        return ("periodic", k.variance, k.lengthscale, k.period, one)
    if isinstance(k, RBF):
        if k.lengthscale.ndim > 0 and k.lengthscale.size > 1:
            raise ValueError("state-space RBF form is 1-D (no ARD)")
        return ("rbf", k.variance, jnp.reshape(k.lengthscale, ()), one, one)
    if isinstance(k, White):
        return ("white", k.variance, one, one, one)
    if isinstance(k, Bias):
        return ("bias", k.variance, one, one, one)
    if isinstance(k, Brownian):
        return ("brownian", k.variance, one, one, one)
    if isinstance(k, Linear):
        # K = sigma^2 x x'  (sde_linear.py:12 with t0 = 0, carried in the
        # 'period' slot of the spec)
        return ("linear", jnp.reshape(k.variances, ()), one, 0.0, one)
    if isinstance(k, Prod) and len(k.parts) == 2:
        ks = k.parts
        per = [p for p in ks if isinstance(p, StandardPeriodic)]
        mat = [p for p in ks if isinstance(p, (OU, Exponential, Matern32))]
        if len(per) == 1 and len(mat) == 1:
            fam = "quasiperiodic_matern12" if isinstance(
                mat[0], (OU, Exponential)) else "quasiperiodic_matern32"
            # product variance folds into the periodic factor
            return (fam, per[0].variance * mat[0].variance, per[0].lengthscale,
                    per[0].period, mat[0].lengthscale)
    raise ValueError(
        f"no state-space (SDE) form for kernel {type(k).__name__}; supported: "
        "OU/Exponential, Matern32, Matern52, StandardPeriodic, RBF (spectral "
        "approximation), White, Bias, Brownian, Linear, "
        "StandardPeriodic*Matern products, and Add sums of those"
    )


def from_kernel(kernel, X, Y, noise_var=0.1, order=7):
    """Build a StateSpaceGP from kernel OBJECTS (the sde_* bridge): accepts the
    Matern family, StandardPeriodic, periodic*Matern products, and Add sums."""
    from ..kernels.base import Add

    import numpy as np

    parts = kernel.parts if isinstance(kernel, Add) else (kernel,)
    specs = [_kernel_to_spec(p) for p in parts]
    fams = tuple(s[0] for s in specs)
    if len(fams) == 1:
        f, v, l, p, ld = specs[0]
        return StateSpaceGP.create(X, Y, family=f, variance=v, lengthscale=l,
                                   period=p, lengthscale_damp=ld,
                                   noise_var=noise_var, order=order)
    return StateSpaceGP.create(
        X, Y, family=fams,
        variance=np.asarray([float(s[1]) for s in specs]),
        lengthscale=np.asarray([float(s[2]) for s in specs]),
        period=np.asarray([float(s[3]) for s in specs]),
        lengthscale_damp=np.asarray([float(s[4]) for s in specs]),
        noise_var=noise_var, order=order,
    )


@pytree_dataclass
class StateSpaceGP:
    """1-D GP regression in state-space form (GPy models/state_space.py).

    `family` may be a single form or a tuple of forms (sum kernel). For tuple
    families, `variance`, `lengthscale`, `period`, `lengthscale_damp` are
    per-component vectors. `lengthscale_damp` is the Matern damping lengthscale
    of quasi-periodic components (ignored elsewhere).
    """

    variance: jnp.ndarray = None
    lengthscale: jnp.ndarray = None
    noise_variance: jnp.ndarray = None
    period: jnp.ndarray = None
    lengthscale_damp: jnp.ndarray = None
    X: jnp.ndarray = None  # (N, 1) inputs (times)
    Y: jnp.ndarray = None  # (N, 1)
    family: str | tuple = static_field(default="matern32")
    order: int = static_field(default=7)  # periodic harmonic truncation

    @classmethod
    def create(cls, X, Y, family="matern32", variance=1.0, lengthscale=1.0,
               noise_var=0.1, period=1.0, lengthscale_damp=1.0, order=7):
        X = jnp.asarray(X, dtype=float)
        # the model is strictly 1-D in time: a silent reshape(-1, 1) of a
        # (n, d>1) input would flatten it to (n*d, 1) against an (n, 1) Y and
        # produce finite-but-meaningless results (review round 4)
        if X.ndim >= 2 and X.shape[-1] != 1:
            raise ValueError(
                f"state-space GPs are 1-D (time) models; got X with "
                f"{X.shape[-1]} input dims — use a kernel-on-X model instead")
        X = X.reshape(-1, 1)
        Y = jnp.asarray(Y, dtype=float).reshape(-1, 1)
        if X.shape[0] != Y.shape[0]:
            raise ValueError(f"X/Y length mismatch: {X.shape[0]} vs {Y.shape[0]}")
        fams = family if isinstance(family, tuple) else (family,)
        if any(f in ("brownian", "linear") for f in fams):
            # origin-at-zero SDEs (brownian/linear) pin the filter clock at
            # t=0; a negative first timestamp gives NEGATIVE process noise
            # (Q = Qc*dt), i.e. NaN LML but finite-garbage predictions. Only
            # checkable eagerly — tracers skip (create is eager in practice).
            try:
                t_min = float(jnp.min(X))
                if t_min < 0:
                    raise ValueError(
                        f"family {family!r} pins the state at t=0 "
                        f"(sde_brownian.py:35 / sde_linear.py:44); negative "
                        f"times (min {t_min:.3g}) are outside the process "
                        f"domain — shift the time axis to start at >= 0")
            except jax.errors.TracerArrayConversionError:
                pass
        k = len(family) if isinstance(family, tuple) else None

        def vec(v):
            v = jnp.asarray(v, dtype=float)
            if k is None:
                return v.reshape(())
            return jnp.broadcast_to(v.reshape(-1), (k,))

        return cls(
            variance=vec(variance),
            lengthscale=vec(lengthscale),
            noise_variance=jnp.asarray(noise_var, dtype=float).reshape(()),
            period=vec(period),
            lengthscale_damp=vec(lengthscale_damp),
            X=X, Y=Y, family=family, order=order,
        )

    # ------------------------------------------------------------------ matrices
    def _component(self, family, variance, lengthscale, period, ls_damp, dtype):
        """One kernel component -> (F, Qc_full, P0, H, kind).

        kind: 'stationary' (Q from P_inf - A P_inf A^T; P0 == P_inf),
        'vanloan' (Q = Phi_12 A^T from the block expm; P0 is the t=0 initial
        covariance — brownian/linear, sde_brownian.py:35 / sde_linear.py:44),
        'white' (degenerate F=-inf: A=0, Q=P_inf per step, sde_static.py:35).
        """
        if family in ("matern12", "matern32", "matern52"):
            F, P, H = _matern_blocks(family, variance, lengthscale, dtype)
            return F, None, P, H, "stationary"
        if family == "periodic":
            F, P, H = _periodic_blocks(variance, lengthscale, period, self.order,
                                       dtype)
            return F, None, P, H, "stationary"
        if family.startswith("quasiperiodic_"):
            m_family = family.split("_", 1)[1]
            Fp, Pp, Hp = _periodic_blocks(variance, lengthscale, period,
                                          self.order, dtype)
            Fm, Pm, Hm = _matern_blocks(m_family, jnp.asarray(1.0, dtype),
                                        ls_damp, dtype)
            F, P, H = _kron_product(Fp, Pp, Hp, Fm, Pm, Hm)
            return F, None, P, H, "stationary"
        if family == "rbf":
            F, P, H = _rbf_blocks(variance, lengthscale, self.order, dtype)
            return F, None, P, H, "stationary"
        if family == "white":
            one = jnp.ones((1, 1), dtype=dtype)
            return jnp.zeros((1, 1), dtype=dtype), None, variance * one, one, \
                "white"
        if family == "bias":
            # F=0 -> A=I, Q = P - P = 0: a frozen random constant
            one = jnp.ones((1, 1), dtype=dtype)
            return jnp.zeros((1, 1), dtype=dtype), None, variance * one, one, \
                "stationary"
        if family == "brownian":
            one = jnp.ones((1, 1), dtype=dtype)
            return (jnp.zeros((1, 1), dtype=dtype), variance * one,
                    jnp.zeros((1, 1), dtype=dtype), one, "vanloan")
        if family == "linear":
            # 'period' slot carries t0 (K = sigma^2 (x + t0)(x' + t0); t0=0 is
            # the plain Linear kernel). State [f, f'], integrator dynamics.
            t0 = period
            F = jnp.zeros((2, 2), dtype=dtype).at[0, 1].set(1.0)
            Qc = jnp.zeros((2, 2), dtype=dtype)
            P0 = variance * jnp.stack([
                jnp.stack([t0 * t0, t0]), jnp.stack([t0, jnp.ones_like(t0)])
            ])
            H = jnp.asarray([[1.0, 0.0]], dtype=dtype)
            return F, Qc, P0, H, "vanloan"
        raise ValueError(f"unsupported state-space family {family!r}")

    def _component_specs(self):
        dtype = self.X.dtype
        fams = self.family if isinstance(self.family, tuple) else (self.family,)
        specs = []
        for i, fam in enumerate(fams):
            if isinstance(self.family, tuple):
                v, l = self.variance[i], self.lengthscale[i]
                p, ld = self.period[i], self.lengthscale_damp[i]
            else:
                v, l = self.variance, self.lengthscale
                p = self.period if self.period is not None else jnp.asarray(1.0, dtype)
                ld = (self.lengthscale_damp
                      if self.lengthscale_damp is not None else jnp.asarray(1.0, dtype))
            specs.append(self._component(fam, v, l, p, ld, dtype))
        return specs

    def _origin_at_zero(self):
        fams = self.family if isinstance(self.family, tuple) else (self.family,)
        return any(f in ("brownian", "linear") for f in fams)

    @staticmethod
    def _discretize_component(spec, dts):
        F, Qc, P0, H, kind = spec
        d = F.shape[0]
        n = dts.shape[0]
        expm = jax.scipy.linalg.expm
        if kind == "white":
            A = jnp.zeros((n, d, d), dtype=F.dtype)
            Q = jnp.broadcast_to(P0, (n, d, d))
            return A, Q
        if kind == "stationary":
            def one(dt):
                A = expm(F * dt)
                Q = P0 - A @ P0 @ A.T
                return A, 0.5 * (Q + Q.T)
            return jax.vmap(one)(dts)
        # vanloan: Q(dt) = int_0^dt e^{Fs} Qc e^{F^T s} ds = Phi_12 A^T with
        # Phi = expm([[F, Qc], [0, -F^T]] dt)  (Van Loan 1978)
        M = jnp.block([[F, Qc], [jnp.zeros_like(F), -F.T]])

        def one(dt):
            Phi = expm(M * dt)
            A = Phi[:d, :d]
            Q = Phi[:d, d:] @ A.T
            return A, 0.5 * (Q + Q.T)

        return jax.vmap(one)(dts)

    def _discretize(self, dts):
        """Per-step transition A_k and process noise Q_k for the (possibly
        summed/block-diagonal) model, plus initial covariance P0 and H."""
        specs = self._component_specs()
        dtype = self.X.dtype
        if len(specs) == 1:
            A, Q = self._discretize_component(specs[0], dts)
            return A, Q, specs[0][2], specs[0][3]
        dims = [s[0].shape[0] for s in specs]
        D = sum(dims)
        n = dts.shape[0]
        A = jnp.zeros((n, D, D), dtype=dtype)
        Q = jnp.zeros((n, D, D), dtype=dtype)
        P0 = jnp.zeros((D, D), dtype=dtype)
        Hs = []
        off = 0
        for spec, di in zip(specs, dims):
            Ai, Qi = self._discretize_component(spec, dts)
            A = A.at[:, off:off + di, off:off + di].set(Ai)
            Q = Q.at[:, off:off + di, off:off + di].set(Qi)
            P0 = P0.at[off:off + di, off:off + di].set(spec[2])
            Hs.append(spec[3])
            off += di
        H = jnp.concatenate(Hs, axis=1)
        return A, Q, P0, H

    # ------------------------------------------------------------------ inference
    def _filter(self, t, y, obs_mask):
        """Kalman filter over sorted times; y entries with obs_mask=0 are skipped
        (prediction-only steps). Returns per-step filtered (m, P) + lml."""
        order = jnp.argsort(t)
        t_s, y_s, mask_s = t[order], y[order], obs_mask[order]
        # brownian/linear components are pinned at t=0, so the filter clock
        # starts there; stationary components start at P_inf and are invariant
        # under the extra propagation.
        first = t_s[0:1] * 0.0 if self._origin_at_zero() else t_s[0:1]
        dts = jnp.diff(t_s, prepend=first)
        A, Q, P_inf, H = self._discretize(dts)
        d = P_inf.shape[0]
        R = self.noise_variance

        def step(carry, inp):
            m, P = carry
            Ak, Qk, yk, mk = inp
            m = Ak @ m
            P = Ak @ P @ Ak.T + Qk
            v = yk - (H @ m)[0]
            S = (H @ P @ H.T)[0, 0] + R
            K = (P @ H.T)[:, 0] / S
            ll = -0.5 * (LOG_2_PI + jnp.log(S) + v * v / S)
            m_upd = m + K * v
            P_upd = P - jnp.outer(K, (H @ P)[0])
            m_new = jnp.where(mk > 0, m_upd, m)
            P_new = jnp.where(mk > 0, P_upd, P)
            return (m_new, P_new), (m_new, P_new, ll * mk, m, P)

        m0 = jnp.zeros((d,), dtype=t.dtype)
        (mf, Pf), (ms, Ps, lls, m_pred, P_pred) = lax.scan(
            step, (m0, P_inf), (A, Q, y_s, mask_s)
        )
        # A *and* Q are returned so predict()'s RTS pass reuses this
        # discretization — the batched expm over all steps is the dominant
        # O(N d^3) cost and was previously recomputed
        return order, t_s, (ms, Ps), (m_pred, P_pred), (A, Q), H, jnp.sum(lls)

    def log_marginal_likelihood(self):
        t = self.X[:, 0]
        y = self.Y[:, 0]
        mask = jnp.ones_like(t)
        *_, lml = self._filter(t, y, mask)
        return lml

    def predict(self, Xnew, include_likelihood=True):
        """RTS smoother over the merged train+test timeline."""
        t_train = self.X[:, 0]
        y_train = self.Y[:, 0]
        t_new = jnp.asarray(Xnew, dtype=self.X.dtype).reshape(-1)
        t_all = jnp.concatenate([t_train, t_new])
        y_all = jnp.concatenate([y_train, jnp.zeros_like(t_new)])
        mask = jnp.concatenate([jnp.ones_like(t_train), jnp.zeros_like(t_new)])

        order, t_s, (mf, Pf), _, (A2, Q2), H2, _ = self._filter(t_all, y_all, mask)

        def rts(carry, inp):
            ms_next, Ps_next = carry
            mfk, Pfk, A_next, Q_next = inp
            m_pred = A_next @ mfk
            P_pred = A_next @ Pfk @ A_next.T + Q_next
            G = Pfk @ A_next.T @ jnp.linalg.inv(
                P_pred + 1e-10 * jnp.eye(P_pred.shape[0], dtype=P_pred.dtype)
            )
            ms_k = mfk + G @ (ms_next - m_pred)
            Ps_k = Pfk + G @ (Ps_next - P_pred) @ G.T
            return (ms_k, Ps_k), (ms_k, Ps_k)

        # align: transition k -> k+1 uses A/Q at index k+1
        A_next = A2[1:]
        Q_next = Q2[1:]
        init = (mf[-1], Pf[-1])
        (_, _), (ms_rev, Ps_rev) = lax.scan(
            rts, init, (mf[:-1][::-1], Pf[:-1][::-1], A_next[::-1], Q_next[::-1])
        )
        ms = jnp.concatenate([ms_rev[::-1], mf[-1:]], axis=0)
        Ps = jnp.concatenate([Ps_rev[::-1], Pf[-1:]], axis=0)

        mu_all = ms @ H2[0]
        var_all = jax.vmap(lambda P: (H2 @ P @ H2.T)[0, 0])(Ps)
        if include_likelihood:
            var_all = var_all + self.noise_variance

        # un-sort and take the test entries
        inv = jnp.argsort(order)
        mu = mu_all[inv][len(t_train):]
        var = var_all[inv][len(t_train):]
        return mu[:, None], jnp.clip(var, 1e-15, None)[:, None]
