"""ODE-derived multi-output kernels (GPy kern/src/ODE_UY.py, ODE_UYC.py,
ODE_t.py, ODE_st.py).

Joint GP kernels over (input..., output_index) where the last input column is
the output index (the reference's index_to_slices convention) and the outputs
are related by a linear ODE operator:

- ODE_UY (ODE_UY.py:10): outputs (U, Y) with a dy/dt + b y = U, U ~ Matern-3/2.
  Index 0 = U, index 1 = Y. With lu = sqrt(3)/lengthscale_U, ly = 1/lengthscale_Y
  and the filter y(t) = sqrt(2 ly Vy) int_{-inf}^t e^{-ly (t-s)} U(s) ds, the
  closed forms below were verified against 2-D/1-D quadrature of that filter
  (see tests/test_ode_kernels.py). NOTE the reference __init__ initializes
  variance_U/lengthscale_U from the Y values (ODE_UY.py:16-18, an upstream
  init-value bug); ours initializes each parameter from its own argument.
- ODE_UYC (ODE_UYC.py:12): ODE_UY plus a `ubias` constant added to the U-U
  block only (the reference does not propagate the bias through the filter —
  replicated as-is).
- ODE_t (ODE_t.py:11): outputs (Y, U) with U = Y + dY/dt, Y ~ RBF with
  k(t,t') = vyt exp(-(t-t')^2 / (2 lengthscale_Yt)); blocks are the derivative
  operator images (1+d/dt)(1+d/dt') k. `a`/`c` are linked parameters upstream
  but UNUSED in K (ODE_t.py:41-46 computes then ignores them) — replicated.
  `ubias` is added to the U-U block.
- ODE_st (ODE_st.py:10): spatio-temporal outputs (Y, U) over inputs (t, x,
  index) with U = -a d^2Y/dx^2 + b dY/dt + c Y, Y ~ separable RBF
  exp(-(dt^2)/(2 l_t) - (dx^2)/(2 l_x)); blocks are the operator images
  L k, L L' k (cross terms in b and the a-b mix cancel by stationarity).

All blocks are assembled as ONE branchless masked select over the index column
(vmappable/jit-safe, replacing the reference's quadruple slice loops); gradients
come from autodiff. Consistency tests: quadrature (UY/UYC) and autodiff-applied
operators on the base kernel (t/st).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..utils.pytree import pytree_dataclass
from .base import Kernel


def _index_masks(X, X2):
    idx1 = X[:, -1]
    idx2 = (X if X2 is None else X2)[:, -1]
    m1 = idx1[:, None]  # (n, 1)
    m2 = idx2[None, :]  # (1, m)
    uu = (m1 < 0.5) & (m2 < 0.5)
    uy = (m1 < 0.5) & (m2 >= 0.5)
    yu = (m1 >= 0.5) & (m2 < 0.5)
    yy = (m1 >= 0.5) & (m2 >= 0.5)
    return uu, uy, yu, yy


@pytree_dataclass
class ODE_UY(Kernel):
    """First-order ODE output kernel: index 0 = U (Matern-3/2 force), index 1
    = Y (filtered response). See module docstring; ODE_UY.py:10."""

    variance_U: jnp.ndarray = None
    variance_Y: jnp.ndarray = None
    lengthscale_U: jnp.ndarray = None
    lengthscale_Y: jnp.ndarray = None

    @classmethod
    def create(cls, input_dim=2, variance_U=3.0, variance_Y=1.0,
               lengthscale_U=1.0, lengthscale_Y=1.0, active_dims=None):
        if input_dim != 2:
            raise ValueError("ODE_UY is defined for input_dim=2 (time, index)")
        s = lambda v: jnp.asarray(v, dtype=float).reshape(())
        return cls(
            input_dim=input_dim,
            active_dims=tuple(active_dims) if active_dims is not None else None,
            variance_U=s(variance_U), variance_Y=s(variance_Y),
            lengthscale_U=s(lengthscale_U), lengthscale_Y=s(lengthscale_Y),
        )

    def _rates(self):
        lu = jnp.sqrt(3.0) / self.lengthscale_U
        ly = 1.0 / self.lengthscale_Y
        return lu, ly

    def _kuu(self, adist):
        lu, _ = self._rates()
        return self.variance_U * (1 + lu * adist) * jnp.exp(-lu * adist)

    def _kyy(self, adist):
        lu, ly = self._rates()
        k1 = jnp.exp(-ly * adist) * (2 * lu + ly) / (lu + ly) ** 2
        k2 = (jnp.exp(-lu * adist) * (ly - 2 * lu + lu * ly * adist
                                      - lu ** 2 * adist)
              + jnp.exp(-ly * adist) * (2 * lu - ly)) / (ly - lu) ** 2
        k3 = jnp.exp(-lu * adist) * ((1 + lu * adist) / (lu + ly)
                                     + lu / (lu + ly) ** 2)
        return self.variance_U * self.variance_Y * (k1 + k2 + k3)

    def _kuy(self, rdist):
        """Cov(U(t_u), Y(t_y)) with rdist = t_u - t_y (ODE_UY.py:59-77)."""
        lu, ly = self._rates()
        vyu = jnp.sqrt(self.variance_Y * ly * 2.0)
        # where() evaluates both branches: clamp each branch's argument to its
        # own half-line so exp() never overflows (and autodiff stays NaN-free)
        dp = jnp.maximum(rdist, 0.0)
        dn = jnp.minimum(rdist, 0.0)
        kyu3 = jnp.exp(-lu * dp) / (lu + ly) * (1 + lu * (dp + 1 / (lu + ly)))
        e = jnp.exp((lu - ly) * dn)
        k1c = jnp.exp(ly * dn) / (lu - ly) * (
            1 - e + lu * (dn * e + (1 - e) / (lu - ly)))
        k2c = jnp.exp(ly * dn) * (1 / (lu + ly) + lu / (lu + ly) ** 2)
        pos = self.variance_U * vyu * kyu3
        neg = self.variance_U * vyu * (k1c + k2c)
        return jnp.where(rdist > 0, pos, neg)

    def K(self, X, X2=None):
        t1 = X[:, 0][:, None]
        t2 = (X if X2 is None else X2)[:, 0][None, :]
        rdist = t1 - t2
        adist = jnp.abs(rdist)
        uu, uy, yu, yy = _index_masks(X, X2)
        K = jnp.where(uu, self._kuu(adist), 0.0)
        K = K + jnp.where(yy, self._kyy(adist), 0.0)
        K = K + jnp.where(uy, self._kuy(rdist), 0.0)
        # Cov(Y(t_y), U(t_u)) = Cov(U(t_u), Y(t_y)) = _kuy(t_u - t_y) = _kuy(-rdist)
        K = K + jnp.where(yu, self._kuy(-rdist), 0.0)
        return K

    def Kdiag(self, X):
        lu, ly = self._rates()
        k1 = (2 * lu + ly) / (lu + ly) ** 2
        k3 = 1 / (lu + ly) + lu / (lu + ly) ** 2
        yvar = self.variance_U * self.variance_Y * (k1 + k3)  # k2(0) = 0
        is_y = X[:, -1] >= 0.5
        return jnp.where(is_y, yvar, self.variance_U)


@pytree_dataclass
class ODE_UYC(ODE_UY):
    """ODE_UY + constant `ubias` on the U-U block only (ODE_UYC.py:12,:46)."""

    ubias: jnp.ndarray = None

    @classmethod
    def create(cls, input_dim=2, variance_U=3.0, variance_Y=1.0,
               lengthscale_U=1.0, lengthscale_Y=1.0, ubias=1.0,
               active_dims=None):
        base = ODE_UY.create(input_dim, variance_U, variance_Y,
                             lengthscale_U, lengthscale_Y, active_dims)
        return cls(
            input_dim=base.input_dim, active_dims=base.active_dims,
            variance_U=base.variance_U, variance_Y=base.variance_Y,
            lengthscale_U=base.lengthscale_U, lengthscale_Y=base.lengthscale_Y,
            ubias=jnp.asarray(ubias, dtype=float).reshape(()),
        )

    def _kuu(self, adist):
        return super()._kuu(adist) + self.ubias

    def Kdiag(self, X):
        base = super().Kdiag(X)
        is_u = X[:, -1] < 0.5
        return base + jnp.where(is_u, self.ubias, 0.0)


@pytree_dataclass
class ODE_t(Kernel):
    """U = Y + dY/dt over an RBF Y (ODE_t.py:11). Index 0 = Y, index 1 = U.
    k(t,t') = vyt exp(-(t-t')^2 lyt), lyt = 1/(2 lengthscale_Yt). `a`/`c` are
    parameters upstream but unused in the covariance (ODE_t.py:41-46) —
    replicated for parameter-surface parity."""

    a: jnp.ndarray = None
    c: jnp.ndarray = None
    variance_Yt: jnp.ndarray = None
    lengthscale_Yt: jnp.ndarray = None
    ubias: jnp.ndarray = None

    @classmethod
    def create(cls, input_dim=2, a=1.0, c=1.0, variance_Yt=3.0,
               lengthscale_Yt=1.5, ubias=1.0, active_dims=None):
        if input_dim != 2:
            raise ValueError("ODE_t is defined for input_dim=2 (time, index)")
        s = lambda v: jnp.asarray(v, dtype=float).reshape(())
        return cls(
            input_dim=input_dim,
            active_dims=tuple(active_dims) if active_dims is not None else None,
            a=s(a), c=s(c), variance_Yt=s(variance_Yt),
            lengthscale_Yt=s(lengthscale_Yt), ubias=s(ubias),
        )

    def K(self, X, X2=None):
        t1 = X[:, 0][:, None]
        t2 = (X if X2 is None else X2)[:, 0][None, :]
        td = t1 - t2
        td2 = td * td
        lyt = 1.0 / (2.0 * self.lengthscale_Yt)
        v = self.variance_Yt
        base = v * jnp.exp(-lyt * td2)
        yy_, yu_, uy_, uu_ = _index_masks(X, X2)  # here index 0 = Y
        k_yy = base
        k_yu = (1 + 2 * lyt * td) * base           # (1)(1 + d/dt') k
        k_uy = (1 - 2 * lyt * td) * base
        k_uu = (1 + 2 * lyt - 4 * lyt ** 2 * td2) * base + self.ubias
        return (jnp.where(yy_, k_yy, 0.0) + jnp.where(yu_, k_yu, 0.0)
                + jnp.where(uy_, k_uy, 0.0) + jnp.where(uu_, k_uu, 0.0))

    def Kdiag(self, X):
        lyt = 1.0 / (2.0 * self.lengthscale_Yt)
        v = self.variance_Yt
        is_u = X[:, -1] >= 0.5
        return jnp.where(is_u, 2 * lyt * v + v + self.ubias,
                         jnp.full((X.shape[0],), 1.0, X.dtype) * v)


@pytree_dataclass
class ODE_st(Kernel):
    """Spatio-temporal first-order reaction-diffusion kernel (ODE_st.py:10):
    inputs (t, x, index), index 0 = Y ~ separable RBF, index 1 =
    U = -a d^2Y/dx^2 + b dY/dt + c Y. Blocks are the operator images of the
    base kernel; the b-odd and a-b cross terms cancel by stationarity."""

    a: jnp.ndarray = None
    b: jnp.ndarray = None
    c: jnp.ndarray = None
    variance_Yt: jnp.ndarray = None
    variance_Yx: jnp.ndarray = None
    lengthscale_Yt: jnp.ndarray = None
    lengthscale_Yx: jnp.ndarray = None

    @classmethod
    def create(cls, input_dim=3, a=1.0, b=1.0, c=1.0, variance_Yx=3.0,
               variance_Yt=1.5, lengthscale_Yx=1.5, lengthscale_Yt=1.5,
               active_dims=None):
        if input_dim != 3:
            raise ValueError("ODE_st is defined for input_dim=3 (t, x, index)")
        s = lambda v: jnp.asarray(v, dtype=float).reshape(())
        return cls(
            input_dim=input_dim,
            active_dims=tuple(active_dims) if active_dims is not None else None,
            a=s(a), b=s(b), c=s(c),
            variance_Yt=s(variance_Yt), variance_Yx=s(variance_Yx),
            lengthscale_Yt=s(lengthscale_Yt), lengthscale_Yx=s(lengthscale_Yx),
        )

    def K(self, X, X2=None):
        X2c = X if X2 is None else X2
        td = X[:, 0][:, None] - X2c[:, 0][None, :]
        xd = X[:, 1][:, None] - X2c[:, 1][None, :]
        td2, xd2 = td * td, xd * xd
        lyt = 1.0 / (2.0 * self.lengthscale_Yt)
        lyx = 1.0 / (2.0 * self.lengthscale_Yx)
        a, b, c = self.a, self.b, self.c
        v = self.variance_Yt * self.variance_Yx
        base = v * jnp.exp(-lyt * td2 - lyx * xd2)
        k1 = 2 * lyt - 4 * lyt ** 2 * td2        # d^2k/dt dt' factor
        k2 = 4 * lyx ** 2 * xd2 - 2 * lyx        # d^2k/dx^2 factor
        k3 = 12 * lyx ** 2 - 48 * xd2 * lyx ** 3 + 16 * xd2 ** 2 * lyx ** 4
        k4 = 2 * lyt * td                        # dk/dt' factor
        yy_, yu_, uy_, uu_ = _index_masks(X, X2)  # index 0 = Y
        k_yy = base
        k_yu = (-a * k2 + b * k4 + c) * base      # L'(k), ODE_st.py:93
        k_uy = (-a * k2 - b * k4 + c) * base
        k_uu = (b ** 2 * k1 - 2 * a * c * k2 + a ** 2 * k3 + c ** 2) * base
        return (jnp.where(yy_, k_yy, 0.0) + jnp.where(yu_, k_yu, 0.0)
                + jnp.where(uy_, k_uy, 0.0) + jnp.where(uu_, k_uu, 0.0))

    def Kdiag(self, X):
        lyt = 1.0 / (2.0 * self.lengthscale_Yt)
        lyx = 1.0 / (2.0 * self.lengthscale_Yx)
        a, b, c = self.a, self.b, self.c
        v = self.variance_Yt * self.variance_Yx
        u_diag = (b ** 2 * (2 * lyt) + 2 * a * c * (2 * lyx)
                  + a ** 2 * (12 * lyx ** 2) + c ** 2) * v
        is_u = X[:, -1] >= 0.5
        return jnp.where(is_u, u_diag, jnp.full((X.shape[0],), 1.0, X.dtype) * v)
