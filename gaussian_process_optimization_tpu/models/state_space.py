"""State-space (Kalman) form of 1-D GPs — linear-time exact inference.

Rebuild of ``GPy/GPy/models/state_space_main.py`` (3622 LoC) +
``state_space_cython.pyx`` (1001 LoC of Cython filter/smoother loops): Matern-family
kernels in 1-D are exactly Markovian SDEs, so LML and prediction are a Kalman filter
/ RTS smoother — O(N) instead of O(N^3). The Cython time loops become
``lax.scan`` (SURVEY 'native component summary' item 5).

Supported kernels: Matern-1/2 (OU/Exponential), Matern-3/2, Matern-5/2 — the exact
SDE forms; state dims 1/2/3.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..utils.pytree import pytree_dataclass, static_field

LOG_2_PI = float(np.log(2 * np.pi))


def _ss_matrices(family, variance, lengthscale, dtype):
    """Continuous-time (F, P_inf, H) for the Matern family."""
    if family == "matern12":
        lam = 1.0 / lengthscale
        F = jnp.asarray([[-lam]], dtype=dtype)
        P_inf = jnp.asarray([[1.0]], dtype=dtype) * variance
        H = jnp.asarray([[1.0]], dtype=dtype)
    elif family == "matern32":
        lam = jnp.sqrt(3.0) / lengthscale
        F = jnp.asarray([[0.0, 1.0], [0.0, 0.0]], dtype=dtype)
        F = F.at[1, 0].set(-lam**2).at[1, 1].set(-2 * lam)
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
        raise ValueError(f"unsupported state-space kernel {family!r}")
    return F, P_inf, H


@pytree_dataclass
class StateSpaceGP:
    """1-D GP regression in state-space form (GPy models/state_space.py)."""

    variance: jnp.ndarray = None
    lengthscale: jnp.ndarray = None
    noise_variance: jnp.ndarray = None
    X: jnp.ndarray = None  # (N, 1) inputs (times)
    Y: jnp.ndarray = None  # (N, 1)
    family: str = static_field(default="matern32")

    @classmethod
    def create(cls, X, Y, family="matern32", variance=1.0, lengthscale=1.0,
               noise_var=0.1):
        X = jnp.asarray(X, dtype=float).reshape(-1, 1)
        Y = jnp.asarray(Y, dtype=float).reshape(-1, 1)
        return cls(
            variance=jnp.asarray(variance, dtype=float).reshape(()),
            lengthscale=jnp.asarray(lengthscale, dtype=float).reshape(()),
            noise_variance=jnp.asarray(noise_var, dtype=float).reshape(()),
            X=X, Y=Y, family=family,
        )

    def _discretize(self, dts):
        F, P_inf, H = _ss_matrices(self.family, self.variance, self.lengthscale,
                                   self.X.dtype)
        expm = jax.scipy.linalg.expm

        def one(dt):
            A = expm(F * dt)
            Q = P_inf - A @ P_inf @ A.T
            return A, 0.5 * (Q + Q.T)

        A, Q = jax.vmap(one)(dts)
        return A, Q, P_inf, H

    def _filter(self, t, y, obs_mask):
        """Kalman filter over sorted times; y entries with obs_mask=0 are skipped
        (prediction-only steps). Returns per-step filtered (m, P) + lml."""
        order = jnp.argsort(t)
        t_s, y_s, mask_s = t[order], y[order], obs_mask[order]
        dts = jnp.diff(t_s, prepend=t_s[0:1])
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
        return order, t_s, (ms, Ps), (m_pred, P_pred), A, H, jnp.sum(lls)

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

        order, t_s, (mf, Pf), _, A, H, _ = self._filter(t_all, y_all, mask)

        # RTS smoother (reverse scan) over the filtered states
        dts = jnp.diff(t_s, prepend=t_s[0:1])
        A2, Q2, P_inf, H2 = self._discretize(dts)

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
