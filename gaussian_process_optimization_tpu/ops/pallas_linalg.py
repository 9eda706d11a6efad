"""Pallas TPU kernels for the batched small-factorization hot spots.

The exact-GP fit's floor at the headline shape (N=4096, B=5 restarts) is the
blocked Cholesky / triangular-inverse stack (`ops/linalg.py`): the MXU panel
updates run near the f32-`highest` matmul ceiling, but the per-panel
DIAGONAL-BLOCK factorizations — batched (B, nb, nb) Cholesky and the
(B*n_blocks, block, block) triangular inverses — are executed essentially
serially per lane by XLA, and their sequential-recursion latency is roughly
half of the measured 11-12 ms per op (BASELINE.md round-4 block-size sweep).

These kernels restructure that stage TPU-natively: ONE kernel launch holds all
G lanes' blocks in VMEM and runs the column recursion VECTORIZED ACROSS LANES —
each sequential step is a full-width VPU op over every lane at once (masked
rank-1 panel updates; batched MXU dots for trailing/merge updates), so the
recursion depth is paid once instead of per lane. This replaces the role of
LAPACK's dpotrf/dtrtri inner blocking in the reference
(GPy/GPy/util/linalg.py:56 jitchol -> scipy potrf, :193 pdinv -> dtrtri).

A `custom_vmap` rule folds `jax.vmap` batching (the fit vmaps its restart
lanes) into the explicit lane axis G — without it, Pallas's default batching
rule would prepend a sequential grid dimension and re-serialize the lanes.

Numerics: same arithmetic class as the XLA ops they replace (f32 on TPU;
rsqrt/divide per column). Non-positive-definite lanes produce NaN/Inf exactly
like XLA's Cholesky, so the jitter ladder's per-lane finiteness check
(`ops/linalg.py _jitchol_loop`) is unaffected. Consistency tests:
tests/test_pallas_linalg.py (interpret mode vs jnp, CPU x64).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..config import config, pallas_enabled

_MB = 32  # micro-panel width: recursion steps are (G, m, _MB) VPU ops
_VMEM_BUDGET = 10 * 1024 * 1024  # in+out blocks per grid program
_LANES = 8  # lanes per grid program — FIXED so every call site compiles the
# SAME kernel shape per (nb, dtype). A VMEM-filling chunk (19 lanes at nb=256)
# sent Mosaic's remote compile into a >50-minute blowup (round-5 profiler log);
# gc=8 compiles in minutes and the recursion latency it pays per grid step is
# amortized over 8 lanes already.


def _lane_chunk(G: int, nb: int, itemsize: int) -> int:
    per_lane = 2 * nb * nb * itemsize
    return max(1, min(_LANES, _VMEM_BUDGET // per_lane))


def _make_chol_kernel(nb: int, mb: int):
    """Blocked right-looking Cholesky of (G, nb, nb), all lanes at once.

    Per micro-panel j: the mb-column recursion runs on the (G, nb-j, mb) panel
    (masked rank-1 updates — produces L11 AND L21 with no separate triangular
    solve), then one batched MXU dot applies the rank-mb trailing update.
    """
    def kernel(a_ref, o_ref):
        o_ref[:] = a_ref[:]
        for j in range(0, nb, mb):
            m = nb - j
            P = o_ref[:, j:, j : j + mb]  # (G, m, mb)
            # masks via iota (Pallas kernels cannot capture array constants)
            col_idx = lax.broadcasted_iota(jnp.int32, (1, 1, mb), 2)
            row_idx = lax.broadcasted_iota(jnp.int32, (1, m), 1)
            for t in range(mb):
                d = P[:, t, t]  # (G,)
                dinv = lax.rsqrt(d)
                col = P[:, :, t] * dinv[:, None]  # (G, m)
                col = jnp.where(row_idx >= t, col, 0.0)
                # rank-1 update of the not-yet-final columns (> t) only
                upd = col[:, :, None] * jnp.where(
                    col_idx > t, col[:, :mb][:, None, :], 0.0
                )
                P = jnp.where(col_idx == t, col[:, :, None], P - upd)
            # zero the strictly-upper part of the top mb x mb block
            tril = (lax.broadcasted_iota(jnp.int32, (m, mb), 0)
                    >= lax.broadcasted_iota(jnp.int32, (m, mb), 1))
            P = jnp.where(tril[None], P, 0.0)
            o_ref[:, j:, j : j + mb] = P
            if j + mb < nb:
                L21 = P[:, mb:, :]  # (G, m-mb, mb)
                T = o_ref[:, j + mb :, j + mb :]
                o_ref[:, j + mb :, j + mb :] = T - lax.dot_general(
                    L21,
                    L21,
                    (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=T.dtype,
                    precision=lax.Precision.HIGHEST,
                )
        # the region above each panel (rows < j, cols j:j+mb) was never
        # touched and still holds A's upper triangle — zero it
        tril_full = (lax.broadcasted_iota(jnp.int32, (nb, nb), 0)
                     >= lax.broadcasted_iota(jnp.int32, (nb, nb), 1))
        o_ref[:] = jnp.where(tril_full[None], o_ref[:], 0.0)

    return kernel


def _make_triinv_kernel(nb: int, mb: int):
    """Lower-triangular inverse of (G, nb, nb), all lanes at once: invert the
    mb x mb diagonal micro-blocks by forward-substitution recursion, then merge
    up the in-VMEM divide-and-conquer tree with batched MXU dots
    ([[A,0],[C,D]]^-1 lower block = -D^-1 C A^-1)."""
    def kernel(l_ref, o_ref):
        o_ref[:] = jnp.zeros_like(o_ref)
        row_idx = lax.broadcasted_iota(jnp.int32, (1, mb, 1), 1)
        col_iota = lax.broadcasted_iota(jnp.int32, (1, mb), 1)
        for j in range(0, nb, mb):
            D = l_ref[:, j : j + mb, j : j + mb]  # (G, mb, mb)
            X = jnp.zeros_like(D)
            for t in range(mb):
                # row t of D via an iota-mask reduction — integer indexing
                # (D[:, t, :]) lowers to a >2D gather Mosaic rejects
                sel_t = (row_idx == t).astype(D.dtype)  # (1, mb, 1)
                d_row = jnp.sum(D * sel_t, axis=1)  # (G, mb)
                acc = jnp.sum(d_row[:, :, None] * X, axis=1)  # (G, mb)
                e_t = jnp.where(col_iota == t, 1.0, 0.0).astype(D.dtype)
                d_tt = jnp.sum(d_row * e_t, axis=1)  # (G,)
                r = (e_t - acc) / d_tt[:, None]
                X = jnp.where(row_idx == t, r[:, None, :], X)
            o_ref[:, j : j + mb, j : j + mb] = X
        sc = mb
        while sc < nb:
            for off in range(0, nb, 2 * sc):
                Ai = o_ref[:, off : off + sc, off : off + sc]
                Di = o_ref[:, off + sc : off + 2 * sc, off + sc : off + 2 * sc]
                C = l_ref[:, off + sc : off + 2 * sc, off : off + sc]
                CA = lax.dot_general(
                    C, Ai, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=C.dtype,
                    precision=lax.Precision.HIGHEST,
                )
                o_ref[:, off + sc : off + 2 * sc, off : off + sc] = (
                    -lax.dot_general(
                        Di, CA, (((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=C.dtype,
                        precision=lax.Precision.HIGHEST,
                    )
                )
            sc *= 2

    return kernel


@functools.partial(jax.jit, static_argnames=("make_kernel", "interpret"))
def _run_blocks(A, make_kernel, interpret):
    """Launch a (G, nb, nb) all-lanes kernel, chunking lanes to the VMEM
    budget via the grid (grid programs run sequentially on the TensorCore, so
    the chunk is kept as large as VMEM allows)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    G, nb = A.shape[0], A.shape[-1]
    gc = _lane_chunk(G, nb, A.dtype.itemsize)
    Gp = -(-G // gc) * gc
    if Gp != G:  # pad with identity lanes (factor/inverse of I is I)
        pad = jnp.broadcast_to(jnp.eye(nb, dtype=A.dtype), (Gp - G, nb, nb))
        A = jnp.concatenate([A, pad], axis=0)
    out = pl.pallas_call(
        make_kernel(nb, _MB),
        out_shape=jax.ShapeDtypeStruct((Gp, nb, nb), A.dtype),
        grid=(Gp // gc,),
        in_specs=[
            pl.BlockSpec((gc, nb, nb), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((gc, nb, nb), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        # blocks + per-micro-panel stack temporaries total ~17 MB at
        # gc=8/nb=256 — over Mosaic's 16 MB DEFAULT scoped-vmem limit
        # (a remote-compiler default change surfaced this mid-round-5 as a
        # compile-time OOM). v5e has 128 MB of VMEM; raise the scoped limit
        # explicitly so the budget is ours, not the compiler default's.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(A)
    return out[:G]


def _make_entry(make_kernel, fallback):
    """(G, nb, nb) entry with a custom_vmap rule that folds vmap batching into
    the lane axis (Pallas's default rule would serialize it through the grid).
    """
    cv = jax.custom_batching.custom_vmap(
        lambda A: _run_blocks(A, make_kernel, config.pallas_interpret)
    )

    @cv.def_vmap
    def _rule(axis_size, in_batched, A):  # noqa: ANN001
        out = cv(A.reshape((-1,) + A.shape[-2:]))
        return out.reshape(A.shape), True

    def entry(A):
        nb = A.shape[-1]
        eligible = (
            (pallas_enabled() or config.pallas_interpret)
            and A.ndim >= 2
            and nb == A.shape[-2]
            and nb % _MB == 0
            and nb >= _MB
            and (A.dtype == jnp.float32 or config.pallas_interpret)
        )
        if not eligible:
            return fallback(A)
        batch = A.shape[:-2]
        out = cv(A.reshape((-1, nb, nb)))
        return out.reshape(batch + (nb, nb))

    return entry


def _triinv_fallback(L):
    eye = jnp.broadcast_to(jnp.eye(L.shape[-1], dtype=L.dtype), L.shape)
    return lax.linalg.triangular_solve(L, eye, left_side=True, lower=True)


cholesky_blocks = _make_entry(_make_chol_kernel, jnp.linalg.cholesky)
cholesky_blocks.__doc__ = (
    "Batched Cholesky of (..., nb, nb) diagonal blocks, all lanes factored in "
    "one Pallas launch (falls back to jnp.linalg.cholesky when Pallas is "
    "disabled or the shape is ineligible). NaN on non-PD lanes, like XLA."
)

tri_inv_blocks = _make_entry(_make_triinv_kernel, _triinv_fallback)
tri_inv_blocks.__doc__ = (
    "Batched lower-triangular inverse of (..., nb, nb) blocks in one Pallas "
    "launch (falls back to XLA triangular_solve vs identity when ineligible)."
)
