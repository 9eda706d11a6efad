"""TPU profile: Pallas all-lanes diag-block kernels vs XLA (slope method).

Measures the round-5 headline lever (VERDICT r4 #1): batched (G, nb, nb)
Cholesky / triangular inverse where XLA serializes the lanes. Follows the
prof_ops.py protocol — fori_loop slope at two trip counts, operands as jit
ARGUMENTS, full-output reduction into the carry.

Run alone (single-client tunnel): timeout 580 python benchmarks/prof_pallas_linalg.py
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).parent.parent / ".jax_cache"))

    from gaussian_process_optimization_tpu.config import config
    from gaussian_process_optimization_tpu.ops import linalg
    from gaussian_process_optimization_tpu.ops import pallas_linalg as pli

    rng = np.random.default_rng(0)

    def slope(make_body, carry0, trips=(4, 12), label="", operands=()):
        def prog(n_trips):
            @jax.jit
            def run(c0, *ops):
                return lax.fori_loop(
                    0, n_trips, lambda i, c: make_body(i, c, *ops), c0)
            return run

        ts = {}
        for nt in trips:
            run = prog(nt)
            c = run(carry0, *operands)
            float(jnp.sum(c))
            reps = []
            for r in range(3):
                t0 = time.perf_counter()
                c = run(carry0 + 1e-6 * (r + 1), *operands)
                float(jnp.sum(c))
                reps.append(time.perf_counter() - t0)
            ts[nt] = float(np.median(reps))
        per_op = (ts[trips[1]] - ts[trips[0]]) / (trips[1] - trips[0])
        print(f"{label:<46s} {per_op * 1e3:8.2f} ms", flush=True)
        return per_op

    def spd(G, nb):
        X = rng.standard_normal((G, nb, nb)).astype(np.float32)
        return jnp.asarray(X @ np.swapaxes(X, 1, 2) + nb * np.eye(nb, dtype=np.float32))

    # ---- correctness on device first (cheap shapes) ----
    A = spd(5, 256)
    Lx = np.asarray(jnp.linalg.cholesky(A))
    Lp = np.asarray(pli.cholesky_blocks(A))
    err = np.max(np.abs(Lp - Lx))
    print(f"device correctness: chol max abs err {err:.3e}", flush=True)
    assert err < 1e-2, "Pallas cholesky_blocks disagrees with XLA on device"
    Lxj = jnp.asarray(Lx)
    Li_x = np.asarray(lax.linalg.triangular_solve(
        Lxj, jnp.broadcast_to(jnp.eye(256, dtype=jnp.float32), Lxj.shape),
        left_side=True, lower=True))
    Li_p = np.asarray(pli.tri_inv_blocks(Lxj))
    err2 = np.max(np.abs(Li_p - Li_x))
    print(f"device correctness: tri_inv max abs err {err2:.3e}", flush=True)
    assert err2 < 1e-2

    # ---- diag-block shapes the fit actually hits ----
    for G, nb in [(5, 256), (80, 256), (5, 512)]:
        A = spd(G, nb)

        def chol_xla(i, c, A):
            return jnp.sum(jnp.linalg.cholesky(A + c * 1e-12)) * 1e-20 + c
        slope(chol_xla, jnp.float32(0.0), operands=(A,),
              label=f"chol XLA batched (G={G},nb={nb})")

        def chol_pl(i, c, A):
            return jnp.sum(pli.cholesky_blocks(A + c * 1e-12)) * 1e-20 + c
        slope(chol_pl, jnp.float32(0.0), operands=(A,),
              label=f"chol Pallas all-lanes (G={G},nb={nb})")

        L = jnp.linalg.cholesky(A)

        def tinv_xla(i, c, L):
            eye = jnp.broadcast_to(jnp.eye(L.shape[-1], dtype=L.dtype), L.shape)
            return jnp.sum(lax.linalg.triangular_solve(
                L + c * 1e-12, eye, left_side=True, lower=True)) * 1e-20 + c
        slope(tinv_xla, jnp.float32(0.0), operands=(L,),
              label=f"tri_inv XLA solve-vs-I (G={G},nb={nb})")

        def tinv_pl(i, c, L):
            return jnp.sum(pli.tri_inv_blocks(L + c * 1e-12)) * 1e-20 + c
        slope(tinv_pl, jnp.float32(0.0), operands=(L,),
              label=f"tri_inv Pallas all-lanes (G={G},nb={nb})")

    # ---- end-to-end ops at the headline shape (N=4096, B=5) ----
    N, B = 4096, 5
    A0 = rng.standard_normal((B, N, 32)).astype(np.float32)
    Ky = jnp.asarray(A0 @ np.swapaxes(A0, 1, 2) + (N / 8) * np.eye(N, dtype=np.float32))

    for use in (False, True):
        config.use_pallas = use
        tag = "pallas" if use else "xla-diag"

        def chol_blk(i, c, Ky):
            return jnp.sum(linalg.blocked_cholesky(Ky + c * 1e-12, nb=256)) * 1e-20 + c
        slope(chol_blk, jnp.float32(0.0), operands=(Ky,),
              label=f"blocked_cholesky nb=256 [{tag}] (B=5,N=4096)")

        L = jnp.linalg.cholesky(Ky)

        def tri_inv(i, c, L):
            return jnp.sum(linalg.tri_inv_lower(L + c * 1e-12, block=256)) * 1e-20 + c
        slope(tri_inv, jnp.float32(0.0), operands=(L,),
              label=f"tri_inv_lower block=256 [{tag}] (B=5,N=4096)")
    config.use_pallas = "auto"


if __name__ == "__main__":
    main()
