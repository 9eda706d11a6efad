"""TPU profile, round 2: production-path ops with the fixed 8-lane-chunk
Pallas kernels (ops/pallas_linalg.py _LANES=8 — the VMEM-filling 19-lane chunk
sent Mosaic's remote compile into a >50 min blowup; see round-5 log).

Measures ONLY what the N=4096 B=5 fit actually executes, against the round-4
XLA numbers (blocked_cholesky 11.87 ms, tri_inv_lower ~11.9 ms, LML value
22.6 ms, LML value+grad 74.2 ms — BASELINE.md):
  1. blocked_cholesky nb=256 with Pallas diag blocks
  2. tri_inv_lower block=256 with Pallas diag-block inverses
  3. LML value and value+grad (use_pallas on)

Run alone (single-client tunnel): timeout 5400 python benchmarks/prof_pallas_linalg2.py
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
            t0 = time.perf_counter()
            c = run(carry0, *operands)
            float(jnp.sum(c))
            print(f"#   compile+warm t{nt}: {time.perf_counter()-t0:.1f}s",
                  flush=True)
            reps = []
            for r in range(3):
                t0 = time.perf_counter()
                c = run(carry0 + 1e-6 * (r + 1), *operands)
                float(jnp.sum(c))
                reps.append(time.perf_counter() - t0)
            ts[nt] = float(np.median(reps))
        per_op = (ts[trips[1]] - ts[trips[0]]) / (trips[1] - trips[0])
        print(f"{label:<52s} {per_op * 1e3:8.2f} ms", flush=True)
        return per_op

    config.use_pallas = True

    # quick on-device correctness of the padded-lane path (G=5 -> pad to 8)
    X5 = rng.standard_normal((5, 256, 256)).astype(np.float32)
    A5 = jnp.asarray(X5 @ np.swapaxes(X5, 1, 2) + 256 * np.eye(256, dtype=np.float32))
    Lx = np.asarray(jnp.linalg.cholesky(A5))
    err = np.max(np.abs(np.asarray(pli.cholesky_blocks(A5)) - Lx))
    print(f"padded-lane chol correctness: {err:.3e}", flush=True)
    assert err < 1e-2
    Li_x = np.asarray(lax.linalg.triangular_solve(
        jnp.asarray(Lx), jnp.broadcast_to(jnp.eye(256, dtype=jnp.float32),
                                          (5, 256, 256)),
        left_side=True, lower=True))
    err2 = np.max(np.abs(np.asarray(pli.tri_inv_blocks(jnp.asarray(Lx))) - Li_x))
    print(f"padded-lane tri_inv correctness: {err2:.3e}", flush=True)
    assert err2 < 1e-2

    N, B, D = 4096, 5, 6
    A0 = rng.standard_normal((B, N, 32)).astype(np.float32)
    Ky = jnp.asarray(A0 @ np.swapaxes(A0, 1, 2) + (N / 8) * np.eye(N, dtype=np.float32))

    def chol_blk(i, c, Ky):
        return jnp.sum(linalg.blocked_cholesky(Ky + c * 1e-12, nb=256)) * 1e-20 + c
    slope(chol_blk, jnp.float32(0.0), operands=(Ky,),
          label="blocked_cholesky nb=256 [pallas] (B=5,N=4096)")

    L = jnp.linalg.cholesky(Ky)

    def tri_inv(i, c, L):
        return jnp.sum(linalg.tri_inv_lower(L + c * 1e-12, block=256)) * 1e-20 + c
    slope(tri_inv, jnp.float32(0.0), operands=(L,),
          label="tri_inv_lower block=256 [pallas] (B=5,N=4096)")

    # LML value / value+grad with the Pallas stack on
    import gaussian_process_optimization_tpu.kernels as kern
    from gaussian_process_optimization_tpu.models import fit as fit_mod
    from gaussian_process_optimization_tpu.models.gp import GPRegression
    from gaussian_process_optimization_tpu.models.parameters import make_packer

    Xh = rng.uniform(-2, 2, (N, D))
    Yh = rng.standard_normal((N, 1))
    model = GPRegression.create(Xh, Yh, kernel=kern.Matern52.create(D, ARD=True),
                                noise_var=0.05, max_points=N)
    packer = make_packer(model)
    obj = fit_mod.make_objective(packer)
    u0 = packer.pack(model)
    us = jnp.broadcast_to(u0, (B,) + u0.shape) + 1e-4 * jnp.asarray(
        rng.standard_normal((B, u0.shape[0])).astype(np.float32))

    def lml_val(i, c):
        v = jax.vmap(lambda u: obj(u + c * 1e-12, model))(us)
        return jnp.sum(v) * 1e-20 + c
    slope(lml_val, jnp.float32(0.0), label="LML value [pallas] (B=5 vmapped)")

    def lml_vg(i, c):
        v, g = jax.vmap(lambda u: jax.value_and_grad(obj)(u + c * 1e-12, model))(us)
        return (jnp.sum(v) + jnp.sum(g)) * 1e-20 + c
    slope(lml_vg, jnp.float32(0.0), label="LML value+grad [pallas] (B=5 vmapped)")

    config.use_pallas = "auto"


if __name__ == "__main__":
    main()
