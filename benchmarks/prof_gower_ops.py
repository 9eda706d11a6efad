"""Slope-method per-op costs for the GOWER fit hot path (vs Matern) —
localizes why the mixed-Gower fit is ~3x the Matern fit at the same N and
trial counts even with the jitter ladder OUT of the picture (noise 0.05,
rung 0; benchmarks/prof_gower_fit.py variant B vs C).

Measures, at N=4096 B=5 f32 (same protocol as prof_ops.py — fori_loop slope,
full-sum reduction, operands as jit args):
  - K build forward (Gower vs Matern)
  - LML value (the line-search trial cost)
  - LML value+grad (the accepted-point cost)
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).resolve().parent.parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import jax.numpy as jnp
import numpy as np
from jax import lax

N, D, B = 4096, 6, 5


def main():
    import gaussian_process_optimization_tpu.kernels as kern
    from gaussian_process_optimization_tpu.models import fit as fit_mod
    from gaussian_process_optimization_tpu.models.gp import GPRegression
    from gaussian_process_optimization_tpu.models.parameters import make_packer

    rng = np.random.default_rng(0)
    Xc = rng.uniform(-2.0, 2.0, (N, 4))
    Xd = rng.integers(0, 3, (N, 2)).astype(float)
    Xh = np.hstack([Xc, Xd])
    Yh = rng.standard_normal((N, 1))

    base = kern.Matern52.create(D, variance=1.0, ARD=True)
    gower = kern.Gower.create(base, ranges=np.full(4, 4.0),
                              cont_dims=(0, 1, 2, 3), disc_dims=(4, 5),
                              gpy_compat=True)
    mat = kern.Matern52.create(D, ARD=True)

    def slope(make_body, label, trips=(4, 12), operands=()):
        """`operands`: big arrays the body reads — threaded as jit ARGUMENTS
        like prof_ops.py's slope (closed-over device arrays are baked into the
        HLO as literal constants, which blows the remote-compile service's
        request-size limit once N or B grows). make_body(i, c, *operands)."""
        def prog(n_trips):
            @jax.jit
            def run(c0, *ops):
                return lax.fori_loop(0, n_trips,
                                     lambda i, c: make_body(i, c, *ops), c0)
            return run

        ts = {}
        for nt in trips:
            run = prog(nt)
            c = run(jnp.float32(0.0), *operands)
            float(jnp.sum(c))
            reps = []
            for r in range(3):
                t0 = time.perf_counter()
                c = run(jnp.float32(1e-6 * (r + 1)), *operands)
                float(jnp.sum(c))
                reps.append(time.perf_counter() - t0)
            ts[nt] = float(np.median(reps))
        per_op = (ts[trips[1]] - ts[trips[0]]) / (trips[1] - trips[0])
        print(f"{label:<46s} {per_op * 1e3:8.2f} ms   "
              f"(t{trips[0]}={ts[trips[0]]:.3f}s t{trips[1]}={ts[trips[1]]:.3f}s)",
              flush=True)
        return per_op

    for label, k in (("gower", gower), ("matern", mat)):
        model = GPRegression.create(Xh, Yh, kernel=k, noise_var=0.05,
                                    max_points=N)
        packer = make_packer(model)
        obj = fit_mod.make_objective(packer)
        u0 = packer.pack(model)
        us = jnp.broadcast_to(u0, (B,) + u0.shape) + 1e-4 * jnp.asarray(
            rng.standard_normal((B, u0.shape[0])).astype(np.float32))
        Xj = jnp.asarray(Xh, dtype=jnp.float32)

        def kbuild(i, c, model, us, Xj, packer=packer):
            def one(u):
                m = packer.unpack(u + c * 1e-12, model)
                return jnp.sum(m.kern.K(Xj))
            return jnp.sum(jax.vmap(one)(us)) * 1e-20 + c

        slope(kbuild, f"{label} K build (B=5 vmapped)",
              operands=(model, us, Xj))

        def lml_val(i, c, model, us, Xj, obj=obj):
            v = jax.vmap(lambda u: obj(u + c * 1e-12, model))(us)
            return jnp.sum(v) * 1e-20 + c

        slope(lml_val, f"{label} LML value (B=5 vmapped)",
              operands=(model, us, Xj))

        def lml_vg(i, c, model, us, Xj, obj=obj):
            v, g = jax.vmap(
                lambda u: jax.value_and_grad(obj)(u + c * 1e-12, model))(us)
            return (jnp.sum(v) + jnp.sum(g)) * 1e-20 + c

        slope(lml_vg, f"{label} LML value+grad (B=5 vmapped)",
              operands=(model, us, Xj))


if __name__ == "__main__":
    main()
