"""Round-5 TPU profile: Pallas routing A/B + the bench-fit per-step gap.

Sections (slope method throughout — CLAUDE.md TIMING notes):
  1. blocked_cholesky nb=256, pallas_chol_blocks OFF vs ON (same run — the
     round-5 first measure saw 13.10 ms ON vs 11.87 OFF under heavy
     compile-service contention; decide the default from a same-run A/B)
  2. tri_inv_lower block=256, pallas_tri_inv ON vs OFF
  3. LML value / value+grad at the production defaults
  4. fit per-step maxiter-slope on NOISE data vs BENCH data (bench.py _data) —
     localizing the 86-vs-50.6 ms/step gap (trials/step explains ~8 ms; the
     rest is suspected jitter-ladder climbs once the fitted noise falls to the
     f32 noise floor on well-modeled data)

Run alone (single-client tunnel): timeout 5400 python benchmarks/prof_r5_linalg.py
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

    import gaussian_process_optimization_tpu.kernels as kern
    from gaussian_process_optimization_tpu.config import config
    from gaussian_process_optimization_tpu.models import fit as fit_mod
    from gaussian_process_optimization_tpu.models.gp import GPRegression
    from gaussian_process_optimization_tpu.ops import linalg

    N, D, B = 4096, 6, 5
    rng = np.random.default_rng(0)
    A0 = rng.standard_normal((B, N, 32)).astype(np.float32)
    Ky = jnp.asarray(A0 @ np.swapaxes(A0, 1, 2)
                     + (N / 8) * np.eye(N, dtype=np.float32))

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
            print(f"#   compile+warm t{nt}: {time.perf_counter() - t0:.1f}s",
                  flush=True)
            reps = []
            for r in range(3):
                t0 = time.perf_counter()
                c = run(carry0 + 1e-6 * (r + 1), *operands)
                float(jnp.sum(c))
                reps.append(time.perf_counter() - t0)
            ts[nt] = float(np.median(reps))
        per_op = (ts[trips[1]] - ts[trips[0]]) / (trips[1] - trips[0])
        print(f"{label:<56s} {per_op * 1e3:8.2f} ms", flush=True)
        return per_op

    # ---- 1. blocked_cholesky A/B ----
    for on in (False, True):
        config.pallas_chol_blocks = on

        def chol(i, c, Ky):
            L = linalg.blocked_cholesky(Ky + c * 1e-12, nb=256)
            return jnp.sum(L) * 1e-20 + c

        slope(chol, jnp.float32(0.0), operands=(Ky,),
              label=f"blocked_cholesky nb=256 pallas_chol={'ON' if on else 'OFF'}")
    config.pallas_chol_blocks = False

    L = jnp.linalg.cholesky(Ky)

    # ---- 2. tri_inv A/B ----
    for on in (True, False):
        config.pallas_tri_inv = on

        def tri_inv(i, c, L):
            Li = linalg.tri_inv_lower(L + c * 1e-12, block=256)
            return jnp.sum(Li) * 1e-20 + c

        slope(tri_inv, jnp.float32(0.0), operands=(L,),
              label=f"tri_inv_lower block=256 pallas_tri_inv={'ON' if on else 'OFF'}")
    config.pallas_tri_inv = True

    # ---- 3. LML at production defaults ----
    from gaussian_process_optimization_tpu.models.parameters import make_packer

    Xh, Yh = rng.uniform(-2, 2, (N, D)), rng.standard_normal((N, 1))
    model = GPRegression.create(Xh, Yh,
                                kernel=kern.Matern52.create(D, ARD=True),
                                noise_var=0.05, max_points=N)
    packer = make_packer(model)
    obj = fit_mod.make_objective(packer)
    u0 = packer.pack(model)
    us = jnp.broadcast_to(u0, (B,) + u0.shape) + 1e-4 * jnp.asarray(
        rng.standard_normal((B, u0.shape[0])).astype(np.float32))

    def lml_val(i, c, us):
        v = jax.vmap(lambda u: obj(u + c * 1e-12, model))(us)
        return jnp.sum(v) * 1e-20 + c

    slope(lml_val, jnp.float32(0.0), operands=(us,),
          label="LML value (B=5 vmapped, defaults)")

    def lml_vg(i, c, us):
        v, g = jax.vmap(
            lambda u: jax.value_and_grad(obj)(u + c * 1e-12, model))(us)
        return (jnp.sum(v) + jnp.sum(g)) * 1e-20 + c

    slope(lml_vg, jnp.float32(0.0), operands=(us,),
          label="LML value+grad (B=5 vmapped, defaults)")

    # ---- 4. fit per-step slope: noise data vs bench data ----
    sys.path.insert(0, str(Path(__file__).parent.parent))
    from bench import _data

    Xb, Yb = _data()
    bench_model = GPRegression.create(
        Xb, Yb, kernel=kern.Matern52.create(D, ARD=True), noise_var=0.05,
        max_points=N)

    for name, m in (("noise", model), ("bench", bench_model)):
        fit_ts = {}
        for mi in (10, 30):
            fitter = fit_mod.Fitter(m, num_restarts=B, maxiter=mi, tol=0.0)
            fitted, res = fitter(m, jax.random.PRNGKey(0))  # compile
            float(fitted.kern.variance)
            reps = []
            for r in range(3):
                t0 = time.perf_counter()
                fitted, res = fitter(m, jax.random.PRNGKey(1 + r))
                float(fitted.kern.variance)
                reps.append(time.perf_counter() - t0)
            fit_ts[mi] = float(np.median(reps))
            n_ls = (np.asarray(res.num_ls, dtype=float).tolist()
                    if res.num_ls is not None else "n/a")
            noise_fit = [float(v) for v in np.ravel(
                np.asarray(fitted.likelihood_variance))] \
                if hasattr(fitted, "likelihood_variance") else "n/a"
            print(f"# fit[{name}] maxiter={mi:<3d} median {fit_ts[mi]:.3f}s "
                  f"num_ls={n_ls} fitted_noise={noise_fit}", flush=True)
        print(f"{f'fit per-step ({name} data, maxiter slope)':<56s} "
              f"{(fit_ts[30] - fit_ts[10]) / 20 * 1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
