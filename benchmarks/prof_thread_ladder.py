"""TPU A/B of the within-fit jitchol ladder-rung threading (round 5).

The round-5 fit-gap profile (`prof_r5_linalg.py` section 4) localized the
83.9-vs-52.4 ms/step bench-vs-noise gap: bench data fits its noise to ~8e-4
(f32 Gram at rung >= 1), so every verified-from-0 ladder pays ~2 batched
factorizations per line-search trial. `Fitter(thread_ladder=True)` threads the
accepted rung through the L-BFGS aux channel (greedy walk from the previous
trial's rung — 1 factorization steady state). This measures both fits on the
SAME bench workload (bench.py `_data`), median of 3, maxiter slope.

Run alone (single-client tunnel): timeout 4000 python benchmarks/prof_thread_ladder.py
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).parent.parent / ".jax_cache"))

    import gaussian_process_optimization_tpu.kernels as kern
    from gaussian_process_optimization_tpu.models import fit as fit_mod
    from gaussian_process_optimization_tpu.models.gp import GPRegression

    from bench import _data, D, N

    Xb, Yb = _data()
    model = GPRegression.create(
        Xb, Yb, kernel=kern.Matern52.create(D, ARD=True), noise_var=0.05,
        max_points=N)

    for thread in (False, True):
        fit_ts = {}
        for mi in (10, 30):
            fitter = fit_mod.Fitter(model, num_restarts=5, maxiter=mi,
                                    tol=0.0, thread_ladder=thread)
            t0 = time.perf_counter()
            fitted, res = fitter(model, jax.random.PRNGKey(0))  # compile
            float(fitted.kern.variance)
            print(f"#   compile+warm mi={mi}: {time.perf_counter()-t0:.1f}s",
                  flush=True)
            reps = []
            for r in range(3):
                t0 = time.perf_counter()
                fitted, res = fitter(model, jax.random.PRNGKey(1 + r))
                float(fitted.kern.variance)
                reps.append(time.perf_counter() - t0)
            fit_ts[mi] = float(np.median(reps))
            n_ls = np.asarray(res.num_ls, dtype=float).tolist()
            aux = (np.asarray(res.aux, dtype=float).tolist()
                   if res.aux is not None else "n/a")
            print(f"# thread={thread} maxiter={mi:<3d} median {fit_ts[mi]:.3f}s"
                  f" num_ls={n_ls} final_rung={aux} f={np.asarray(res.f).tolist()}",
                  flush=True)
        print(f"{f'fit per-step (bench data, thread_ladder={thread})':<56s} "
              f"{(fit_ts[30] - fit_ts[10]) / 20 * 1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
