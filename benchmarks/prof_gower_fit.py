"""Why is the mixed-Gower fit ~2.7x the Matern-ARD fit at the same N?
(prof_gower_lp localized bench.py's gower_lp_batch_s to _update_model.)

A/B/C on the bench gower data (N=4096, 4 cont + 2 disc):
  A) wrapper-equivalent fit: Gower kernel, noise FIXED 1e-6 (exact_feval)
  B) same but noise free at 0.05       -> isolates conditioning/jitchol cost
  C) Matern52-ARD, noise fixed 1e-6    -> isolates the kernel-build cost

Prints fit wall time, per-lane L-BFGS iters, line-search trial counts, and the
accepted jitter rung (0 = clean Cholesky) for each variant.
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

import numpy as np

N, D, STEPS, RESTARTS = 4096, 6, 30, 5


def main():
    import jax.numpy as jnp

    from gaussian_process_optimization_tpu.kernels import Gower, Matern52
    from gaussian_process_optimization_tpu.models import fit as fit_mod
    from gaussian_process_optimization_tpu.models.gp import GPRegression
    from gaussian_process_optimization_tpu.ops import linalg

    rng = np.random.default_rng(0)
    Xc = rng.uniform(-2.0, 2.0, (N, 4))
    Xd = rng.integers(0, 3, (N, 2)).astype(float)
    X = np.hstack([Xc, Xd])
    Y = (np.sin(Xc[:, :1] * 2.0) + 0.3 * np.cos(Xc.sum(1, keepdims=True))
         + 0.1 * Xd[:, :1] + 0.05 * rng.standard_normal((N, 1)))
    Y = (Y - Y.mean()) / Y.std()  # the BO loop fits on 'stats'-normalized Y

    base = Matern52.create(D, variance=1.0, ARD=True)
    # wrapper construction (bo_models._default_kernel): ranges = per-continuous-
    # dim value range, Hamming on the discrete columns, gpy_compat parity mode
    gower = Gower.create(base, ranges=np.full(4, 4.0), cont_dims=(0, 1, 2, 3),
                         disc_dims=(4, 5), gpy_compat=True)
    mat = Matern52.create(D, ARD=True)

    def run(label, kern, noise, fix_noise):
        model = GPRegression.create(X, Y, kernel=kern, noise_var=noise,
                                    max_points=N)
        fix = ("likelihood_variance",) if fix_noise else ()
        fitter = fit_mod.Fitter(model, num_restarts=RESTARTS, maxiter=STEPS,
                                fix=fix)
        fitted, res = fitter(model, jax.random.PRNGKey(0))  # compile
        float(jax.tree_util.tree_leaves(fitted.kern)[0].ravel()[0])
        times = []
        for i in range(2):
            t0 = time.perf_counter()
            fitted, res = fitter(model, jax.random.PRNGKey(1 + i))
            float(jax.tree_util.tree_leaves(fitted.kern)[0].ravel()[0])
            times.append(time.perf_counter() - t0)
        # jitter rung accepted at the FITTED params (proxy for in-fit ladder)
        @jax.jit
        def probe(m):
            Ky = m.kern.K(m.X) + m.likelihood_variance * jnp.eye(m.X.shape[0],
                                                                 dtype=m.X.dtype)
            _, jitter, ok = linalg.jitchol(Ky)
            return jitter, ok

        jitter, ok = probe(fitted)
        print(f"{label:<38s} fit {np.median(times):6.3f}s  "
              f"iters={np.asarray(res.num_iters).tolist()} "
              f"num_ls={np.asarray(res.num_ls).tolist()} "
              f"jitter={float(jitter):.3e} ok={bool(ok)}", flush=True)

    run("A gower  noise FIXED 1e-6", gower, 1e-6, True)
    run("B gower  noise free 0.05", gower, 0.05, False)
    run("C matern noise FIXED 1e-6", mat, 1e-6, True)


if __name__ == "__main__":
    main()
