"""Phase breakdown of the mixed-Gower LP batch-5 suggest call (bench.py
run_gower_lp, the thesis pipeline hot path) — finds where the warm
`gower_lp_batch_s` seconds go: fit, estimate_L, and each of the 6
acquisition argmaxes. Run standalone on the TPU (single tunnel client).
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

N, FIT_STEPS, FIT_RESTARTS = 4096, 30, 5


def main():
    from gaussian_process_optimization_tpu.bo import evaluators as ev_mod
    from gaussian_process_optimization_tpu.bo.methods import BayesianOptimization

    rng = np.random.default_rng(0)
    Xc = rng.uniform(-2.0, 2.0, (N, 4))
    Xd = rng.integers(0, 3, (N, 2)).astype(float)
    X = np.hstack([Xc, Xd])
    Y = (np.sin(Xc[:, :1] * 2.0) + 0.3 * np.cos(Xc.sum(1, keepdims=True))
         + 0.1 * Xd[:, :1] + 0.05 * rng.standard_normal((N, 1)))
    domain = (
        [{"name": f"x{i}", "type": "continuous", "domain": (-2.0, 2.0)}
         for i in range(4)]
        + [{"name": f"d{i}", "type": "discrete", "domain": (0, 1, 2)}
           for i in range(2)]
    )
    bo = BayesianOptimization(
        f=None, domain=domain, X=X, Y=Y, Gower=True, acquisition_type="EI",
        evaluator_type="local_penalization", batch_size=5, exact_feval=True,
        seed=0, max_iters=FIT_STEPS, optimize_restarts=FIT_RESTARTS,
    )

    # --- instrument: wrap estimate_L and AcquisitionLP.optimize with timers ---
    phases = []

    real_estimate_L = ev_mod.estimate_L

    def timed_estimate_L(*a, **k):
        t0 = time.perf_counter()
        out = real_estimate_L(*a, **k)
        phases.append(("estimate_L", time.perf_counter() - t0))
        return out

    ev_mod.estimate_L = timed_estimate_L

    evaluator = bo.evaluator
    acq = evaluator.acquisition
    real_opt = acq.optimize

    def timed_opt(*a, **k):
        t0 = time.perf_counter()
        out = real_opt(*a, **k)
        phases.append(("acq.optimize", time.perf_counter() - t0))
        return out

    acq.optimize = timed_opt

    real_update = bo._update_model

    def timed_update(*a, **k):
        t0 = time.perf_counter()
        out = real_update(*a, **k)
        phases.append(("fit(_update_model)", time.perf_counter() - t0))
        return out

    bo._update_model = timed_update

    batch = bo.suggest_next_locations()  # compile + warm
    assert batch.shape == (5, 6)
    print("# warm-up phases:")
    for name, dt in phases:
        print(f"#   {name}: {dt:.3f}s")

    for i in range(2):
        phases.clear()
        bo.Y = Y + 0.01 * np.random.default_rng(10 + i).standard_normal((N, 1))
        t0 = time.perf_counter()
        batch = bo.suggest_next_locations()
        total = time.perf_counter() - t0
        print(f"# ---- warm call {i}: total {total:.3f}s ----")
        for name, dt in phases:
            print(f"#   {name}: {dt:.3f}s")
        print(f"#   (unaccounted: {total - sum(dt for _, dt in phases):.3f}s)")


if __name__ == "__main__":
    main()
