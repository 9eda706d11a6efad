"""Regret-parity benchmark: the SAME BO configuration run on the TPU (f32, the
production path) and on CPU float64 (the reference-numerics proxy — identical math
to GPy/GPyOpt's LAPACK f64), across seeds. Writes benchmarks/RESULTS.md and a
regret-curve plot. This is the evidence for BASELINE's "matching regret curves".

Runs each backend in its own subprocess (the platform is fixed at jax init, and the
TPU tunnel is single-client).
"""
import json
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

CHILD = r"""
import sys, json
sys.path.insert(0, {root!r})
import jax
if {cpu}:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
import numpy as np
from gaussian_process_optimization_tpu.bo import BayesianOptimization, bounds_to_space
from gaussian_process_optimization_tpu.bo import objectives

out = {{}}
for func_name in {funcs!r}:
    func = getattr(objectives, func_name)
    curves = []
    for seed in range({seeds}):
        bo = BayesianOptimization(
            f=lambda x: np.asarray(func(x)),
            domain=bounds_to_space(func.bounds),
            acquisition_type="EI", initial_design_numdata=5,
            initial_design_type="latin", exact_feval=True, seed=seed)
        bo.run_optimization(max_iter={iters}, eps=-1)
        best = np.minimum.accumulate(bo.Y[:, 0]) - func.fmin
        curves.append(best.tolist())
    out[func_name] = curves
print("RESULT::" + json.dumps(out))
"""


def run_backend(cpu, funcs, seeds, iters):
    code = CHILD.format(root=str(ROOT), cpu=cpu, funcs=funcs, seeds=seeds, iters=iters)
    res = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True,
                         timeout=3600)
    for line in res.stdout.splitlines():
        if line.startswith("RESULT::"):
            return json.loads(line[len("RESULT::"):])
    raise RuntimeError(f"child failed:\n{res.stdout[-2000:]}\n{res.stderr[-2000:]}")


def main(funcs=("branin", "forrester"), seeds=3, iters=20):
    print("running CPU f64 (reference-numerics proxy)...", flush=True)
    cpu = run_backend(True, list(funcs), seeds, iters)
    print("running TPU f32...", flush=True)
    tpu = run_backend(False, list(funcs), seeds, iters)

    import numpy as np

    lines = ["# Regret parity: TPU f32 vs CPU f64 (same code, same config)\n",
             f"EI, latin init 5, {iters} iterations, {seeds} seeds, exact_feval.\n"]
    for fn in funcs:
        c = np.asarray([row[-1] for row in cpu[fn]])
        t = np.asarray([row[-1] for row in tpu[fn]])
        lines.append(f"## {fn}\n")
        lines.append(f"- final regret CPU f64: {np.round(c, 4).tolist()} "
                     f"(median {np.median(c):.4f})")
        lines.append(f"- final regret TPU f32: {np.round(t, 4).tolist()} "
                     f"(median {np.median(t):.4f})\n")
    md = "\n".join(lines)
    (ROOT / "benchmarks" / "RESULTS.md").write_text(md)
    print(md)

    # plot
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, len(funcs), figsize=(6 * len(funcs), 4.5))
    axes = np.atleast_1d(axes)
    for ax, fn in zip(axes, funcs):
        for label, data, color in [("CPU f64", cpu[fn], "C0"), ("TPU f32", tpu[fn], "C1")]:
            for i, row in enumerate(data):
                ax.semilogy(np.maximum(row, 1e-6), color=color, alpha=0.6,
                            label=label if i == 0 else None)
        ax.set_title(fn)
        ax.set_xlabel("evaluation")
        ax.set_ylabel("simple regret")
        ax.legend()
    fig.savefig(ROOT / "benchmarks" / "regret_curves.png", bbox_inches="tight")
    print("wrote benchmarks/RESULTS.md, benchmarks/regret_curves.png")


if __name__ == "__main__":
    main()
