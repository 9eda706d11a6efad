"""Per-op TPU cost profiler — slope method (CLAUDE.md TIMING notes).

Every dispatch through the tunnel costs ~25-28 ms, so one-call timings measure
overhead. For true device cost, repeat the op inside ONE program with a data
dependence between iterations (lax.fori_loop) at two trip counts and take the
slope. The carried value must reduce the op's FULL output (jnp.sum) — a sliced
readout lets XLA dead-code-eliminate the rest of the op.

Usage (tunnel must be up; single-client — nothing else running):
    python benchmarks/prof_ops.py            # default N=4096 B=5 suite
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
    from gaussian_process_optimization_tpu.models import fit as fit_mod
    from gaussian_process_optimization_tpu.models.gp import GPRegression
    from gaussian_process_optimization_tpu.ops import linalg

    N, D, B = 4096, 6, 5
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.uniform(-2, 2, (N, D)).astype(np.float32))
    Yc = jnp.asarray(rng.standard_normal((B, N, 1)).astype(np.float32))
    A0 = rng.standard_normal((B, N, 32)).astype(np.float32)
    Ky = jnp.asarray(A0 @ np.swapaxes(A0, 1, 2) + (N / 8) * np.eye(N, dtype=np.float32))

    def slope(make_body, carry0, trips=(4, 12), label="", operands=()):
        """Wall time per op iteration via two fori_loop trip counts.

        `operands`: the big arrays the body reads. They MUST be jit ARGUMENTS,
        not Python closures — closed-over device arrays are baked into the HLO
        as literal constants, and a Gram-sized constant (B x N x N f32 = 335 MB)
        blows the remote-compile service's request-size limit (HTTP 413).
        make_body(i, c, *operands)."""
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
            float(jnp.sum(c))  # warm + compile; device->host read as barrier
            reps = []
            for r in range(3):
                t0 = time.perf_counter()
                # fresh input EVERY call (the tunnel coalesces identical
                # (program, args) executions)
                c = run(carry0 + 1e-6 * (r + 1), *operands)
                float(jnp.sum(c))
                reps.append(time.perf_counter() - t0)
            ts[nt] = float(np.median(reps))
        per_op = (ts[trips[1]] - ts[trips[0]]) / (trips[1] - trips[0])
        print(f"{label:<42s} {per_op * 1e3:8.2f} ms   "
              f"(t{trips[0]}={ts[trips[0]]:.3f}s t{trips[1]}={ts[trips[1]]:.3f}s)")
        return per_op

    L = jnp.linalg.cholesky(Ky)

    # 1) Cholesky variants
    def chol_xla(i, c, Ky):
        return jnp.sum(jnp.linalg.cholesky(Ky + c * 1e-12)) * 1e-20 + c
    slope(chol_xla, jnp.float32(0.0), operands=(Ky,),
          label="cholesky XLA batched (B=5,N=4096)")

    for nb in (128, 192, 256, 384, 512):
        def chol_blk(i, c, Ky, nb=nb):
            return jnp.sum(linalg.blocked_cholesky(Ky + c * 1e-12, nb=nb)) * 1e-20 + c
        slope(chol_blk, jnp.float32(0.0), operands=(Ky,),
              label=f"blocked_cholesky nb={nb}")

    # 2) 1-rhs triangular solve variants
    def solve_xla(i, c, L, Yc):
        return jnp.sum(linalg.solve_lower(L, Yc + c * 1e-12)) * 1e-20 + c
    slope(solve_xla, jnp.float32(0.0), operands=(L, Yc),
          label="solve_lower XLA (1 rhs)")

    for nb in (256, 512, 1024):
        def solve_blk(i, c, L, Yc, nb=nb):
            return jnp.sum(linalg.blocked_solve_lower(L, Yc + c * 1e-12, nb=nb)) * 1e-20 + c
        slope(solve_blk, jnp.float32(0.0), operands=(L, Yc),
              label=f"blocked_solve_lower nb={nb}")

    # 2b) backward-pass constituents (tri_inv_lower + tri_tdot dominate the
    # _exact_core pullback)
    for blk in (128, 256, 512):
        def tri_inv(i, c, L, blk=blk):
            return jnp.sum(linalg.tri_inv_lower(L + c * 1e-12, block=blk)) * 1e-20 + c
        slope(tri_inv, jnp.float32(0.0), operands=(L,),
              label=f"tri_inv_lower (D&C) block={blk}")

    Li0 = linalg.tri_inv_lower(L)

    for nb in (256, 512, 1024):
        def tri_td(i, c, Li0, nb=nb):
            return jnp.sum(linalg.tri_tdot(Li0 + c * 1e-12, nb=nb)) * 1e-20 + c
        slope(tri_td, jnp.float32(0.0), operands=(Li0,),
              label=f"tri_tdot (lauum-blocked) nb={nb}")

    # 3) LML value and value+grad (the line-search trial and accept costs)
    Xh, Yh = rng.uniform(-2, 2, (N, D)), rng.standard_normal((N, 1))
    model = GPRegression.create(Xh, Yh, kernel=kern.Matern52.create(D, ARD=True),
                                noise_var=0.05, max_points=N)
    from gaussian_process_optimization_tpu.models.parameters import make_packer
    packer = make_packer(model)
    obj = fit_mod.make_objective(packer)
    u0 = packer.pack(model)
    us = jnp.broadcast_to(u0, (B,) + u0.shape) + 1e-4 * jnp.asarray(
        rng.standard_normal((B, u0.shape[0])).astype(np.float32))

    def lml_val(i, c):
        v = jax.vmap(lambda u: obj(u + c * 1e-12, model))(us)
        return jnp.sum(v) * 1e-20 + c
    slope(lml_val, jnp.float32(0.0), label="LML value (B=5 vmapped)")

    def lml_vg(i, c):
        v, g = jax.vmap(lambda u: jax.value_and_grad(obj)(u + c * 1e-12, model))(us)
        return (jnp.sum(v) + jnp.sum(g)) * 1e-20 + c
    slope(lml_vg, jnp.float32(0.0), label="LML value+grad (B=5 vmapped)")

    # 3b) TRUE per-fit-step cost via maxiter slope: two Fitter programs at
    # maxiter=10/30, median-of-3 each, slope = per-step wall cost of the real
    # line-searched L-BFGS step (incl. while_loop/carry/two-loop overhead).
    # Compare against (trials x LML value + 1 backward) from sections above to
    # localize the structural residue (BASELINE.md round-3: ~20 ms/step).
    fit_ts = {}
    for mi in (10, 30):
        fitter = fit_mod.Fitter(model, num_restarts=B, maxiter=mi, tol=0.0)
        fitted, res = fitter(model, jax.random.PRNGKey(0))  # compile
        float(fitted.kern.variance)
        reps = []
        for r in range(3):
            t0 = time.perf_counter()
            fitted, res = fitter(model, jax.random.PRNGKey(1 + r))
            float(fitted.kern.variance)
            reps.append(time.perf_counter() - t0)
        fit_ts[mi] = float(np.median(reps))
        n_ls = np.asarray(res.num_ls, dtype=float) if res.num_ls is not None else None
        print(f"fit maxiter={mi:<3d} median {fit_ts[mi]:.3f}s   num_ls/lane="
              f"{n_ls.tolist() if n_ls is not None else 'n/a'}")
    print(f"{'fit per-step (maxiter slope)':<42s} "
          f"{(fit_ts[30] - fit_ts[10]) / 20 * 1e3:8.2f} ms")

    # 4) Sparse VarDTC at BASELINE config-4 scale (N=50k, M=256): round-2
    # measured 368 ms per fit step — orders of magnitude above the ~3 GFLOP
    # floor of A = Lm^-1 Kmn and A A^T. Decompose: bound value, value+grad.
    from gaussian_process_optimization_tpu.models.sparse import SparseGPRegression

    Ns, Ms = 50_000, 256
    Xs_ = rng.uniform(-2, 2, (Ns, D)).astype(np.float32)
    Ys_ = (np.sin(Xs_[:, :1]) + 0.05 * rng.standard_normal((Ns, 1))).astype(np.float32)
    sp = SparseGPRegression.create(Xs_, Ys_, kernel=kern.Matern52.create(D, ARD=True),
                                   num_inducing=Ms, noise_var=0.05)
    sp_packer = make_packer(sp)
    sp_obj = fit_mod.make_objective(sp_packer)
    su0 = sp_packer.pack(sp)

    def sp_val(i, c):
        return jnp.sum(sp_obj(su0 + c * 1e-12, sp)) * 1e-20 + c
    slope(sp_val, jnp.float32(0.0), label=f"VarDTC bound value (N={Ns}, M={Ms})")

    def sp_vg(i, c):
        v, g = jax.value_and_grad(sp_obj)(su0 + c * 1e-12, sp)
        return (jnp.sum(v) + jnp.sum(g)) * 1e-20 + c
    slope(sp_vg, jnp.float32(0.0), label=f"VarDTC bound value+grad (N={Ns}, M={Ms})")


if __name__ == "__main__":
    main()
