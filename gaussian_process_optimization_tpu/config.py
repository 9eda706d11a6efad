"""Global runtime configuration.

The reference stack (GPy) uses an INI cascade (``GPy/GPy/util/config.py:17-29``) to toggle
cython/openmp/plotting. Here the analogous switches are: whether the Pallas TPU kernels are
used for covariance construction (vs. the pure ``jnp`` path), numeric floors, and the jitter
ladder shape (``GPy/GPy/util/linalg.py:56-74``).
"""
from __future__ import annotations

import dataclasses
import os
from typing import Literal


@dataclasses.dataclass
class Config:
    # 'auto': use Pallas kernels on TPU backends for sufficiently large float32 problems.
    use_pallas: Literal["auto", True, False] = "auto"
    # Run Pallas kernels in interpreter mode (CPU testing).
    pallas_interpret: bool = False
    # Additive noise floor on the Gaussian-likelihood variance, matching
    # GPy exact_gaussian_inference.py:52 (`Ky += (sigma2 + 1e-8) I`).
    noise_jitter: float = 1e-8
    # jitchol ladder: first jitter = mean(diag)*base, then *10 each try, `maxtries` tries.
    jitchol_base: float = 1e-6
    jitchol_maxtries: int = 5
    # Predictive-variance floor (GPyOpt gpmodel.py:99 clips at 1e-10 before sqrt).
    variance_floor: float = 1e-10
    # float32 minimum effective noise on the Gram diagonal. The reference runs
    # float64 LAPACK where exact_feval's 1e-6 noise is fine; in f32 on TPU that is
    # below Cholesky's resolution once the kernel variance grows, and the fit dies
    # with an unrecoverable non-PD matrix. Applied ONLY when the compute dtype is
    # float32 (f64 parity paths are unaffected).
    f32_noise_floor: float = 1e-4
    # Acquisition std floor (GPyOpt util/general.py:121 floors s at 1e-10).
    std_floor: float = 1e-10
    # Matmul precision for the exact-GP GRADIENT path only (the Wi = Li^T Li /
    # alpha alpha^T contractions in _exact_core_bwd and the tri_inv merge
    # matmuls feeding them). The global pin stays 'highest' (CLAUDE.md: bf16
    # operands corrupt distance/solve numerics), but the LML gradient only
    # steers the optimizer — 'high' (bf16x3, ~21-bit mantissa) is regret-neutral
    # across the 6-function 10-seed suite (benchmarks/PRECISION.md) and ~14%
    # faster on the N=4096 fit, so it is the default. Force full precision with
    # GPO_GRAD_MATMUL_PRECISION=highest.
    grad_matmul_precision: str = os.environ.get(
        "GPO_GRAD_MATMUL_PRECISION", "high")
    # Line-search warm-start growth after a BACKTRACKED accept (ops/lbfgs.py
    # `grow_backtracked`; Fitter reads this as its default). 1.0 = HOLD
    # (re-probe the accepted step) kills the grow->fail->re-backtrack
    # oscillation on structured LML surfaces (~6% fewer trials, max-over-lanes
    # 48->43 at N=1024 f32) — but the regret gate FAILED: hartmann6 median
    # +9%, alpine1 upper quartile 4x (benchmarks/ls_policy_ab.json, 10 seeds
    # x 3 functions CPU f64). Same verdict as nonmonotone_eta and the global
    # bf16x3 knob: speed knobs that move regret stay OPT-IN; default 2.0.
    ls_grow_backtracked: float = float(os.environ.get(
        "GPO_LS_GROW_BACKTRACKED", "2.0"))
    # Pallas all-lanes diag-block routing inside the blocked linalg stack
    # (ops/pallas_linalg.py), gated PER CALL SITE by measured integrated wins
    # (benchmarks/prof_pallas_linalg2.py, v5e f32, N=4096 B=5):
    # - tri_inv_lower diag-block inverses: 10.07 ms vs ~11.9 XLA -> default ON.
    # - blocked_cholesky diag-block factorizations: 13.10 ms vs 11.87 XLA
    #   integrated (despite the standalone kernel winning 0.04 vs 0.34 ms)
    #   -> default OFF until an integrated win is measured; opt in via
    #   GPO_PALLAS_CHOL=1.
    # Small-matrix full factorizations (n below the blocking threshold) always
    # use XLA: per-shape Mosaic remote compiles cost ~5-15 min EACH, and the
    # BO loop's padded buckets would each pay one for sub-millisecond ops.
    pallas_chol_blocks: bool = bool(os.environ.get("GPO_PALLAS_CHOL", ""))
    pallas_tri_inv: bool = os.environ.get("GPO_PALLAS_TRIINV", "1") not in (
        "", "0")


config = Config()

if os.environ.get("GPO_TPU_PALLAS_INTERPRET", ""):
    config.pallas_interpret = True


def pallas_enabled() -> bool:
    """Resolve the use_pallas tri-state against the actual backend."""
    if config.use_pallas == "auto":
        import jax

        return jax.default_backend() == "tpu"
    return bool(config.use_pallas)
