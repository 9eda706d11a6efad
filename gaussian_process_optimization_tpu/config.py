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


config = Config()

if os.environ.get("GPO_TPU_PALLAS_INTERPRET", ""):
    config.pallas_interpret = True


def pallas_enabled() -> bool:
    """Resolve the use_pallas tri-state against the actual backend."""
    if config.use_pallas == "auto":
        import jax

        return jax.default_backend() == "tpu"
    return bool(config.use_pallas)
