"""Pallas TPU kernels for the covariance hot path.

Stub for now: the pure-XLA path (matmul distance trick + fused elementwise) is the
reference implementation; the fused tile kernels land here with consistency tests
mirroring the reference's cython-vs-numpy tests (GPy/GPy/testing/cython_tests.py:26-45).
"""
from __future__ import annotations


def supports(kern, X, X2) -> bool:
    return False


def stationary_K(kern, X, X2):  # pragma: no cover - not reachable while supports()=False
    raise NotImplementedError
