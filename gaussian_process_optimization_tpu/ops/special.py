"""Special functions absent from jax.scipy: the Faddeeva function w(z) and the
complex error function erf(z).

Needed by the second-order latent-force-model kernel (kernels/lfm.py EQ_ODE2):
its closed forms are first-order expressions evaluated at COMPLEX decay rates
gamma = alpha +- i*omega, so erf of complex arguments appears (the reference's
eq_ode2.py reaches the same functions through scipy's wofz).

w(z) uses Weideman's rational approximation (SIAM Rev. 36(4), 1994, algorithm
"cef"): a single polynomial in (L+iz)/(L-iz), accurate to ~1e-13 on the closed
upper half-plane for N=64 terms. The coefficients are computed once at import
with a numpy FFT (host-side, deterministic).

erf(z) = 1 - exp(-z^2) w(iz) for Re(z) >= 0, odd-extended otherwise.
Validated against scipy.special.erf/wofz in tests/test_lfm.py.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_N = 64


def _weideman_coeffs(N=_N):
    M = 2 * N
    M2 = 2 * M
    k = np.arange(-M + 1, M)
    L = np.sqrt(N / np.sqrt(2.0))
    theta = k * np.pi / M
    t = L * np.tan(theta / 2.0)
    f = np.exp(-(t**2)) * (L**2 + t**2)
    f = np.append(0.0, f)
    a = np.real(np.fft.fft(np.fft.fftshift(f))) / M2
    a = np.flipud(a[1 : N + 1])
    return L, a


_L, _A = _weideman_coeffs()


def wofz(z):
    """Faddeeva w(z) = exp(-z^2) erfc(-iz), valid for Im(z) >= 0."""
    z = jnp.asarray(z, dtype=jnp.complex128)
    iz = 1j * z
    Z = (_L + iz) / (_L - iz)
    p = jnp.polyval(jnp.asarray(_A, dtype=jnp.complex128), Z)
    return 2.0 * p / (_L - iz) ** 2 + (1.0 / jnp.sqrt(jnp.pi)) / (_L - iz)


def cerf(z):
    """erf for complex arguments via w(z), odd-extended to Re(z) < 0."""
    z = jnp.asarray(z, dtype=jnp.complex128)
    flip = jnp.real(z) < 0
    zp = jnp.where(flip, -z, z)  # Re(zp) >= 0 -> Im(i*zp) >= 0 for wofz
    val = 1.0 - jnp.exp(-(zp**2)) * wofz(1j * zp)
    return jnp.where(flip, -val, val)
