"""Pseudo-spectral 2-D incompressible Navier-Stokes (vorticity form) —
the canonical large-scale FFT production workload (turbulence DNS).

Vorticity equation on the periodic square, solved spectrally::

    dw/dt = -(u . grad) w + nu lap(w),   u = rot(psi),  lap(psi) = -w

* spatial derivatives and the Poisson inversion are exact in Fourier space
* the quadratic advection term is evaluated pseudo-spectrally with 2/3-rule
  dealiasing (Orszag)
* time stepping: RK2 (Heun) with an exact integrating factor for the
  viscous term — unconditionally stable diffusion

Single-chip :func:`step_fn` runs on the engine's r2c/c2r plans; the
distributed :func:`distributed_step_fn` shards the y axis over a mesh and
consumes `parallel.plan_dft_r2c_dist` / `plan_dft_c2r_dist` (the fftw-mpi
consumption pattern).  Both are pure, jittable, differentiable.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import api


def _wavenumbers(n: int) -> np.ndarray:
    # domain [0, 2pi): mode m <-> exp(i m x), so wavenumbers are integers
    return np.fft.fftfreq(n, 1.0 / n)


def _spectral_operators(ny: int, nx: int):
    """(kx, ky on the rfft2 grid; inverse Laplacian; 2/3 dealias mask)."""
    ky = _wavenumbers(ny)[:, None]                    # (ny, 1)
    kx = _wavenumbers(nx)[None, : nx // 2 + 1]        # (1, nx//2+1)
    k2 = kx * kx + ky * ky
    inv_k2 = np.where(k2 == 0.0, 0.0, 1.0 / np.where(k2 == 0.0, 1.0, k2))
    # 2/3 rule on INTEGER mode numbers
    my = np.fft.fftfreq(ny, 1.0 / ny)[:, None]
    mx = np.fft.fftfreq(nx, 1.0 / nx)[None, : nx // 2 + 1]
    dealias = ((np.abs(my) <= ny // 3) & (np.abs(mx) <= nx // 3))
    return (kx.astype(np.float32), ky.astype(np.float32),
            k2.astype(np.float32), inv_k2.astype(np.float32),
            dealias.astype(np.float32))


def step_fn(ny: int, nx: int, nu: float, dt: float):
    """Jittable RK2 step ``w -> w`` for real vorticity fields (..., ny, nx)
    (leading batch dims broadcast)."""
    kx, ky, k2, inv_k2, dealias = _spectral_operators(ny, nx)
    # exact viscous integrating factors
    e_full = np.exp(-nu * k2 * dt).astype(np.float32)
    e_half = np.exp(-nu * k2 * dt / 2.0).astype(np.float32)

    def rfft2(x):
        return api.rfftn(x, axes=(-2, -1))

    def irfft2(X):
        return api.irfftn(X, s=(ny, nx), axes=(-2, -1))

    def nonlinear(W):
        """N(W) = -dealias(FFT[(u.grad) w]) from spectral vorticity W."""
        psi = W * inv_k2                         # lap(psi) = -w -> psi = w/k2
        u = irfft2(1j * ky * psi)                # u =  d(psi)/dy
        v = irfft2(-1j * kx * psi)               # v = -d(psi)/dx
        wx = irfft2(1j * kx * W)
        wy = irfft2(1j * ky * W)
        return -dealias * rfft2(u * wx + v * wy)

    def step(w):
        W = rfft2(w)
        n1 = nonlinear(W)
        W1 = (W + dt * n1) * e_full              # Euler predictor
        n2 = nonlinear(W1)
        # Heun corrector with integrating-factor weighting
        Wn = W * e_full + (dt / 2.0) * (n1 * e_full + n2)
        return irfft2(Wn)

    return step


def taylor_green_vorticity(ny: int, nx: int, kappa: int = 1) -> np.ndarray:
    """Taylor-Green vortex initial vorticity: w = 2 kappa^2 cos(kx) cos(ky)
    (decays analytically as exp(-2 nu kappa^2 t) — the standard spectral
    NS validation)."""
    y = np.arange(ny) * (2.0 * np.pi / ny)
    x = np.arange(nx) * (2.0 * np.pi / nx)
    return (2.0 * kappa * kappa
            * np.cos(kappa * y)[:, None] * np.cos(kappa * x)[None, :]
            ).astype(np.float32)


def distributed_step_fn(ny: int, nx: int, nu: float, dt: float, mesh,
                        axis_name: str = "x",
                        transpose_method: str = "all_to_all"):
    """The same RK2 step with the vorticity field sharded over its y axis,
    FFTs through the engine's DISTRIBUTED r2c/c2r plans (one global
    transpose pair each, `fftw/mpi` consumption pattern).  Returns
    (jitted step, input NamedSharding)."""
    from ..parallel import dist

    fwd = dist.plan_dft_r2c_dist((ny, nx), mesh, axis_name, axes=(0, 1),
                                 transpose_method=transpose_method)
    bwd = dist.plan_dft_c2r_dist((ny, nx), mesh, axis_name, axes=(0, 1),
                                 transpose_method=transpose_method)
    kx, ky, k2, inv_k2, dealias = _spectral_operators(ny, nx)
    e_full = np.exp(-nu * k2 * dt).astype(np.float32)
    norm = 1.0 / (ny * nx)                       # c2r is unnormalized

    def rfft2(x):
        return fwd.apply(x)

    def irfft2(X):
        return bwd.apply(X) * norm

    def nonlinear(W):
        psi = W * inv_k2
        u = irfft2(1j * ky * psi)
        v = irfft2(-1j * kx * psi)
        wx = irfft2(1j * kx * W)
        wy = irfft2(1j * ky * W)
        return -dealias * rfft2(u * wx + v * wy)

    def step(w):
        W = rfft2(w)
        n1 = nonlinear(W)
        W1 = (W + dt * n1) * e_full
        n2 = nonlinear(W1)
        Wn = W * e_full + (dt / 2.0) * (n1 * e_full + n2)
        return irfft2(Wn)

    return jax.jit(step), fwd.input_sharding()
