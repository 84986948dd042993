"""Spectral Poisson solvers — the classic FFTW production workload.

Solve ``lap(u) = f`` on regular grids with second-order finite-difference
eigenvalues (so the solver is the exact inverse of the 2nd-order stencil):

* periodic boundaries      -> FFT diagonalization (c2c / r2c)
* homogeneous Dirichlet    -> DST-I diagonalization (RODFT00)
* homogeneous Neumann      -> DCT-II/III diagonalization (REDFT10/01)

All pure, jittable, n-dimensional, batched.  The mean/nullspace mode is
projected out where the operator is singular (periodic, Neumann).
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np

from .. import api


def _eig_periodic(n, h):
    k = np.arange(n)
    return (2.0 * np.cos(2.0 * np.pi * k / n) - 2.0) / (h * h)


def _eig_dirichlet(n, h):
    k = np.arange(1, n + 1)
    return (2.0 * np.cos(np.pi * k / (n + 1)) - 2.0) / (h * h)


def _eig_neumann(n, h):
    k = np.arange(n)
    return (2.0 * np.cos(np.pi * k / n) - 2.0) / (h * h)


def solve_periodic(f, spacing: Sequence[float] = None):
    """Periodic Poisson: real f -> real u with zero mean."""
    f = jnp.asarray(f)
    nd = f.ndim
    spacing = [1.0] * nd if spacing is None else list(spacing)
    F = api.rfftn(f)
    shape = f.shape
    lam = np.zeros(F.shape, np.float64)
    for a in range(nd):
        n = shape[a]
        e = _eig_periodic(n, spacing[a])
        if a == nd - 1:
            e = e[: shape[a] // 2 + 1]
        sh = [1] * nd
        sh[a] = len(e)
        lam = lam + e.reshape(sh)
    lam_flat = lam.copy()
    lam_flat.flat[0] = 1.0                     # nullspace: mean mode
    U = F / jnp.asarray(lam_flat, F.dtype)
    U = U.at[(0,) * nd].set(0.0)
    return api.irfftn(U, s=shape)      # numpy-norm irfftn includes the 1/N


def solve_dirichlet(f, spacing: Sequence[float] = None):
    """Homogeneous Dirichlet Poisson via DST-I along every axis."""
    f = jnp.asarray(f)
    nd = f.ndim
    spacing = [1.0] * nd if spacing is None else list(spacing)
    U = f
    for a in range(nd):
        U = api.dst(U, type=1, axis=a)
    lam = np.zeros(f.shape, np.float64)
    for a in range(nd):
        e = _eig_dirichlet(f.shape[a], spacing[a])
        sh = [1] * nd
        sh[a] = len(e)
        lam = lam + e.reshape(sh)
    U = U / jnp.asarray(lam, U.dtype)
    for a in range(nd):
        U = api.dst(U, type=1, axis=a)
    scale = np.prod([2.0 * (n + 1) for n in f.shape])
    return U / scale


def solve_neumann(f, spacing: Sequence[float] = None):
    """Homogeneous Neumann Poisson via DCT-II/III; zero-mean solution."""
    f = jnp.asarray(f)
    nd = f.ndim
    spacing = [1.0] * nd if spacing is None else list(spacing)
    U = f
    for a in range(nd):
        U = api.dct(U, type=2, axis=a)
    lam = np.zeros(f.shape, np.float64)
    for a in range(nd):
        e = _eig_neumann(f.shape[a], spacing[a])
        sh = [1] * nd
        sh[a] = len(e)
        lam = lam + e.reshape(sh)
    lam.flat[0] = 1.0
    U = U / jnp.asarray(lam, U.dtype)
    U = U.at[(0,) * nd].set(0.0)
    for a in range(nd):
        U = api.dct(U, type=3, axis=a)
    scale = np.prod([2.0 * n for n in f.shape])
    return U / scale


def laplacian_periodic(u, spacing: Sequence[float] = None):
    """The matching 2nd-order periodic stencil (for verification)."""
    u = jnp.asarray(u)
    nd = u.ndim
    spacing = [1.0] * nd if spacing is None else list(spacing)
    out = jnp.zeros_like(u)
    for a in range(nd):
        h2 = spacing[a] ** 2
        out = out + (jnp.roll(u, 1, a) - 2 * u + jnp.roll(u, -1, a)) / h2
    return out
