"""Complex-to-complex 1-D solver builders.

Each builder turns a *plan descriptor* (a JSON-able dict chosen by the
planner) into a pure, jittable ``apply`` closure acting on the last axis of a
complex array ``(..., n) -> (..., n)``.  Transforms are unnormalized; ``sign``
is FFTW_FORWARD (-1) or FFTW_BACKWARD (+1).

Solver map to the reference (see SURVEY.md section 2.3):

* ``nop``       — dft-nop               (fftw/fftw_api.c:3959-4012)
* ``direct``    — dft-direct + dft-generic, unified: a whole-transform DFT
                  matrix multiply.  On TPU this is the *right* leaf: an
                  (B, n) @ (n, n) complex matmul runs on the MXU
                  (fftw_api.c:3131-3377, :3390-3519)
* ``mixed``     — dft-ct Cooley-Tukey, in the transposed four-step (Stockham
                  autosort) formulation: no bit reversal, every stage is a
                  batched matmul + twiddle + transpose (fftw_api.c:2068-3103)
* ``rader``     — dft-rader, prime n via (n-1)-point cyclic convolution
                  (fftw_api.c:4139-4413)
* ``bluestein`` — dft-bluestein, any n via chirp-z convolution at a padded
                  smooth size m >= 2n-1 (fftw_api.c:1598-1804)
* ``xla``       — delegate to XLA's built-in FFT custom-call; registered as a
                  competitor the planner may time against (no FFTW analog).
"""
from __future__ import annotations

from typing import Callable, Dict

import jax.numpy as jnp
import numpy as np

from .. import config
from ..utils import primes
from . import matrices

Apply = Callable[[jnp.ndarray], jnp.ndarray]


def complex_dtype(rdtype) -> np.dtype:
    return np.dtype(np.complex64) if np.dtype(rdtype) == np.float32 \
        else np.dtype(np.complex128)


def build_c2c(desc: Dict, sign: int, rdtype) -> Apply:
    """Build the apply closure for a c2c descriptor tree."""
    alg = desc["alg"]
    n = desc["n"]
    ctype = complex_dtype(rdtype)

    if alg == "nop" or n == 1:
        return lambda x: x

    if alg == "direct":
        F = np.asarray(matrices.dft_matrix(n, sign), dtype=ctype)

        def apply_direct(x):
            return jnp.matmul(x, F, precision=config.precision())
        return apply_direct

    if alg == "mixed":
        p = desc["p"]
        q = n // p
        Fp = np.asarray(matrices.dft_matrix(p, sign), dtype=ctype)
        tw = np.asarray(matrices.twiddle_2d(p, q, sign), dtype=ctype)
        child = build_c2c(desc["child"], sign, rdtype)

        def apply_mixed(x):
            shp = x.shape[:-1]
            x = x.reshape(*shp, p, q)
            # DFT_p along axis -2: contraction on the MXU.
            y = jnp.einsum("...pq,pc->...cq", x, Fp,
                           precision=config.precision())
            z = child(y * tw)                       # recurse on last axis
            return jnp.swapaxes(z, -1, -2).reshape(*shp, n)
        return apply_mixed

    if alg == "bluestein":
        m = desc["m"]
        c = matrices.chirp(n, sign)                 # host f64
        v = np.zeros(m, np.complex128)
        v[:n] = np.conj(c)
        v[m - n + 1:] = np.conj(c[1:])[::-1]
        fwd = build_c2c(desc["child"], -1, rdtype)
        bwd = build_c2c(desc["child"], +1, rdtype)
        # V = F(v) precomputed at plan time on host (exact f64 chirp).
        V = np.fft.fft(v)
        Vj = np.asarray(V / m, dtype=ctype)        # fold 1/m into kernel
        cj = np.asarray(c, dtype=ctype)

        def apply_bluestein(x):
            u = x * cj
            pad = [(0, 0)] * (u.ndim - 1) + [(0, m - n)]
            U = fwd(jnp.pad(u, pad))
            conv = bwd(U * Vj)
            return cj * conv[..., :n]
        return apply_bluestein

    if alg == "rader":
        p = n
        g = primes.find_generator(p)
        ginv = pow(g, p - 2, p)
        perm_a = np.array([pow(g, t, p) for t in range(p - 1)], np.int32)
        idx_out = np.array([pow(ginv, t, p) for t in range(p - 1)], np.int32)
        # b[j] = w^{g^{-j}}, exact integer exponents (rader omega table analog,
        # fftw/fftw_api.c:16541-16570).
        e = np.array([pow(ginv, t, p) for t in range(p - 1)], np.int64)
        b = np.exp(sign * 2j * np.pi * e / p)
        fwd = build_c2c(desc["child"], -1, rdtype)
        bwd = build_c2c(desc["child"], +1, rdtype)
        B = np.asarray(np.fft.fft(b) / (p - 1), dtype=ctype)
        perm_a = np.asarray(perm_a)
        idx_out = np.asarray(idx_out)

        def apply_rader(x):
            a = x[..., perm_a]
            conv = bwd(fwd(a) * B)
            out = jnp.empty_like(x)
            out = out.at[..., idx_out].set(x[..., 0:1] + conv)
            out = out.at[..., 0].set(jnp.sum(x, axis=-1))
            return out
        return apply_rader

    if alg == "xla":
        if sign == -1:
            return lambda x: jnp.fft.fft(x, axis=-1)
        return lambda x: jnp.fft.ifft(x, axis=-1) * n

    raise ValueError(f"unknown c2c algorithm {alg!r}")


# ---------------------------------------------------------------------------
# Op counts per transform (for plan.flops(), analog of the codelet desc
# opcounts consumed by fftw_flops, fftw/fftw_api.c:489-501).  Counts are for
# one 1-D transform, in real operations.
# ---------------------------------------------------------------------------

def c2c_opcount(desc: Dict) -> Dict[str, float]:
    alg, n = desc["alg"], desc["n"]
    if alg == "nop" or n == 1:
        return {"add": 0.0, "mul": 0.0, "fma": 0.0}
    if alg in ("direct", "xla"):
        # complex matmul: n^2 complex MACs = 4n^2 real mul + 4n^2 real add
        return {"add": 4.0 * n * n, "mul": 0.0, "fma": 4.0 * n * n}
    if alg == "mixed":
        p = desc["p"]
        q = n // p
        child = c2c_opcount(desc["child"])
        return {
            "add": 4.0 * p * p * q + p * child["add"],
            "mul": 6.0 * n + p * child["mul"],          # twiddle mult
            "fma": 4.0 * p * p * q + p * child["fma"],
        }
    if alg == "bluestein":
        child = c2c_opcount(desc["child"])
        return {
            "add": 2 * child["add"] + 2.0 * desc["m"],
            "mul": 2 * child["mul"] + 6.0 * (2 * desc["n"] + desc["m"]),
            "fma": 2 * child["fma"],
        }
    if alg == "rader":
        child = c2c_opcount(desc["child"])
        return {
            "add": 2 * child["add"] + 4.0 * n,
            "mul": 2 * child["mul"] + 6.0 * n,
            "fma": 2 * child["fma"],
        }
    raise ValueError(alg)
