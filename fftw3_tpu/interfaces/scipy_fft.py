"""scipy.fft-compatible interface over the TPU engine.

Mirrors ``scipy.fft``'s public surface: the complex/real FFT family plus
DCT/DST I-IV with scipy's norm conventions ("backward" default, "ortho",
"forward"), and the n-dimensional dctn/dstn variants.  All transforms route
through the plan-cached engine (FFTW-convention unnormalized kernels with
the scipy factors applied on top, exactly how scipy wraps pocketfft).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

from .. import api as _api
from .. import kinds as K

# complex/real FFT family — scipy norm semantics match numpy's
fft = _api.fft
ifft = _api.ifft
fft2 = _api.fft2
ifft2 = _api.ifft2
fftn = _api.fftn
ifftn = _api.ifftn
rfft = _api.rfft
irfft = _api.irfft
rfft2 = _api.rfft2
irfft2 = _api.irfft2
rfftn = _api.rfftn
irfftn = _api.irfftn
fftfreq = _api.fftfreq
rfftfreq = _api.rfftfreq
fftshift = _api.fftshift
ifftshift = _api.ifftshift

from .numpy_fft import hfft, ihfft  # noqa: E402


def _axis_n(x, axis):
    return x.shape[axis % x.ndim]


def _shape_vec(x, axis, vals):
    shp = [1] * x.ndim
    shp[axis % x.ndim] = len(vals)
    return jnp.asarray(vals, x.dtype).reshape(shp)


def dct(x, type: int = 2, n=None, axis: int = -1, norm=None):
    x = jnp.asarray(x, jnp.float32 if x is not None and
                    jnp.asarray(x).dtype != jnp.float64 else jnp.float64)
    if n is not None:
        x = _api._fit_length(x, n, axis)
    N = _axis_n(x, axis)
    if norm in (None, "backward"):
        return _api.dct(x, type, axis, None)
    if norm == "forward":
        return _api.dct(x, type, axis, None) / _forward_den(type, N, True)
    if norm != "ortho":
        raise ValueError(f"bad norm {norm!r}")
    # ortho factors (scipy's orthonormalized DCTs)
    if type == 1:
        if N < 2:
            raise ValueError("DCT-I needs n >= 2")
        pre = np.ones(N)
        pre[0] = pre[-1] = np.sqrt(2.0)
        post = np.full(N, 1.0 / np.sqrt(2.0 * (N - 1)))
        post[0] = post[-1] = post[0] / np.sqrt(2.0)
        y = _api.dct(x * _shape_vec(x, axis, pre), 1, axis, None)
        return y * _shape_vec(y, axis, post)
    if type == 2:
        post = np.full(N, np.sqrt(1.0 / (2.0 * N)))
        post[0] = np.sqrt(1.0 / (4.0 * N))
        y = _api.dct(x, 2, axis, None)
        return y * _shape_vec(y, axis, post)
    if type == 3:
        pre = np.full(N, 1.0 / np.sqrt(2.0 * N))
        pre[0] = 1.0 / np.sqrt(N)
        return _api.dct(x * _shape_vec(x, axis, pre), 3, axis, None)
    if type == 4:
        return _api.dct(x, 4, axis, None) / np.sqrt(2.0 * N)
    raise ValueError(f"bad DCT type {type}")


def dst(x, type: int = 2, n=None, axis: int = -1, norm=None):
    x = jnp.asarray(x, jnp.float32 if jnp.asarray(x).dtype != jnp.float64
                    else jnp.float64)
    if n is not None:
        x = _api._fit_length(x, n, axis)
    N = _axis_n(x, axis)
    if norm in (None, "backward"):
        return _api.dst(x, type, axis, None)
    if norm == "forward":
        return _api.dst(x, type, axis, None) / _forward_den(type, N, False)
    if norm != "ortho":
        raise ValueError(f"bad norm {norm!r}")
    if type == 1:
        return _api.dst(x, 1, axis, None) / np.sqrt(2.0 * (N + 1))
    if type == 2:
        post = np.full(N, np.sqrt(1.0 / (2.0 * N)))
        post[-1] = np.sqrt(1.0 / (4.0 * N))
        y = _api.dst(x, 2, axis, None)
        return y * _shape_vec(y, axis, post)
    if type == 3:
        pre = np.full(N, 1.0 / np.sqrt(2.0 * N))
        pre[-1] = 1.0 / np.sqrt(N)
        return _api.dst(x * _shape_vec(x, axis, pre), 3, axis, None)
    if type == 4:
        return _api.dst(x, 4, axis, None) / np.sqrt(2.0 * N)
    raise ValueError(f"bad DST type {type}")


def _forward_den(type_: int, N: int, is_dct: bool) -> float:
    """Logical size: the "forward" norm divides by it (scipy convention)."""
    if type_ == 1:
        return 2.0 * (N - 1) if is_dct else 2.0 * (N + 1)
    return 2.0 * N


_INV_TYPE = {1: 1, 2: 3, 3: 2, 4: 4}


def idct(x, type: int = 2, n=None, axis: int = -1, norm=None):
    it = _INV_TYPE[type]
    N = _axis_n(jnp.asarray(x), axis) if n is None else n
    if norm == "ortho":
        return dct(x, it, n, axis, "ortho")
    if norm == "forward":
        return dct(x, it, n, axis, None)           # forward fwd -> bare inv
    return dct(x, it, n, axis, None) / _forward_den(it, N, True)


def idst(x, type: int = 2, n=None, axis: int = -1, norm=None):
    it = _INV_TYPE[type]
    N = _axis_n(jnp.asarray(x), axis) if n is None else n
    if norm == "ortho":
        return dst(x, it, n, axis, "ortho")
    if norm == "forward":
        return dst(x, it, n, axis, None)
    return dst(x, it, n, axis, None) / _forward_den(it, N, False)


def _nd(fn1, x, type, axes, norm):
    x = jnp.asarray(x)
    axes = tuple(range(x.ndim)) if axes is None else \
        tuple(a % x.ndim for a in axes)
    for a in axes:
        x = fn1(x, type, None, a, norm)
    return x


def dctn(x, type: int = 2, axes=None, norm=None):
    return _nd(dct, x, type, axes, norm)


def idctn(x, type: int = 2, axes=None, norm=None):
    return _nd(idct, x, type, axes, norm)


def dstn(x, type: int = 2, axes=None, norm=None):
    return _nd(dst, x, type, axes, norm)


def idstn(x, type: int = 2, axes=None, norm=None):
    return _nd(idst, x, type, axes, norm)
