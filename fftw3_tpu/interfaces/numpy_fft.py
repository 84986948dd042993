"""numpy.fft-compatible interface over the TPU engine.

Function-for-function mirror of ``numpy.fft``'s public surface, with numpy's
norm conventions.  (The reference's equivalent "users switch by changing an
import" surface is its FFTW2/F77 compat layers; for a Python audience the
numpy module IS the de-facto API to mirror.)
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as _np

from .. import api as _api

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


def hfft(x, n=None, axis=-1, norm=None):
    """Hermitian-input FFT (numpy.fft.hfft semantics): the c2r transform of
    conj(x) — c2r IS the unnormalized Hermitian-to-real DFT — with numpy's
    norm factors (backward: 1, ortho: 1/sqrt(n), forward: 1/n)."""
    x = jnp.asarray(x)
    if n is None:
        n = 2 * (x.shape[axis] - 1)
    # irfft applies the "backward" 1/n; undo it to get the raw c2r, then
    # apply numpy's hfft scaling
    y = irfft(jnp.conj(x), n, axis, None) * n
    scale = {None: 1.0, "backward": 1.0,
             "ortho": 1.0 / _np.sqrt(n), "forward": 1.0 / n}[norm]
    return y if scale == 1.0 else y * jnp.asarray(scale, y.dtype)


def ihfft(x, n=None, axis=-1, norm=None):
    """Inverse of hfft: conj(rfft(x)) with the inverse norm factors."""
    x = jnp.asarray(x)
    if n is None:
        n = x.shape[axis]
    y = jnp.conj(rfft(x, n, axis, None))
    scale = {None: 1.0 / n, "backward": 1.0 / n,
             "ortho": 1.0 / _np.sqrt(n), "forward": 1.0}[norm]
    return y if scale == 1.0 else y * jnp.asarray(scale, y.dtype)
