"""dd64 tier (fftwl_/fftwq_ analog): double-double c2c accuracy.

The oracle problem: numpy's complex128 FFT carries ~1e-16 error, 14
orders too coarse to verify a ~1e-30 transform — so the reference DFT is
computed directly in mpmath at 40 digits (O(n^2), small n only) and the
dd result is rebuilt and compared IN mpmath.
"""
import jax
import numpy as np
import pytest

import fftw3_tpu as ftpu

mpmath = pytest.importorskip("mpmath")


def _mp_dft(zr, zi, n, sign):
    """(n,) mpmath DFT from f64 hi/lo pair columns."""
    mp = mpmath
    mp.mp.dps = 50
    out = []
    for k in range(n):
        sr = mp.mpf(0)
        si = mp.mpf(0)
        for j in range(n):
            a = mp.mpf(2 * ((j * k) % n)) / n
            c, s = mp.cospi(a), mp.sinpi(a) * sign
            xr, xi = zr[j], zi[j]
            sr += xr * c - xi * s
            si += xr * s + xi * c
        out.append((sr, si))
    return out


def _dd_err(plan, n, rng):
    """Max relative error of apply_dd vs the 50-digit oracle."""
    mp = mpmath
    mp.mp.dps = 50
    rh = rng.standard_normal(n)
    ih = rng.standard_normal(n)
    rl = rng.standard_normal(n) * 1e-17     # genuine dd inputs: lo bits set
    il = rng.standard_normal(n) * 1e-17
    yrh, yrl, yih, yil = (np.asarray(v) for v in
                          jax.jit(plan.apply_dd)(rh, rl, ih, il))
    zr = [mp.mpf(float(rh[j])) + mp.mpf(float(rl[j])) for j in range(n)]
    zi = [mp.mpf(float(ih[j])) + mp.mpf(float(il[j])) for j in range(n)]
    ref = _mp_dft(zr, zi, n, plan.sign)
    scale = max(abs(sr) + abs(si) for sr, si in ref)
    err = mp.mpf(0)
    for k, (sr, si) in enumerate(ref):
        dr = (mp.mpf(float(yrh[k])) + mp.mpf(float(yrl[k]))) - sr
        di = (mp.mpf(float(yih[k])) + mp.mpf(float(yil[k]))) - si
        err = max(err, abs(dr) + abs(di))
    return float(err / scale)


@pytest.mark.parametrize("n", [16, 30, 64])
def test_dd64_quad_accuracy(rng, n):
    """~1e-30 relative — 11 orders past long double (eps 1.1e-19), a few
    bits short of quad eps (1.9e-34): the documented dd trade."""
    p = ftpu.plan_dft_1d_q(n)
    assert _dd_err(p, n, rng) < 1e-28


def test_dd64_backward(rng):
    p = ftpu.plan_dft_1d_l(16, sign=+1)
    assert _dd_err(p, 16, rng) < 1e-28


def test_dd64_execute_clongdouble(rng):
    """Host clongdouble boundary: exact hi split, error bounded by the
    CONTAINER's eps (x86 80-bit, 1.1e-19), not the transform's."""
    n = 48
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)
         ).astype(np.clongdouble)
    x += x * np.longdouble(1e-17)           # exercise sub-f64 input bits
    y = ftpu.plan_dft_1d_l(n).execute(x)
    assert y.dtype == np.clongdouble
    ref = np.fft.fft(x.astype(np.complex128))
    # coarse oracle (1e-16); the fine check is test_dd64_quad_accuracy
    assert np.max(np.abs(y.astype(np.complex128) - ref)) \
        / np.max(np.abs(ref)) < 1e-13


def test_dd64_batch_dims(rng):
    """Leading batch dims ride along (right-relative axes invariant)."""
    p = ftpu.plan_dft_1d_q(16)
    planes = tuple(rng.standard_normal((3, 2, 16)) for _ in range(4))
    out = jax.jit(p.apply_dd)(*planes)
    assert all(v.shape == (3, 2, 16) for v in out)
    one = p.apply_dd(*(v[1, 0] for v in planes))
    np.testing.assert_allclose(np.asarray(out[0][1, 0]),
                               np.asarray(one[0]), rtol=0, atol=0)


def test_dd64_grad_is_adjoint(rng):
    """Custom VJP: cotangents go through the opposite-sign transform at
    dd accuracy (not f32/f64-truncated autodiff through the EFT chains)."""
    p = ftpu.plan_dft_1d_q(8)
    rh = rng.standard_normal(8)

    def loss(v):
        yrh, _, _, _ = p.apply_dd(v, np.zeros(8), np.zeros(8), np.zeros(8))
        return yrh.sum()

    g = np.asarray(jax.grad(loss)(rh))
    # d(sum_k Re Y_k)/dx_j = sum_k cos(2 pi jk/8) — compute directly
    j = np.arange(8)[:, None]
    k = np.arange(8)[None, :]
    ref = np.cos(2 * np.pi * j * k / 8).sum(axis=1)
    np.testing.assert_allclose(g, ref, atol=1e-12)


def test_dd64_gates():
    with pytest.raises(ValueError):
        ftpu.plan_dft_1d_q(14)              # 7-smooth: not supported
    assert ftpu.DdPlan(16).flops()[0] > 0
    assert "dd64" in repr(ftpu.plan_dft_1d_l(16))


def test_dd64_nd(rng):
    """Rank-2 long-double plan: coarse oracle vs numpy (the fine per-axis
    accuracy is covered by test_dd64_quad_accuracy; here the composition
    and the clongdouble boundary)."""
    x = (rng.standard_normal((12, 16)) + 1j * rng.standard_normal((12, 16))
         ).astype(np.clongdouble)
    y = ftpu.plan_dft_l((12, 16)).execute(x)
    ref = np.fft.fft2(x.astype(np.complex128))
    assert np.max(np.abs(y.astype(np.complex128) - ref)) \
        / np.max(np.abs(ref)) < 1e-12
    # axes subset + leading batch dim via apply_dd
    p = ftpu.plan_dft_q((4, 9, 8), axes=(1, 2))
    planes = tuple(rng.standard_normal((4, 9, 8)) for _ in range(4))
    out = jax.jit(p.apply_dd)(*planes)
    assert out[0].shape == (4, 9, 8)
