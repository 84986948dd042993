"""DCT/DST (all 8 kinds) + DHT correctness vs scipy.fft double reference.

scipy.fft with norm=None uses exactly FFTW's unnormalized r2r definitions.
"""
import numpy as np
import pytest
import scipy.fft as sfft

import fftw3_tpu as ftpu
from fftw3_tpu.kinds import Kind, logical_size

from conftest import tol_for


def relerr(a, b):
    scale = np.max(np.abs(b)) or 1.0
    return np.max(np.abs(np.asarray(a) - b)) / scale


SIZES = [3, 4, 5, 8, 9, 15, 16, 32, 100, 128]
DCT_DST = [("redft00", sfft.dct, 1), ("redft10", sfft.dct, 2),
           ("redft01", sfft.dct, 3), ("redft11", sfft.dct, 4),
           ("rodft00", sfft.dst, 1), ("rodft10", sfft.dst, 2),
           ("rodft01", sfft.dst, 3), ("rodft11", sfft.dst, 4)]


@pytest.mark.parametrize("n", SIZES)
@pytest.mark.parametrize("kind,fn,typ", DCT_DST)
def test_reodft_all_kinds(rng, n, kind, fn, typ):
    if kind == "redft00" and n < 4:
        pytest.skip("DCT-I needs n>=2; extension path n>=4")
    x = rng.standard_normal((3, n))
    p = ftpu.plan_r2r((3, n), [kind], axes=(1,), dtype="float64")
    assert relerr(p(x), fn(x, type=typ, axis=1)) < 1e-10, \
        f"{kind} n={n}: {p}"


@pytest.mark.parametrize("kind,fn,typ", DCT_DST)
def test_reodft_f32(rng, kind, fn, typ):
    n = 64
    x = rng.standard_normal((2, n)).astype("float32")
    p = ftpu.plan_r2r((2, n), [kind], axes=(1,), dtype="float32")
    assert relerr(p(x), fn(np.float64(x), type=typ, axis=1)) < 1e-3


@pytest.mark.parametrize("n", [8, 9, 16, 27])
def test_dht(rng, n):
    x = rng.standard_normal((2, n))
    p = ftpu.plan_r2r((2, n), ["dht"], axes=(1,), dtype="float64")
    jk = 2 * np.pi * np.outer(np.arange(n), np.arange(n)) / n
    ref = x @ (np.cos(jk) + np.sin(jk))
    assert relerr(p(x), ref) < 1e-10
    # DHT is self-inverse up to n (FFTW manual)
    assert relerr(p(np.asarray(p(x))), n * x) < 1e-10


@pytest.mark.parametrize("kind", ["redft00", "redft10", "redft01", "redft11",
                                  "rodft00", "rodft10", "rodft01", "rodft11"])
def test_r2r_roundtrip_logical_size(rng, kind):
    """FFTW: each r2r kind composed with its inverse kind multiplies by the
    logical transform size N (manual 'Real even/odd DFTs')."""
    inverse = {"redft00": "redft00", "rodft00": "rodft00",
               "redft10": "redft01", "redft01": "redft10",
               "rodft10": "rodft01", "rodft01": "rodft10",
               "redft11": "redft11", "rodft11": "rodft11"}
    n = 16
    x = rng.standard_normal(n)
    f = ftpu.plan_r2r((n,), [kind], dtype="float64")
    b = ftpu.plan_r2r((n,), [inverse[kind]], dtype="float64")
    N = logical_size(Kind(kind), n)
    assert relerr(b(f(x)), N * x) < 1e-10


def test_r2r_2d_mixed_kinds(rng):
    """Per-axis kinds, like fftw_plan_r2r with a kinds array."""
    x = rng.standard_normal((8, 12))
    p = ftpu.plan_r2r((8, 12), ["redft10", "rodft10"], dtype="float64")
    ref = sfft.dst(sfft.dct(x, type=2, axis=0), type=2, axis=1)
    assert relerr(p(x), ref) < 1e-10


def test_scipy_style_wrappers(rng):
    x = rng.standard_normal((4, 20))
    for typ in (1, 2, 3, 4):
        np.testing.assert_allclose(np.asarray(ftpu.dct(x, type=typ)),
                                   sfft.dct(x, type=typ), atol=1e-9)
        np.testing.assert_allclose(np.asarray(ftpu.dst(x, type=typ)),
                                   sfft.dst(x, type=typ), atol=1e-9)
    h = np.asarray(ftpu.dht(x))
    n = 20
    jk = 2 * np.pi * np.outer(np.arange(n), np.arange(n)) / n
    np.testing.assert_allclose(h, x @ (np.cos(jk) + np.sin(jk)), atol=1e-9)
