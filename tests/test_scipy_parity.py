"""interfaces.scipy_fft vs scipy.fft itself (VERDICT r2 weak #8).

The dct/dst norm conventions' semantic source is scipy (which wraps
pocketfft exactly the way this module wraps the plan engine); testing
against the internal oracle would only prove self-consistency.  scipy is
in the base image, so compare directly: types 1-4, all three norms, odd
and even n, n= padding/truncation, and the n-dimensional variants.
"""
import numpy as np
import pytest

scipy_fft = pytest.importorskip("scipy.fft")

from fftw3_tpu.interfaces import scipy_fft as ftpu_fft  # noqa: E402


def _cmp(a, b, tol=2e-4):
    a = np.asarray(a).astype(np.result_type(np.asarray(b).dtype,
                                            np.float64))
    scale = max(np.max(np.abs(b)), 1e-30)
    assert np.max(np.abs(a - b)) / scale < tol, \
        f"max abs diff {np.max(np.abs(a - b)):.3e} scale {scale:.3e}"


@pytest.mark.parametrize("tp", [1, 2, 3, 4])
@pytest.mark.parametrize("norm", [None, "ortho", "forward"])
@pytest.mark.parametrize("n", [8, 9, 16])
def test_dct_matches_scipy(rng, tp, norm, n):
    x = rng.standard_normal((3, n))
    _cmp(ftpu_fft.dct(x.astype(np.float32), type=tp, norm=norm),
         scipy_fft.dct(x, type=tp, norm=norm))


@pytest.mark.parametrize("tp", [1, 2, 3, 4])
@pytest.mark.parametrize("norm", [None, "ortho", "forward"])
@pytest.mark.parametrize("n", [8, 9, 16])
def test_dst_matches_scipy(rng, tp, norm, n):
    x = rng.standard_normal((3, n))
    _cmp(ftpu_fft.dst(x.astype(np.float32), type=tp, norm=norm),
         scipy_fft.dst(x, type=tp, norm=norm))


@pytest.mark.parametrize("tp", [1, 2, 3, 4])
@pytest.mark.parametrize("norm", [None, "ortho", "forward"])
def test_idct_idst_match_scipy(rng, tp, norm):
    x = rng.standard_normal((2, 12))
    _cmp(ftpu_fft.idct(x.astype(np.float32), type=tp, norm=norm),
         scipy_fft.idct(x, type=tp, norm=norm))
    _cmp(ftpu_fft.idst(x.astype(np.float32), type=tp, norm=norm),
         scipy_fft.idst(x, type=tp, norm=norm))


@pytest.mark.parametrize("tp", [2, 3])
def test_dct_axis_and_n(rng, tp):
    x = rng.standard_normal((6, 10))
    # non-default axis
    _cmp(ftpu_fft.dct(x.astype(np.float32), type=tp, axis=0),
         scipy_fft.dct(x, type=tp, axis=0))
    # n= truncation and zero-padding
    for n in (6, 14):
        _cmp(ftpu_fft.dct(x.astype(np.float32), type=tp, n=n, norm="ortho"),
             scipy_fft.dct(x, type=tp, n=n, norm="ortho"))


@pytest.mark.parametrize("norm", [None, "ortho"])
def test_dctn_dstn_match_scipy(rng, norm):
    x = rng.standard_normal((6, 8))
    _cmp(ftpu_fft.dctn(x.astype(np.float32), norm=norm),
         scipy_fft.dctn(x, norm=norm))
    _cmp(ftpu_fft.dstn(x.astype(np.float32), norm=norm),
         scipy_fft.dstn(x, norm=norm))
    # roundtrip through the inverse pair
    _cmp(ftpu_fft.idctn(np.asarray(
        ftpu_fft.dctn(x.astype(np.float32), norm=norm)), norm=norm), x)


@pytest.mark.parametrize("norm", [None, "ortho", "forward"])
def test_fft_family_matches_scipy(rng, norm):
    x = rng.standard_normal((4, 16)) + 1j * rng.standard_normal((4, 16))
    _cmp(ftpu_fft.fft(x.astype(np.complex64), norm=norm),
         scipy_fft.fft(x, norm=norm))
    xr = rng.standard_normal((4, 16))
    _cmp(ftpu_fft.rfft(xr.astype(np.float32), norm=norm),
         scipy_fft.rfft(xr, norm=norm))
    _cmp(ftpu_fft.irfft(np.asarray(ftpu_fft.rfft(xr.astype(np.float32))),
                        norm=norm),
         scipy_fft.irfft(scipy_fft.rfft(xr), norm=norm))


def test_workers_and_overwrite_accepted(rng):
    """scipy's workers/overwrite_x must be accepted (and may be ignored —
    XLA owns scheduling)."""
    x = rng.standard_normal((2, 8)).astype(np.float32)
    _cmp(ftpu_fft.dct(x, workers=4, overwrite_x=True),
         scipy_fft.dct(x.astype(np.float64)))
    _cmp(ftpu_fft.dctn(x, workers=2), scipy_fft.dctn(x.astype(np.float64)))


@pytest.mark.parametrize("tp", [1, 2, 3, 4])
@pytest.mark.parametrize("norm", [None, "ortho", "forward"])
@pytest.mark.parametrize("og", [False, True])
def test_orthogonalize_matches_scipy(rng, tp, norm, og):
    """Explicit orthogonalize (scipy >= 1.8): boundary sqrt(2) rescales
    independent of the uniform norm scaling, both values, all norms."""
    x = rng.standard_normal((2, 9))
    if tp == 1 and not og and norm == "ortho":
        pass  # valid combination, still compared below
    _cmp(ftpu_fft.dct(x.astype(np.float32), type=tp, norm=norm,
                      orthogonalize=og),
         scipy_fft.dct(x, type=tp, norm=norm, orthogonalize=og))
    _cmp(ftpu_fft.dst(x.astype(np.float32), type=tp, norm=norm,
                      orthogonalize=og),
         scipy_fft.dst(x, type=tp, norm=norm, orthogonalize=og))
    _cmp(ftpu_fft.idct(x.astype(np.float32), type=tp, norm=norm,
                       orthogonalize=og),
         scipy_fft.idct(x, type=tp, norm=norm, orthogonalize=og))
