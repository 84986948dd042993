"""Complex DFT correctness vs numpy double-precision reference.

Covers every c2c solver (direct, mixed-radix Stockham, Bluestein, Rader),
batched and multi-dimensional, both signs, both precisions — the per-solver
"paranoid" analog of FFTW's check.pl fuzzing (SURVEY.md section 4).
"""
import numpy as np
import pytest

import fftw3_tpu as ftpu
from fftw3_tpu.ops import c2c as c2c_ops
from fftw3_tpu.planner import the_planner

from conftest import tol_for


def relerr(a, b):
    scale = np.max(np.abs(b)) or 1.0
    return np.max(np.abs(np.asarray(a) - b)) / scale


def ref_fft(x, sign, axes=None):
    if axes is None:
        axes = list(range(x.ndim))
    y = np.asarray(x, np.complex128)
    for a in np.atleast_1d(axes):
        y = np.fft.fft(y, axis=a) if sign == -1 else \
            np.fft.ifft(y, axis=a) * y.shape[a]
    return y


SIZES = [1, 2, 3, 4, 5, 8, 12, 16, 27, 30, 32, 64, 100, 128, 210, 243, 256,
         360, 512, 1000, 1024]
PRIMES = [7, 11, 13, 17, 31, 97, 101, 127, 131, 257, 509, 1009]


@pytest.mark.parametrize("n", SIZES)
@pytest.mark.parametrize("dtype", ["complex64", "complex128"])
def test_fft_1d_sizes(rng, n, dtype):
    x = (rng.standard_normal((3, n)) + 1j * rng.standard_normal((3, n))) \
        .astype(dtype)
    p = ftpu.plan_dft((3, n), axes=(1,), dtype=dtype)
    assert relerr(p(x), ref_fft(x, -1, [1])) < tol_for(dtype)


@pytest.mark.parametrize("n", PRIMES)
def test_fft_primes(rng, n):
    x = rng.standard_normal((2, n)) + 1j * rng.standard_normal((2, n))
    p = ftpu.plan_dft((2, n), axes=(1,), dtype="complex128")
    assert relerr(p(x), ref_fft(x, -1, [1])) < 1e-10


@pytest.mark.parametrize("n", [8, 30, 100, 1000])
def test_backward(rng, n):
    x = rng.standard_normal((n,)) + 1j * rng.standard_normal((n,))
    p = ftpu.plan_dft((n,), sign=ftpu.BACKWARD, dtype="complex128")
    assert relerr(p(x), ref_fft(x, +1)) < 1e-10


@pytest.mark.parametrize("n", [16, 60, 101])
def test_roundtrip_unnormalized(rng, n):
    """FFTW semantics: backward(forward(x)) == n * x."""
    x = rng.standard_normal((n,)) + 1j * rng.standard_normal((n,))
    fwd = ftpu.plan_dft((n,), dtype="complex128")
    bwd = ftpu.plan_dft((n,), sign=ftpu.BACKWARD, dtype="complex128")
    assert relerr(bwd(fwd(x)), n * x) < 1e-10


@pytest.mark.parametrize("shape,axes", [
    ((8, 8), None), ((4, 6, 8), None), ((16, 32), (1,)),
    ((5, 12, 7), (0, 2)), ((3, 3, 3, 3), None),
])
def test_fft_nd(rng, shape, axes):
    x = rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
    p = ftpu.plan_dft(shape, axes=axes, dtype="complex128")
    ax = list(range(len(shape))) if axes is None else list(axes)
    assert relerr(p(x), ref_fft(x, -1, ax)) < 1e-10


def test_single_precision_accuracy(rng):
    """f32 path must stay within FFTW's single tolerance at large n."""
    n = 4096
    x = (rng.standard_normal((n,)) + 1j * rng.standard_normal((n,)))
    p = ftpu.plan_dft((n,), dtype="complex64")
    assert relerr(p(x.astype("complex64")), ref_fft(x, -1)) < 1e-3


# ---- per-solver paranoid checks (forced descriptors) ----------------------

@pytest.mark.parametrize("desc", [
    {"alg": "direct", "n": 24},
    {"alg": "mixed", "n": 96, "p": 8, "child": {"alg": "direct", "n": 12}},
    {"alg": "mixed", "n": 64, "p": 8,
     "child": {"alg": "mixed", "n": 8, "p": 2,
               "child": {"alg": "direct", "n": 4}}},
    {"alg": "bluestein", "n": 12, "m": 32,
     "child": {"alg": "direct", "n": 32}},
    {"alg": "rader", "n": 13, "child": {"alg": "direct", "n": 12}},
    {"alg": "xla", "n": 24},
])
@pytest.mark.parametrize("sign", [-1, +1])
def test_solver_paranoid(rng, desc, sign):
    n = desc["n"]
    fn = c2c_ops.build_c2c(desc, sign, np.float64)
    x = rng.standard_normal((4, n)) + 1j * rng.standard_normal((4, n))
    assert relerr(fn(x), ref_fft(x, sign, [1])) < 1e-10


def test_plan_flops_positive():
    p = ftpu.plan_dft((64, 64), dtype="complex64")
    add, mul, fma = ftpu.flops(p)
    assert add > 0 and fma > 0
    assert ftpu.cost(p) > 0


def test_plan_printer():
    p = ftpu.plan_dft_1d(1024, dtype="complex64")
    s = ftpu.sprint_plan(p)
    assert "plan" in s and "1024" in s
