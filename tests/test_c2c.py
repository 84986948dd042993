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


def test_apply_tolerates_leading_batch_dims(rng):
    """plan.apply embeds in larger jits where leading batch dims appear."""
    import jax

    import fftw3_tpu as ftpu

    p = ftpu.plan_dft_1d(32)
    x = (rng.standard_normal((5, 32))
         + 1j * rng.standard_normal((5, 32))).astype("complex64")
    got = np.asarray(jax.jit(p.apply)(x))
    want = np.fft.fft(x, axis=-1)
    assert np.max(np.abs(got - want)) / np.max(np.abs(want)) < 1e-4
    # multi-axis plan with an extra leading dim
    p2 = ftpu.plan_dft((8, 16))
    x2 = (rng.standard_normal((3, 8, 16))
          + 1j * rng.standard_normal((3, 8, 16))).astype("complex64")
    got2 = np.asarray(jax.jit(p2.apply)(x2))
    want2 = np.fft.fftn(x2, axes=(1, 2))
    assert np.max(np.abs(got2 - want2)) / np.max(np.abs(want2)) < 1e-4
    # r2r too
    p3 = ftpu.plan_r2r((16,), ["redft10"])
    x3 = rng.standard_normal((4, 16)).astype("float32")
    got3 = np.asarray(jax.jit(p3.apply)(x3))
    from fftw3_tpu.ops.matrices import r2r_matrix
    want3 = x3 @ r2r_matrix("redft10", 16)
    assert np.max(np.abs(got3 - want3)) < 1e-3 * np.max(np.abs(want3))


def test_bogus_wisdom_recovery():
    """The wisdom-corruption recovery ladder (fftw_api.c:283-315 analog):
    structurally invalid imported wisdom is dropped, planning proceeds."""
    import json

    import fftw3_tpu as ftpu
    from fftw3_tpu.planner import Planner, validate_desc

    pl = Planner()
    good = pl.plan_c2c(64, np.float32, 0)
    assert validate_desc("c2c", 64, good)
    # corrupt entries of several shapes
    assert not validate_desc("c2c", 64, {"alg": "direct", "n": 32})
    assert not validate_desc("c2c", 64, {"alg": "mixed", "n": 64, "p": 7,
                                         "child": good})
    assert not validate_desc("c2c", 64, {"alg": "pallas", "n": 64,
                                         "radices": [8, 4]})
    assert not validate_desc("c2c", 64, "garbage")
    assert not validate_desc("r2c", 64, {"alg": "r2c_pack", "n": 64,
                                         "child": {"alg": "direct",
                                                   "n": 16}})
    # poisoned wisdom: planner must drop it and re-plan, not crash
    key = pl._key("c2c", 128, np.dtype(np.float32))
    pl.wisdom[key] = {"desc": {"alg": "mixed", "n": 128, "p": 5,
                               "child": {"alg": "direct", "n": 3}},
                      "patience": 3, "cost": 0.0}
    desc = pl.plan_c2c(128, np.float32, 0)
    assert validate_desc("c2c", 128, desc)
    assert pl.stats.get("nbogus", 0) == 1
