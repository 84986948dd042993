"""Round-4 additions: desc-carried kernel variants.

- ``merge``  (pallas_r2c / pallas_c2r): the A/B two-real pipelines run as
  ONE double-lane-width _stages call.  On-chip it verified but LOST the
  r2c race (BASELINE.md round 4); the capability stays desc-carried.
- ``tile_b`` (pallas, pallas4): row-tile override — pallas4's outer
  kernel at q=128 measured 15-19% faster at tb=512 (the 128-row blocks
  are 64 KB and per-grid-step overhead dominates).
- ``k2: "force"``: per-plan override of the K2_MAX_BYTES cross-pass
  budget (presplit shrank the cross operand; n=2048's 1 MB first stage
  becomes raceable).

All exercised in interpret mode against float64 oracles.
"""
import jax
import numpy as np
import pytest

import fftw3_tpu  # noqa: F401  (conftest forces cpu + interpret)
from fftw3_tpu.ops import pallas_stockham as ps

RNG = np.random.default_rng(42)


def _relerr(a, b):
    return np.max(np.abs(a - b)) / np.max(np.abs(b))


@pytest.mark.parametrize("extra", [{"merge": True},
                                   {"merge": True, "radices": [16, 16]},
                                   {"k2": "force"},
                                   {"merge": True, "k2": "force"}])
def test_r2c_desc_variants(extra):
    n = 512
    x = RNG.standard_normal((256, n)).astype(np.float32)
    ref = np.fft.rfft(x.astype(np.float64), axis=1)
    desc = {"alg": "pallas_r2c", "n": n}
    desc.update(extra)
    f = ps.build_pallas_r2c(desc, np.float32)
    y = np.asarray(jax.jit(f)(x))
    assert _relerr(y, ref) < 2e-5


@pytest.mark.parametrize("extra", [{"merge": True}, {"k2": "force"}])
def test_c2r_desc_variants(extra):
    n = 512
    x = RNG.standard_normal((256, n)).astype(np.float32)
    X = np.fft.rfft(x.astype(np.float64), axis=1).astype(np.complex64)
    desc = {"alg": "pallas_c2r", "n": n}
    desc.update(extra)
    f = ps.build_pallas_c2r(desc, np.float32)
    y = np.asarray(jax.jit(f)(X))
    assert _relerr(y, n * x) < 2e-5


@pytest.mark.parametrize("tb", [512, 1024])
def test_pallas4_tile_b(tb):
    n = 4096
    p4, q4 = ps.choose_fourstep(n)
    xr = RNG.standard_normal((40, n)).astype(np.float32)
    xi = RNG.standard_normal((40, n)).astype(np.float32)
    ref = np.fft.fft((xr + 1j * xi).astype(np.complex128), axis=1)
    f = jax.jit(ps.build_pallas_c2c_split_fourstep(
        {"alg": "pallas4", "n": n, "p": p4, "q": q4, "tile_b": tb},
        -1, np.float32))
    yr, yi = f(xr, xi)
    assert _relerr(np.asarray(yr) + 1j * np.asarray(yi), ref) < 2e-5


def test_c2c_k2_force_matches_budgeted():
    """k2="force" changes scheduling, not semantics: same transform, and
    at n=2048 [128,16] the forced cross pass must still verify (the
    static budget excludes this shape)."""
    n = 2048
    xr = RNG.standard_normal((128, n)).astype(np.float32)
    xi = RNG.standard_normal((128, n)).astype(np.float32)
    ref = np.fft.fft((xr + 1j * xi).astype(np.complex128), axis=1)
    for k2 in ("first", "force"):
        f = jax.jit(ps.build_pallas_c2c_split(
            {"alg": "pallas", "n": n, "radices": [128, 16], "k2": k2},
            -1, np.float32))
        yr, yi = f(xr, xi)
        assert _relerr(np.asarray(yr) + 1j * np.asarray(yi), ref) < 2e-5


def test_r2c_inner_kernel():
    """Axis-(-2) r2c kernel directly: real (pre, n, L) -> half spectrum
    over axis -2, no transposes."""
    pre, n, L = 3, 256, 384
    x = RNG.standard_normal((pre, n, L)).astype(np.float32)
    ref = np.fft.rfft(x.astype(np.float64), axis=1)
    f = ps.build_pallas_r2c_inner({"alg": "pallas_r2c_inner", "n": n},
                                  np.float32)
    yr, yi = jax.jit(f)(x)
    assert _relerr(np.asarray(yr) + 1j * np.asarray(yi), ref) < 2e-5


@pytest.mark.parametrize("shape", [(2, 256, 384), (256, 512)])
def test_r2c_swapped_composition(shape):
    """config.r2c_swapped: axis-(-2) r2c + last-axis c2c + Hermitian
    reconstruct must match rfftn exactly (contract layout: half spectrum
    on the LAST axis)."""
    import fftw3_tpu as ftpu
    from fftw3_tpu.planner import the_planner
    axes = tuple(range(len(shape) - 2, len(shape)))
    x = RNG.standard_normal(shape).astype(np.float32)
    ftpu.forget_wisdom()
    # pin the axis-(-2) r2c to the kernel solver (the CPU-tier cost model
    # may otherwise pick dense at small n, which correctly disables the
    # swap — here we exercise the swapped composition itself)
    n_a = shape[-2]
    vec = int(np.prod(shape)) // n_a
    the_planner.wisdom[the_planner._key("r2c", n_a, np.float32, vec)] = {
        "desc": {"alg": "pallas_r2c", "n": n_a,
                 "radices": ps.choose_radices(n_a // 2)},
        "patience": 99, "cost": 0.0}
    ftpu.config.r2c_swapped = True
    mode0 = ftpu.config.pallas_mode
    ftpu.config.pallas_mode = "interpret"   # "auto" on CPU gates pallas off
    try:
        p = ftpu.plan_dft_r2c(shape, axes=axes, dtype="float32")
    finally:
        ftpu.config.r2c_swapped = False
        ftpu.config.pallas_mode = mode0
        ftpu.forget_wisdom()
    assert "pallas_r2c_inner" in repr(p)
    y = np.asarray(jax.jit(p.apply)(x))
    ref = np.fft.rfftn(x.astype(np.float64), axes=axes)
    assert y.shape == ref.shape
    assert _relerr(y, ref) < 2e-5
    # extra LEADING batch dims at apply time must still work
    xb = RNG.standard_normal((2,) + shape).astype(np.float32)
    yb = np.asarray(jax.jit(p.apply)(xb))
    refb = np.fft.rfftn(xb.astype(np.float64),
                        axes=tuple(a + 1 for a in axes))
    assert _relerr(yb, refb) < 2e-5


def test_pallas_r2c_vjp_matches_reference():
    """The fused r2c kernel's custom VJP (round 4 — without it jax.grad
    through an r2c plan dies on the real chip while interpret mode hides
    the gap) must match jnp.fft.rfft's vjp: identical linear map,
    identical JAX cotangent conventions."""
    n, m = 256, 128
    x = RNG.standard_normal((8, n)).astype(np.float32)
    g = (RNG.standard_normal((8, m + 1))
         + 1j * RNG.standard_normal((8, m + 1))).astype(np.complex64)
    f = ps.build_pallas_r2c({"alg": "pallas_r2c", "n": n}, np.float32)
    import jax.numpy as jnp
    _, vjp = jax.vjp(f, x)
    _, vjp_ref = jax.vjp(lambda a: jnp.fft.rfft(a, axis=-1), x)
    a, b = np.asarray(vjp(g)[0]), np.asarray(vjp_ref(g)[0])
    assert _relerr(a, b) < 2e-5


def test_pallas_c2r_vjp_matches_reference():
    """c2r VJP: the kernel equals n * jnp.fft.irfft (DC/Nyquist imag
    parts drop out in both), so its vjp must match n * irfft's —
    including the zeroed DC/Nyquist imaginary cotangents."""
    n, m = 256, 128
    import jax.numpy as jnp
    X = (RNG.standard_normal((8, m + 1))
         + 1j * RNG.standard_normal((8, m + 1))).astype(np.complex64)
    gy = RNG.standard_normal((8, n)).astype(np.float32)
    f = ps.build_pallas_c2r({"alg": "pallas_c2r", "n": n}, np.float32)
    _, vjp = jax.vjp(f, X)
    _, vjp_ref = jax.vjp(lambda Z: jnp.fft.irfft(Z, n, axis=-1) * n, X)
    a, b = np.asarray(vjp(gy)[0]), np.asarray(vjp_ref(gy)[0])
    assert _relerr(a, b) < 2e-5


def test_x64_ambient_does_not_change_pallas_results():
    """Round-4 fix: every pallas invocation traces under a scoped
    x64-off context (ambient jax_enable_x64 crashes fresh Mosaic
    compiles on the real toolchain).  The wrapper must (a) leave the
    global flag intact and (b) produce identical results either way —
    the kernels are all-f32, so 32-bit tracing changes nothing."""
    n = 256
    x = RNG.standard_normal((128, n)).astype(np.float32)
    xi = RNG.standard_normal((128, n)).astype(np.float32)
    f = jax.jit(ps.build_pallas_c2c_split(
        {"alg": "pallas", "n": n, "radices": [16, 16]}, -1, np.float32))
    y0 = np.asarray(f(x, xi)[0])
    assert jax.config.jax_enable_x64  # conftest turns it on for oracles
    with jax.enable_x64(True):
        y1 = np.asarray(f(x, xi)[0])
    np.testing.assert_array_equal(y0, y1)
    assert jax.config.jax_enable_x64


def test_system_wisdom_file_is_valid():
    """wisdom/v5e.json (the shipped system wisdom, round-4 on-chip
    winners) must parse, import, and contain only structurally valid
    descriptors.  The v5e device signature never matches the CPU test
    runtime, so entries are validated directly rather than via plans."""
    import json
    import os
    import fftw3_tpu as ftpu
    from fftw3_tpu.planner import validate_desc

    path = os.path.join(os.path.dirname(__file__), "..", "wisdom",
                        "v5e.json")
    w = json.load(open(path))
    assert w["format"].startswith("fftw3-tpu-wisdom")
    assert w["entries"]
    for key, v in w["entries"].items():
        kind, ns = key.split(":")[:2]
        assert validate_desc(kind, int(ns), v["desc"]), key
        assert v["patience"] >= 1 and v["cost"] > 0
    os.environ["FFTW3_TPU_SYSTEM_WISDOM"] = path
    try:
        assert ftpu.import_system_wisdom()
    finally:
        del os.environ["FFTW3_TPU_SYSTEM_WISDOM"]
        ftpu.forget_wisdom()


def test_merge_tb64_is_buildable_but_gated():
    """tb=64 + merge builds (the 64-lane recombine slices only crash the
    REAL Mosaic compiler, not interpret mode) — documents why the bench
    never races it on chip."""
    n = 512
    x = RNG.standard_normal((64, n)).astype(np.float32)
    ref = np.fft.rfft(x.astype(np.float64), axis=1)
    f = ps.build_pallas_r2c({"alg": "pallas_r2c", "n": n, "merge": True,
                             "tile_b": 64}, np.float32)
    y = np.asarray(jax.jit(f)(x))
    assert _relerr(y, ref) < 2e-5
