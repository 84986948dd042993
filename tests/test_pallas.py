"""Tests for the fused Stockham Pallas kernel tier (SURVEY.md §2.6/§2.10
analog).  Run in interpret mode on the CPU runtime; the compiled path is
exercised on real TPU hardware by bench.py / the verify drive."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fftw3_tpu import config
from fftw3_tpu.ops import pallas_stockham as PS


@pytest.fixture(autouse=True)
def _interpret_mode():
    old = config.pallas_mode
    config.pallas_mode = "interpret"
    yield
    config.pallas_mode = old


def _run(n, radices, sign=-1, batch=9, tile_b=128):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((batch, n)) + 1j * rng.standard_normal((batch, n))
    fn = PS.build_pallas_c2c_split(
        {"alg": "pallas", "n": n, "radices": radices, "tile_b": tile_b},
        sign, np.float32)
    yr, yi = jax.jit(fn)(jnp.asarray(x.real, jnp.float32),
                         jnp.asarray(x.imag, jnp.float32))
    got = np.asarray(yr) + 1j * np.asarray(yi)
    want = np.fft.fft(x, axis=-1) if sign == -1 else \
        np.fft.ifft(x, axis=-1) * n
    err = np.max(np.abs(got - want)) / np.max(np.abs(want))
    assert err < 1e-4, (n, radices, err)


@pytest.mark.parametrize("n", [128, 256, 512, 1024, 2048])
def test_pow2(n):
    _run(n, PS.choose_radices(n))


@pytest.mark.parametrize("n", [384, 1000, 1500, 240])
def test_nonpow2(n):
    _run(n, PS.choose_radices(n))


def test_backward():
    _run(512, PS.choose_radices(512), sign=+1)


def test_single_stage_leaf():
    _run(48, [48])


def test_batch_padding_and_multidim_batch():
    n = 256
    fn = PS.build_pallas_c2c_split(
        {"alg": "pallas", "n": n, "radices": [64, 4], "tile_b": 128},
        -1, np.float32)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((3, 5, n)) + 1j * rng.standard_normal((3, 5, n))
    yr, yi = jax.jit(fn)(jnp.asarray(x.real, jnp.float32),
                         jnp.asarray(x.imag, jnp.float32))
    got = np.asarray(yr) + 1j * np.asarray(yi)
    want = np.fft.fft(x, axis=-1)
    assert np.max(np.abs(got - want)) / np.max(np.abs(want)) < 1e-4


class TestChooseRadices:
    def test_small_leaf(self):
        assert PS.choose_radices(48) == [48]

    def test_single_stage_window(self):
        assert PS.choose_radices(128) == [128]
        assert PS.choose_radices(256) == [256]

    def test_two_stage_cost_ranked(self):
        for n in (512, 1024, 2048, 1000, 1500):
            r = PS.choose_radices(n)
            assert len(r) == 2 and r[0] * r[1] == n and r[0] >= r[1]
            assert r[1] >= 8, (n, r)       # tiny radices are last-resort

    def test_unfactorable(self):
        with pytest.raises(ValueError):
            PS.choose_radices(67 * 521)    # no factor pair <= 256


class TestApplicable:
    def test_f64_rejected(self):
        assert not PS.applicable(1024, np.float64)

    def test_window(self):
        assert PS.applicable(1024, np.float32)
        assert not PS.applicable(64, np.float32)       # direct leaf instead
        assert not PS.applicable(4096, np.float32)     # VMEM ceiling

    def test_off_switch(self):
        config.pallas_mode = "off"
        assert not PS.applicable(1024, np.float32)


def test_planner_integration():
    """With pallas enabled the planner picks it for in-window f32 sizes."""
    from fftw3_tpu import planner as planner_mod

    pl = planner_mod.Planner()
    desc = pl.plan_c2c(1024, np.float32, 0)
    assert desc["alg"] == "pallas", desc
    # ...and the full plan built from it matches numpy
    import fftw3_tpu as ftpu
    p = ftpu.plan_dft((4, 1024), axes=(1,))
    rng = np.random.default_rng(2)
    x = rng.standard_normal((4, 1024)) + 1j * rng.standard_normal((4, 1024))
    got = np.asarray(p.execute(x.astype(np.complex64)))
    want = np.fft.fft(x, axis=1)
    assert np.max(np.abs(got - want)) / np.max(np.abs(want)) < 1e-4


def test_opcount_pallas():
    from fftw3_tpu.ops.c2c import c2c_opcount
    ops = c2c_opcount({"alg": "pallas", "n": 1024, "radices": [64, 16]})
    assert ops["fma"] > 0 and ops["mul"] > 0


@pytest.mark.parametrize("n", [256, 1000 * 2, 1024, 4096])
def test_fused_r2c(n):
    fn = PS.build_pallas_r2c(
        {"alg": "pallas_r2c", "n": n, "radices": PS.choose_radices(n // 2)},
        np.float32)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((5, n)).astype(np.float32)
    got = np.asarray(jax.jit(fn)(x))
    want = np.fft.rfft(x, axis=-1)
    assert np.max(np.abs(got - want)) / np.max(np.abs(want)) < 1e-4


def test_fused_r2c_planner_integration():
    from fftw3_tpu import planner as planner_mod
    pl = planner_mod.Planner()
    desc = pl.plan_r2c(1024, np.float32, 0)
    assert desc["alg"] == "pallas_r2c", desc
    import fftw3_tpu as ftpu
    p = ftpu.plan_dft_r2c((4, 1024), axes=(1,))
    rng = np.random.default_rng(1)
    x = rng.standard_normal((4, 1024)).astype(np.float32)
    got = np.asarray(p.execute(x))
    want = np.fft.rfft(x, axis=1)
    assert np.max(np.abs(got - want)) / np.max(np.abs(want)) < 1e-4


@pytest.mark.parametrize("n", [256, 1024, 2048])
def test_fused_c2r_roundtrip(n):
    fn_f = PS.build_pallas_r2c(
        {"alg": "pallas_r2c", "n": n, "radices": PS.choose_radices(n // 2)},
        np.float32)
    fn_b = PS.build_pallas_c2r(
        {"alg": "pallas_c2r", "n": n, "radices": PS.choose_radices(n // 2)},
        np.float32)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((5, n)).astype(np.float32)
    y = np.asarray(jax.jit(lambda a: fn_b(fn_f(a)))(x))
    assert np.max(np.abs(y - n * x)) / (n * np.max(np.abs(x))) < 1e-4


def test_fused_c2r_planner_integration():
    from fftw3_tpu import planner as planner_mod
    pl = planner_mod.Planner()
    desc = pl.plan_c2r(1024, np.float32, 0)
    assert desc["alg"] == "pallas_c2r", desc
    import fftw3_tpu as ftpu
    p = ftpu.plan_dft_c2r((4, 1024), axes=(1,))
    rng = np.random.default_rng(1)
    x = rng.standard_normal((4, 1024)).astype(np.float32)
    X = np.fft.rfft(x, axis=1).astype(np.complex64)
    got = np.asarray(p.execute(X))
    assert np.max(np.abs(got - 1024 * x)) / (1024 * np.max(np.abs(x))) < 1e-4


@pytest.mark.parametrize("n", [4096, 8192])
def test_fourstep(n):
    pq = PS.choose_fourstep(n)
    assert pq is not None
    fn = PS.build_pallas_c2c_split_fourstep(
        {"alg": "pallas4", "n": n, "p": pq[0], "q": pq[1]}, -1, np.float32)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, n)) + 1j * rng.standard_normal((3, n))
    yr, yi = jax.jit(fn)(jnp.asarray(x.real, jnp.float32),
                         jnp.asarray(x.imag, jnp.float32))
    got = np.asarray(yr) + 1j * np.asarray(yi)
    want = np.fft.fft(x, axis=-1)
    assert np.max(np.abs(got - want)) / np.max(np.abs(want)) < 1e-4


def test_fourstep_planner_integration():
    from fftw3_tpu import planner as planner_mod
    pl = planner_mod.Planner()
    desc = pl.plan_c2c(4096, np.float32, 0)
    assert desc["alg"] == "pallas4", desc
    import fftw3_tpu as ftpu
    p = ftpu.plan_dft((2, 4096), axes=(1,))
    rng = np.random.default_rng(2)
    x = (rng.standard_normal((2, 4096))
         + 1j * rng.standard_normal((2, 4096))).astype(np.complex64)
    got = np.asarray(p.execute(x))
    want = np.fft.fft(x, axis=1)
    assert np.max(np.abs(got - want)) / np.max(np.abs(want)) < 1e-4
