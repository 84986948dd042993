"""Compensated-f32 (double-float) tier tests — VERDICT r2 item 6.

The tier's contract: for ``dtype=complex128`` plans the planner may choose
the ``df32`` solver, whose pure-f32 error-free-transform arithmetic must
stay inside FFTW's double-precision verify tolerance of 1e-10
(fftw/libbench2/bench-main.c:70) while avoiding every emulated-f64 matmul.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import fftw3_tpu as ftpu
from fftw3_tpu import config
from fftw3_tpu import kinds as K
from fftw3_tpu.ops import c2c as c2c_ops
from fftw3_tpu.ops import df32
from fftw3_tpu.planner import Planner, validate_desc


def relerr(yr, yi, ref):
    y = np.asarray(yr) + 1j * np.asarray(yi)
    return np.max(np.abs(y - ref)) / np.max(np.abs(ref))


@pytest.mark.parametrize("n", [2, 4, 8, 12, 60, 360, 1000, 1024, 2048])
def test_df32_forward_backward(rng, n):
    rad = df32.df32_radices(n)
    assert rad is not None and int(np.prod(rad)) == n
    desc = {"alg": "df32", "n": n, "radices": rad}
    x = rng.standard_normal((3, n)) + 1j * rng.standard_normal((3, n))
    fwd = df32.build_df32_c2c_split(desc, -1, np.float64)
    yr, yi = jax.jit(fwd)(x.real, x.imag)
    assert relerr(yr, yi, np.fft.fft(x, axis=-1)) < 1e-12
    bwd = df32.build_df32_c2c_split(desc, +1, np.float64)
    zr, zi = jax.jit(bwd)(np.asarray(yr), np.asarray(yi))
    assert relerr(zr, zi, x * n) < 1e-12


def test_df32_applicability():
    assert df32.df32_applicable(720)
    assert not df32.df32_applicable(7)      # prime > 5
    assert not df32.df32_applicable(1)
    assert df32.df32_radices(14) is None


def test_planner_picks_df32_for_f64():
    pl = Planner()
    d = pl.plan_c2c(1024, np.float64, K.PATIENCE_ESTIMATE)
    assert d["alg"] == "df32"
    # f32 planning is unaffected by the tier
    d32 = pl.plan_c2c(1024, np.float32, K.PATIENCE_ESTIMATE)
    assert d32["alg"] != "df32"


def test_strict_f64_knob():
    old = config.strict_f64
    try:
        config.strict_f64 = True
        pl = Planner()
        d = pl.plan_c2c(1024, np.float64, K.PATIENCE_ESTIMATE)
        assert d["alg"] != "df32"
    finally:
        config.strict_f64 = old


def test_f64_composition_through_real_plans(rng):
    """f64 r2c routes its complex child through the df32 tier and still
    meets the double contract."""
    p = ftpu.plan_dft_r2c([1024], dtype="float64")
    x = rng.standard_normal(1024)
    y = np.asarray(p.execute(x))
    ref = np.fft.rfft(x)
    assert np.max(np.abs(y - ref)) / np.max(np.abs(ref)) < 1e-12
    assert "df32" in repr(p)


def test_f64_prime_composition(rng):
    """Prime n: rader/bluestein over df32 children."""
    p = ftpu.plan_dft((4, 101), axes=(1,), dtype="complex128")
    x = rng.standard_normal((4, 101)) + 1j * rng.standard_normal((4, 101))
    y = np.asarray(p.execute(x))
    assert np.max(np.abs(y - np.fft.fft(x, axis=1))) \
        / np.max(np.abs(y)) < 1e-10


def test_grad_through_df32(rng):
    """The error-free transforms are plain jnp ops — the custom-VJP-free
    autodiff path must produce the adjoint transform."""
    desc = {"alg": "df32", "n": 64, "radices": df32.df32_radices(64)}
    fwd = df32.build_df32_c2c_split(desc, -1, np.float64)
    x = rng.standard_normal(64)

    def loss(v):
        yr, yi = fwd(v, jnp.zeros_like(v))
        return jnp.sum(yr ** 2 + yi ** 2)
    g = jax.grad(loss)(x)
    # d/dx sum |F x|^2 = 2 F^H F x = 2 n x for the unnormalized DFT
    np.testing.assert_allclose(np.asarray(g), 2 * 64 * x, rtol=1e-10)


def test_validate_and_opcount():
    rad = df32.df32_radices(1024)
    assert validate_desc("c2c", 1024, {"alg": "df32", "n": 1024,
                                       "radices": rad})
    assert not validate_desc("c2c", 1024, {"alg": "df32", "n": 1024,
                                           "radices": [4, 4]})
    ops = c2c_ops.c2c_opcount({"alg": "df32", "n": 1024, "radices": rad})
    assert ops["add"] > 0 and ops["mul"] > 0


def test_wisdom_roundtrip_serves_df32():
    pl = Planner()
    d = pl.plan_c2c(256, np.float64, K.PATIENCE_ESTIMATE)
    assert d["alg"] == "df32"
    s = pl.export_wisdom()
    pl2 = Planner()
    assert pl2.import_wisdom(s)
    n0 = pl2.stats["nplan"]
    assert pl2.plan_c2c(256, np.float64, K.PATIENCE_ESTIMATE) == d
    assert pl2.stats["nplan"] == n0


def test_f64_cost_model_prefers_df32():
    """The dtype-aware cost model must rank df32 above every emulated-f64
    matmul solver at ESTIMATE (that is what makes the tier fire)."""
    pl = Planner()
    cands = pl._candidates("c2c", 1024, np.float64, K.PATIENCE_ESTIMATE)
    best = min(cands, key=lambda d: pl._cost("c2c", d, f64=True))
    assert best["alg"] == "df32"
    # and the same descriptors cost MORE under f64 than under f32 for the
    # matmul algs (emulation penalty), keeping f32 rankings untouched
    mixed = next(d for d in cands if d["alg"] == "mixed")
    assert pl._cost("c2c", mixed, f64=True) > pl._cost("c2c", mixed)


class TestDf32Pallas:
    """The fused Pallas df32 kernel ("df32p"): whole double-float pipeline
    VMEM-resident — one HBM pass vs one sweep per stage on the XLA df32
    path.  Butterfly constants travel as kernel OPERANDS: XLA's algebraic
    simplifier reassociates constant products (ah*bh + ah*bl ->
    ah*(bh+bl)), collapsing the error-free transforms to f32 when the df
    twiddles are trace-time literals (measured: 1e-7 instead of 5e-15,
    firing context-dependently)."""

    @pytest.fixture(autouse=True)
    def _interpret(self):
        old = config.pallas_mode
        config.pallas_mode = "interpret"
        yield
        config.pallas_mode = old

    @pytest.mark.parametrize("n,rad", [(256, [16, 16]), (1024, [64, 16]),
                                       (1024, [32, 32]), (240, [16, 15]),
                                       (1000, [40, 25])])
    def test_double_contract(self, rng, n, rad):
        fn = jax.jit(df32.build_df32_pallas_split(
            {"alg": "df32p", "n": n, "radices": rad}, -1, np.float64))
        xr = rng.standard_normal((2, n))
        xi = rng.standard_normal((2, n))
        yr, yi = fn(xr, xi)
        got = np.asarray(yr) + 1j * np.asarray(yi)
        ref = np.fft.fft(xr + 1j * xi, axis=1)
        err = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
        assert err < 1e-12, (n, rad, err)     # well inside the 1e-10

    def test_roundtrip_and_grad(self, rng):
        n = 256
        f = df32.build_df32_pallas_split(
            {"alg": "df32p", "n": n, "radices": [16, 16]}, -1, np.float64)
        b = df32.build_df32_pallas_split(
            {"alg": "df32p", "n": n, "radices": [16, 16]}, +1, np.float64)
        xr = rng.standard_normal((2, n))
        xi = rng.standard_normal((2, n))
        yr, yi = f(xr, xi)
        zr, zi = b(yr, yi)
        assert np.max(np.abs(np.asarray(zr) / n - xr)) < 1e-12
        # custom VJP: adjoint of unnormalized F is F_{-sign}
        x = jnp.asarray(xr)
        def loss(a):
            yr2, yi2 = f(a, jnp.zeros_like(a))
            return jnp.sum(yr2 ** 2 + yi2 ** 2)

        g = jax.grad(loss)(x)
        assert np.allclose(np.asarray(g), 2 * n * np.asarray(x),
                           rtol=1e-10, atol=1e-8)

    def test_planner_races_df32p_at_measure(self, monkeypatch):
        from fftw3_tpu import planner as planner_mod
        # candidate enumeration recursively PLANS children; stub the
        # timing pass so this stays an enumeration test
        monkeypatch.setattr(
            planner_mod.Planner, "_measure_best",
            lambda self, kind, n, rdtype, cands, *a, **k: (cands[0], 0.0),
            raising=True)
        pl = Planner()
        cands = pl._candidates("c2c", 1024, np.float64,
                               K.PATIENCE_MEASURE)
        assert any(c["alg"] == "df32p" for c in cands)
        d = next(c for c in cands if c["alg"] == "df32p")
        assert validate_desc("c2c", 1024, d)
        assert planner_mod.sprint_desc(d).startswith("(df32p-1024")
        # ESTIMATE never emits it (compile risk stays MEASURE-gated)
        est = pl._candidates("c2c", 1024, np.float64, K.PATIENCE_ESTIMATE)
        assert not any(c["alg"] == "df32p" for c in est)

    def test_wisdom_served_plan_end_to_end(self, rng):
        from fftw3_tpu.planner import the_planner
        ftpu.forget_wisdom()
        key = the_planner._key("c2c", 512, np.float64, 4)
        the_planner.wisdom[key] = {
            "desc": {"alg": "df32p", "n": 512, "radices": [32, 16]},
            "patience": 99, "cost": 0.0}
        try:
            p = ftpu.plan_many_dft([512], howmany=4, dtype="complex128")
            assert "df32p" in repr(p)
            x = (rng.standard_normal((4, 512))
                 + 1j * rng.standard_normal((4, 512)))
            got = np.asarray(p.execute(x.astype(np.complex128)))
            ref = np.fft.fft(x, axis=1)
            assert np.max(np.abs(got - ref)) / np.max(np.abs(ref)) < 1e-12
            assert p.flops()[2] == 0.0        # no fma: pure VPU
        finally:
            ftpu.forget_wisdom()

    def test_applicable_gate(self):
        assert df32.df32p_applicable(1024)
        assert df32.df32p_applicable(240)
        assert not df32.df32p_applicable(2048)     # above the df window
        assert not df32.df32p_applicable(1009)     # prime
