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


class TestVpuLastStage:
    """config.pallas_vpu_last: the final Stockham stage as pure-f32 VPU
    radix-4/2 butterflies (no bf16 hi/lo machinery) — the round-3
    headline candidate.  Gate: final radix a power of two <= 32.
    Covers every kernel form that routes through ``_stages``."""

    @pytest.fixture(autouse=True)
    def _vpu(self):
        old = config.pallas_vpu_last
        config.pallas_vpu_last = True
        yield
        config.pallas_vpu_last = old

    @pytest.mark.parametrize("n,rad", [(1024, [64, 16]), (512, [32, 16]),
                                       (2048, [64, 32]), (128, [16, 8]),
                                       (256, [64, 4]), (256, [128, 2])])
    def test_1d_both_signs(self, n, rad):
        _run(n, rad, sign=-1)
        _run(n, rad, sign=+1)

    def test_non_pow2_final_radix_falls_back(self):
        _run(1000, [40, 25])         # gate skips; must stay correct

    def test_matches_mxu_path_closely(self):
        """Flag on/off agree to f32 rounding (same transform, different
        final-stage arithmetic)."""
        rng = np.random.default_rng(1)
        x = rng.standard_normal((4, 1024)).astype(np.float32)
        y = rng.standard_normal((4, 1024)).astype(np.float32)
        desc = {"alg": "pallas", "n": 1024, "radices": [64, 16],
                "tile_b": 128}
        fn_on = PS.build_pallas_c2c_split(desc, -1, np.float32)
        r_on = jax.jit(fn_on)(x, y)
        config.pallas_vpu_last = False
        fn_off = PS.build_pallas_c2c_split(desc, -1, np.float32)
        r_off = jax.jit(fn_off)(x, y)
        config.pallas_vpu_last = True
        scale = float(np.max(np.abs(np.asarray(r_off[0]))))
        for a, b in zip(r_on, r_off):
            assert np.max(np.abs(np.asarray(a) - np.asarray(b))) / scale \
                < 5e-5

    def test_r2c_c2r_roundtrip(self):
        rng = np.random.default_rng(2)
        x = rng.standard_normal((130, 512)).astype(np.float32)
        fwd = PS.build_pallas_r2c({"alg": "pallas_r2c", "n": 512},
                                  np.float32)
        bwd = PS.build_pallas_c2r({"alg": "pallas_c2r", "n": 512},
                                  np.float32)
        X = jax.jit(fwd)(x)
        ref = np.fft.rfft(x.astype(np.float64), axis=-1)
        assert np.max(np.abs(np.asarray(X) - ref)) \
            / np.max(np.abs(ref)) < 1e-4
        y = np.asarray(jax.jit(bwd)(X)) / 512.0
        assert np.max(np.abs(y - x)) < 1e-4

    def test_gradients(self):
        """Custom VJP path with the VPU final stage."""
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.standard_normal((2, 256)), jnp.float32)
        fn = PS.build_pallas_c2c_split(
            {"alg": "pallas", "n": 256, "radices": [16, 16],
             "tile_b": 128}, -1, np.float32)

        def loss(a):
            yr, yi = fn(a, jnp.zeros_like(a))
            return jnp.sum(yr ** 2 + yi ** 2)

        g = jax.grad(loss)(x)
        # Parseval: d/dx sum |F x|^2 = 2 n x for real x
        assert np.allclose(np.asarray(g), 2 * 256 * np.asarray(x),
                           rtol=1e-4, atol=1e-2)


def test_desc_pins_vpu_variant_over_config():
    """desc["vpu"] overrides config.pallas_vpu_last at build time: a
    wisdom entry recording a measured winner must reproduce that variant
    regardless of the global default (bench autotune relies on this), and
    the planner must serve such a desc through validate_desc."""
    from fftw3_tpu import planner as planner_mod

    rng = np.random.default_rng(5)
    x = rng.standard_normal((4, 1024)).astype(np.float32)
    y = rng.standard_normal((4, 1024)).astype(np.float32)
    ref = np.fft.fft((x + 1j * y).astype(np.complex128), axis=1)
    assert config.pallas_vpu_last is False
    desc = {"alg": "pallas", "n": 1024, "radices": [64, 16],
            "tile_b": 128, "vpu": True}
    assert planner_mod.validate_desc("c2c", 1024, desc)
    fn = jax.jit(PS.build_pallas_c2c_split(desc, -1, np.float32))
    yr, yi = fn(x, y)
    got = np.asarray(yr) + 1j * np.asarray(yi)
    assert np.max(np.abs(got - ref)) / np.max(np.abs(ref)) < 1e-4
    # desc-pinned OFF under a True global default: also honored
    config.pallas_vpu_last = True
    try:
        fn2 = jax.jit(PS.build_pallas_c2c_split(
            {**desc, "vpu": False}, -1, np.float32))
    finally:
        config.pallas_vpu_last = False
    yr2, yi2 = fn2(x, y)
    got2 = np.asarray(yr2) + 1j * np.asarray(yi2)
    assert np.max(np.abs(got2 - ref)) / np.max(np.abs(ref)) < 1e-4


class TestVpuAllStages:
    """desc["vpu"] == "all": EVERY eligible stage (radix a power of two
    <= 64) as pure-f32 VPU butterflies — no MXU matmul and no bf16 hi/lo
    cast anywhere in the kernel.  The round-3 ablation attributed ~38 of
    ~52 ps/pt to the precision machinery this variant deletes; the bench
    autotune races it on-chip.  Accuracy is BETTER than the MXU path
    (pure f32 adds vs bf16x3)."""

    @pytest.mark.parametrize("n,rad", [(1024, [64, 16]), (1024, [32, 32]),
                                       (512, [32, 16]), (256, [16, 16]),
                                       (2048, [64, 32])])
    def test_1d_both_signs(self, n, rad):
        for sign in (-1, +1):
            rng = np.random.default_rng(0)
            x = (rng.standard_normal((9, n))
                 + 1j * rng.standard_normal((9, n)))
            fn = PS.build_pallas_c2c_split(
                {"alg": "pallas", "n": n, "radices": rad, "tile_b": 128,
                 "vpu": "all"}, sign, np.float32)
            yr, yi = jax.jit(fn)(jnp.asarray(x.real, jnp.float32),
                                 jnp.asarray(x.imag, jnp.float32))
            got = np.asarray(yr) + 1j * np.asarray(yi)
            ref = np.fft.fft(x, axis=1) if sign < 0 \
                else np.fft.ifft(x, axis=1) * n
            err = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
            # pure-f32 butterflies: tighter than the bf16 contract
            assert err < 1e-5, (n, rad, sign, err)

    def test_ineligible_radix_stays_mxu(self):
        """p=128 > 64: that stage keeps the G matmul; the kernel is a
        correct MXU/VPU hybrid."""
        _run(2048, [128, 16])

    def test_partial_override_vs_true(self):
        """"all" and True differ: at [32, 32] the first stage is VPU only
        under "all" (check by accuracy signature: full-VPU is ~1e-7,
        final-only keeps the first stage's bf16 error ~5e-6)."""
        rng = np.random.default_rng(1)
        x = rng.standard_normal((4, 1024)).astype(np.float32)
        y = rng.standard_normal((4, 1024)).astype(np.float32)
        ref = np.fft.fft((x + 1j * y).astype(np.complex128), axis=1)

        def err_for(vpu):
            fn = jax.jit(PS.build_pallas_c2c_split(
                {"alg": "pallas", "n": 1024, "radices": [32, 32],
                 "tile_b": 128, "vpu": vpu}, -1, np.float32))
            yr, yi = fn(x, y)
            got = np.asarray(yr) + 1j * np.asarray(yi)
            return np.max(np.abs(got - ref)) / np.max(np.abs(ref))

        e_all, e_last = err_for("all"), err_for(True)
        assert e_all < 1e-6 < e_last < 1e-4

    def test_config_all_reaches_every_kernel_form(self):
        """config.pallas_vpu_last = "all" flows through the inner, 2-D,
        r2c, c2r and four-step builders (they snapshot the config)."""
        old = config.pallas_vpu_last
        config.pallas_vpu_last = "all"
        try:
            rng = np.random.default_rng(2)
            # axis -2 form
            fn = jax.jit(PS.build_pallas_c2c_split_inner(
                {"alg": "pallas", "n": 256, "radices": [16, 16]},
                -1, np.float32))
            xr = rng.standard_normal((2, 256, 256)).astype(np.float32)
            xi = rng.standard_normal((2, 256, 256)).astype(np.float32)
            yr, yi = fn(xr, xi)
            ref = np.fft.fft((xr + 1j * xi).astype(np.complex128), axis=1)
            assert np.max(np.abs(np.asarray(yr) + 1j * np.asarray(yi)
                                 - ref)) / np.max(np.abs(ref)) < 1e-4
            # fused r2c -> c2r roundtrip
            x = rng.standard_normal((8, 512)).astype(np.float32)
            X = jax.jit(PS.build_pallas_r2c(
                {"alg": "pallas_r2c", "n": 512}, np.float32))(x)
            ref2 = np.fft.rfft(x.astype(np.float64), axis=-1)
            assert np.max(np.abs(np.asarray(X) - ref2)) \
                / np.max(np.abs(ref2)) < 1e-4
            y = np.asarray(jax.jit(PS.build_pallas_c2r(
                {"alg": "pallas_c2r", "n": 512}, np.float32))(X)) / 512.0
            assert np.max(np.abs(y - x)) < 1e-4
            # four-step
            f4 = jax.jit(PS.build_pallas_c2c_split_fourstep(
                {"alg": "pallas4", "n": 4096, "p": 64, "q": 64},
                -1, np.float32))
            xr = rng.standard_normal((2, 4096)).astype(np.float32)
            xi = rng.standard_normal((2, 4096)).astype(np.float32)
            yr, yi = f4(xr, xi)
            ref3 = np.fft.fft((xr + 1j * xi).astype(np.complex128), axis=1)
            assert np.max(np.abs(np.asarray(yr) + 1j * np.asarray(yi)
                                 - ref3)) / np.max(np.abs(ref3)) < 1e-4
        finally:
            config.pallas_vpu_last = old

    def test_gradients(self):
        """Custom VJP with the all-VPU kernel (adjoint pins the variant)."""
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.standard_normal((2, 256)), jnp.float32)
        fn = PS.build_pallas_c2c_split(
            {"alg": "pallas", "n": 256, "radices": [16, 16],
             "tile_b": 128, "vpu": "all"}, -1, np.float32)

        def loss(a):
            yr, yi = fn(a, jnp.zeros_like(a))
            return jnp.sum(yr ** 2 + yi ** 2)

        g = jax.grad(loss)(x)
        assert np.allclose(np.asarray(g), 2 * 256 * np.asarray(x),
                           rtol=1e-4, atol=1e-2)

    def test_planner_races_vpuall_in_measure(self):
        """MEASURE-tier candidate sets include the {"vpu": "all"} variant
        for all-eligible schedules, and validate_desc accepts it."""
        from fftw3_tpu import kinds as K
        from fftw3_tpu import planner as planner_mod

        cands = planner_mod.the_planner._candidates_c2c(
            1024, np.float32, K.PATIENCE_MEASURE, None)
        alls = [c for c in cands
                if c.get("alg") == "pallas" and c.get("vpu") == "all"]
        assert alls, "no vpu=all candidate at MEASURE patience"
        for c in alls:
            assert planner_mod.validate_desc("c2c", 1024, c)
            assert all(r <= 64 and (r & (r - 1)) == 0
                       for r in c["radices"])

    def test_opcount_vpuall(self):
        """flops() accounting mirrors the implementation: the all-variant
        replaces EVERY eligible stage's 4pn MACs with butterfly adds."""
        from fftw3_tpu.ops.c2c import c2c_opcount

        base = {"alg": "pallas", "n": 1024, "radices": [64, 16]}
        mxu = c2c_opcount(base)
        last = c2c_opcount({**base, "vpu": True})
        alls = c2c_opcount({**base, "vpu": "all"})
        # each step off the MXU strictly cuts fma and adds VPU add/mul
        assert alls["fma"] == 0.0 < last["fma"] < mxu["fma"]
        assert alls["add"] > last["add"] > mxu["add"]


def test_fused_2d_honors_desc_radices_and_vpu(monkeypatch):
    """The fused 2-D builder takes the per-axis planner descs: wisdom can
    steer its radix schedules and vpu variant (e.g. racing [16,16]-vpuall
    against the MXU-only [256] single stage at n=256 — bench_c2c_3d)."""
    import fftw3_tpu as ftpu
    from fftw3_tpu.planner import the_planner

    captured = {}
    real = PS._make_call_2d

    def spy(n1, n2, rad1, rad2, sign, interpret, vpu=None, **kw):
        captured.update(rad1=rad1, rad2=rad2, vpu=vpu)
        return real(n1, n2, rad1, rad2, sign, interpret, vpu=vpu, **kw)

    monkeypatch.setattr(PS, "_make_call_2d", spy)
    n = 256
    desc = {"alg": "pallas", "n": n, "radices": [16, 16], "tile_b": 128,
            "vpu": "all"}
    ftpu.forget_wisdom()
    the_planner.wisdom[the_planner._key("c2c", n, np.float32, n)] = {
        "desc": dict(desc), "patience": 99, "cost": 0.0}
    try:
        p = ftpu.plan_dft((n, n), dtype="complex64")
    finally:
        ftpu.forget_wisdom()
    assert captured == {"rad1": [16, 16], "rad2": [16, 16], "vpu": "all"}
    rng = np.random.default_rng(0)
    x = (rng.standard_normal((n, n))
         + 1j * rng.standard_normal((n, n))).astype(np.complex64)
    got = np.asarray(jax.jit(p.apply)(jnp.asarray(x)))
    ref = np.fft.fft2(x.astype(np.complex128))
    assert np.max(np.abs(got - ref)) / np.max(np.abs(ref)) < 1e-5


def test_r2c_c2r_desc_pins_vpu():
    """The fused real kernels honor desc["vpu"] like the c2c forms (the
    config flag stays the fallback), so wisdom/autotune steer them too."""
    assert config.pallas_vpu_last is False
    rng = np.random.default_rng(6)
    x = rng.standard_normal((8, 512)).astype(np.float32)
    X = jax.jit(PS.build_pallas_r2c(
        {"alg": "pallas_r2c", "n": 512, "vpu": "all"}, np.float32))(x)
    ref = np.fft.rfft(x.astype(np.float64), axis=-1)
    assert np.max(np.abs(np.asarray(X) - ref)) / np.max(np.abs(ref)) < 1e-4
    y = np.asarray(jax.jit(PS.build_pallas_c2r(
        {"alg": "pallas_c2r", "n": 512, "vpu": "all"}, np.float32))(X))
    assert np.max(np.abs(y / 512.0 - x)) < 1e-4


def test_planner_offers_vpuall_above_max_n(monkeypatch):
    """Above the MXU-form VMEM window (MAX_N) MEASURE still races a
    single-kernel all-VPU candidate (no G/cross/bf16 buffers, so it may
    fit where the MXU form blew scoped VMEM) against pallas4."""
    import fftw3_tpu as ftpu
    from fftw3_tpu import kinds as K
    from fftw3_tpu import planner as planner_mod

    # candidate enumeration recursively PLANS children (mixed/bluestein);
    # stub the timing pass so this stays an enumeration test
    monkeypatch.setattr(
        planner_mod.Planner, "_measure_best",
        lambda self, kind, n, rdtype, cands, *a, **k: (cands[0], 0.0),
        raising=True)
    ftpu.forget_wisdom()
    n = 2 * PS.MAX_N
    cands = planner_mod.the_planner._candidates_c2c(
        n, np.float32, K.PATIENCE_MEASURE, None)
    singles = [c for c in cands
               if c.get("alg") == "pallas" and c.get("vpu") == "all"]
    assert singles, "no above-window vpuall candidate at MEASURE"
    for c in singles:
        assert planner_mod.validate_desc("c2c", n, c)
        assert all(r <= 64 and (r & (r - 1)) == 0 for r in c["radices"])
    # ESTIMATE never emits it (native C++ policy equality)
    est = planner_mod.the_planner._candidates_c2c(
        n, np.float32, K.PATIENCE_ESTIMATE, None)
    assert not any(c.get("alg") == "pallas" for c in est)


class TestVpuRadix5:
    """Radix-5 VPU butterflies: 2-5-smooth radices <= 64 are eligible for
    the VPU stage paths, making the non-pow2 BASELINE config n=1000
    ([40,25] / [50,20]) fully VPU-servable (fftw n1_5.c codelet role)."""

    def test_gate(self):
        assert PS._vpu_last_ok(40, 1) and PS._vpu_last_ok(25, 1)
        assert PS._vpu_last_ok(50, 1) and PS._vpu_last_ok(10, 1)
        assert not PS._vpu_last_ok(80, 1)      # > 64
        assert not PS._vpu_last_ok(7, 1)

    @pytest.mark.parametrize("n,rad,vpu", [
        (1000, [40, 25], "all"), (1000, [50, 20], "all"),
        (1000, [40, 25], True), (500, [25, 20], "all"),
        (640, [64, 10], "all")])
    def test_correct(self, n, rad, vpu):
        for sign in (-1, +1):
            rng = np.random.default_rng(0)
            x = (rng.standard_normal((8, n))
                 + 1j * rng.standard_normal((8, n)))
            fn = jax.jit(PS.build_pallas_c2c_split(
                {"alg": "pallas", "n": n, "radices": rad, "tile_b": 128,
                 "vpu": vpu}, sign, np.float32))
            yr, yi = fn(jnp.asarray(x.real, jnp.float32),
                        jnp.asarray(x.imag, jnp.float32))
            got = np.asarray(yr) + 1j * np.asarray(yi)
            ref = np.fft.fft(x, axis=1) if sign < 0 \
                else np.fft.ifft(x, axis=1) * n
            err = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
            tol = 1e-5 if vpu == "all" else 1e-4
            assert err < tol, (n, rad, vpu, sign, err)

    def test_opcount(self):
        from fftw3_tpu.ops.c2c import c2c_opcount
        base = {"alg": "pallas", "n": 1000, "radices": [40, 25]}
        alls = c2c_opcount({**base, "vpu": "all"})
        assert alls["fma"] == 0.0
        assert alls["mul"] > 0 and alls["add"] > 0   # radix-5 rotations


class TestVpuRadix3:
    """Radix-3 VPU butterflies complete the 2-3-5-smooth <= 64 gate
    (fftw n1_3.c codelet role): e.g. n=1500 [50,30], 384 [24,16]."""

    def test_gate(self):
        assert PS._vpu_last_ok(48, 1) and PS._vpu_last_ok(60, 1)
        assert PS._vpu_last_ok(27, 1) and PS._vpu_last_ok(15, 1)
        assert not PS._vpu_last_ok(7, 1) and not PS._vpu_last_ok(66, 1)

    @pytest.mark.parametrize("n,rad", [
        (1500, [50, 30]), (384, [24, 16]), (240, [16, 15]),
        (1296, [36, 36]), (972, [54, 18])])
    def test_correct(self, n, rad):
        for sign in (-1, +1):
            rng = np.random.default_rng(0)
            x = (rng.standard_normal((8, n))
                 + 1j * rng.standard_normal((8, n)))
            fn = jax.jit(PS.build_pallas_c2c_split(
                {"alg": "pallas", "n": n, "radices": rad, "tile_b": 128,
                 "vpu": "all"}, sign, np.float32))
            yr, yi = fn(jnp.asarray(x.real, jnp.float32),
                        jnp.asarray(x.imag, jnp.float32))
            got = np.asarray(yr) + 1j * np.asarray(yi)
            ref = np.fft.fft(x, axis=1) if sign < 0 \
                else np.fft.ifft(x, axis=1) * n
            assert np.max(np.abs(got - ref)) / np.max(np.abs(ref)) < 1e-5

    def test_opcount(self):
        from fftw3_tpu.ops.c2c import c2c_opcount
        alls = c2c_opcount({"alg": "pallas", "n": 1500,
                            "radices": [50, 30], "vpu": "all"})
        assert alls["fma"] == 0.0 and alls["mul"] > 0
