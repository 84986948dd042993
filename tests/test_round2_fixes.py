"""Regression tests for the round-1 advisor findings (ADVICE.md) and the
round-1 judge's "weak" list (VERDICT.md)."""
import numpy as np
import pytest

import fftw3_tpu as ftpu
from fftw3_tpu import config
from fftw3_tpu import kinds as K
from fftw3_tpu.planner import Planner, the_planner


@pytest.fixture
def interpret_pallas():
    old = config.pallas_mode
    old_pts = config.measure_points
    config.pallas_mode = "interpret"
    config.measure_points = 1 << 12      # interpret-mode timing is slow
    yield
    config.pallas_mode = old
    config.measure_points = old_pts


def test_measure_candidates_pallas4_no_keyerror(interpret_pallas):
    """ADVICE high: _candidates('c2c', 4096, f32, MEASURE) raised KeyError
    'radices' (the alternative-radices loop read the pallas4 desc)."""
    pl = Planner()
    cands = pl._candidates("c2c", 4096, np.float32, K.PATIENCE_MEASURE)
    assert any(c["alg"] == "pallas4" for c in cands)
    # MXU-form pallas descs at n=4096 blow scoped VMEM and must never be
    # candidates; the one sanctioned exception is the all-VPU variant
    # (round 3: no G/cross/bf16 buffers — compile failure just drops it)
    for c in cands:
        if c["alg"] == "pallas":
            assert c.get("vpu") == "all", c


def test_measure_alternative_radices_in_window(interpret_pallas):
    """ADVICE medium: in-window n must get alternative radix schedules
    under MEASURE (previously they were only generated out-of-window)."""
    pl = Planner()
    cands = pl._candidates("c2c", 1024, np.float32, K.PATIENCE_MEASURE)
    pallas = [c for c in cands if c["alg"] == "pallas"]
    assert len(pallas) >= 2
    for c in pallas:
        assert int(np.prod(c["radices"])) == 1024


def test_measure_patience_plans_n4096(interpret_pallas):
    """End-to-end: MEASURE planning for a pallas4-eligible n succeeds."""
    pl = Planner()
    desc = pl.plan_c2c(4096, np.float32, K.PATIENCE_MEASURE)
    assert desc["alg"] in ("pallas4", "mixed", "direct", "pallas")
    assert pl.stats["nmeasure"] + pl.stats["nmeasure_failed"] > 0


def test_wisdom_entry_missing_patience_recovers():
    """ADVICE low: imported wisdom entries without 'patience' must fall
    through to the recovery rung, not crash."""
    pl = Planner()
    good = pl.plan_c2c(256, np.float32, K.PATIENCE_ESTIMATE)
    key = pl._key("c2c", 256, np.float32)
    pl.wisdom[key] = {"desc": good}            # no 'patience'
    desc = pl.plan_c2c(256, np.float32, K.PATIENCE_ESTIMATE)
    assert desc["alg"] == good["alg"]


def test_wisdom_entry_not_a_dict_recovers():
    pl = Planner()
    pl.plan_c2c(256, np.float32, K.PATIENCE_ESTIMATE)
    key = pl._key("c2c", 256, np.float32)
    pl.wisdom[key] = "garbage"
    desc = pl.plan_c2c(256, np.float32, K.PATIENCE_ESTIMATE)
    assert isinstance(desc, dict)
    assert pl.stats.get("nbogus", 0) >= 1


def test_measure_failed_counter(interpret_pallas, monkeypatch):
    """VERDICT weak: MEASURE must count candidate failures, not swallow."""
    pl = Planner()
    from fftw3_tpu import planner as planner_mod

    real = planner_mod._measure_fn
    calls = {"n": 0}

    def flaky(kind, desc, n, rdtype, batch=None):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("injected miscompile")
        return real(kind, desc, n, rdtype, batch)

    monkeypatch.setattr(planner_mod, "_measure_fn", flaky)
    pl.plan_c2c(1024, np.float32, K.PATIENCE_MEASURE)
    assert pl.stats["nmeasure_failed"] >= 1
    assert "injected miscompile" in pl.stats["last_measure_error"]


def test_batch_aware_wisdom_keys(interpret_pallas):
    """VERDICT #6: wisdom is bucketed by the caller's vector size so
    plan_many_dft([1024], 128) and (..., 65536) can diverge under MEASURE."""
    pl = Planner()
    d1 = pl.plan_c2c(1024, np.float32, K.PATIENCE_MEASURE, batch=128)
    d2 = pl.plan_c2c(1024, np.float32, K.PATIENCE_MEASURE, batch=65536)
    k1 = pl._key("c2c", 1024, np.float32, 128)
    k2 = pl._key("c2c", 1024, np.float32, 65536)
    assert k1 != k2
    assert pl.wisdom[k1]["desc"] == d1 and pl.wisdom[k2]["desc"] == d2
    # replans at the same batch hit wisdom
    before = pl.stats["nwisdom_hit"]
    pl.plan_c2c(1024, np.float32, K.PATIENCE_MEASURE, batch=128)
    assert pl.stats["nwisdom_hit"] == before + 1


def test_make_plan_passes_batch():
    """make_plan must plan each axis at the caller's actual vector size."""
    from fftw3_tpu import planner as planner_mod

    seen = {}
    pl = Planner()
    orig = pl._plan

    def spy(kind, n, rdtype, patience, batch=None):
        seen.setdefault((kind, n), batch)
        return orig(kind, n, rdtype, patience, batch)

    pl._plan = spy
    from fftw3_tpu.plan import Problem, make_plan
    prob = Problem(shape=(8, 64, 32), axes=(1, 2), kind="c2c",
                   rdtype="float32")
    make_plan(prob, planner=pl)
    assert seen[("c2c", 64)] == 8 * 32
    assert seen[("c2c", 32)] == 8 * 64


def test_problem_string_docstring_example_parses():
    """ADVICE low: the documented batched-DCT-II example must parse."""
    from fftw3_tpu.harness.problem import parse_problem
    p = parse_problem("k512e10v4096")
    assert p.kind == "r2r" and p.sizes == (512,)
    assert p.r2r_kinds == (K.Kind.REDFT10,)
    assert p.batch == (4096,)


def test_problem_string_default_strides_accepted():
    from fftw3_tpu.harness.problem import UnsupportedProblem, parse_problem
    p = parse_problem("c64:32x32")          # 32 == contiguous default
    assert p.sizes == (64, 32)
    with pytest.raises(UnsupportedProblem):
        parse_problem("c64x32:7")           # non-default physical stride


def test_api_dct_ortho_matches_scipy_layer(rng):
    """VERDICT weak: api.dct(norm='ortho') must work (was inconsistent
    with interfaces.scipy_fft which implements it)."""
    from fftw3_tpu.interfaces import scipy_fft
    x = rng.standard_normal((4, 32)).astype(np.float32)
    for typ in (1, 2, 3, 4):
        a = np.asarray(ftpu.dct(x, type=typ, norm="ortho"))
        b = np.asarray(scipy_fft.dct(x, type=typ, norm="ortho"))
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)
        # round trip under ortho is the identity
        back = np.asarray(ftpu.idct(ftpu.dct(x, type=typ, norm="ortho"),
                                    type=typ, norm="ortho"))
        np.testing.assert_allclose(back, x, rtol=1e-4, atol=1e-4)


def test_guru_execute_paths_cache_jit(rng):
    """VERDICT weak: execute paths must not rebuild jax.jit per call."""
    from fftw3_tpu import guru
    p = guru.plan_guru_split_dft([guru.iodim(64)], [guru.iodim(4)])
    ri = rng.standard_normal((4, 64)).astype(np.float32)
    ii = rng.standard_normal((4, 64)).astype(np.float32)
    p.execute(ri, ii)
    fn1 = p._jitted
    p.execute(ri, ii)
    assert p._jitted is fn1 and fn1 is not None


def test_alloc_local_oracle():
    from fftw3_tpu.parallel import alloc_local
    # 10x12x4 over 4 ranks: rank 0 holds ceil(10/4)=3 slabs of 48
    assert alloc_local((10, 12, 4), 4, 0) == 3 * 48
    # transposed: max(input slab, output slab) — 12/4=3 rows of 40
    assert alloc_local((10, 12, 4), 4, 0, transposed=True) == max(144, 120)
    assert alloc_local((8,), 4, 0, howmany=5) == 10


def test_overlap_chunks_consumes_nthreads_hint():
    """VERDICT weak: plan_with_nthreads was dead state; it now sets the
    default overlap pipeline depth of distributed plans."""
    import jax
    from jax.sharding import Mesh

    from fftw3_tpu import threads
    from fftw3_tpu.parallel import plan_dft_dist

    devs = np.asarray(jax.devices()[:4])
    mesh = Mesh(devs, ("x",))
    threads.plan_with_nthreads(2)
    try:
        plan = plan_dft_dist((8, 16, 16), mesh, "x", axes=(0, 1, 2))
        x = (np.arange(8 * 16 * 16).reshape(8, 16, 16) % 7).astype(
            np.complex64)
        y = np.asarray(plan(jax.device_put(x, plan.input_sharding())))
        ref = np.fft.fftn(x)
        assert np.max(np.abs(y - ref)) / np.max(np.abs(ref)) < 1e-5
    finally:
        threads.cleanup_threads()


class TestFastReodft:
    """VERDICT #10: reodft00e-splitradix + reodft11e-r2hc-odd analogs."""

    @pytest.mark.parametrize("kind,alg", [
        ("redft00", "redft00_split"), ("rodft00", "rodft00_split"),
        ("redft11", "redft11_odd")])
    @pytest.mark.parametrize("n", [5, 9, 33, 129, 1025])
    def test_matches_dense(self, kind, alg, n, rng):
        from fftw3_tpu.ops import matrices
        from fftw3_tpu.ops import r2r as r2r_ops
        from fftw3_tpu.planner import validate_desc

        pl = Planner()
        cands = pl._candidates(kind, n, np.float64, K.PATIENCE_ESTIMATE)
        descs = [c for c in cands if c["alg"] == alg]
        assert descs, f"{alg} not offered for odd n={n}"
        d = descs[0]
        assert validate_desc(kind, n, d)
        fn = r2r_ops.build_r2r(d, np.float64)
        x = rng.standard_normal((3, n))
        y = np.asarray(fn(x))
        ref = x @ matrices.r2r_matrix(kind, n)
        assert np.max(np.abs(y - ref)) / np.max(np.abs(ref)) < 1e-10

    def test_not_offered_for_even_n(self):
        pl = Planner()
        for kind, alg in [("redft00", "redft00_split"),
                          ("redft11", "redft11_odd")]:
            cands = pl._candidates(kind, 16, np.float64,
                                   K.PATIENCE_ESTIMATE)
            assert not any(c["alg"] == alg for c in cands)

    def test_planner_prefers_split_at_large_odd_n(self):
        """Above the dense-matmul window the split/odd routes must win the
        ESTIMATE race against the padded/2n routes."""
        pl = Planner()
        d = pl.plan_r2r(K.Kind.REDFT00, 8193, np.float32,
                        K.PATIENCE_ESTIMATE)
        assert d["alg"] == "redft00_split"
        d = pl.plan_r2r(K.Kind.REDFT11, 8193, np.float32,
                        K.PATIENCE_ESTIMATE)
        assert d["alg"] == "redft11_odd"


class TestRaggedDistribution:
    """VERDICT #7: extents not divisible by the mesh axis work via internal
    pad-and-crop (mpi/block.c short-last-block analog)."""

    def _mesh(self, p=4):
        import jax
        from jax.sharding import Mesh
        return Mesh(np.asarray(jax.devices()[:p]), ("x",))

    def test_slab_ragged_shard_axis(self, rng):
        import jax

        from fftw3_tpu.parallel import plan_dft_dist
        mesh = self._mesh(4)
        shape = (10, 12, 6)                      # 4 divides neither 10 nor 6
        plan = plan_dft_dist(shape, mesh, "x", axes=(0, 1, 2))
        x = (rng.standard_normal(shape) +
             1j * rng.standard_normal(shape)).astype(np.complex64)
        y = np.asarray(plan(jax.device_put(x, plan.input_sharding())))
        ref = np.fft.fftn(x.astype(np.complex128))
        assert y.shape == shape
        assert np.max(np.abs(y - ref)) / np.max(np.abs(ref)) < 1e-5

    def test_slab_ragged_swap_axis_transposed_out(self, rng):
        import jax

        from fftw3_tpu.parallel import plan_dft_dist
        mesh = self._mesh(4)
        shape = (8, 10, 4)                       # swap axis 10 % 4 != 0
        plan = plan_dft_dist(shape, mesh, "x", axes=(0, 1),
                             transposed_out=True)
        x = (rng.standard_normal(shape) +
             1j * rng.standard_normal(shape)).astype(np.complex64)
        y = np.asarray(plan(jax.device_put(x, plan.input_sharding())))
        ref = np.fft.fftn(x.astype(np.complex128), axes=(0, 1))
        assert y.shape == shape
        assert np.max(np.abs(y - ref)) / np.max(np.abs(ref)) < 1e-5

    def test_six_step_ragged_rows(self, rng):
        import jax

        from fftw3_tpu.parallel import plan_dft_1d_dist
        mesh = self._mesh(4)
        n = 40                                    # R=10 ragged, C=4|P? C=4
        plan = plan_dft_1d_dist(n, mesh, "x")
        assert "ragged" in plan.desc or "six-step" in plan.desc
        x = (rng.standard_normal(n) +
             1j * rng.standard_normal(n)).astype(np.complex64)
        y = np.asarray(plan(jax.device_put(x, plan.input_sharding())))
        ref = np.fft.fft(x.astype(np.complex128))
        assert y.shape == (n,)
        assert np.max(np.abs(y - ref)) / np.max(np.abs(ref)) < 1e-5

    def test_six_step_ragged_batched(self, rng):
        import jax

        from fftw3_tpu.parallel import plan_dft_1d_dist
        mesh = self._mesh(4)
        n = 24                                    # (R,C): needs 4 | C
        plan = plan_dft_1d_dist(n, mesh, "x", batch_shape=(3,))
        x = (rng.standard_normal((3, n)) +
             1j * rng.standard_normal((3, n))).astype(np.complex64)
        y = np.asarray(plan(jax.device_put(x, plan.input_sharding())))
        ref = np.fft.fft(x.astype(np.complex128), axis=-1)
        assert np.max(np.abs(y - ref)) / np.max(np.abs(ref)) < 1e-5

    def test_r2c_ragged(self, rng):
        import jax

        from fftw3_tpu.parallel import plan_dft_r2c_dist
        mesh = self._mesh(4)
        shape = (10, 12, 8)
        plan = plan_dft_r2c_dist(shape, mesh, "x", axes=(0, 1, 2))
        x = rng.standard_normal(shape).astype(np.float32)
        y = np.asarray(plan(jax.device_put(x, plan.input_sharding())))
        ref = np.fft.rfftn(x.astype(np.float64))
        assert y.shape == ref.shape
        assert np.max(np.abs(y - ref)) / np.max(np.abs(ref)) < 1e-5

    def test_c2r_ragged(self, rng):
        import jax

        from fftw3_tpu.parallel import plan_dft_c2r_dist, plan_dft_r2c_dist
        mesh = self._mesh(4)
        shape = (10, 12, 8)
        fwd = plan_dft_r2c_dist(shape, mesh, "x", axes=(0, 1, 2))
        bwd = plan_dft_c2r_dist(shape, mesh, "x", axes=(0, 1, 2))
        x = rng.standard_normal(shape).astype(np.float32)
        X = fwd(jax.device_put(x, fwd.input_sharding()))
        y = np.asarray(bwd(X)) / np.prod(shape)
        assert np.max(np.abs(y - x)) < 1e-4

    def test_r2r_ragged(self, rng):
        import jax

        from fftw3_tpu.ops import matrices
        from fftw3_tpu.parallel import plan_r2r_dist
        mesh = self._mesh(4)
        shape = (6, 10)                          # both ragged over 4
        plan = plan_r2r_dist(shape, "redft10", mesh, "x", axes=(0, 1))
        x = rng.standard_normal(shape).astype(np.float32)
        y = np.asarray(plan(jax.device_put(x, plan.input_sharding())))
        M0 = matrices.r2r_matrix("redft10", 6)
        M1 = matrices.r2r_matrix("redft10", 10)
        ref = M0.T @ x @ M1
        assert np.max(np.abs(y - ref)) / np.max(np.abs(ref)) < 1e-4

    def test_bigvec_ragged_batch(self, rng):
        import jax

        from fftw3_tpu.parallel import plan_dft_dist
        mesh = self._mesh(4)
        shape = (6, 16)                          # batch 6 ragged over 4
        plan = plan_dft_dist(shape, mesh, "x", axes=(1,), shard_axis=0)
        assert "bigvec" in plan.desc
        x = (rng.standard_normal(shape) +
             1j * rng.standard_normal(shape)).astype(np.complex64)
        y = np.asarray(plan(jax.device_put(x, plan.input_sharding())))
        ref = np.fft.fft(x.astype(np.complex128), axis=1)
        assert np.max(np.abs(y - ref)) / np.max(np.abs(ref)) < 1e-5


class TestDistWholePlanMeasure:
    """VERDICT #9: flags=MEASURE times complete distributed candidates."""

    def test_slab_measure_picks_and_memoizes(self, rng):
        import jax

        from fftw3_tpu.parallel import plan_dft_dist
        from jax.sharding import Mesh
        mesh = Mesh(np.asarray(jax.devices()[:4]), ("x",))
        the_planner.forget_wisdom()
        plan = plan_dft_dist((8, 8, 8), mesh, "x", axes=(0, 1, 2),
                             flags=K.MEASURE)
        keys = [k for k in the_planner.wisdom if k.startswith("dist:slab")]
        assert keys, "whole-plan measure must memoize a dist: wisdom entry"
        choice = the_planner.wisdom[keys[0]]["desc"]
        assert choice["transpose_method"] in ("all_to_all", "ppermute",
                                              "recurse")
        # correctness of the timed winner
        x = (rng.standard_normal((8, 8, 8))
             + 1j * rng.standard_normal((8, 8, 8))).astype(np.complex64)
        y = np.asarray(plan(jax.device_put(x, plan.input_sharding())))
        ref = np.fft.fftn(x.astype(np.complex128))
        assert np.max(np.abs(y - ref)) / np.max(np.abs(ref)) < 1e-5
        # second call is a wisdom hit
        before = the_planner.stats["nwisdom_hit"]
        plan_dft_dist((8, 8, 8), mesh, "x", axes=(0, 1, 2),
                      flags=K.MEASURE)
        assert the_planner.stats["nwisdom_hit"] > before
        the_planner.forget_wisdom()

    def test_six_step_measure(self, rng):
        import jax

        from fftw3_tpu.parallel import plan_dft_1d_dist
        from jax.sharding import Mesh
        mesh = Mesh(np.asarray(jax.devices()[:4]), ("x",))
        the_planner.forget_wisdom()
        plan = plan_dft_1d_dist(64, mesh, "x", flags=K.MEASURE)
        keys = [k for k in the_planner.wisdom
                if k.startswith("dist:sixstep")]
        assert keys
        x = (rng.standard_normal(64)
             + 1j * rng.standard_normal(64)).astype(np.complex64)
        y = np.asarray(plan(jax.device_put(x, plan.input_sharding())))
        ref = np.fft.fft(x.astype(np.complex128))
        assert np.max(np.abs(y - ref)) / np.max(np.abs(ref)) < 1e-5
        the_planner.forget_wisdom()


class TestGuruOutputStrides:
    """VERDICT #3: the guru layer honors OUTPUT iodim strides (scatter to
    layout), mirroring fftw_plan_guru_dft's os semantics."""

    def test_output_strides_scatter(self, rng):
        from fftw3_tpu import guru
        n, b = 8, 3
        # input contiguous (is=0 default); output strided: os=2 on the
        # transform dim, os=16 on the batch dim
        p = guru.plan_guru_dft([guru.iodim(n, 0, 2)],
                               [guru.iodim(b, 0, 16)])
        x = (rng.standard_normal((b, n))
             + 1j * rng.standard_normal((b, n))).astype(np.complex64)
        flat = x.reshape(-1)
        y = np.asarray(p.execute(flat))
        ref = np.fft.fft(x.astype(np.complex128), axis=1)
        assert y.shape == (p.out_size,)   # 1 + max offset = 47
        idx = 16 * np.arange(b)[:, None] + 2 * np.arange(n)[None, :]
        np.testing.assert_allclose(y[idx], ref, rtol=1e-4, atol=1e-4)
        # positions outside the layout are zero
        mask = np.ones(p.out_size, bool)
        mask[idx.ravel()] = False
        assert np.all(y[mask] == 0)

    def test_output_strides_into_existing_buffer(self, rng):
        from fftw3_tpu import guru
        n = 8
        p = guru.plan_guru_dft([guru.iodim(n, 0, 3)])
        x = (rng.standard_normal(n)
             + 1j * rng.standard_normal(n)).astype(np.complex64)
        sentinel = (np.full(p.out_size, 7.0)
                    + 0j).astype(np.complex64)
        y = np.asarray(p.execute(x, out=sentinel))
        ref = np.fft.fft(x.astype(np.complex128))
        np.testing.assert_allclose(y[0::3], ref, rtol=1e-4, atol=1e-4)
        # untouched semantics: non-layout positions keep caller data
        mask = np.ones(p.out_size, bool)
        mask[0::3] = False
        assert np.all(y[mask] == 7.0)

    def test_input_strides_still_work(self, rng):
        from fftw3_tpu import guru
        n = 16
        p = guru.plan_guru_dft([guru.iodim(n, 2, 0)])
        buf = (rng.standard_normal(2 * n)
               + 1j * rng.standard_normal(2 * n)).astype(np.complex64)
        y = np.asarray(p.execute(buf))
        ref = np.fft.fft(buf[0::2].astype(np.complex128))
        np.testing.assert_allclose(y, ref, rtol=1e-4, atol=1e-4)


def test_wisdom_to_conf_roundtrip(tmp_path):
    """fftw-wisdom-to-conf analog: the generated module installs wisdom on
    import (no file I/O at startup)."""
    import importlib.util
    import subprocess
    import sys as _sys

    ftpu.forget_wisdom()
    ftpu.plan_dft_1d(64)
    wis = tmp_path / "w.json"
    wis.write_text(ftpu.export_wisdom_to_string())
    conf = tmp_path / "myconf.py"
    r = subprocess.run(
        [_sys.executable, "-m", "fftw3_tpu.tools.wisdom_to_conf",
         "-w", str(wis), "-o", str(conf)],
        capture_output=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr.decode()
    ftpu.forget_wisdom()
    assert the_planner.wisdom == {}
    spec = importlib.util.spec_from_file_location("myconf", conf)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert any(k.startswith("c2c:64") for k in the_planner.wisdom)
    ftpu.forget_wisdom()


def test_explicit_block0(rng):
    """fftw_mpi explicit-block analog: block0 sets the per-rank row count
    (padding beyond the default ceil(n/P) block)."""
    import jax
    from jax.sharding import Mesh

    from fftw3_tpu.parallel import plan_dft_dist
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("x",))
    shape = (10, 12, 8)
    plan = plan_dft_dist(shape, mesh, "x", axes=(0, 1, 2), block0=4)
    x = (rng.standard_normal(shape)
         + 1j * rng.standard_normal(shape)).astype(np.complex64)
    y = np.asarray(plan(jax.device_put(x, plan.input_sharding())))
    ref = np.fft.fftn(x.astype(np.complex128))
    assert y.shape == shape
    assert np.max(np.abs(y - ref)) / np.max(np.abs(ref)) < 1e-5
    with pytest.raises(ValueError):
        plan_dft_dist(shape, mesh, "x", axes=(0, 1, 2), block0=2)


def test_set_functional_flags_replans(interpret_pallas):
    """The numpy-style surface can reach MEASURE planning."""
    from fftw3_tpu import api
    ftpu.forget_wisdom()
    try:
        ftpu.set_functional_flags(K.MEASURE)
        x = np.ones((4, 256), np.complex64)
        np.asarray(ftpu.fft(x))
        assert the_planner.stats["nmeasure"] \
            + the_planner.stats["nmeasure_failed"] > 0
        assert api.get_functional_flags() == K.MEASURE
    finally:
        ftpu.set_functional_flags(K.ESTIMATE)
        ftpu.forget_wisdom()


def test_pallas4_fused_store_p128(interpret_pallas, rng):
    """The p=128 four-step path stores (B, q, p) blocks in-VMEM; the
    k2-major flatten must equal the plain swapaxes result."""
    from fftw3_tpu.ops import pallas_stockham as ps
    n = 16384
    p, q = ps.choose_fourstep(n)
    assert p == 128                       # full-lane store path
    apply = ps.build_pallas_c2c_split_fourstep(
        {"alg": "pallas4", "n": n, "p": p, "q": q}, -1, np.float32)
    xr = rng.standard_normal((3, n)).astype(np.float32)
    xi = rng.standard_normal((3, n)).astype(np.float32)
    yr, yi = apply(xr, xi)
    ref = np.fft.fft((xr + 1j * xi).astype(np.complex128), axis=1)
    err = np.max(np.abs(np.asarray(yr) + 1j * np.asarray(yi) - ref)) \
        / np.max(np.abs(ref))
    assert err < 1e-3


def test_real_first_stage_r2c(interpret_pallas, rng):
    """ai=None first stage (left G block) must equal the full transform."""
    from fftw3_tpu.ops import pallas_stockham as ps
    for n in (256, 512, 2048):
        apply = ps.build_pallas_r2c(
            {"alg": "pallas_r2c", "n": n,
             "radices": ps.choose_radices(n // 2)}, np.float32)
        x = rng.standard_normal((4, n)).astype(np.float32)
        y = np.asarray(apply(x))
        ref = np.fft.rfft(x.astype(np.float64), axis=1)
        assert np.max(np.abs(y - ref)) / np.max(np.abs(ref)) < 1e-3


def test_api_surface_shims():
    """MIGRATING.md contract: every fftw3.h entry point has a live analog."""
    import io

    from fftw3_tpu import api, guru, threads
    from fftw3_tpu import parallel as par

    for name in ("plan_r2r_2d", "plan_r2r_3d", "fprint_plan",
                 "export_wisdom", "import_wisdom", "alloc_real",
                 "alloc_complex", "alignment_of"):
        assert callable(getattr(api, name)), name
    for name in ("init", "mpi_cleanup", "execute_dft", "execute_dft_r2c",
                 "execute_dft_c2r", "execute_r2r", "local_size",
                 "local_size_transposed", "local_size_many_1d",
                 "local_size_many_transposed", "gather_wisdom",
                 "broadcast_wisdom"):
        assert callable(getattr(par, name)), name
    assert isinstance(api.version, str) and "fftw3_tpu" in api.version
    # oracle sanity
    assert par.local_size((100, 7), 8, 7) == par.local_size_1d(100, 8, 7)
    (i0, s0), (o0, _) = par.local_size_many_transposed((10, 12), 1, None,
                                                      None, 4, 0)
    assert (i0, s0) == (3, 0) and o0 == 3
    p = ftpu.plan_dft_1d(16)
    buf = io.StringIO()
    api.fprint_plan(p, buf)
    assert "plan" in buf.getvalue()


def test_wisdom_only_flag():
    """FFTW_WISDOM_ONLY: plan from wisdom or fail (fftw3.h:487)."""
    from fftw3_tpu.planner import WisdomOnlyMiss
    ftpu.forget_wisdom()
    with pytest.raises(WisdomOnlyMiss):
        ftpu.plan_dft_1d(96, flags=K.ESTIMATE | K.WISDOM_ONLY)
    ftpu.plan_dft_1d(96)                       # populate wisdom
    p = ftpu.plan_dft_1d(96, flags=K.ESTIMATE | K.WISDOM_ONLY)
    assert p.problem.shape == (96,)
    # mode flag must not leak after the failure path
    assert not the_planner.wisdom_only
    ftpu.forget_wisdom()


def test_guru_offset_with_output_strides(rng):
    """Code-review fix: a fresh scatter buffer must not silently drop
    elements when an input offset is given."""
    from fftw3_tpu import guru
    p = guru.plan_guru_dft([guru.iodim(4, 1, 2)])
    x = (rng.standard_normal(5) + 1j * rng.standard_normal(5)) \
        .astype(np.complex64)
    y = np.asarray(p.execute(x, offset=1))
    ref = np.fft.fft(x[1:5].astype(np.complex128))
    np.testing.assert_allclose(y[0::2], ref, rtol=1e-4, atol=1e-4)
    # all four bins present (bin k=3 was dropped before the fix)
    assert y.shape == (7,)


def test_overlap_chunks_with_vector_sharding(rng):
    """Code-review fix: the chunk axis divisibility check must use the
    LOCAL extent of vector-sharded dims."""
    import jax
    from jax.sharding import Mesh

    from fftw3_tpu.parallel import plan_dft_dist
    devs = np.asarray(jax.devices()[:4]).reshape(2, 2)
    mesh = Mesh(devs, ("dp", "x"))
    plan = plan_dft_dist((4, 4, 6), mesh, "x", axes=(1, 2), shard_axis=1,
                         overlap_chunks=4, vector_shardings={0: "dp"})
    x = (rng.standard_normal((4, 4, 6))
         + 1j * rng.standard_normal((4, 4, 6))).astype(np.complex64)
    y = np.asarray(plan(jax.device_put(x, plan.input_sharding())))
    ref = np.fft.fftn(x.astype(np.complex128), axes=(1, 2))
    assert np.max(np.abs(y - ref)) / np.max(np.abs(ref)) < 1e-5


def test_old_wisdom_format_rejected():
    """Code-review fix: stale key-schema exports fail loudly on import."""
    import json
    old = json.dumps({"format": "fftw3-tpu-wisdom-1", "entries": {
        "c2c:64:float32:cpu": {"desc": {"alg": "direct", "n": 64},
                               "patience": 0}}})
    assert not ftpu.import_wisdom_from_string(old)


class TestRaggedEdges:
    def test_r2c_ragged_transposed_out(self, rng):
        import jax
        from jax.sharding import Mesh

        from fftw3_tpu.parallel import plan_dft_r2c_dist
        mesh = Mesh(np.asarray(jax.devices()[:4]), ("x",))
        shape = (10, 10, 8)                   # both 10s ragged over 4
        plan = plan_dft_r2c_dist(shape, mesh, "x", axes=(0, 1, 2),
                                 transposed_out=True)
        x = rng.standard_normal(shape).astype(np.float32)
        y = np.asarray(plan(jax.device_put(x, plan.input_sharding())))
        ref = np.fft.rfftn(x.astype(np.float64))
        assert y.shape == ref.shape
        assert np.max(np.abs(y - ref)) / np.max(np.abs(ref)) < 1e-5

    def test_six_step_scrambled_ragged_raises(self):
        import jax
        from jax.sharding import Mesh

        from fftw3_tpu.parallel import plan_dft_1d_dist
        mesh = Mesh(np.asarray(jax.devices()[:4]), ("x",))
        # n=40 -> R=10 ragged; SCRAMBLED_OUT is undefined with pad rows
        with pytest.raises(ValueError):
            plan_dft_1d_dist(40, mesh, "x", scrambled_out=True)

    def test_ragged_gradients_flow(self, rng):
        """Grad through a ragged distributed plan (pad/crop are linear)."""
        import jax
        from jax.sharding import Mesh

        from fftw3_tpu.parallel import plan_dft_dist
        mesh = Mesh(np.asarray(jax.devices()[:4]), ("x",))
        shape = (6, 12, 4)
        plan = plan_dft_dist(shape, mesh, "x", axes=(0, 1))

        def loss(xr, xi):
            y = plan.apply(xr + 1j * xi)
            return jnp_abs2(y)

        import jax.numpy as jnp

        def jnp_abs2(y):
            return jnp.sum(jnp.abs(y) ** 2)

        xr = rng.standard_normal(shape).astype(np.float32)
        xi = rng.standard_normal(shape).astype(np.float32)
        g = jax.grad(loss)(jnp.asarray(xr), jnp.asarray(xi))
        # Parseval: d/dx sum|F x|^2 = 2 * N_transform * x
        ntrans = shape[0] * shape[1]
        np.testing.assert_allclose(np.asarray(g), 2.0 * ntrans * xr,
                                   rtol=1e-4, atol=1e-3)
