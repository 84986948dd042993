"""Round-5 hardening: toolchain-stamped wisdom signatures and the
canary-probe machinery (VERDICT r4 items 4-5).

The reference hashes its build configuration into every wisdom entry so
stale wisdom can never cross builds (signature_of_configuration,
/root/reference/fftw/fftw_api.c:14829).  Round 4 proved the TPU analog
must stamp the COMPILER: cached executables behaved differently from
fresh compiles of the same kernel under one toolchain drift.
"""
import numpy as np
import pytest

import fftw3_tpu as ftpu
from fftw3_tpu import planner


def test_signature_stamps_toolchain():
    import jax
    import jaxlib

    sig = planner._device_signature()
    assert f"jax{jax.__version__}" in sig
    assert f"jl{jaxlib.__version__}" in sig
    # cached: second call returns the identical object fast
    assert planner._device_signature() is sig


def test_signature_change_invalidates_wisdom(monkeypatch):
    """A simulated toolchain upgrade (different signature) must orphan
    every existing wisdom entry — old keys never match, so stale
    winners/geometries can never be served to a new compiler."""
    p = planner.the_planner
    ftpu.forget_wisdom()
    try:
        plan = ftpu.plan_many_dft([256], howmany=8, dtype="complex64")
        old_keys = set(p.wisdom)
        assert old_keys, "planning must deposit wisdom"
        old_key = p._key("c2c", 256, np.float32, 8)
        assert old_key in old_keys
        monkeypatch.setattr(planner, "_sig_cache",
                            planner._device_signature() + "-upgraded")
        new_key = p._key("c2c", 256, np.float32, 8)
        assert new_key != old_key
        assert new_key not in old_keys
    finally:
        ftpu.forget_wisdom()


def test_exported_wisdom_carries_signature():
    ftpu.forget_wisdom()
    try:
        ftpu.plan_many_dft([128], howmany=4, dtype="complex64")
        import json

        doc = json.loads(planner.the_planner.export_wisdom())
        assert doc["signature"] == planner._device_signature()
        assert all(planner._device_signature() in k for k in doc["entries"])
    finally:
        ftpu.forget_wisdom()


def test_system_wisdom_signature_matches_generator():
    """wisdom/v5e.json must carry the toolchain-stamped signature format
    (device kind + jax + jaxlib + platform-version digest), not the old
    device-only form that a compiler upgrade could never retire."""
    import json
    import os

    path = os.path.join(os.path.dirname(__file__), "..", "wisdom",
                        "v5e.json")
    w = json.load(open(path))
    sig = w["signature"]
    assert sig.startswith("tpu-") and "-jax" in sig and "-jl" in sig \
        and "-pv" in sig
    assert all(f":{sig}:" in k for k in w["entries"])


def test_toolchain_probe_skips_off_tpu(capsys):
    """On the CPU test runtime the probes must SKIP (not fabricate PASS
    results the autotune gates would act on)."""
    from fftw3_tpu import toolchain_probe

    toolchain_probe.RESULTS = None        # fresh run in this process
    try:
        res = toolchain_probe.run_probes()
        assert res == {}
        assert not toolchain_probe.passed("tb32")
        assert not toolchain_probe.passed("stage3")
    finally:
        toolchain_probe.RESULTS = None


def test_repro_scripts_importable():
    """The one-file miscompile repros double as canary probes; their
    probe functions must stay importable (toolchain_probe siblings)."""
    import importlib.util
    import os

    for name in ("repro_k2_done1", "repro_pack_2048"):
        path = os.path.join(os.path.dirname(__file__), "..",
                            "experiments", f"{name}.py")
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        assert hasattr(mod, f"probe_{name.split('repro_')[1]}") or \
            hasattr(mod, "probe_k2_done1") or hasattr(mod, "probe_pack_2048")


def test_fused_2d_tile_b_plane_groups():
    """desc["tile_b"] on a 2-D-fused desc groups leading planes per block
    (ADVICE r4: the knob must actually reach the kernel).  Verify g in
    {2, 4} against numpy and against the g=1 baseline, including a batch
    the group must clamp against (pre=2 with tile_b=4)."""
    from fftw3_tpu.ops import pallas_stockham as ps

    rng = np.random.default_rng(7)
    xr = rng.standard_normal((4, 256, 256)).astype(np.float32)
    xi = rng.standard_normal((4, 256, 256)).astype(np.float32)
    ref = np.fft.fft2((xr + 1j * xi).astype(np.complex128), axes=(1, 2))
    scale = np.max(np.abs(ref))
    for tb, batch in ((512, 4), (1024, 4), (1024, 2)):
        ap = ps.build_pallas_c2c_split_2d(256, 256, -1, np.float32,
                                          {"tile_b": tb}, {})
        yr, yi = ap(xr[:batch], xi[:batch])
        err = np.max(np.abs((np.asarray(yr) + 1j * np.asarray(yi))
                            - ref[:batch])) / scale
        assert err < 1e-4, (tb, batch, err)


def test_fused_2d_tile_b_gradients():
    """The lazy adjoint must carry the same plane-group geometry."""
    import jax
    import jax.numpy as jnp
    from fftw3_tpu.ops import pallas_stockham as ps

    rng = np.random.default_rng(8)
    xr = jnp.asarray(rng.standard_normal((2, 256, 256)), jnp.float32)
    xi = jnp.asarray(rng.standard_normal((2, 256, 256)), jnp.float32)
    ap1 = ps.build_pallas_c2c_split_2d(256, 256, -1, np.float32, {}, {})
    ap2 = ps.build_pallas_c2c_split_2d(256, 256, -1, np.float32,
                                       {"tile_b": 512}, {})
    g1 = jax.grad(lambda a, b: jnp.sum(ap1(a, b)[0] ** 2))(xr, xi)
    g2 = jax.grad(lambda a, b: jnp.sum(ap2(a, b)[0] ** 2))(xr, xi)
    assert np.allclose(np.asarray(g1), np.asarray(g2), atol=1e-2)


def test_standalone_builder_honors_sub128_tile_b():
    """Sub-128 tile_b must reach the kernel VERBATIM: the tb32 canary
    probe and the n=4096 single-kernel autotune arms build such descs to
    detect the toolchain's lane-merge fix, so a silent clamp here turns
    the probe into a false PASS (happened once, round 5).  In interpret
    mode (CPU tests) the kernel is legal at any tile and must be
    CORRECT; on restricted toolchains the build fails loudly instead."""
    from fftw3_tpu.ops import pallas_stockham as ps

    rng = np.random.default_rng(9)
    xr = rng.standard_normal((8, 256)).astype(np.float32)
    xi = rng.standard_normal((8, 256)).astype(np.float32)
    ap = ps.build_pallas_c2c_split(
        {"alg": "pallas", "n": 256, "radices": [16, 16], "tile_b": 4},
        -1, np.float32)
    yr, yi = ap(xr, xi)
    ref = np.fft.fft((xr + 1j * xi).astype(np.complex128), axis=1)
    err = (np.max(np.abs((np.asarray(yr) + 1j * np.asarray(yi)) - ref))
           / np.max(np.abs(ref)))
    assert err < 1e-4, err
    # and the block geometry really is sub-128: grid covers 8/4 = 2 steps
    import jax
    hlo4 = jax.jit(ap).lower(xr, xi).as_text()
    ap128 = ps.build_pallas_c2c_split(
        {"alg": "pallas", "n": 256, "radices": [16, 16], "tile_b": 128},
        -1, np.float32)
    hlo128 = jax.jit(ap128).lower(xr, xi).as_text()
    assert hlo4 != hlo128


def test_inner_unaligned_pad_align_variants():
    """Unaligned trailing L in the axis-(-2) kernel: both the masked-tile
    default and the desc-pinned pad-to-aligned variant must be correct
    (incl. grads).  On chip one masked edge tile pessimizes the whole
    stage kernel ~2.5x/tile while XLA pad/slice of unaligned lanes costs
    the same class (experiments/r2c_decomp.py) — bench races both; here
    we pin correctness."""
    import jax
    import jax.numpy as jnp
    from fftw3_tpu.ops import pallas_stockham as ps

    rng = np.random.default_rng(11)
    xr = rng.standard_normal((2, 256, 129)).astype(np.float32)
    xi = rng.standard_normal((2, 256, 129)).astype(np.float32)
    ref = np.fft.fft((xr + 1j * xi).astype(np.complex128), axis=1)
    outs = {}
    for pin in (False, True):
        ap = ps.build_pallas_c2c_split_inner(
            {"alg": "pallas", "n": 256, "pad_align": pin}, -1, np.float32)
        yr, yi = ap(xr, xi)
        err = (np.max(np.abs((np.asarray(yr) + 1j * np.asarray(yi))
                             - ref)) / np.max(np.abs(ref)))
        assert err < 1e-4, (pin, err)
        g = jax.grad(lambda a, b, f=ap: jnp.sum(f(a, b)[0] ** 2),
                     argnums=(0, 1))(jnp.asarray(xr), jnp.asarray(xi))
        outs[pin] = g
    for k in (0, 1):
        assert np.allclose(np.asarray(outs[False][k]),
                           np.asarray(outs[True][k]), atol=1e-2)
