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
