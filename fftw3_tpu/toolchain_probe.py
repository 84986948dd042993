"""Toolchain canary probes: notice when the Mosaic compiler fixes a gate.

Every dead-end gate in the kernel tier (K2_DEFAULT, the tb<128 lane-merge
exclusion, the 3-stage miscompile, the ambient-x64 compile crash) is
correct only FOR THE TOOLCHAIN VERSION IT WAS MEASURED ON (CLAUDE.md
round-4/5 notes), and the repo's own outlook says the remaining headline
levers are toolchain changes.  This module is the mechanism that notices
a fix: bench.py runs the probes once at suite start on the real chip,
prints one PASS/FAIL line each (recorded in the driver's BENCH tail),
and the autotunes consult ``RESULTS`` to re-admit arms the gates
currently exclude — so a toolchain upgrade re-opens dead routes
automatically instead of silently keeping stale gates.

The FFTW analog is fail-loudly configuration tainting
(/root/reference/fftw/simd-support/taint.c:25-40) plus the config
signature that retires stale wisdom (fftw_api.c:14829; our
planner._device_signature stamps jax/jaxlib/platform_version for the
same reason).  Each probe VERIFIES output against a float64 oracle —
"compiles" is not enough, two of the four known regressions are silent
miscomputes.

One-file repro siblings (same triggers, standalone, for upstream
reports): experiments/repro_k2_done1.py, experiments/repro_pack_2048.py.
"""
from __future__ import annotations

import sys
from typing import Dict, Optional

import numpy as np

#: probe outcomes for this process: name -> bool (PASS = the toolchain
#: handles it now).  None until run_probes() executes.
RESULTS: Optional[Dict[str, bool]] = None


def _verify_c2c(fn, n: int, batch: int) -> bool:
    rng = np.random.default_rng(0)
    xr = rng.standard_normal((batch, n)).astype(np.float32)
    xi = rng.standard_normal((batch, n)).astype(np.float32)
    yr, yi = fn(xr, xi)
    ref = np.fft.fft((xr + 1j * xi).astype(np.complex128), axis=1)
    err = np.max(np.abs(np.asarray(yr) + 1j * np.asarray(yi) - ref)) \
        / np.max(np.abs(ref))
    return bool(err < 1e-3)


def _probe_k2_done1() -> bool:
    """Round-4 regression: fresh compile of the k2 fused cross pass on a
    done>1 stage (legacy in-kernel-cast form) crashes the remote
    compiler.  PASS re-admits k2='all' on non-presplit kernels."""
    import jax

    from .ops import pallas_stockham as ps
    fn = jax.jit(ps.build_pallas_c2c_split(
        {"alg": "pallas", "n": 256, "radices": [16, 16],
         "k2": "all", "gsplit": False}, -1, np.float32))
    return _verify_c2c(fn, 256, 384)


def _probe_tb32() -> bool:
    """Sub-128 row tile: the stage view (2, n, TB) -> (2p, q*TB)
    lane-merges with inner block TB, legal only at 128-multiples —
    any stage matmul at tb=32 crashes the compiler
    (experiments/bisect4096*.py).  PASS re-opens the n=4096
    single-kernel route (small tb shrinks its VMEM footprint under the
    16 MB cap)."""
    import jax

    from .ops import pallas_stockham as ps
    fn = jax.jit(ps.build_pallas_c2c_split(
        {"alg": "pallas", "n": 256, "radices": [16, 16],
         "tile_b": 32}, -1, np.float32))
    return _verify_c2c(fn, 256, 128)


def _probe_stage3() -> bool:
    """3+-stage schedules miscompile (silently) on this toolchain —
    choose_radices is capped at 2 stages because of it.  PASS would let
    the planner race deeper schedules (smaller radices, fewer twiddle
    bytes)."""
    import jax

    from .ops import pallas_stockham as ps
    fn = jax.jit(ps.build_pallas_c2c_split(
        {"alg": "pallas", "n": 512, "radices": [8, 8, 8]},
        -1, np.float32))
    return _verify_c2c(fn, 512, 128)


def _probe_x64_ambient() -> bool:
    """Ambient jax_enable_x64 crashes every fresh Mosaic compile (round
    4) — production kernels carry a conditional _x64_off() scope.  This
    probes the RAW condition with a minimal standalone kernel traced
    under x64 (the production wrap would mask it)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    G = np.eye(128, dtype=np.float32)

    def kernel(x_ref, g_ref, y_ref):
        y_ref[...] = jnp.dot(g_ref[...], x_ref[...],
                             preferred_element_type=jnp.float32)

    spec = pl.BlockSpec((128, 128), lambda i: (0, 0),
                        memory_space=pltpu.VMEM)
    x = np.random.default_rng(0).standard_normal(
        (128, 128)).astype(np.float32)
    with jax.enable_x64(True):
        fn = pl.pallas_call(kernel, grid=(1,), in_specs=[spec, spec],
                            out_specs=spec,
                            out_shape=jax.ShapeDtypeStruct(
                                (128, 128), jnp.float32))
        y = jax.jit(fn)(x, G)
        return bool(np.max(np.abs(np.asarray(y) - x)) < 1e-6)


_PROBES = [
    ("k2_done1", _probe_k2_done1),
    ("tb32", _probe_tb32),
    ("stage3", _probe_stage3),
    ("x64_ambient", _probe_x64_ambient),
]


def run_probes(stream=None) -> Dict[str, bool]:
    """Run all canaries (TPU only; on other backends everything passes
    vacuously and is reported as SKIP).  Idempotent per process."""
    global RESULTS
    if RESULTS is not None:
        return RESULTS
    import jax
    stream = stream or sys.stderr
    out: Dict[str, bool] = {}
    on_tpu = jax.default_backend() == "tpu"
    for name, probe in _PROBES:
        if not on_tpu:
            print(f"# toolchain-probe {name}: SKIP (no TPU)", file=stream)
            continue
        try:
            ok = probe()
        except Exception as exc:                       # noqa: BLE001
            print(f"#   ({name}: {str(exc).splitlines()[0][:110]})",
                  file=stream)
            ok = False
        out[name] = ok
        print(f"# toolchain-probe {name}: {'PASS' if ok else 'FAIL'}",
              file=stream)
    RESULTS = out
    return out


def passed(name: str) -> bool:
    """Gate helper: True only if the probes ran AND the canary passed."""
    return bool(RESULTS and RESULTS.get(name))
