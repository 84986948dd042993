"""Minimal repro + re-enable probe for the round-4 toolchain regression:
a FRESH Mosaic compile of any stage kernel using the k2 fused cross pass
on a stage with done > 1 crashes tpu_compile_helper (HTTP 500 / remote
subprocess exit 1), while the identical kernel in 3-pass form (k2 off),
first-stage-only k2, or any PRESPLIT form compiles fine.  The trigger is
the concat-of-in-kernel-bf16-casts feeding the K=4p matmul on a permuted
operand (ops/pallas_stockham.py K2_DEFAULT note; gated there).

Prints exactly one verdict line:
  ``k2-done1: COMPILES``  -> the toolchain fixed it; the K2_DEFAULT
                             "first" gate and the nosplit autotune arm
                             can be promoted back to "all".
  ``k2-done1: CRASHES``   -> regression still live (expected 2026-08).

Run on the real chip (`python experiments/repro_k2_done1.py`); CPU
interpret mode always COMPILES (the bug is in the remote Mosaic
compiler, not the kernel).  Doubles as a bench-start canary
(fftw3_tpu/toolchain_probe.py imports ``probe_k2_done1``).
"""
import sys

sys.path.insert(0, "/root/repo")

import numpy as np


def probe_k2_done1(batch: int = 384) -> bool:
    """True iff the legacy (non-presplit) full-k2 kernel freshly compiles
    AND verifies.  ``batch`` is chosen to miss every cached executable
    shape (the round-2/3 headline cached at 128-multiples of 8192+)."""
    import jax

    from fftw3_tpu.ops import pallas_stockham as ps

    n = 1024
    fn = jax.jit(ps.build_pallas_c2c_split(
        {"alg": "pallas", "n": n, "radices": [64, 16],
         "k2": "all", "gsplit": False}, -1, np.float32))
    rng = np.random.default_rng(0)
    xr = rng.standard_normal((batch, n)).astype(np.float32)
    xi = rng.standard_normal((batch, n)).astype(np.float32)
    try:
        yr, yi = fn(xr, xi)
        ref = np.fft.fft((xr + 1j * xi).astype(np.complex128), axis=1)
        err = np.max(np.abs(np.asarray(yr) + 1j * np.asarray(yi) - ref)) \
            / np.max(np.abs(ref))
        return bool(err < 1e-3)
    except Exception as exc:                           # noqa: BLE001
        print(f"# {str(exc).splitlines()[0][:140]}", file=sys.stderr)
        return False


if __name__ == "__main__":
    ok = probe_k2_done1()
    print(f"k2-done1: {'COMPILES' if ok else 'CRASHES'}")
