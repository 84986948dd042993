"""Minimal repro + re-enable probe for the round-4 SILENT MISCOMPUTE:
rank>=2 r2c with the DC/Nyquist column pack ON gives rel err ~1 in mid
output columns at (8, 2048, 2048) on the real chip, while the SAME
composition verifies at (2, 2048, 2048) and (8, 512, 512) and every
isolated stage (pack alone, packed-width c2c, unpack) verifies at 2e-5.
A backend fusion miscompile, not a math bug — all CPU-interpret tests
pass with the pack on (config.r2c_dc_nyquist_pack doc).

Prints one verdict line per shape and an overall verdict:
  ``pack-2048: MATCHES`` -> toolchain fixed it; flip
                            config.r2c_dc_nyquist_pack default back on
                            (bench.py already races a verify-gated
                            pack-on arm, so the win returns by itself).
  ``pack-2048: DIFFERS`` -> miscompile still live (expected 2026-08).

Run on the real chip; CPU interpret mode always MATCHES.  Doubles as a
bench-start canary (fftw3_tpu/toolchain_probe.py imports
``probe_pack_2048``).
"""
import sys

sys.path.insert(0, "/root/repo")

import numpy as np


def _relerr_shape(shape) -> float:
    import jax
    import jax.numpy as jnp

    import fftw3_tpu as ftpu
    from fftw3_tpu import config

    b, n1, n2 = shape
    rng = np.random.default_rng(1)
    x = rng.standard_normal(shape).astype(np.float32)
    ref = np.fft.rfftn(x[:1].astype(np.float64), axes=(1, 2))

    old = config.r2c_dc_nyquist_pack
    config.r2c_dc_nyquist_pack = True
    try:
        ftpu.forget_wisdom()
        plan = ftpu.plan_dft_r2c(shape, axes=(1, 2), dtype="float32")
    finally:
        config.r2c_dc_nyquist_pack = old
        ftpu.forget_wisdom()

    @jax.jit
    def run(a):
        y = plan.apply(a)
        return jnp.real(y[:1]), jnp.imag(y[:1])

    yr, yi = run(jnp.asarray(x))
    got = np.asarray(yr) + 1j * np.asarray(yi)
    return float(np.max(np.abs(got - ref)) / np.max(np.abs(ref)))


def probe_pack_2048() -> bool:
    """True iff the packed composition verifies at the failing shape."""
    err = _relerr_shape((8, 2048, 2048))
    print(f"# (8,2048,2048) pack-on rel err = {err:.2e}", file=sys.stderr)
    return err < 1e-3


if __name__ == "__main__":
    # control shape first: if THIS differs the harness itself is broken
    ctrl = _relerr_shape((8, 512, 512))
    print(f"pack-512 control: "
          f"{'MATCHES' if ctrl < 1e-3 else 'DIFFERS'} ({ctrl:.1e})")
    ok = probe_pack_2048()
    print(f"pack-2048: {'MATCHES' if ok else 'DIFFERS'}")
