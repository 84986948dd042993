"""Attribute the n=1000 radix tax (VERDICT r4 item 8).

n=1000 wins its race at 90.9-94.3 ps/pt vs ~35-48 for n=1024 — a 2.6x
tax with no attribution.  Two candidate mechanisms are confounded in the
[40,25]/[50,20] kernels:

  (a) non-pow2 STAGE RADICES (odd-shape G matmuls, e.g. p=25 -> an
      (50, 100) hh operand on 128x128 MXU tiles; odd q twiddle layouts);
  (b) non-128-multiple LANE COUNT n (the data block is (tb, n); n=1000
      pads every lane-dim op to 1024 tiles — 2.4%% of lanes wasted, but
      Mosaic may fall off fast paths entirely on padded tiles).

This race separates them at matched total points (~16.6M), interleaved
chained ps/pt, every arm verified vs numpy first:

  n1024  [32,32]  pow2 control (headline kernel)
  n1280  [40,32]  radix-40 stage, n = 10*128 ALIGNED   -> isolates (a)
  n640   [32,20]  radix-20 stage, n = 5*128  ALIGNED   -> isolates (a)
  n800   [32,25]  radix-25 stage, n UNALIGNED          -> (a)+(b)
  n1000  [40,25]  prod arm                              -> (a)+(b)
  n1000b [50,20]  prod alt                              -> (a)+(b)

If the aligned non-pow2 arms (n1280/n640) sit near the control while the
unaligned arms carry the 2-3x, the tax is (b) lane padding — structural
for n=1000 (no 128-multiple factorization exists: 1000 = 2^3 * 5^3) and
the five-arm radix re-race every round can be trimmed.  If n1280/n640
are slow too, the tax is the odd-radix stage itself and a different
schedule (e.g. padding to 1024 via Bluestein) becomes the lever.

Run ON CHIP: python experiments/attrib1000.py
"""
import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from fftw3_tpu.ops import pallas_stockham as ps
from fftw3_tpu.utils import timing

POINTS = 16_600_000


def make_arm(tag, n, radices):
    B = max(128, int(round(POINTS / n / 128)) * 128)
    ap = ps.build_pallas_c2c_split(
        {"alg": "pallas", "n": n, "radices": list(radices)},
        -1, np.float32)
    rng = np.random.default_rng(0)
    xr = jnp.asarray(rng.standard_normal((B, n)), jnp.float32)
    xi = jnp.asarray(rng.standard_normal((B, n)), jnp.float32)
    run = jax.jit(ap)
    # verify on a slice (full-B oracle is slow host-side)
    yr, yi = run(xr, xi)
    ref = np.fft.fft((np.asarray(xr[:64]) + 1j * np.asarray(xi[:64]))
                     .astype(np.complex128), axis=1)
    err = (np.max(np.abs((np.asarray(yr[:64]) + 1j * np.asarray(yi[:64]))
                         - ref)) / np.max(np.abs(ref)))
    print(f"# {tag}: B={B} relerr={err:.1e}", file=sys.stderr)
    assert err < 1e-4, (tag, err)
    return tag, run, (xr, xi), B * n


def main():
    print(f"# backend={jax.default_backend()}", file=sys.stderr)
    arms = []
    for tag, n, radices in [
        ("n1024", 1024, [32, 32]),
        ("n1280", 1280, [40, 32]),
        ("n640", 640, [32, 20]),
        ("n800", 800, [32, 25]),
        ("n1000", 1000, [40, 25]),
        ("n1000b", 1000, [50, 20]),
    ]:
        try:
            arms.append(make_arm(tag, n, radices))
        except Exception as exc:                       # noqa: BLE001
            print(f"# {tag}: FAIL {str(exc)[:140]}", file=sys.stderr)

    configs = [(run, args) for _, run, args, _ in arms]
    ts = timing.time_chained_multi(configs, k1=4, k2=16, reps=7)
    for (tag, _, _, pts), t in zip(arms, ts):
        print(f"{tag}: {t*1e6:.0f} us/call  {t/pts*1e12:.2f} ps/pt")


if __name__ == "__main__":
    main()
