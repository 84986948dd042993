"""A/B: reversed two-stage radix orders at n=1024 (headline config).

Same question as rev1000.py, asked of the headline: `alternative_radices`
only emits p >= q pairs, so [16,64] and [8,128] have never been raced —
the stages are asymmetric (stage-1 carries the flat-twiddle first-stage
form; stage 2 the done>1 cross structure), so order genuinely changes the
kernel.  [32,32] presplit is the standing winner at 34.7 ps/pt.
Interleaved marginal slopes, verified arms only.

Run ON CHIP: PYTHONPATH=/root/repo:/root/.axon_site python experiments/rev1024.py
"""
import sys

import numpy as np
import jax
import jax.numpy as jnp

from fftw3_tpu.ops import pallas_stockham as ps
from fftw3_tpu.utils import timing

N = 1024
ARMS = [[32, 32], [64, 16], [16, 64], [8, 128]]


def main():
    print(f"# backend={jax.default_backend()}", file=sys.stderr)
    rng = np.random.default_rng(3)
    vr = rng.standard_normal((256, N)).astype(np.float32)
    vi = rng.standard_normal((256, N)).astype(np.float32)
    ref = np.fft.fft((vr + 1j * vi).astype(np.complex128), axis=1)

    b_lo, b_hi = 8192, 24576
    pr_lo = jnp.zeros((b_lo, N), jnp.float32)
    pr_hi = jnp.zeros((b_hi, N), jnp.float32)
    good = []
    for rad in ARMS:
        tag = str(rad)
        try:
            fn = jax.jit(ps.build_pallas_c2c_split(
                {"alg": "pallas", "n": N, "radices": rad,
                 "tile_b": 128, "k2": "first", "gsplit": True},
                -1, np.float32))
            yr, yi = fn(vr, vi)
            err = float(np.max(np.abs(
                (np.asarray(yr) + 1j * np.asarray(yi)) - ref))
                / np.max(np.abs(ref)))
            print(f"# {tag}: relerr={err:.1e}", file=sys.stderr)
            if err < 1e-4:
                fn(pr_lo, pr_lo)[0].block_until_ready()
                fn(pr_hi, pr_hi)[0].block_until_ready()
                good.append((tag, fn))
        except Exception as exc:                       # noqa: BLE001
            print(f"# {tag}: FAIL {str(exc)[:140]}", file=sys.stderr)

    if len(good) < 2:
        print("# fewer than 2 arms; no race", file=sys.stderr)
        return
    configs = []
    rng2 = np.random.default_rng(4)
    for tag, fn in good:
        for b in (b_lo, b_hi):
            xr = jnp.asarray(rng2.standard_normal((b, N)), jnp.float32)
            xi = jnp.asarray(rng2.standard_normal((b, N)), jnp.float32)
            configs.append((fn, (xr, xi)))
    ts = timing.time_chained_multi(configs, k1=4, k2=16, reps=7)
    for i, (tag, _) in enumerate(good):
        s = (ts[2 * i + 1] - ts[2 * i]) / ((b_hi - b_lo) * N)
        print(f"{tag}: {s*1e12:.1f} ps/pt")


if __name__ == "__main__":
    main()
