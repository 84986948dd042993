"""A/B: outer row-tile widening for the n=256 axis kernels in the 3-D plan.

Round-4 lesson (bisect4096): widening desc["tile_b"] pays exactly where the
per-grid-step blocks are tiny — pallas4's q=128 outer (64 KB blocks) gained
15-19% at tb=512, while n=1024 (512 KB blocks) LOST.  The 256^3 config runs
THREE single-stage [256] passes whose (128, 256) f32 blocks are 128 KB each,
i.e. squarely in the tiny-block regime.  This races tb 128/512/1024 on the
full 3-D plan with interleaved chained timing (decision-grade per
CLAUDE.md's measurement discipline).

Run ON CHIP: python experiments/tile3d.py
"""
import sys

import numpy as np
import jax
import jax.numpy as jnp

import fftw3_tpu as ftpu
from fftw3_tpu.planner import the_planner
from fftw3_tpu.utils import timing

N = 256


def inject(tb):
    for b in (N * N, N):
        the_planner.wisdom[the_planner._key("c2c", N, np.float32, b)] = {
            "desc": {"alg": "pallas", "n": N, "radices": [N],
                     "tile_b": tb},
            "patience": 99, "cost": 0.0}


def main():
    print(f"# backend={jax.default_backend()}", file=sys.stderr)
    rng = np.random.default_rng(0)
    xr = jnp.asarray(rng.standard_normal((N, N, N)), jnp.float32)
    xi = jnp.asarray(rng.standard_normal((N, N, N)), jnp.float32)
    ref = np.fft.fftn((np.asarray(xr) + 1j * np.asarray(xi))
                      .astype(np.complex128))

    arms = []
    for tb in (128, 512, 1024):
        ftpu.forget_wisdom()
        if tb != 128:
            inject(tb)
        try:
            plan = ftpu.plan_dft((N, N, N), dtype="complex64")
            run = jax.jit(plan.apply_split)
            yr, yi = run(xr, xi)
            err = float(np.max(np.abs(
                (np.asarray(yr) + 1j * np.asarray(yi)) - ref))
                / np.max(np.abs(ref)))
            print(f"# tb{tb}: plan={plan!r} relerr={err:.1e}",
                  file=sys.stderr)
            if err < 1e-4:
                arms.append((f"tb{tb}", run))
        except Exception as exc:                       # noqa: BLE001
            print(f"# tb{tb}: FAIL {str(exc)[:140]}", file=sys.stderr)
        finally:
            ftpu.forget_wisdom()

    if len(arms) < 2:
        print("# fewer than 2 arms verified; no race", file=sys.stderr)
        return
    configs = [(run, (xr, xi)) for _, run in arms]
    ts = timing.time_chained_multi(configs, k1=4, k2=16, reps=7)
    flops = 5.0 * (N ** 3) * np.log2(float(N) ** 3)
    for (tag, _), t in zip(arms, ts):
        print(f"{tag}: {t*1e6:.0f} us/call  {flops/t/1e9:.0f} GFLOPS  "
              f"{t/(N**3)*1e12:.1f} ps/pt")


if __name__ == "__main__":
    main()
