"""A/B: block widening for the two kernels the 256^3 plan actually runs.

Plan structure at 256^3 (plan.py multi-axis dispatch): axes 1-2 are fused
into ONE 2-D Pallas pass (`build_pallas_c2c_split_2d`, blocks
(tile_b, 256, 256) — 256 KB per plane) and axis 0 runs as the axis-(-2)
inner kernel (`build_pallas_c2c_split_inner`, blocks (1, 256, tle) with
tle widened to INNER_AREA/n = 512 lanes, 512 KB).  Both passes are in the
small-block regime where pallas4's tile_b widening paid 15-19%
(bisect4096); the knobs here are desc["tile_b"] (leading ROWS per fused-2D
block, n1=256 rows per plane -> tile_b//256 planes, plumbed round 5 — the round-4 run of this script raced identical
kernels, ADVICE r4) and desc["inner_area"] (axis-0 working-set budget).

Each non-prod arm asserts its lowered HLO differs from prod before the
race (the ADVICE r4 false-wash guard).  Interleaved chained timing.

Run ON CHIP: python experiments/tile3d.py
"""
import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

import fftw3_tpu as ftpu
from fftw3_tpu.planner import the_planner
from fftw3_tpu.ops import pallas_stockham as ps
from fftw3_tpu.utils import timing

N = 256


def inject(extra):
    for b in (N * N, N):
        desc = {"alg": "pallas", "n": N, "radices": [N]}
        desc.update(extra)
        the_planner.wisdom[the_planner._key("c2c", N, np.float32, b)] = {
            "desc": desc, "patience": 99, "cost": 0.0}


def main():
    print(f"# backend={jax.default_backend()}", file=sys.stderr)
    rng = np.random.default_rng(0)
    xr = jnp.asarray(rng.standard_normal((N, N, N)), jnp.float32)
    xi = jnp.asarray(rng.standard_normal((N, N, N)), jnp.float32)
    ref = np.fft.fftn((np.asarray(xr) + 1j * np.asarray(xi))
                      .astype(np.complex128))

    ARMS = [
        ("prod", None),
        ("g2", {"tile_b": 512}),
        ("g4", {"tile_b": 1024}),
        ("ia2", {"inner_area": 2 * ps.INNER_AREA}),
        ("g4ia2", {"tile_b": 1024, "inner_area": 2 * ps.INNER_AREA}),
    ]
    arms, prod_hlo = [], None
    for tag, extra in ARMS:
        ftpu.forget_wisdom()
        if extra is not None:
            inject(extra)
        try:
            plan = ftpu.plan_dft((N, N, N), dtype="complex64")
            run = jax.jit(plan.apply_split)
            hlo = run.lower(xr, xi).as_text()
            if tag == "prod":
                prod_hlo = hlo
            elif hlo == prod_hlo:
                print(f"# {tag}: IDENTICAL lowering to prod — knob did "
                      "not reach the kernel, arm dropped", file=sys.stderr)
                continue
            yr, yi = run(xr, xi)
            err = float(np.max(np.abs(
                (np.asarray(yr) + 1j * np.asarray(yi)) - ref))
                / np.max(np.abs(ref)))
            print(f"# {tag}: plan={plan!r} relerr={err:.1e}",
                  file=sys.stderr)
            if err < 1e-4:
                arms.append((tag, run))
        except Exception as exc:                       # noqa: BLE001
            print(f"# {tag}: FAIL {str(exc)[:140]}", file=sys.stderr)
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
