"""Close the r2c axis-1 attribution: SCHEDULE or FORM?

copy_inner.py refuted the DMA-stride hypothesis (inner-layout copies
run at/below the contiguous floor), so the axis-1 pass's ~2x per-point
excess over the last-axis kernel is in-stage.  Two suspects remain:

  (a) the SCHEDULE: INNER_NP_MAX recaps [128,16] to [64,32] (sum 96 vs
      144 — but the round-2 cost curves rank [128,16] faster per point);
  (b) the FORM: the (1, n, TL)-block axis-(-2) kernel itself (same
      _stages graph, different block geometry / grid shape).

Race at matched points (~16.8M complex), interleaved:

  last128x16   last-axis kernel, n=2048, [128,16]  (control, ~44 ps/pt)
  last64x32    last-axis kernel, n=2048, [64,32]   (isolates a)
  inner64x32   inner kernel over (8, 2048, 1024), [64,32] (a + b;
               L=1024 aligned, so the masked-edge +2 ps/pt is excluded)

If last64x32 ~ control and inner64x32 is 2x, the tax is the FORM; if
last64x32 is slow too, it is the SCHEDULE and the inner form is fine.

Run ON CHIP: python experiments/inner_form.py
"""
import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from fftw3_tpu.ops import pallas_stockham as ps
from fftw3_tpu.utils import timing

N = 2048
PRE, L = 8, 1024          # inner: (8, 2048, 1024); last-axis: (8192, 2048)


def make_last(tag, radices):
    fn = jax.jit(ps.build_pallas_c2c_split(
        {"alg": "pallas", "n": N, "radices": radices,
         "tile_b": 128, "k2": "first", "gsplit": True}, -1, np.float32))
    rng = np.random.default_rng(0)
    B = PRE * L
    xr = rng.standard_normal((B, N)).astype(np.float32)
    xi = rng.standard_normal((B, N)).astype(np.float32)
    yr, yi = fn(xr[:64], xi[:64])
    ref = np.fft.fft((xr[:64] + 1j * xi[:64]).astype(np.complex128),
                     axis=1)
    err = (np.max(np.abs(np.asarray(yr) + 1j * np.asarray(yi) - ref))
           / np.max(np.abs(ref)))
    print(f"# {tag}: relerr={err:.1e}", file=sys.stderr)
    assert err < 1e-4
    a = (jnp.asarray(xr), jnp.asarray(xi))
    fn(*a)[0].block_until_ready()
    return tag, fn, a, B * N


def make_inner(tag, radices):
    ap = ps.build_pallas_c2c_split_inner(
        {"alg": "pallas", "n": N, "radices": radices, "k2": "first",
         "gsplit": True}, -1, np.float32)
    fn = jax.jit(ap)
    rng = np.random.default_rng(0)
    xr = rng.standard_normal((PRE, N, L)).astype(np.float32)
    xi = rng.standard_normal((PRE, N, L)).astype(np.float32)
    yr, yi = fn(jnp.asarray(xr[:1, :, :128]), jnp.asarray(xi[:1, :, :128]))
    ref = np.fft.fft((xr[:1, :, :128] + 1j * xi[:1, :, :128])
                     .astype(np.complex128), axis=1)
    err = (np.max(np.abs(np.asarray(yr) + 1j * np.asarray(yi) - ref))
           / np.max(np.abs(ref)))
    print(f"# {tag}: relerr={err:.1e}", file=sys.stderr)
    assert err < 1e-4
    a = (jnp.asarray(xr), jnp.asarray(xi))
    fn(*a)[0].block_until_ready()
    return tag, fn, a, PRE * N * L


def main():
    print(f"# backend={jax.default_backend()}", file=sys.stderr)
    arms = []
    for mk in (lambda: make_last("last128x16", [128, 16]),
               lambda: make_last("last64x32", [64, 32]),
               lambda: make_inner("inner64x32", [64, 32])):
        try:
            arms.append(mk())
        except Exception as exc:                       # noqa: BLE001
            print(f"# FAIL {str(exc)[:140]}", file=sys.stderr)
    configs = [(fn, a) for _, fn, a, _ in arms]
    ts = timing.time_chained_multi(configs, k1=4, k2=16, reps=7)
    for (tag, _, _, pts), t in zip(arms, ts):
        print(f"{tag}: {t*1e6:.0f} us/call  {t/pts*1e12:.2f} ps/pt")


if __name__ == "__main__":
    main()
