"""Probe the r2c axis-1 attribution: inner-form (1, n, TL) blocks over a
(pre, n, L) array read strided row segments (TL*4 bytes of every L*4-byte
row).  Race copy-only inner-layout kernels at n=2048 with L=1024 (aligned,
8 tiles) vs L=1025 (the r2c half-spectrum layout, masked 9th tile) vs the
last-axis layout (tb, n) control at matched points.  If strided1025 >>
strided1024 ~ lastaxis, the axis-1 tax is the masked edge tile; if both
strided arms are >> the control, it's the 512-byte segment stride itself;
if all three tie, the r2c axis-1 cost is in-stage (like the n=1000 tax,
see copy1000.py/attrib1000.py) and BASELINE's DMA attribution is wrong.

Run ON CHIP: python experiments/copy_inner.py
"""
import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from fftw3_tpu.ops.pallas_stockham import _x64_off
from fftw3_tpu.utils import timing

N = 2048
PRE = 8


def _copy3_kernel(x_ref, y_ref):
    y_ref[...] = x_ref[...] * 1.0001


def make_inner(tag, L, tl=128):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    spec = pl.BlockSpec((1, N, tl), lambda i, j: (i, 0, j),
                        memory_space=pltpu.VMEM)
    fn = pl.pallas_call(
        _copy3_kernel, grid=(PRE, -(-L // tl)),
        in_specs=[spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((PRE, N, L), jnp.float32))

    def run(x):
        with _x64_off():
            return (fn(x),)

    run = jax.jit(run)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((PRE, N, L)), jnp.float32)
    (y,) = run(x)
    assert np.allclose(np.asarray(y[0, :4, :8]),
                       np.asarray(x[0, :4, :8]) * 1.0001, atol=1e-3)
    print(f"# {tag}: ok", file=sys.stderr)
    return tag, run, (x,), PRE * N * L


def make_lastaxis(tag, L):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B = PRE * L  # matched points, contiguous (tb, N) blocks
    spec = pl.BlockSpec((128, N), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)

    def _k(x_ref, y_ref):
        y_ref[...] = x_ref[...] * 1.0001

    Bp = -(-B // 128) * 128
    fn = pl.pallas_call(
        _k, grid=(Bp // 128,), in_specs=[spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((Bp, N), jnp.float32))

    def run(x):
        with _x64_off():
            return (fn(x),)

    run = jax.jit(run)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((Bp, N)), jnp.float32)
    run(x)
    print(f"# {tag}: ok", file=sys.stderr)
    return tag, run, (x,), Bp * N


def main():
    print(f"# backend={jax.default_backend()}", file=sys.stderr)
    arms = []
    for mk in (lambda: make_inner("strided1024", 1024),
               lambda: make_inner("strided1025", 1025),
               lambda: make_lastaxis("lastaxis", 1024)):
        try:
            arms.append(mk())
        except Exception as exc:                       # noqa: BLE001
            print(f"# FAIL {str(exc)[:140]}", file=sys.stderr)
    configs = [(run, args) for _, run, args, _ in arms]
    ts = timing.time_chained_multi(configs, k1=4, k2=16, reps=7)
    for (tag, _, _, pts), t in zip(arms, ts):
        print(f"{tag}: {t*1e6:.0f} us/call  {t/pts*1e12:.2f} ps/pt")


if __name__ == "__main__":
    main()
