"""Pin the mechanism of the unaligned-lane tax (attrib1000 follow-up).

attrib1000.py measured: the n=1000 2.6x tax is the non-128-multiple
lane count, not the odd radices (n800 [32,25] 90.8 ps/pt == n1000 91.3,
while ALIGNED non-pow2 arms run 27.5-49.4).  Two sub-mechanisms remain:

  (i)  the HBM<->VMEM copies of (tb, n) blocks with n unaligned (masked
       edge lane tiles — also the r2c axis-1 pass's regime at 1025);
  (ii) the in-kernel boundary transposes (tb, n) <-> (n, tb) on
       unaligned lanes (aligned 2-D transposes measured free).

Race minimal kernels at n=1000 vs n=1024, matched points: copy-only
(isolates i) and transpose-scale-transpose (adds ii).  If copy1000 >>
copy1024 the tax is the DMA floor (structural; Bluestein-to-aligned
costs 2x points and cannot win); if copy arms tie and only trans1000
blows up, a lanes=TB kernel form (skip the boundary transposes) would
recover it.

Run ON CHIP: python experiments/copy1000.py
"""
import sys

sys.path.insert(0, "/root/repo")

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from fftw3_tpu.ops.pallas_stockham import _x64_off
from fftw3_tpu.utils import timing

POINTS = 16_600_000
TB = 128


def _copy_kernel(x_ref, y_ref):
    y_ref[...] = x_ref[...] * 1.0001


def _trans_kernel(x_ref, y_ref):
    v = jnp.transpose(x_ref[...])          # (n, tb)
    v = v * 1.0001                         # keep the transposes live
    y_ref[...] = jnp.transpose(v)


def make_arm(tag, n, kernel):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B = max(TB, int(round(POINTS / n / TB)) * TB)
    spec = pl.BlockSpec((TB, n), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    fn = pl.pallas_call(
        kernel, grid=(B // TB,), in_specs=[spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((B, n), jnp.float32))

    def run(x):
        with _x64_off():
            return (fn(x),)                # tuple: chained timer feeds
                                           # outputs back as inputs

    run = jax.jit(run)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, n)), jnp.float32)
    (y,) = run(x)                           # compile + sanity
    assert np.allclose(np.asarray(y[:4]), np.asarray(x[:4]) * 1.0001,
                       atol=1e-3)
    print(f"# {tag}: B={B} ok", file=sys.stderr)
    return tag, run, (x,), B * n


def main():
    print(f"# backend={jax.default_backend()}", file=sys.stderr)
    arms = []
    for tag, n, kern in [
        ("copy1024", 1024, _copy_kernel),
        ("copy1000", 1000, _copy_kernel),
        ("trans1024", 1024, _trans_kernel),
        ("trans1000", 1000, _trans_kernel),
    ]:
        try:
            arms.append(make_arm(tag, n, kern))
        except Exception as exc:                       # noqa: BLE001
            print(f"# {tag}: FAIL {str(exc)[:140]}", file=sys.stderr)

    configs = [(run, args) for _, run, args, _ in arms]
    ts = timing.time_chained_multi(configs, k1=4, k2=16, reps=7)
    for (tag, _, _, pts), t in zip(arms, ts):
        print(f"{tag}: {t*1e6:.0f} us/call  {t/pts*1e12:.2f} ps/pt")


if __name__ == "__main__":
    main()
