"""On-chip A/B: swapped 2-D r2c composition vs prod at (8, 2048, 2048).

prod    = fused last-axis r2c + axis-(-2) c2c (VMEM-capped [64,32])
swapped = axis-(-2) r2c kernel + last-axis c2c + Hermitian reconstruct
Also races swapped+k2force.  Dispatched timing (the bench's protocol for
this config) with interleaved repeats.
"""
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import fftw3_tpu as ftpu
from fftw3_tpu import config
from fftw3_tpu.ops import pallas_stockham as ps
from fftw3_tpu.utils import timing


def build(tag, swap, c2c_k2=None, batch=8, n=2048):
    from fftw3_tpu.planner import the_planner
    ftpu.forget_wisdom()
    if c2c_k2:
        cdesc = {"alg": "pallas", "n": n, "radices": ps.choose_radices(n),
                 "k2": c2c_k2}
        for b in (batch * n, batch * (n // 2 + 1), batch * (n // 2)):
            the_planner.wisdom[the_planner._key("c2c", n, np.float32, b)] \
                = {"desc": cdesc, "patience": 99, "cost": 0.0}
    config.r2c_swapped = swap
    try:
        plan = ftpu.plan_dft_r2c((batch, n, n), axes=(1, 2),
                                 dtype="float32")
    finally:
        config.r2c_swapped = False
    print(f"{tag}: {plan!r}", flush=True)

    @jax.jit
    def run(a):
        y = plan.apply(a)
        return jnp.real(y), jnp.imag(y)
    return run


def main():
    n, batch = 2048, 8
    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, n, n)), jnp.float32)
    ref = np.fft.rfftn(np.asarray(x[:1]).astype(np.float64), axes=(1, 2))
    fns = {}
    for tag, swap, k2 in (("prod", False, None),
                          ("swapped", True, None),
                          ("swappedk2f", True, "force")):
        try:
            fn = build(tag, swap, k2, batch, n)
            yr, yi = fn(x)
            err = np.max(np.abs(
                np.asarray(yr[:1]) + 1j * np.asarray(yi[:1]) - ref)
                ) / np.max(np.abs(ref))
            print(f"{tag}: relerr={err:.1e}", flush=True)
            if err < 1e-3:
                fns[tag] = fn
        except Exception as exc:                       # noqa: BLE001
            print(f"{tag}: FAIL {str(exc)[:120]}", flush=True)
    ftpu.forget_wisdom()
    if len(fns) < 2:
        return
    flops = 2.5 * (n * n) * np.log2(float(n) * n) * batch
    for rep in range(3):
        for tag, fn in fns.items():
            t = timing.time_dispatched(fn, (x,))
            print(f"rep{rep} {tag}: {flops/t/1e9:.0f} GFLOPS "
                  f"({t*1e6:.0f} us)", flush=True)


if __name__ == "__main__":
    main()
