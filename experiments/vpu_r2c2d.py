"""A/B the VPU final stage on the 2-D r2c BASELINE config (2048^2 x 8).

The axis-(-2) inner pass at n=2048 is VMEM-capped to a [64,32] schedule
(INNER_NP_MAX); its final radix 32 is exactly what the VPU stage replaces
— and with the flag on the footprint shrinks (no final G/cross operands),
so also try widening the first radix back to [128,16] under the flag.

Usage: python experiments/vpu_r2c2d.py
"""
import sys

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import fftw3_tpu as ftpu
    from fftw3_tpu import config
    from fftw3_tpu.utils import timing

    from fftw3_tpu.ops import pallas_stockham as ps

    n, b = 2048, 8
    rng = np.random.default_rng(0)
    interp = jax.default_backend() != "tpu"
    fns = {}
    np_max0 = ps.INNER_NP_MAX
    # vpu_wide: the VPU final stage drops the last stage's G/cross-pass
    # VMEM operands, so ALSO try readmitting the [128, 16] schedule the
    # INNER_NP_MAX bound rejects (measured with MXU finals; a p=128 first
    # stage halves the stage count's twiddle sweeps).  A scoped-VMEM
    # compile failure here is expected-possible and just drops the arm.
    for tag, flag, np_max in [("prod", False, np_max0),
                              ("vpu", True, np_max0),
                              ("vpuall", "all", np_max0),
                              ("vpu_wide", True, n * 128),
                              ("prod2", False, np_max0)]:
        config.pallas_vpu_last = flag
        ps.INNER_NP_MAX = np_max
        ftpu.forget_wisdom()
        try:
            plan = ftpu.plan_dft_r2c((b, n, n), axes=(1, 2),
                                     dtype="float32")
        finally:
            config.pallas_vpu_last = False
            ps.INNER_NP_MAX = np_max0
        if tag in ("prod", "vpu_wide"):
            print(f"{tag} plan: {plan!r}", flush=True)

        def make(p):
            def run(a):
                y = p.apply(a)
                return jnp.real(y), jnp.imag(y)
            return jax.jit(run)
        fns[tag] = make(plan)

    xv = rng.standard_normal((b, n, n)).astype(np.float32)
    ref = np.fft.rfftn(xv[:1].astype(np.float64), axes=(1, 2))
    good = []
    for tag in ("prod", "vpu", "vpuall", "vpu_wide", "prod2"):
        try:
            yr, yi = fns[tag](xv)
            err = np.max(np.abs(np.asarray(yr[:1]) + 1j * np.asarray(yi[:1])
                                - ref)) / np.max(np.abs(ref))
            if tag != "prod2":
                print(f"{tag}: relerr={err:.1e}", flush=True)
            assert err < 1e-3, err
            good.append(tag)
        except Exception as e:                         # noqa: BLE001
            print(f"{tag}: FAIL {str(e)[:140]}", flush=True)
    if interp:
        return

    x = jnp.asarray(xv)
    for tag in good:
        t = min(timing.time_dispatched(fns[tag], (x,)),
                timing.time_dispatched(fns[tag], (x,)))
        gf = 2.5 * n * n * np.log2(float(n) * n) * b / t / 1e9
        print(f"{tag}: {gf:.0f} GFLOPS ({t*1e6:.0f} us)", flush=True)


if __name__ == "__main__":
    main()
