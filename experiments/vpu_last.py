"""A/B the VPU final-stage path (config.pallas_vpu_last) against prod.

The round-3 ablation (BASELINE.md) decomposed the n=1024 kernel's
~40 ps/pt of compute into the bf16 hi/lo precision machinery (~39) vs
~1 for twiddle/permute.  The final stage's radix is small (2p < 128
underfills the MXU rows) and its matmul carries the same hi/lo cast +
cross-pass tax — this variant replaces it with pure-f32 VPU radix-4/2
butterflies (~20 flops/pt, no casts, no bf16 relayouts).

Protocol: same-session interleaved marginal slopes (time_chained_multi
at two batch sizes per variant, A/B/A order) — the only decision-grade
comparison on the tunnel (CLAUDE.md measurement discipline).

Usage: python experiments/vpu_last.py [n ...]
"""
import sys

sys.path.insert(0, "/root/repo")

import numpy as np


def bench_4096(rng, interp):
    """n=4096 single-kernel schedules with the VPU final stage vs the
    pallas4 four-step.  With two MXU stages these blew scoped VMEM
    (MAX_N=2048); the VPU stage drops the final G/cross operands — if one
    compiles and beats pallas4's ~80 ps/pt marginal slope, the four-step's
    third HBM pass disappears at n=4096."""
    import jax
    import jax.numpy as jnp

    from fftw3_tpu import config
    from fftw3_tpu.ops import pallas_stockham as ps
    from fftw3_tpu.utils import timing

    n = 4096
    fns = {}
    p4, q4 = ps.choose_fourstep(n)
    fns["pallas4"] = jax.jit(ps.build_pallas_c2c_split_fourstep(
        {"alg": "pallas4", "n": n, "p": p4, "q": q4}, -1, np.float32))
    for rad, vpu in (([128, 32], True), ([64, 64], True),
                     ([64, 64], "all")):
        tag = f"single{rad}{'all' if vpu == 'all' else ''}"
        fns[tag] = jax.jit(ps.build_pallas_c2c_split(
            {"alg": "pallas", "n": n, "radices": rad, "tile_b": 128,
             "vpu": vpu}, -1, np.float32))

    vr = rng.standard_normal((256, n)).astype(np.float32)
    vi = rng.standard_normal((256, n)).astype(np.float32)
    ref = np.fft.fft((vr + 1j * vi).astype(np.complex128), axis=1)
    good = []
    for tag, fn in fns.items():
        try:
            yr, yi = fn(vr, vi)
            err = np.max(np.abs(np.asarray(yr) + 1j * np.asarray(yi) - ref)
                         ) / np.max(np.abs(ref))
            print(f"n=4096 {tag}: relerr={err:.1e}", flush=True)
            if err < 1e-3:
                good.append((tag, fn))
        except Exception as e:                         # noqa: BLE001
            print(f"n=4096 {tag}: FAIL {str(e)[:140]}", flush=True)
    if interp:
        return
    b_lo, b_hi = 2048, 6144
    configs = []
    for tag, fn in good:
        for b in (b_lo, b_hi):
            xr = jnp.asarray(rng.standard_normal((b, n)), jnp.float32)
            xi = jnp.asarray(rng.standard_normal((b, n)), jnp.float32)
            configs.append((fn, (xr, xi)))
    ts = timing.time_chained_multi(configs, k1=4, k2=16, reps=9)
    for i, (tag, _) in enumerate(good):
        s = (ts[2 * i + 1] - ts[2 * i]) / ((b_hi - b_lo) * n) * 1e12
        gf = 5.0 * np.log2(n) / (s * 1e-12) / 1e9
        print(f"n=4096 {tag}: {s:.1f} ps/pt ({gf:.0f} GFLOPS slope)",
              flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from fftw3_tpu import config
    from fftw3_tpu.ops import pallas_stockham as ps
    from fftw3_tpu.utils import timing

    ns = [int(a) for a in sys.argv[1:]] or [1024, 2048]
    rng = np.random.default_rng(0)
    interp = jax.default_backend() != "tpu"

    for n in ns:
        if n == 4096:
            bench_4096(rng, interp)
            continue
        rad = ps.choose_radices(n)
        fns = {}

        def _all_ok(r):
            return all(ps._vpu_last_ok(x, 1) for x in r)  # 2-5-smooth

        def mk(radices, vpu):
            return jax.jit(ps.build_pallas_c2c_split(
                {"alg": "pallas", "n": n, "radices": list(radices),
                 "tile_b": 128, "vpu": vpu}, -1, np.float32))
        fns["prod"] = mk(rad, False)
        fns["vpu"] = mk(rad, True)
        if _all_ok(rad):
            fns["vpuall"] = mk(rad, "all")
        # radix re-sweep under the VPU stages: the measured stage-cost
        # curves were fit with MXU finals; free-ish VPU stages may move
        # the optimum (e.g. [32,32] vs [64,16] at n=1024)
        for alt in ps.alternative_radices(n, k=4):
            if alt == rad or len(alt) != 2:
                continue
            if _all_ok(alt):
                fns[f"vpuall{alt}"] = mk(alt, "all")
            elif ps._vpu_last_ok(alt[1], 1):
                fns[f"vpu{alt}"] = mk(alt, True)
        fns["prod2"] = mk(rad, False)

        # verify every variant on chip first (drop any that fails:
        # a VMEM overflow or miscompile must not kill the A/B)
        vr = rng.standard_normal((256, n)).astype(np.float32)
        vi = rng.standard_normal((256, n)).astype(np.float32)
        ref = np.fft.fft((vr + 1j * vi).astype(np.complex128), axis=1)
        # prod2 last so the timing order is A/B/.../A (drift bracket)
        tags = [t for t in fns if t != "prod2"] + ["prod2"]
        good = []
        for tag in tags:
            try:
                yr, yi = fns[tag](vr, vi)
                err = np.max(np.abs(np.asarray(yr) + 1j * np.asarray(yi)
                                    - ref)) / np.max(np.abs(ref))
                if tag != "prod2":
                    print(f"n={n} {tag}: relerr={err:.1e}", flush=True)
                assert err < 1e-3, err
                good.append(tag)
            except Exception as e:                     # noqa: BLE001
                print(f"n={n} {tag}: FAIL {str(e)[:140]}", flush=True)
        if interp:
            continue

        b_lo, b_hi = 8192, 24576
        configs = []
        for tag in good:
            for b in (b_lo, b_hi):
                xr = jnp.asarray(rng.standard_normal((b, n)), jnp.float32)
                xi = jnp.asarray(rng.standard_normal((b, n)), jnp.float32)
                configs.append((fns[tag], (xr, xi)))
        ts = timing.time_chained_multi(configs, k1=4, k2=16, reps=9)
        for i, tag in enumerate(good):
            s = (ts[2 * i + 1] - ts[2 * i]) / ((b_hi - b_lo) * n) * 1e12
            gf = 5.0 * np.log2(n) / (s * 1e-12) / 1e9
            print(f"n={n} {tag}: {s:.1f} ps/pt ({gf:.0f} GFLOPS slope)",
                  flush=True)


if __name__ == "__main__":
    main()
