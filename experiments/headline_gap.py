"""Headline mechanism probe (round-5 verdict item 1): WHO owns the gap
between the chained steady-state (~43-46 ps/pt, flat in batch) and the
interleaved marginal slope (34.7-40.9 ps/pt) of the SHIPPING presplit
n=1024 kernel?

Hypotheses, one arm each, all raced same-block interleaved:

* ``prod``    — the shipping kernel, standard chained protocol (control:
                should reproduce ~43-46 ps/pt).
* ``donate``  — same kernel jitted with ``donate_argnums=(0, 1)``: every
                chained call reuses the input HBM buffers for its outputs
                instead of allocating 2 fresh (B, n) f32 planes (134 MB at
                B=16384).  A win here = allocation/defrag owns the gap.
                (This is also the in-place-FFT analog: FFTW's default
                bench mode is in-place, fftw/tests/README:8-55.)
* ``stream2`` — TWO independent chains interleaved in one dispatch queue;
                per-call cost halves any queue bubble between dependent
                dispatches.  A win = dispatch-gap latency owns it.
* ``rep1/3/5``— the exact shipping stage pipeline repeated r times INSIDE
                the kernel (extra passes touch no HBM): the slope in r is
                the dispatch- and DMA-free per-pass COMPUTE cost of the
                shipping config.  ~40 => the kernel steady-state is real
                and the interleaved slope is the flattering outlier
                (re-baseline); ~<32 => there is a recoverable fixed cost.

Plus, in the same session (separate block), the standard interleaved
marginal-slope measurement (8192 vs 24576) so the 43-vs-35 discrepancy is
witnessed in one place.

Usage: python experiments/headline_gap.py [radix1 radix2]
"""
import sys
import time

sys.path.insert(0, "/root/repo")
from functools import partial

import numpy as np

from _race import interleaved_chain_race, make_chain

N = 1024
B = 16384            # chained cost measured FLAT in batch at 16k/64k/128k


def make_repeat_call(n, radices, sign, tb, r, interpret=False):
    """The production kernel with the stage pipeline run ``r`` times
    (values explode — unnormalized transform — but TPU arithmetic is
    value-independent, verified round 2)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from fftw3_tpu.ops import pallas_stockham as ps

    tw_lanes = ps._flat_tw_lanes(n, radices, tb)
    consts = ps._stage_consts(n, radices, sign, tw_lanes, presplit=True)
    flat_consts = [c for stage in consts for c in stage]

    def kernel(*refs):
        xr_ref, xi_ref = refs[0], refs[1]
        yr_ref, yi_ref = refs[-2], refs[-1]
        crefs = refs[2:-2]
        ar = jnp.transpose(xr_ref[...])
        ai = jnp.transpose(xi_ref[...])
        for _ in range(r):
            ar, ai = ps._stages(tuple(radices), n, tb, crefs, ar, ai,
                                tw_lanes=tw_lanes, sign=0,
                                k2mode="first", presplit=True)
        yr_ref[...] = jnp.transpose(ar)
        yi_ref[...] = jnp.transpose(ai)

    data_spec = pl.BlockSpec((tb, n), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    const_specs = [pl.BlockSpec(c.shape, lambda i: (0, 0),
                                memory_space=pltpu.VMEM)
                   for c in flat_consts]

    def run(xr, xi):
        Bc = xr.shape[0]
        fn = pl.pallas_call(
            kernel,
            grid=(Bc // tb,),
            in_specs=[data_spec, data_spec] + const_specs,
            out_specs=[data_spec, data_spec],
            out_shape=[jax.ShapeDtypeStruct((Bc, n), jnp.float32)] * 2,
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=int(6 * n * sum(radices) * Bc * r),
                bytes_accessed=int(4 * Bc * n * 4),
                transcendentals=0),
        )
        with ps._x64_off():
            return fn(xr, xi, *flat_consts)

    return run


def main():
    import jax
    import jax.numpy as jnp

    from fftw3_tpu.ops import pallas_stockham as ps
    from fftw3_tpu.utils import timing

    rad = [int(a) for a in sys.argv[1:3]] if len(sys.argv) > 2 else [32, 32]
    interp = jax.default_backend() != "tpu"
    rng = np.random.default_rng(3)

    desc = {"alg": "pallas", "n": N, "radices": rad, "tile_b": 128,
            "k2": "first", "gsplit": True}
    prod = jax.jit(ps.build_pallas_c2c_split(desc, -1, np.float32))
    prod_d = jax.jit(ps.build_pallas_c2c_split(desc, -1, np.float32),
                     donate_argnums=(0, 1))
    reps_fns = {r: jax.jit(make_repeat_call(N, rad, -1, 128, r,
                                            interpret=interp))
                for r in (1, 3, 5)}

    # verify everything once (small batch)
    vr = rng.standard_normal((256, N)).astype(np.float32)
    vi = rng.standard_normal((256, N)).astype(np.float32)
    ref = np.fft.fft((vr + 1j * vi).astype(np.complex128), axis=1)
    yr, yi = prod(vr, vi)
    err = np.max(np.abs(np.asarray(yr) + 1j * np.asarray(yi) - ref)) \
        / np.max(np.abs(ref))
    yr1, yi1 = reps_fns[1](vr, vi)
    err1 = np.max(np.abs(np.asarray(yr1) + 1j * np.asarray(yi1) - ref)) \
        / np.max(np.abs(ref))
    print(f"verify prod={err:.1e} rep1={err1:.1e}", flush=True)
    assert err < 1e-3 and err1 < 1e-3
    if interp:
        print("CPU interpret mode: verify only")
        return

    xr = jnp.asarray(rng.standard_normal((B, N)), jnp.float32)
    xi = jnp.asarray(rng.standard_normal((B, N)), jnp.float32)
    dup = jax.jit(lambda a, b: (a + 0.0, b + 0.0))   # fresh device buffers

    # force-compile every arm at the timing shape (shape-specialized
    # Mosaic functions; a mid-race HTTP 500 kills the whole block)
    chains = []
    out0 = prod(xr, xi)
    timing.sync(out0)
    chains.append(("prod", make_chain(prod, out0, timing.sync)))

    def chain_donate(k):
        cur = dup(xr, xi)
        timing.sync(cur)
        t0 = time.perf_counter()
        for _ in range(k):
            cur = prod_d(*cur)
        timing.sync(cur)
        return time.perf_counter() - t0
    chain_donate(1)                                   # force-compile
    chains.append(("donate", chain_donate))

    out_a = prod(xr, xi)
    out_b = dup(*out_a)
    timing.sync(out_b)

    def chain_stream2(k):
        ca, cb = out_a, out_b
        t0 = time.perf_counter()
        for _ in range(k):
            ca = prod(*ca)
            cb = prod(*cb)
        timing.sync(ca)
        timing.sync(cb)
        return (time.perf_counter() - t0) / 2.0       # per-chain-call
    chains.append(("stream2", chain_stream2))

    for r, fn in reps_fns.items():
        o = fn(xr, xi)
        timing.sync(o)
        chains.append((f"rep{r}", make_chain(fn, o, timing.sync)))

    print(f"== interleaved chained race at B={B}, radices {rad} ==",
          flush=True)
    res = interleaved_chain_race(chains, k1=4, k2=16, reps=7)
    pp = {tag: sec / (B * N) * 1e12 for tag, sec in res.items()}
    for tag, v in pp.items():
        print(f"{tag}: {v:.1f} ps/pt", flush=True)
    slope_r = (pp["rep5"] - pp["rep1"]) / 4.0
    print(f"in-kernel per-pass compute (rep slope): {slope_r:.1f} ps/pt")
    print(f"fixed-per-call (rep1 - slope): {pp['rep1'] - slope_r:.1f} ps/pt")
    print(f"donate saves {pp['prod'] - pp['donate']:.1f}, "
          f"stream2 saves {pp['prod'] - pp['stream2']:.1f} ps/pt")

    # same-session control: the standard interleaved marginal slope
    print("== marginal slope block (8192 vs 24576) ==", flush=True)
    cfgs = []
    for b in (8192, 24576):
        br = jnp.asarray(rng.standard_normal((b, N)), jnp.float32)
        bi = jnp.asarray(rng.standard_normal((b, N)), jnp.float32)
        cfgs.append((prod, (br, bi)))
    ts = timing.time_chained_multi(cfgs, k1=4, k2=16, reps=7)
    s = (ts[1] - ts[0]) / (16384 * N) * 1e12
    print(f"prod marginal slope: {s:.1f} ps/pt "
          f"(chained@{B} was {pp['prod']:.1f})", flush=True)


if __name__ == "__main__":
    main()
