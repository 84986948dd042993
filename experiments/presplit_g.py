"""Round-4 experiment: host-PRE-SPLIT bf16 G operands for the stacked
stage matmul.

Production `_gmm` casts the f32 G operand to (Gh, Gl) bf16 INSIDE the
kernel every grid step and, under k2, concatenates the casts — the exact
pattern whose fresh Mosaic compile now crashes on a done>1 stage
(pallas_stockham.K2_DEFAULT note), and part of the ~19 ps/pt the round-3
ablation charged to casts/relayouts.  Here the splits ship as separate
bf16 VMEM operands prepared on host:

* ``Gh``   (2p, 2p) bf16  — hi halves
* ``GG``   (2p, 4p) bf16  — [Gh | Gl] pre-concatenated for the k2 pass

so the kernel's G-side work drops to zero; only the X-side cast+concat
remains.  Three questions, answered on-chip by `python
experiments/presplit_g.py`:

1. does the k2 cross pass COMPILE fresh on a done>1 stage in this form?
2. same-session marginal slope vs prod-k2first and (cached) prod-k2all
   at n=1024 [64,16];
3. accuracy unchanged (~5e-6)?
"""
from __future__ import annotations

import sys
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from fftw3_tpu.ops import matrices  # noqa: E402
from fftw3_tpu.ops import pallas_stockham as ps  # noqa: E402


def _presplit_consts(n, radices, sign, tw_lanes):
    """Per stage: Gh bf16, GG bf16, then the twiddle pair (as in prod)."""
    out = []
    rest = n
    first = True
    for p in radices:
        q = rest // p
        F = matrices.dft_matrix(p, sign)
        G = np.block([[np.ascontiguousarray(F.real),
                       -np.ascontiguousarray(F.imag)],
                      [np.ascontiguousarray(F.imag),
                       np.ascontiguousarray(F.real)]]).astype(np.float32)
        Gh32 = G.astype(jnp.bfloat16).astype(np.float32)
        Gh = np.ascontiguousarray(G.astype(jnp.bfloat16))
        Gl = np.ascontiguousarray((G - Gh32).astype(jnp.bfloat16))
        GG = np.ascontiguousarray(np.concatenate([Gh, Gl], axis=1))
        consts = [Gh, GG]
        if q > 1:
            e = np.mod(np.outer(np.arange(p, dtype=np.int64),
                                np.arange(q, dtype=np.int64)), rest)
            w = np.exp(sign * 2j * np.pi * e / rest)
            wr = np.ascontiguousarray(w.real, np.float32)
            wi = np.ascontiguousarray(w.imag, np.float32)
            if tw_lanes and first:
                wr = np.ascontiguousarray(
                    np.repeat(wr[:, :, None], tw_lanes, 2).reshape(
                        p, q * tw_lanes))
                wi = np.ascontiguousarray(
                    np.repeat(wi[:, :, None], tw_lanes, 2).reshape(
                        p, q * tw_lanes))
            consts += [wr, wi]
        out.append(consts)
        rest = q
        first = False
    return out


def _gmm_presplit(Gh, GG, X, k2=True):
    Xh = X.astype(jnp.bfloat16)
    Xl = (X - Xh.astype(jnp.float32)).astype(jnp.bfloat16)

    def d(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32)
    if k2:
        XX = jnp.concatenate([Xl, Xh], axis=0)
        return d(Gh, Xh) + d(GG, XX)
    p2 = Gh.shape[0]
    Gl = GG[:, p2:]
    return d(Gh, Xh) + (d(Gh, Xl) + d(Gl, Xh))


def _stages_presplit(radices, n, tb, crefs, ar, ai, tw_lanes, k2stage2):
    done = 1
    rest = n
    ci = 0
    st = jnp.concatenate([ar[None], ai[None]], 0)
    for p in radices:
        q = rest // p
        M = q * done * tb
        Gh = crefs[ci][...]
        GG = crefs[ci + 1][...]
        ci += 2
        k2 = (done == 1) or k2stage2
        y = _gmm_presplit(Gh, GG, st.reshape(2 * p, M), k2=k2)
        if q > 1:
            if done == 1 and tw_lanes == tb:
                wr = crefs[ci][...]
                wi = crefs[ci + 1][...]
                ci += 2
                y3 = y.reshape(2, p, M)
                tr = y3[0] * wr - y3[1] * wi
                ti = y3[0] * wi + y3[1] * wr
                y = jnp.concatenate([tr[None], ti[None]], 0)
            else:
                sh = (p, q) + ((1, 1) if done > 1 else (1,))
                wr = crefs[ci][...].reshape(sh)
                wi = crefs[ci + 1][...].reshape(sh)
                ci += 2
                y3 = y.reshape((2, p, q) +
                               ((done, tb) if done > 1 else (tb,)))
                tr = y3[0] * wr - y3[1] * wi
                ti = y3[0] * wi + y3[1] * wr
                y = jnp.concatenate([tr[None], ti[None]], 0)
            if done == 1:
                st = jnp.transpose(y.reshape(2, p, q, tb),
                                   (0, 2, 1, 3)).reshape(2, q * p, tb)
            else:
                st = jnp.transpose(y.reshape(2, p, q, done, tb),
                                   (0, 2, 1, 3, 4)).reshape(
                    2, q * p * done, tb)
        else:
            st = y.reshape(2, p * done, tb)
        done *= p
        rest = q
    return st[0], st[1]


def _kernel_presplit(radices, n, tb, tw_lanes, k2stage2, *refs):
    xr_ref, xi_ref = refs[0], refs[1]
    yr_ref, yi_ref = refs[-2], refs[-1]
    crefs = refs[2:-2]
    ar, ai = _stages_presplit(radices, n, tb, crefs,
                              jnp.transpose(xr_ref[...]),
                              jnp.transpose(xi_ref[...]),
                              tw_lanes, k2stage2)
    yr_ref[...] = jnp.transpose(ar)
    yi_ref[...] = jnp.transpose(ai)


def make_presplit(n, radices, sign=-1, tb=128, k2stage2=True):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    tw_lanes = ps._flat_tw_lanes(n, radices, tb)
    consts = _presplit_consts(n, radices, sign, tw_lanes)
    flat = [c for st in consts for c in st]
    const_specs = [pl.BlockSpec(c.shape, lambda i: (0, 0),
                                memory_space=pltpu.VMEM) for c in flat]
    kernel = partial(_kernel_presplit, tuple(radices), n, tb, tw_lanes,
                     k2stage2)
    data_spec = pl.BlockSpec((tb, n), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)

    def run(xr, xi):
        B = xr.shape[0]
        fn = pl.pallas_call(
            kernel, grid=(B // tb,),
            in_specs=[data_spec, data_spec] + const_specs,
            out_specs=[data_spec, data_spec],
            out_shape=[jax.ShapeDtypeStruct((B, n), jnp.float32)] * 2,
            cost_estimate=pl.CostEstimate(
                flops=int(6 * n * sum(radices) * B),
                bytes_accessed=int(4 * B * n * 4), transcendentals=0))
        with ps._x64_off():
            return fn(xr, xi, *flat)
    return jax.jit(run)


def main():
    from fftw3_tpu.utils import timing

    n = 1024
    rad = [64, 16]
    rng = np.random.default_rng(3)
    vr = rng.standard_normal((256, n)).astype(np.float32)
    vi = rng.standard_normal((256, n)).astype(np.float32)
    ref = np.fft.fft((vr + 1j * vi).astype(np.complex128), axis=1)

    arms = {}
    for tag, mk in [
        ("presplit_k2s2", lambda: make_presplit(n, rad, k2stage2=True)),
        ("presplit_k2first", lambda: make_presplit(n, rad, k2stage2=False)),
        ("prod_k2first", lambda: jax.jit(ps.build_pallas_c2c_split(
            {"alg": "pallas", "n": n, "radices": rad, "tile_b": 128,
             "k2": "first"}, -1, np.float32))),
        ("prod_k2all", lambda: jax.jit(ps.build_pallas_c2c_split(
            {"alg": "pallas", "n": n, "radices": rad, "tile_b": 128,
             "k2": "all"}, -1, np.float32))),
    ]:
        try:
            fn = mk()
            yr, yi = fn(vr, vi)
            e = float(np.max(np.abs(np.asarray(yr) + 1j * np.asarray(yi)
                                    - ref)) / np.max(np.abs(ref)))
            print(f"{tag}: verify {e:.1e}", flush=True)
            if e < 1e-3:
                arms[tag] = fn
        except Exception as ex:                        # noqa: BLE001
            print(f"{tag}: FAIL {str(ex)[:110]}", flush=True)

    if len(arms) < 2:
        return
    b_lo, b_hi = 8192, 24576
    cfgs = []
    tags = list(arms)
    for t in tags:
        for b in (b_lo, b_hi):
            xr = jnp.asarray(rng.standard_normal((b, n)), jnp.float32)
            xi = jnp.asarray(rng.standard_normal((b, n)), jnp.float32)
            cfgs.append((arms[t], (xr, xi)))
    ts = timing.time_chained_multi(cfgs, k1=4, k2=16, reps=7)
    for i, t in enumerate(tags):
        s = (ts[2 * i + 1] - ts[2 * i]) / ((b_hi - b_lo) * n)
        print(f"slope {t}: {s*1e12:.1f} ps/pt", flush=True)


if __name__ == "__main__":
    main()
