"""Round-3 headline experiments, informed by ablate_stage.py findings:

The stage pipeline's cost is NOT twiddle/permute sweeps (those measured
~1-2 ps/pt); it is the bf16 hi/lo precision machinery (~38 ps/pt of the
~52 total): the K=4p cross matmul pass (~20) and the hi/lo casts/bf16
relayouts (~19).  Variants:

  prod        baseline (hh + fused K=4p cross, per-stage casts)
  blockdiag   small-radix stages packed block-diagonally to fill the
              128 MXU rows: a (2p, M) matmul with 2p < 128 wastes
              (128-2p)/128 of the systolic rows; packing r = 128//(2p)
              independent column groups into rows makes one full-width
              (2p*r, M/r) pass.  Major-dim transpose + reshape only.
  noxl        drop the Xl operand: y = Gh@Xh + Gl@Xh = (G split, X
              rounded).  2 passes, no X split/concat.  Error ~2^-9
              (input rounding) — measures the cast cost ceiling and
              whether a relaxed-precision rung is worth racing.
  r[a,b]      radix re-sweeps under the stacked form

Usage: python experiments/precision_variants.py [n]
"""
import sys
from functools import partial

sys.path.insert(0, "/root/repo")

import numpy as np


def make_kernel(n, radices, sign, tb, mode="prod", interpret=False):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from fftw3_tpu.ops.pallas_stockham import (_flat_tw_lanes, _gmm,
                                               _stage_consts)

    tw_lanes = _flat_tw_lanes(n, radices, tb)
    consts = _stage_consts(n, radices, sign, tw_lanes)
    if mode == "blockdiag":
        # expand each stage's G to its block-diagonal packed form at PLAN
        # time (numpy) — the kernel reads the packed constant from VMEM
        consts = [list(stage) for stage in consts]
        done = 1
        rest = n
        for si, p in enumerate(radices):
            q = rest // p
            r = 128 // (2 * p)
            M = q * done * tb
            if 2 * p < 128 and r > 1 and M % r == 0:
                G = consts[si][0]
                BD = np.zeros((2 * p * r, 2 * p * r), np.float32)
                for i in range(r):
                    BD[2 * p * i:2 * p * (i + 1),
                       2 * p * i:2 * p * (i + 1)] = G
                consts[si][0] = BD
            done *= p
            rest = q
    flat_consts = [c for stage in consts for c in stage]

    def bd_gmm(BD, x2, p, M):
        """Block-diagonal full-width pass for 2p < 128: pack r column
        groups into rows; math identical to _gmm(G, x2).  BD is the
        plan-time packed (2p*r, 2p*r) constant."""
        r = BD.shape[0] // (2 * p)
        if r <= 1 or M % r:
            return _gmm(BD, x2, k2=(4 * p * M <= 768 << 10))
        Mr = M // r
        xg = jnp.transpose(x2.reshape(2 * p, r, Mr), (1, 0, 2)) \
            .reshape(2 * p * r, Mr)
        yg = _gmm(BD, xg, k2=(2 * BD.shape[0] * Mr <= 768 << 10))
        return jnp.transpose(yg.reshape(r, 2 * p, Mr), (1, 0, 2)) \
            .reshape(2 * p, M)

    def noxl_gmm(G, x2):
        Gh = G.astype(jnp.bfloat16)
        Gl = (G - Gh.astype(jnp.float32)).astype(jnp.bfloat16)
        xh = x2.astype(jnp.bfloat16)
        GG = jnp.concatenate([Gh, Gl], axis=1)
        XX = jnp.concatenate([xh, xh], axis=0)
        return jnp.dot(GG, XX, preferred_element_type=jnp.float32)

    def stages(crefs, ar, ai):
        done, rest, ci = 1, n, 0
        st = jnp.concatenate([ar[None], ai[None]], 0)
        for p in radices:
            q = rest // p
            G = crefs[ci][...]
            ci += 1
            M = q * done * tb
            x2 = st.reshape(2 * p, M)
            if mode == "blockdiag" and 2 * p < 128:
                y = bd_gmm(G, x2, p, M)
            elif mode == "noxl":
                y = noxl_gmm(G, x2)
            else:
                y = _gmm(G, x2, k2=(4 * p * M <= 768 << 10))
            if q > 1:
                if done == 1 and tw_lanes == tb:
                    wr = crefs[ci][...]
                    wi = crefs[ci + 1][...]
                    ci += 2
                    y3 = y.reshape(2, p, M)
                    tr = (y3[0] * wr - y3[1] * wi).reshape(p, q, tb)
                    ti = (y3[0] * wi + y3[1] * wr).reshape(p, q, tb)
                    perm = (1, 0, 2)
                    shp = (p, q, tb)
                else:
                    sh = (p, q) + ((1, 1) if done > 1 else (1,))
                    wr = crefs[ci][...].reshape(sh)
                    wi = crefs[ci + 1][...].reshape(sh)
                    ci += 2
                    y3 = y.reshape((2, p, q) +
                                   ((done, tb) if done > 1 else (tb,)))
                    tr = y3[0] * wr - y3[1] * wi
                    ti = y3[0] * wi + y3[1] * wr
                    perm = (1, 0, 2, 3) if done > 1 else (1, 0, 2)
                    shp = (p, q, done, tb) if done > 1 else (p, q, tb)
                pr = jnp.transpose(tr.reshape(shp), perm)
                pi_ = jnp.transpose(ti.reshape(shp), perm)
                st = jnp.concatenate(
                    [pr.reshape(1, q * p * done, tb),
                     pi_.reshape(1, q * p * done, tb)], 0)
            else:
                st = y.reshape(2, p * done, tb)
            done *= p
            rest = q
        return st[0], st[1]

    def kernel(xr_ref, xi_ref, *refs):
        yr_ref, yi_ref = refs[-2], refs[-1]
        crefs = refs[:-2]
        ar, ai = stages(crefs, jnp.transpose(xr_ref[...]),
                        jnp.transpose(xi_ref[...]))
        yr_ref[...] = jnp.transpose(ar)
        yi_ref[...] = jnp.transpose(ai)

    data_spec = pl.BlockSpec((tb, n), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    const_specs = [pl.BlockSpec(c.shape, lambda i: (0, 0),
                                memory_space=pltpu.VMEM)
                   for c in flat_consts]

    def run(xr, xi):
        B = xr.shape[0]
        fn = pl.pallas_call(
            kernel, grid=(B // tb,),
            in_specs=[data_spec, data_spec] + const_specs,
            out_specs=[data_spec, data_spec],
            out_shape=[jax.ShapeDtypeStruct((B, n), jnp.float32)] * 2,
            interpret=interpret)
        return fn(xr, xi, *flat_consts)

    return run


def main():
    import jax
    import jax.numpy as jnp

    from fftw3_tpu.ops import pallas_stockham as ps
    from fftw3_tpu.utils import timing

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    rng = np.random.default_rng(0)
    rad = ps.choose_radices(n)
    interp = jax.default_backend() != "tpu"

    variants = [("prod", rad, "prod"),
                ("blockdiag", rad, "blockdiag"),
                ("noxl", rad, "noxl")]
    for alt in ps.alternative_radices(n, k=4):
        if alt != rad and len(alt) == 2:
            variants.append((f"r{alt}", alt, "prod"))
            variants.append((f"r{alt}+bd", alt, "blockdiag"))

    good = []
    for tag, radices, mode in variants:
        try:
            run = make_kernel(n, radices, -1, 128, mode=mode,
                              interpret=interp)
            xr = rng.standard_normal((256, n)).astype(np.float32)
            xi = rng.standard_normal((256, n)).astype(np.float32)
            yr, yi = jax.jit(run)(xr, xi)
            ref = np.fft.fft((xr + 1j * xi).astype(np.complex128), axis=1)
            err = np.max(np.abs(np.asarray(yr) + 1j * np.asarray(yi) - ref)
                         ) / np.max(np.abs(ref))
            print(f"{tag}: relerr={err:.1e}", flush=True)
            if err < 3e-3:          # noxl races at a relaxed rung
                good.append((tag, run))
        except Exception as e:
            print(f"{tag}: FAIL {str(e)[:160]}", flush=True)
    if interp:
        return

    configs = []
    for tag, run in good:
        for b in (8192, 24576):
            xrb = jnp.asarray(rng.standard_normal((b, n)), jnp.float32)
            xib = jnp.asarray(rng.standard_normal((b, n)), jnp.float32)
            configs.append((jax.jit(run), (xrb, xib)))
    ts = timing.time_chained_multi(configs, k1=4, k2=16, reps=9)
    for i, (tag, _) in enumerate(good):
        s = (ts[2 * i + 1] - ts[2 * i]) / (16384 * n) * 1e12
        print(f"{tag}: {s:.1f} ps/pt", flush=True)


if __name__ == "__main__":
    main()
