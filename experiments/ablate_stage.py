"""Ablation costing of the production stacked-kernel stage pipeline.

Round-3 headline work needs to know where the ~40 ps/pt of in-kernel
compute goes before choosing a layout change.  Each variant below removes
ONE op class from the production pipeline (results are numerically wrong
for the ablated variants — timing only); the interleaved marginal-slope
protocol (time_chained_multi) gives decision-grade deltas in one session.

Variants:
  prod        full pipeline (baseline)
  no_tw       skip both twiddle multiplies
  no_perm     skip the inter-stage permute transposes
  no_cross    hh bf16 pass only (drops the K=4p cross matmul)
  f32dot      plain f32 jnp.dot per stage (Mosaic default precision)
  no_iot      skip the (tb,n)<->(n,tb) boundary transposes (lanes=n form)
  no_restack  keep (tr, ti) planes separate through the permute; concat
              only at the next stage's matmul view build

Usage: python experiments/ablate_stage.py [n]
"""
import sys
from functools import partial

sys.path.insert(0, "/root/repo")

import numpy as np


def make_variant(n, radices, sign, tb, skip=(), interpret=False):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from fftw3_tpu.ops.pallas_stockham import (_flat_tw_lanes, _gmm,
                                               _stage_consts)

    tw_lanes = _flat_tw_lanes(n, radices, tb)
    consts = _stage_consts(n, radices, sign, tw_lanes)
    flat_consts = [c for stage in consts for c in stage]

    def stages(crefs, ar, ai):
        done = 1
        rest = n
        ci = 0
        st = jnp.concatenate([ar[None], ai[None]], 0)
        planes = None          # (tr, ti) pair for the no_restack variant
        for p in radices:
            q = rest // p
            G = crefs[ci][...]
            ci += 1
            M = q * done * tb
            if planes is not None:
                x2 = jnp.concatenate(planes, 0).reshape(2 * p, M)
                planes = None
            else:
                x2 = st.reshape(2 * p, M)
            if "f32dot" in skip:
                y = jnp.dot(G, x2, preferred_element_type=jnp.float32)
            elif "no_cross" in skip:
                Gh = G.astype(jnp.bfloat16)
                xh = x2.astype(jnp.bfloat16)
                y = jnp.dot(Gh, xh, preferred_element_type=jnp.float32)
            else:
                y = _gmm(G, x2, k2=True)
            if q > 1:
                if "no_tw" in skip:
                    ci += 2
                    y = y.reshape((2, p, q) +
                                  ((done, tb) if done > 1 else (tb,)))
                    tr, ti = y[0], y[1]
                elif done == 1 and tw_lanes == tb:
                    wr = crefs[ci][...]
                    wi = crefs[ci + 1][...]
                    ci += 2
                    y3 = y.reshape(2, p, M)
                    tr = (y3[0] * wr - y3[1] * wi).reshape(p, q, tb)
                    ti = (y3[0] * wi + y3[1] * wr).reshape(p, q, tb)
                else:
                    sh = (p, q) + ((1, 1) if done > 1 else (1,))
                    wr = crefs[ci][...].reshape(sh)
                    wi = crefs[ci + 1][...].reshape(sh)
                    ci += 2
                    y3 = y.reshape((2, p, q) +
                                   ((done, tb) if done > 1 else (tb,)))
                    tr = y3[0] * wr - y3[1] * wi
                    ti = y3[0] * wi + y3[1] * wr
                shp = (p, q, done, tb) if done > 1 else (p, q, tb)
                perm = (1, 0, 2, 3) if done > 1 else (1, 0, 2)
                if "no_perm" in skip:
                    pr, pi_ = tr.reshape(shp), ti.reshape(shp)
                else:
                    pr = jnp.transpose(tr.reshape(shp), perm)
                    pi_ = jnp.transpose(ti.reshape(shp), perm)
                if "no_restack" in skip:
                    planes = (pr.reshape(1, q * p * done, tb),
                              pi_.reshape(1, q * p * done, tb))
                else:
                    st = jnp.concatenate(
                        [pr.reshape(1, q * p * done, tb),
                         pi_.reshape(1, q * p * done, tb)], 0)
            else:
                st = y.reshape(2, p * done, tb)
            done *= p
            rest = q
        if planes is not None:
            st = jnp.concatenate(planes, 0)[None].reshape(2, n, tb)
        return st[0], st[1]

    def kernel(xr_ref, xi_ref, *refs):
        yr_ref, yi_ref = refs[-2], refs[-1]
        crefs = refs[:-2]
        if "no_iot" in skip:
            ar, ai = stages(crefs, xr_ref[...], xi_ref[...])
            yr_ref[...] = ar
            yi_ref[...] = ai
        else:
            ar, ai = stages(crefs, jnp.transpose(xr_ref[...]),
                            jnp.transpose(xi_ref[...]))
            yr_ref[...] = jnp.transpose(ar)
            yi_ref[...] = jnp.transpose(ai)

    if "no_iot" in skip:
        data_spec = pl.BlockSpec((n, tb), lambda i: (0, i),
                                 memory_space=pltpu.VMEM)
    else:
        data_spec = pl.BlockSpec((tb, n), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
    const_specs = [pl.BlockSpec(c.shape, lambda i: (0, 0),
                                memory_space=pltpu.VMEM)
                   for c in flat_consts]

    def run(xr, xi):
        if "no_iot" in skip:
            B = xr.shape[1]
            grid = (B // tb,)
            out_shape = [jax.ShapeDtypeStruct((n, B), jnp.float32)] * 2
        else:
            B = xr.shape[0]
            grid = (B // tb,)
            out_shape = [jax.ShapeDtypeStruct((B, n), jnp.float32)] * 2
        fn = pl.pallas_call(
            kernel, grid=grid,
            in_specs=[data_spec, data_spec] + const_specs,
            out_specs=[data_spec, data_spec],
            out_shape=out_shape,
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

    variants = [("prod", ()), ("no_tw", ("no_tw",)),
                ("no_perm", ("no_perm",)), ("no_cross", ("no_cross",)),
                ("f32dot", ("f32dot",)), ("no_iot", ("no_iot",)),
                ("no_restack", ("no_restack",))]
    good = []
    for tag, skip in variants:
        run = make_variant(n, rad, -1, 128, skip=skip, interpret=interp)
        xr = rng.standard_normal((256, n)).astype(np.float32)
        xi = rng.standard_normal((256, n)).astype(np.float32)
        a = (xr.T.copy(), xi.T.copy()) if "no_iot" in skip else (xr, xi)
        try:
            yr, yi = jax.jit(run)(*a)
            if not skip or skip == ("no_iot",):
                y = np.asarray(yr) + 1j * np.asarray(yi)
                if "no_iot" in skip:
                    y = y.T
                ref = np.fft.fft((xr + 1j * xi).astype(np.complex128),
                                 axis=1)
                err = np.max(np.abs(y - ref)) / np.max(np.abs(ref))
                print(f"{tag}: relerr={err:.1e}", flush=True)
                if err > 1e-4:
                    continue
            else:
                print(f"{tag}: compiled (math ablated)", flush=True)
            good.append((tag, skip, run))
        except Exception as e:
            print(f"{tag}: FAIL {str(e)[:160]}", flush=True)
    if interp:
        return

    configs = []
    for tag, skip, run in good:
        for b in (8192, 24576):
            xrb = rng.standard_normal((b, n)).astype(np.float32)
            xib = rng.standard_normal((b, n)).astype(np.float32)
            if "no_iot" in skip:
                xrb, xib = xrb.T.copy(), xib.T.copy()
            configs.append((jax.jit(run),
                            (jnp.asarray(xrb), jnp.asarray(xib))))
    ts = timing.time_chained_multi(configs, k1=4, k2=16, reps=9)
    for i, (tag, skip, _) in enumerate(good):
        s = (ts[2 * i + 1] - ts[2 * i]) / (16384 * n) * 1e12
        print(f"{tag}: {s:.1f} ps/pt", flush=True)


if __name__ == "__main__":
    main()
