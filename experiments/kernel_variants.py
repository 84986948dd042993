"""Fused-kernel variants for on-chip A/B (marginal-slope) measurement.

Variants over the round-1 baseline (ops/pallas_stockham.py):
  tw=bcast   stage twiddle as (p,q,1[,1]) VPU broadcast     (baseline)
  tw=lanes   twiddle pre-broadcast on host to (p, q, TB)    (no broadcast)
  tw=flat    twiddle as (p, q*TB) constant on the 2-D view  (pure 2-D mul)
  fsplit     F matrices pre-split hi/lo bf16 on the host
  xsplit1    split x into hi/lo ONCE per stage input (not per product)
  tb=N       lane tile

Usage: python experiments/kernel_variants.py [n]
"""
import sys

sys.path.insert(0, "/root/repo")
import math
from functools import partial

import numpy as np


def make_variant(n, radices, sign, tb, tw="bcast", fsplit=False,
                 vmem_mb=None, diag=None, k2=False):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from fftw3_tpu.ops import matrices

    # ---- host constants ----
    flat_consts = []
    specs_shapes = []
    rest = n
    metas = []
    for p in radices:
        q = rest // p
        F = matrices.dft_matrix(p, sign)
        if fsplit:
            Fr = np.ascontiguousarray(F.real, np.float32)
            Fi = np.ascontiguousarray(F.imag, np.float32)
            for M in (Fr, Fi, Fr + Fi):
                hi = M.astype(np.float32).astype(jnp.bfloat16)
                lo = (M - np.asarray(hi, np.float32)).astype(jnp.bfloat16)
                flat_consts += [np.asarray(hi), np.asarray(lo)]
        else:
            flat_consts += [np.ascontiguousarray(F.real, np.float32),
                            np.ascontiguousarray(F.imag, np.float32)]
        if q > 1:
            e = np.mod(np.outer(np.arange(p, dtype=np.int64),
                                np.arange(q, dtype=np.int64)), rest)
            w = np.exp(sign * 2j * np.pi * e / rest)
            wr = np.ascontiguousarray(w.real, np.float32)
            wi = np.ascontiguousarray(w.imag, np.float32)
            if tw == "lanes":
                wr = np.repeat(wr[:, :, None], tb, axis=2)
                wi = np.repeat(wi[:, :, None], tb, axis=2)
            elif tw == "flat":
                wr = np.repeat(wr[:, :, None], tb, axis=2).reshape(p, q * tb)
                wi = np.repeat(wi[:, :, None], tb, axis=2).reshape(p, q * tb)
            flat_consts += [wr, wi]
        metas.append((p, q))
        rest = q

    def mm_pair(crefs, ci, ar, ai):
        """Karatsuba with either in-kernel or host-pre-split bf16."""
        if fsplit:
            Frh, Frl = crefs[ci][...], crefs[ci + 1][...]
            Fih, Fil = crefs[ci + 2][...], crefs[ci + 3][...]
            Fsh, Fsl = crefs[ci + 4][...], crefs[ci + 5][...]
            nci = ci + 6

            def d(a, b):
                return jnp.dot(a, b, preferred_element_type=jnp.float32)

            def mmx(Fh, Fl, x):
                xh = x.astype(jnp.bfloat16)
                xl = (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)
                return d(Fh, xh) + (d(Fh, xl) + d(Fl, xh))
            t1 = mmx(Frh, Frl, ar)
            t2 = mmx(Fih, Fil, ai)
            t3 = mmx(Fsh, Fsl, ar + ai)
            return nci, t1 - t2, t3 - t1 - t2
        Fr = crefs[ci][...]
        Fi = crefs[ci + 1][...]
        nci = ci + 2

        def d(a, b):
            return jnp.dot(a, b, preferred_element_type=jnp.float32)

        def mmx(F, x):
            Fh = F.astype(jnp.bfloat16)
            Fl = (F - Fh.astype(jnp.float32)).astype(jnp.bfloat16)
            xh = x.astype(jnp.bfloat16)
            xl = (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)
            if k2:
                # cross terms Fh@xl + Fl@xh as ONE K=2p matmul
                FF = jnp.concatenate([Fh, Fl], axis=1)
                XX = jnp.concatenate([xl, xh], axis=0)
                return d(Fh, xh) + d(FF, XX)
            return d(Fh, xh) + (d(Fh, xl) + d(Fl, xh))
        t1 = mmx(Fr, ar)
        t2 = mmx(Fi, ai)
        t3 = mmx(Fr + Fi, ar + ai)
        return nci, t1 - t2, t3 - t1 - t2

    def kernel(*refs):
        xr_ref, xi_ref = refs[0], refs[1]
        yr_ref, yi_ref = refs[-2], refs[-1]
        crefs = refs[2:-2]
        if diag == "copy":                  # pure load/transpose/store floor
            yr_ref[...] = jnp.transpose(jnp.transpose(xr_ref[...]))
            yi_ref[...] = jnp.transpose(jnp.transpose(xi_ref[...]))
            return
        ar = jnp.transpose(xr_ref[...])
        ai = jnp.transpose(xi_ref[...])
        done = 1
        ci = 0
        for (p, q) in metas:
            a2r = ar.reshape(p, q * done * tb)
            a2i = ai.reshape(p, q * done * tb)
            ci, yr, yi = mm_pair(crefs, ci, a2r, a2i)
            if q > 1 and diag in ("notw", "noperm-notw"):
                yr = yr.reshape(p, q, tb) if done == 1 else \
                    yr.reshape(p, q, done, tb)
                yi = yi.reshape(p, q, tb) if done == 1 else \
                    yi.reshape(p, q, done, tb)
            elif q > 1:
                if tw == "flat" and done == 1:
                    wr = crefs[ci][...]
                    wi = crefs[ci + 1][...]
                    ci += 2
                    yr, yi = yr * wr - yi * wi, yr * wi + yi * wr
                    yr = yr.reshape(p, q, tb)
                    yi = yi.reshape(p, q, tb)
                elif tw == "lanes" and done == 1:
                    wr = crefs[ci][...]
                    wi = crefs[ci + 1][...]
                    ci += 2
                    yr = yr.reshape(p, q, tb)
                    yi = yi.reshape(p, q, tb)
                    yr, yi = yr * wr - yi * wi, yr * wi + yi * wr
                else:
                    yr = yr.reshape(p, q, done, tb) if done > 1 else \
                        yr.reshape(p, q, tb)
                    yi = yi.reshape(p, q, done, tb) if done > 1 else \
                        yi.reshape(p, q, tb)
                    sh = (p, q) + ((1, 1) if done > 1 else (1,))
                    wr = crefs[ci][...].reshape(sh)
                    wi = crefs[ci + 1][...].reshape(sh)
                    ci += 2
                    yr, yi = yr * wr - yi * wi, yr * wi + yi * wr
                pass
            if q > 1:
                if diag in ("noperm", "noperm-notw"):
                    ar = yr.reshape(q, p * done, tb)   # WRONG math: timing only
                    ai = yi.reshape(q, p * done, tb)
                elif done == 1:
                    ar = jnp.transpose(yr, (1, 0, 2))
                    ai = jnp.transpose(yi, (1, 0, 2))
                else:
                    ar = jnp.transpose(yr, (1, 0, 2, 3)).reshape(
                        q, p * done, tb)
                    ai = jnp.transpose(yi, (1, 0, 2, 3)).reshape(
                        q, p * done, tb)
            else:
                # last stage (q == 1): index k_done + done*k1 -> p-major
                ar = yr.reshape(p * done, tb)
                ai = yi.reshape(p * done, tb)
            done *= p
        ar = ar.reshape(n, tb)
        ai = ai.reshape(n, tb)
        yr_ref[...] = jnp.transpose(ar)
        yi_ref[...] = jnp.transpose(ai)

    data_spec = pl.BlockSpec((tb, n), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    const_specs = [pl.BlockSpec(c.shape, (lambda nd: lambda i: (0,) * nd)(
        c.ndim), memory_space=pltpu.VMEM) for c in flat_consts]
    params = {}
    if vmem_mb:
        params["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb << 20)

    def run(xr, xi):
        B = xr.shape[0]
        fn = pl.pallas_call(
            kernel,
            grid=(B // tb,),
            in_specs=[data_spec, data_spec] + const_specs,
            out_specs=[data_spec, data_spec],
            out_shape=[jax.ShapeDtypeStruct((B, n), jnp.float32)] * 2,
            **params,
        )
        return fn(xr, xi, *flat_consts)

    return run


def check_and_time(name, run, n, b1=8192, b2=24576):
    import jax
    import jax.numpy as jnp

    from fftw3_tpu.utils import timing

    rng = np.random.default_rng(0)
    xr = rng.standard_normal((256, n)).astype(np.float32)
    xi = rng.standard_normal((256, n)).astype(np.float32)
    skip_check = "diag" in name
    try:
        yr, yi = jax.jit(run)(xr, xi)
        ref = np.fft.fft((xr + 1j * xi).astype(np.complex128), axis=1)
        err = np.max(np.abs(np.asarray(yr) + 1j * np.asarray(yi) - ref)) \
            / np.max(np.abs(ref))
        if not err < 1e-3 and not skip_check:
            print(f"{name}: WRONG relerr={err:.2e}")
            return
        ts = {}
        for b in (b1, b2):
            xrb = jnp.asarray(rng.standard_normal((b, n)), jnp.float32)
            xib = jnp.asarray(rng.standard_normal((b, n)), jnp.float32)
            ts[b] = timing.time_chained(jax.jit(run), (xrb, xib),
                                        k1=4, k2=16, reps=7)
        s = (ts[b2] - ts[b1]) / ((b2 - b1) * n) * 1e12
        print(f"{name}: {s:.1f} ps/pt  relerr={err:.1e}  "
              f"t8k={ts[b1]*1e6:.0f}us t24k={ts[b2]*1e6:.0f}us", flush=True)
    except Exception as e:
        print(f"{name}: FAIL {str(e)[:160]}")


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    rad = [32, 32] if n == 1024 else None
    if rad is None:
        from fftw3_tpu.ops import pallas_stockham as ps
        rad = ps.choose_radices(n)
    all_variants = {
        "baseline": dict(),
        "lanes": dict(tw="lanes"),
        "flat": dict(tw="flat"),
        "fsplit": dict(fsplit=True),
        "flat+fsplit": dict(tw="flat", fsplit=True),
        "lanes+fsplit": dict(tw="lanes", fsplit=True),
        "tb256": dict(tb=256),
        "tb256+flat": dict(tb=256, tw="flat"),
        "vmem100": dict(vmem_mb=100),
        "flat+vmem100": dict(tw="flat", vmem_mb=100),
        "k2": dict(k2=True),
        "flat+k2": dict(tw="flat", k2=True),
        "diag-copy": dict(diag="copy"),
        "diag-notw": dict(diag="notw"),
        "diag-noperm": dict(tw="flat", diag="noperm"),
        "diag-noperm-notw": dict(diag="noperm-notw"),
    }
    which = sys.argv[2].split(",") if len(sys.argv) > 2 else \
        ["baseline", "lanes", "flat", "flat+fsplit", "tb256+flat"]
    for name in which:
        kw = dict(all_variants[name])
        tb = kw.pop("tb", 128)
        run = make_variant(n, rad, -1, tb, **kw)
        check_and_time(f"n={n} r{rad} tb={tb} {name}", run, n)


if __name__ == "__main__":
    main()
