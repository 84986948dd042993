"""Stacked split-complex Stockham kernel: the complex stage matmul as ONE
real (2p, 2p) contraction over stacked (re, im) planes.

Y = [[Fr, -Fi], [Fi, Fr]] @ [ar; ai]  — schoolbook complex product as a
single block matrix.  With bf16 hi/lo: hh pass (K=2p) + fused cross pass
(K=4p) = 2 MXU passes per stage, vs 6 for Karatsuba-k2.  At p=32 the cross
pass K=128 exactly fills the MXU.

Usage: python experiments/stacked_kernel.py [n] [b1] [b2]
"""
import sys

sys.path.insert(0, "/root/repo")
from functools import partial

import numpy as np


def make_stacked(n, radices, sign, tb, flat_tw=True, interpret=False):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from fftw3_tpu.ops import matrices

    flat_consts = []
    metas = []
    rest = n
    first = True
    for p in radices:
        q = rest // p
        F = matrices.dft_matrix(p, sign)
        Fr = np.ascontiguousarray(F.real)
        Fi = np.ascontiguousarray(F.imag)
        G = np.block([[Fr, -Fi], [Fi, Fr]])          # (2p, 2p)
        flat_consts.append(np.ascontiguousarray(G, np.float32))
        if q > 1:
            e = np.mod(np.outer(np.arange(p, dtype=np.int64),
                                np.arange(q, dtype=np.int64)), rest)
            w = np.exp(sign * 2j * np.pi * e / rest)
            wr = np.ascontiguousarray(w.real, np.float32)
            wi = np.ascontiguousarray(w.imag, np.float32)
            if flat_tw and first:
                wr = np.ascontiguousarray(
                    np.repeat(wr[:, :, None], tb, 2).reshape(p, q * tb))
                wi = np.ascontiguousarray(
                    np.repeat(wi[:, :, None], tb, 2).reshape(p, q * tb))
            flat_consts += [wr, wi]
        metas.append((p, q))
        rest = q
        first = False

    def gmm(G, X):
        """bf16 hh + fused-cross: 2 MXU passes."""
        Gh = G.astype(jnp.bfloat16)
        Gl = (G - Gh.astype(jnp.float32)).astype(jnp.bfloat16)
        Xh = X.astype(jnp.bfloat16)
        Xl = (X - Xh.astype(jnp.float32)).astype(jnp.bfloat16)

        def d(a, b):
            return jnp.dot(a, b, preferred_element_type=jnp.float32)
        GG = jnp.concatenate([Gh, Gl], axis=1)
        XX = jnp.concatenate([Xl, Xh], axis=0)
        return d(Gh, Xh) + d(GG, XX)

    def kernel(*refs):
        xr_ref, xi_ref = refs[0], refs[1]
        yr_ref, yi_ref = refs[-2], refs[-1]
        crefs = refs[2:-2]
        ar = jnp.transpose(xr_ref[...])              # (n, tb)
        ai = jnp.transpose(xi_ref[...])
        st = jnp.concatenate([ar[None], ai[None]], 0)   # (2, n, tb)
        done = 1
        ci = 0
        for (p, q) in metas:
            M = q * done * tb
            G = crefs[ci][...]
            ci += 1
            y = gmm(G, st.reshape(2 * p, M))         # (2p, M)
            if q > 1:
                if done == 1 and flat_tw:
                    wr = crefs[ci][...]
                    wi = crefs[ci + 1][...]
                    ci += 2
                    y3 = y.reshape(2, p, M)
                    tr = y3[0] * wr - y3[1] * wi
                    ti = y3[0] * wi + y3[1] * wr
                    y = jnp.concatenate([tr[None], ti[None]], 0)
                    y = y.reshape(2, p, q, tb)
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
                st = y.reshape(2, p * done, tb)      # p-major: final order
            done *= p
        yr_ref[...] = jnp.transpose(st[0])
        yi_ref[...] = jnp.transpose(st[1])

    data_spec = pl.BlockSpec((tb, n), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    const_specs = [pl.BlockSpec(c.shape, (lambda nd: lambda i: (0,) * nd)(
        c.ndim), memory_space=pltpu.VMEM) for c in flat_consts]

    def run(xr, xi):
        B = xr.shape[0]
        fn = pl.pallas_call(
            kernel,
            grid=(B // tb,),
            in_specs=[data_spec, data_spec] + const_specs,
            out_specs=[data_spec, data_spec],
            out_shape=[jax.ShapeDtypeStruct((B, n), jnp.float32)] * 2,
            interpret=interpret,
        )
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

    def check(run, tag):
        xr = rng.standard_normal((256, n)).astype(np.float32)
        xi = rng.standard_normal((256, n)).astype(np.float32)
        try:
            yr, yi = jax.jit(run)(xr, xi)
            ref = np.fft.fft((xr + 1j * xi).astype(np.complex128), axis=1)
            err = np.max(np.abs(np.asarray(yr) + 1j * np.asarray(yi) - ref)
                         ) / np.max(np.abs(ref))
            if interp:
                print(f"{tag}: relerr={err:.1e}")
                return
            ts = {}
            for b in (8192, 24576):
                xrb = jnp.asarray(rng.standard_normal((b, n)), jnp.float32)
                xib = jnp.asarray(rng.standard_normal((b, n)), jnp.float32)
                ts[b] = timing.time_chained(jax.jit(run), (xrb, xib),
                                            k1=4, k2=16, reps=7)
            s = (ts[24576] - ts[8192]) / (16384 * n) * 1e12
            print(f"{tag}: {s:.1f} ps/pt relerr={err:.1e}", flush=True)
        except Exception as e:
            print(f"{tag}: FAIL {str(e)[:160]}", flush=True)

    check(make_stacked(n, rad, -1, 128, interpret=interp),
          f"stacked n={n} r{rad}")
    # current production kernel in the SAME session for an honest A/B
    prod = ps.build_pallas_c2c_split(
        {"alg": "pallas", "n": n, "radices": rad}, -1, np.float32)
    check(prod, f"prod n={n}")
    check(make_stacked(n, rad, -1, 128, interpret=interp),
          f"stacked2 n={n}")


if __name__ == "__main__":
    main()
