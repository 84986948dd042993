"""Bisect round 2: is the crash the narrow lane tile or the matmul form?

Round 1: identity and transpose at (32, 4096) compile; ANY stage-1
matmul at tb=32 crashes — including the n=2048 control that works in
production at tb=128.  So test the matmul form (HIGHEST vs presplit
bf16) x lane tile (32 vs 128) x n (2048 vs 4096) grid.
"""
import sys

sys.path.insert(0, "/root/repo")

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fftw3_tpu.ops import matrices


def run_case(tag, kernel, n, tb, consts=()):
    data_spec = pl.BlockSpec((tb, n), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    const_specs = [pl.BlockSpec(c.shape, lambda i: (0, 0),
                                memory_space=pltpu.VMEM) for c in consts]
    fn = pl.pallas_call(
        kernel,
        grid=(2,),
        in_specs=[data_spec, data_spec] + const_specs,
        out_specs=[data_spec, data_spec],
        out_shape=[jax.ShapeDtypeStruct((2 * tb, n), jnp.float32)] * 2,
    )
    x = np.random.default_rng(0).standard_normal((2 * tb, n)).astype(
        np.float32)
    try:
        yr, yi = jax.jit(lambda a, b: fn(a, b, *consts))(x, x)
        np.asarray(yr)
        print(f"{tag}: OK", flush=True)
        return True
    except Exception as exc:                           # noqa: BLE001
        print(f"{tag}: FAIL {str(exc)[:80]}", flush=True)
        return False


def k_stage1(n, tb, p, mm, xr, xi, *refs):
    yr, yi = refs[-2], refs[-1]
    a = jnp.transpose(xr[...])          # (n, tb)
    b = jnp.transpose(xi[...])
    st = jnp.concatenate([a[None], b[None]], 0)     # (2, n, tb)
    q = n // p
    M = q * tb
    X = st.reshape(2 * p, M)
    if mm == "highest":
        G = refs[0][...]
        y = jnp.dot(G, X, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    elif mm == "ps":                    # presplit bf16 hi/lo, 3-pass
        Gh = refs[0][...]
        Gl = refs[1][...]
        Xh = X.astype(jnp.bfloat16)
        Xl = (X - Xh.astype(jnp.float32)).astype(jnp.bfloat16)

        def d(u, v):
            return jnp.dot(u, v, preferred_element_type=jnp.float32)
        y = d(Gh, Xh) + (d(Gh, Xl) + d(Gl, Xh))
    else:                               # plain bf16 single pass
        Gh = refs[0][...]
        y = jnp.dot(Gh, X.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
    st2 = y.reshape(2, n, tb)
    yr[...] = jnp.transpose(st2[0])
    yi[...] = jnp.transpose(st2[1])


def gmats(p):
    F = matrices.dft_matrix(p, -1)
    G = np.block([[F.real, -F.imag],
                  [F.imag, F.real]]).astype(np.float32)
    Gh = np.ascontiguousarray(G.astype(jnp.bfloat16))
    Gl = np.ascontiguousarray(
        (G - Gh.astype(np.float32)).astype(jnp.bfloat16))
    return G, Gh, Gl


def main():
    print(f"devices: {jax.devices()}", flush=True)
    cases = [
        # (n, tb, p, mm)
        (2048, 128, 128, "highest"),   # prod size, HIGHEST form
        (2048, 32, 128, "ps"),         # narrow tb, presplit form
        (2048, 32, 128, "bf16"),       # narrow tb, plain bf16
        (4096, 128, 64, "ps"),         # big n, full tb, presplit
        (4096, 32, 64, "bf16"),        # big n, narrow tb, plain bf16
    ]
    for n, tb, p, mm in cases:
        G, Gh, Gl = gmats(p)
        consts = {"highest": (G,), "ps": (Gh, Gl), "bf16": (Gh,)}[mm]
        run_case(f"n={n} tb={tb} p={p} {mm}",
                 functools.partial(k_stage1, n, tb, p, mm), n, tb,
                 consts=consts)


if __name__ == "__main__":
    main()
