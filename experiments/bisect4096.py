"""Bisect WHAT in the n=4096 single-kernel crashes Mosaic (round 4).

Every n=4096 arm crashes tpu_compile_helper (tb=128/64/32/16, MXU or
all-VPU, k2 on/off) while n=2048 tb=128 compiles — so the crash is
structural, not bytes or the precision machinery.  Build the kernel up
op-by-op on (tb, 4096) blocks and find the first op that kills the
compiler.
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
        print(f"{tag}: FAIL {str(exc)[:90]}", flush=True)
        return False


def k_identity(xr, xi, yr, yi):
    yr[...] = xr[...]
    yi[...] = xi[...]


def k_transpose(xr, xi, yr, yi):
    yr[...] = jnp.transpose(jnp.transpose(xr[...]))
    yi[...] = jnp.transpose(jnp.transpose(xi[...]))


def k_stage1(n, tb, p, xr, xi, G, yr, yi):
    # first stage shape flow only, f32 HIGHEST matmul, no twiddle
    a = jnp.transpose(xr[...])          # (n, tb)
    b = jnp.transpose(xi[...])
    st = jnp.concatenate([a[None], b[None]], 0)     # (2, n, tb)
    q = n // p
    M = q * tb
    y = jnp.dot(G[...], st.reshape(2 * p, M),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)  # (2p, M)
    st2 = y.reshape(2, p * q, tb)
    yr[...] = jnp.transpose(st2[0])
    yi[...] = jnp.transpose(st2[1])


def k_stage1_tw_perm(n, tb, p, xr, xi, G, wr_, wi_, yr, yi):
    a = jnp.transpose(xr[...])
    b = jnp.transpose(xi[...])
    st = jnp.concatenate([a[None], b[None]], 0)
    q = n // p
    M = q * tb
    y = jnp.dot(G[...], st.reshape(2 * p, M),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
    sh = (p, q, 1)
    wr = wr_[...].reshape(sh)
    wi = wi_[...].reshape(sh)
    y3 = y.reshape(2, p, q, tb)
    tr = y3[0] * wr - y3[1] * wi
    ti = y3[0] * wi + y3[1] * wr
    yv = jnp.concatenate([tr[None], ti[None]], 0)
    st2 = jnp.transpose(yv, (0, 2, 1, 3)).reshape(2, q * p, tb)
    yr[...] = jnp.transpose(st2[0])
    yi[...] = jnp.transpose(st2[1])


def gmat(p):
    F = matrices.dft_matrix(p, -1)
    return np.block([[F.real, -F.imag],
                     [F.imag, F.real]]).astype(np.float32)


def twid(n, p):
    q = n // p
    e = np.mod(np.outer(np.arange(p), np.arange(q)), n)
    w = np.exp(-2j * np.pi * e / n)
    return (np.ascontiguousarray(w.real, np.float32),
            np.ascontiguousarray(w.imag, np.float32))


def main():
    print(f"devices: {jax.devices()}", flush=True)
    n, tb = 4096, 32
    run_case("identity(32,4096)", k_identity, n, tb)
    run_case("transpose(4096,32)", k_transpose, n, tb)
    p = 64
    run_case("stage1 p=64 f32 matmul",
             functools.partial(k_stage1, n, tb, p), n, tb,
             consts=(gmat(p),))
    wr, wi = twid(n, p)
    run_case("stage1+tw+permute p=64",
             functools.partial(k_stage1_tw_perm, n, tb, p), n, tb,
             consts=(gmat(p), wr, wi))
    # control: identical flow at n=2048 (known-good size)
    n2, p2 = 2048, 128
    run_case("CONTROL n=2048 stage1 p=128",
             functools.partial(k_stage1, n2, tb, p2), n2, tb,
             consts=(gmat(p2),))


if __name__ == "__main__":
    main()
