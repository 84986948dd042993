"""Attribute the swapped-r2c loss (288 vs 601 GFLOPS): time each stage
of the composition separately at (8, 2048, 2048)."""
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from fftw3_tpu.ops import pallas_stockham as ps
from fftw3_tpu.utils import timing

N, B = 2048, 8
M = N // 2


def main():
    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, N, N)), jnp.float32)
    xr = jnp.asarray(rng.standard_normal((B, M + 1, N)), jnp.float32)
    xi = jnp.asarray(rng.standard_normal((B, M + 1, N)), jnp.float32)

    inner = jax.jit(ps.build_pallas_r2c_inner(
        {"alg": "pallas_r2c_inner", "n": N}, np.float32))
    c2c = ps.build_pallas_c2c_split(
        {"alg": "pallas", "n": N, "radices": [128, 16]}, -1, np.float32)

    @jax.jit
    def c2c_pass(ar, ai):
        br = ar.reshape(B * (M + 1), N)
        bi = ai.reshape(B * (M + 1), N)
        yr, yi = c2c(br, bi)
        return yr.reshape(ar.shape), yi.reshape(ai.shape)

    @jax.jit
    def epilogue(ar, ai):
        C = ar + 1j * ai
        D = jnp.roll(jnp.flip(C, axis=-1), 1, axis=-1)[..., :M + 1]
        top = C[..., :, :M + 1]
        bot = jnp.conj(jnp.flip(D[..., 1:M, :], axis=-2))
        out = jnp.concatenate([top, bot], axis=-2)
        return jnp.real(out), jnp.imag(out)

    # also: epilogue in split-real form (no complex intermediates)
    @jax.jit
    def epilogue_split(ar, ai):
        dr = jnp.roll(jnp.flip(ar, axis=-1), 1, axis=-1)[..., :M + 1]
        di = jnp.roll(jnp.flip(ai, axis=-1), 1, axis=-1)[..., :M + 1]
        br = jnp.flip(dr[..., 1:M, :], axis=-2)
        bi = -jnp.flip(di[..., 1:M, :], axis=-2)
        return (jnp.concatenate([ar[..., :, :M + 1], br], axis=-2),
                jnp.concatenate([ai[..., :, :M + 1], bi], axis=-2))

    for tag, fn, args in (
            ("inner_r2c", inner, (x,)),
            ("c2c_pass", c2c_pass, (xr, xi)),
            ("epilogue", epilogue, (xr, xi)),
            ("epilogue_split", epilogue_split, (xr, xi))):
        try:
            t = min(timing.time_dispatched(fn, args),
                    timing.time_dispatched(fn, args))
            print(f"{tag}: {t*1e6:.0f} us", flush=True)
        except Exception as exc:                       # noqa: BLE001
            print(f"{tag}: FAIL {str(exc)[:110]}", flush=True)


if __name__ == "__main__":
    main()
