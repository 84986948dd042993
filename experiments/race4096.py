"""n=4096 round-5 race (verdict item 2): land the queued ia4/tb2048 arms
against the cross-session winner (pallas4 tile_b=512), re-race the
(p, q) split under presplit, and PROBE THE READ-SIDE of the four-step's
output transpose.

Block 1 — four-step arms, one interleaved chained race at B=2048:
  tb512 (control) / tb1024 / tb2048 / tb512ia4 / tb1024ia4 /
  tb512r168 / p16q256tb512 / p8q512tb512.

Block 2 — the output-transpose bisect.  The four-step ends with an XLA
swapaxes (B, p, q) -> (B, q, p) (~20 ps/pt attributed round 4, from the
STORE-side postmortem: the fused (g, q, p) store at p=32 measured 187 vs
133 because the out-block lane dim is p=32).  The read-side alternative
is a STANDALONE Pallas transpose kernel whose grid reads natural
(g, p, q) blocks and 2-D-transposes each in VMEM (both measured-legal
ops), paying the narrow-lane cost only on its store.  Arms, dispatched
interleaved at (B, 32, 128) f32 pairs:
  xlaT    — jit swapaxes + reshape (what production pays today)
  palT    — the Pallas per-batch transpose kernel
  noT     — jit reshape only (the zero floor: what deleting the
            transpose would buy)
If palT >= xlaT the read side is dead too (the transpose is already at
bandwidth and no Mosaic form beats XLA's), closing the verdict item with
attribution.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from _race import interleaved_chain_race, make_chain

N = 4096
B = 2048


def make_pallas_transpose(p, q, g, interpret=False):
    """(B, p, q) split pair -> (B, q, p): grid over B/g, in-VMEM 2-D
    transposes, narrow-lane (p) store."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(xr_ref, xi_ref, yr_ref, yi_ref):
        for bi in range(g):                      # unrolled tiny loop
            yr_ref[bi] = jnp.transpose(xr_ref[bi])
            yi_ref[bi] = jnp.transpose(xi_ref[bi])

    in_spec = pl.BlockSpec((g, p, q), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((g, q, p), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    def run(xr, xi):
        Bc = xr.shape[0]
        fn = pl.pallas_call(
            kernel, grid=(Bc // g,),
            in_specs=[in_spec, in_spec],
            out_specs=[out_spec, out_spec],
            out_shape=[jax.ShapeDtypeStruct((Bc, q, p), jnp.float32)] * 2,
            interpret=interpret)
        return fn(xr, xi)

    return run


def main():
    import jax
    import jax.numpy as jnp

    from fftw3_tpu.ops import pallas_stockham as ps
    from fftw3_tpu.utils import timing

    interp = jax.default_backend() != "tpu"
    rng = np.random.default_rng(5)

    descs = {
        "tb512": {"alg": "pallas4", "n": N, "p": 32, "q": 128,
                  "tile_b": 512},
        "tb1024": {"alg": "pallas4", "n": N, "p": 32, "q": 128,
                   "tile_b": 1024},
        "tb2048": {"alg": "pallas4", "n": N, "p": 32, "q": 128,
                   "tile_b": 2048},
        "tb512ia4": {"alg": "pallas4", "n": N, "p": 32, "q": 128,
                     "tile_b": 512, "inner_area": 4 * ps.INNER_AREA},
        "tb1024ia4": {"alg": "pallas4", "n": N, "p": 32, "q": 128,
                      "tile_b": 1024, "inner_area": 4 * ps.INNER_AREA},
        "tb512r168": {"alg": "pallas4", "n": N, "p": 32, "q": 128,
                      "tile_b": 512, "radices": [16, 8]},
        "p16tb512": {"alg": "pallas4", "n": N, "p": 16, "q": 256,
                     "tile_b": 512},
        "p8tb512": {"alg": "pallas4", "n": N, "p": 8, "q": 512,
                    "tile_b": 512},
    }
    fns = {}
    for tag, d in descs.items():
        try:
            fns[tag] = jax.jit(
                ps.build_pallas_c2c_split_fourstep(d, -1, np.float32))
        except Exception as e:                         # noqa: BLE001
            print(f"{tag}: build FAIL {str(e)[:120]}", flush=True)

    vr = rng.standard_normal((256, N)).astype(np.float32)
    vi = rng.standard_normal((256, N)).astype(np.float32)
    ref = np.fft.fft((vr + 1j * vi).astype(np.complex128), axis=1)
    xr = None if interp else jnp.asarray(
        rng.standard_normal((B, N)), jnp.float32)
    xi = None if interp else jnp.asarray(
        rng.standard_normal((B, N)), jnp.float32)

    chains = []
    for tag, fn in fns.items():
        try:
            yr, yi = fn(vr, vi)
            err = np.max(np.abs(np.asarray(yr) + 1j * np.asarray(yi)
                                - ref)) / np.max(np.abs(ref))
            print(f"{tag}: verify {err:.1e}", flush=True)
            if err > 1e-3:
                continue
            if interp:
                continue
            out0 = fn(xr, xi)              # force-compile at timing shape
            timing.sync(out0)
            chains.append((tag, make_chain(fn, out0, timing.sync)))
        except Exception as e:                         # noqa: BLE001
            print(f"{tag}: FAIL {str(e)[:120]}", flush=True)
    if interp:
        print("CPU interpret mode: verify only")
        return

    print(f"== block 1: four-step arms, chained B={B} ==", flush=True)
    res = interleaved_chain_race(chains, k1=4, k2=16, reps=7)
    for tag, sec in sorted(res.items(), key=lambda kv: kv[1]):
        pp = sec / (B * N) * 1e12
        gf = 5.0 * N * np.log2(N) * B / sec / 1e9
        print(f"{tag}: {pp:.1f} ps/pt ({gf:.0f} GFLOPS chained)",
              flush=True)

    # ---- block 2: output-transpose bisect --------------------------------
    p, q = 32, 128
    a3 = jnp.asarray(rng.standard_normal((B, p, q)), jnp.float32)
    b3 = jnp.asarray(rng.standard_normal((B, p, q)), jnp.float32)

    xlaT = jax.jit(lambda a, b: (jnp.swapaxes(a, -1, -2).reshape(B, N),
                                 jnp.swapaxes(b, -1, -2).reshape(B, N)))
    palT = jax.jit(make_pallas_transpose(p, q, g=32))
    noT = jax.jit(lambda a, b: (a.reshape(B, N), b.reshape(B, N)))

    def disp_chain(fn):
        o = fn(a3, b3)
        timing.sync(o)

        def chain(k):
            t0 = time.perf_counter()
            for _ in range(k):
                o = fn(a3, b3)
            timing.sync(o)
            return time.perf_counter() - t0
        return chain

    tchains = []
    for tag, fn in (("xlaT", xlaT), ("palT", palT), ("noT", noT)):
        try:
            tchains.append((tag, disp_chain(fn)))
        except Exception as e:                         # noqa: BLE001
            print(f"{tag}: FAIL {str(e)[:120]}", flush=True)
    print("== block 2: transpose bisect (dispatched) ==", flush=True)
    res2 = interleaved_chain_race(tchains, k1=8, k2=32, reps=7)
    for tag, sec in res2.items():
        print(f"{tag}: {sec/(B*N)*1e12:.1f} ps/pt", flush=True)


if __name__ == "__main__":
    main()
