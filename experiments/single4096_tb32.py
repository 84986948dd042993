"""n=4096 single-kernel probe at tb=32/16 (round 4).

The tb=128 and tb=64 two-stage n=4096 schedules crash tpu_compile_helper
(scoped-VMEM class: the (2, 4096, TB) f32 working set plus stage
intermediates).  tb=32 halves the working set again (~1 MB/plane) while
the HBM-side blocks stay full-width (TB rows x 4096 lanes).  If any arm
compiles + verifies, race it against pallas4 with same-session
interleaved marginal slopes (the only decision-grade protocol — see
CLAUDE.md measurement discipline).

Reference role: four-step structure /root/reference/fftw/mpi/dft-rank1.c:20-60.
"""
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from fftw3_tpu.ops import pallas_stockham as ps
from fftw3_tpu.utils import timing

N = 4096


def main():
    print(f"devices: {jax.devices()}", flush=True)
    p4, q4 = ps.choose_fourstep(N)
    fns = {"pallas4": jax.jit(ps.build_pallas_c2c_split_fourstep(
        {"alg": "pallas4", "n": N, "p": p4, "q": q4}, -1, np.float32))}
    arms = {}
    for rad, tb, k2 in (([64, 64], 32, "first"), ([128, 32], 32, "first"),
                        ([64, 64], 16, "first"), ([64, 64], 32, "off")):
        tag = f"single{rad}tb{tb}k2{k2}"
        try:
            fns[tag] = jax.jit(ps.build_pallas_c2c_split(
                {"alg": "pallas", "n": N, "radices": rad, "tile_b": tb,
                 "k2": k2}, -1, np.float32))
            arms[tag] = (rad, tb, k2)
        except Exception as exc:                       # noqa: BLE001
            print(f"{tag}: build FAIL {str(exc)[:120]}", flush=True)

    rng = np.random.default_rng(7)
    vr = rng.standard_normal((128, N)).astype(np.float32)
    vi = rng.standard_normal((128, N)).astype(np.float32)
    ref = np.fft.fft((vr + 1j * vi).astype(np.complex128), axis=1)
    good = []
    for tag, fn in fns.items():
        try:
            yr, yi = fn(vr, vi)
            y = np.asarray(yr) + 1j * np.asarray(yi)
            err = np.max(np.abs(y - ref)) / np.max(np.abs(ref))
            print(f"{tag}: relerr={err:.2e}", flush=True)
            if err < 1e-3:
                good.append(tag)
        except Exception as exc:                       # noqa: BLE001
            print(f"{tag}: verify FAIL {str(exc)[:160]}", flush=True)
    if len(good) < 2:
        print("no surviving single-kernel arm; done", flush=True)
        return

    b_lo, b_hi = 1024, 3072
    configs = []
    for tag in good:
        for b in (b_lo, b_hi):
            xr = jnp.asarray(rng.standard_normal((b, N)), jnp.float32)
            xi = jnp.asarray(rng.standard_normal((b, N)), jnp.float32)
            configs.append((fns[tag], (xr, xi)))
    for rep in range(2):
        ts = timing.time_chained_multi(configs, k1=4, k2=16, reps=7)
        for i, tag in enumerate(good):
            s = (ts[2 * i + 1] - ts[2 * i]) / ((b_hi - b_lo) * N)
            gf = 5 * N * np.log2(N) / (s * 1e9 * N) if s > 0 else float("inf")
            print(f"block{rep} {tag}: {s*1e12:.1f} ps/pt ({gf:.0f} GF marginal)",
                  flush=True)


if __name__ == "__main__":
    main()
