"""Nail down the [8,128] asymmetric-split headline win (rev1024 found
25.5 ps/pt vs [32,32]'s 43.7, same interleaved block).

Mechanism hypothesis: the kernel is VMEM-sweep-bound (twiddle + permute
+ casts cost ~2.7 ps/sweep; MXU MACs < 1 ps/pt), so the optimum wants
the FEWEST twiddle/permute sweeps and the LARGEST dense final stage the
MXU will absorb — [small p, huge q]: one twiddled stage + one dense
matmul stage.  choose_radices/alternative_radices cap radices at 64
(MAX_RADIX, a cost-model assumption), so this family was never raced.
n=256's single-stage [256] winner is the limit case of the same law.

Arms at n=1024, every arm verified vs numpy at 256 rows AND at the low
timing batch (8192 — shape-specialized executables), interleaved
marginal slopes + a chained number per arm at B=16384:

  [32,32]   presplit control (standing winner)
  [8,128]   the rev1024 discovery
  [4,256]   push the dense stage to 256 (256 MACs/pt, still cheap)
  [2,512]   G presplit operands (1024, 2048) bf16 = 4 MB — VMEM gamble
  [16,64]   the p<q member inside the old cap (lost rev1024: 50.4)
  [128,8]   reversed — big stage FIRST (carries the flat twiddle)

Run ON CHIP: python experiments/asym1024.py
"""
import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from fftw3_tpu.ops import pallas_stockham as ps
from fftw3_tpu.utils import timing

N = 1024
ARMS = [[32, 32], [8, 128], [4, 256], [2, 512], [16, 64], [128, 8]]
B_LO, B_HI = 8192, 24576
B_CHAIN = 16384


def main():
    print(f"# backend={jax.default_backend()}", file=sys.stderr)
    rng = np.random.default_rng(3)
    vr = rng.standard_normal((256, N)).astype(np.float32)
    vi = rng.standard_normal((256, N)).astype(np.float32)
    ref = np.fft.fft((vr + 1j * vi).astype(np.complex128), axis=1)

    good = []
    for rad in ARMS:
        tag = str(rad)
        try:
            fn = jax.jit(ps.build_pallas_c2c_split(
                {"alg": "pallas", "n": N, "radices": rad,
                 "tile_b": 128, "k2": "first", "gsplit": True},
                -1, np.float32))
            yr, yi = fn(vr, vi)
            err = float(np.max(np.abs(
                (np.asarray(yr) + 1j * np.asarray(yi)) - ref))
                / np.max(np.abs(ref)))
            # verify AT a timing batch too: executables are shape-
            # specialized, so correctness at 256 does not carry
            xr = rng.standard_normal((B_LO, N)).astype(np.float32)
            xi = rng.standard_normal((B_LO, N)).astype(np.float32)
            yr2, yi2 = fn(xr, xi)
            ref2 = np.fft.fft((xr[:64] + 1j * xi[:64])
                              .astype(np.complex128), axis=1)
            err2 = float(np.max(np.abs(
                (np.asarray(yr2[:64]) + 1j * np.asarray(yi2[:64]))
                - ref2)) / np.max(np.abs(ref2)))
            print(f"# {tag}: relerr={err:.1e} @256, {err2:.1e} @{B_LO}",
                  file=sys.stderr)
            if max(err, err2) < 1e-4:
                fn(jnp.zeros((B_HI, N), jnp.float32),
                   jnp.zeros((B_HI, N), jnp.float32))[0].block_until_ready()
                fn(jnp.zeros((B_CHAIN, N), jnp.float32),
                   jnp.zeros((B_CHAIN, N), jnp.float32))[0].block_until_ready()
                good.append((tag, fn))
        except Exception as exc:                       # noqa: BLE001
            print(f"# {tag}: FAIL {str(exc)[:140]}", file=sys.stderr)

    if len(good) < 2:
        print("# fewer than 2 arms; no race", file=sys.stderr)
        return
    rng2 = np.random.default_rng(4)
    configs = []
    for tag, fn in good:
        for b in (B_LO, B_HI):
            xr = jnp.asarray(rng2.standard_normal((b, N)), jnp.float32)
            xi = jnp.asarray(rng2.standard_normal((b, N)), jnp.float32)
            configs.append((fn, (xr, xi)))
    ts = timing.time_chained_multi(configs, k1=4, k2=16, reps=7)
    for i, (tag, _) in enumerate(good):
        s = (ts[2 * i + 1] - ts[2 * i]) / ((B_HI - B_LO) * N)
        print(f"{tag}: slope {s*1e12:.1f} ps/pt")

    # chained block (the driver metric's protocol) at B_CHAIN
    configs2 = []
    for tag, fn in good:
        xr = jnp.asarray(rng2.standard_normal((B_CHAIN, N)), jnp.float32)
        xi = jnp.asarray(rng2.standard_normal((B_CHAIN, N)), jnp.float32)
        configs2.append((fn, (xr, xi)))
    ts2 = timing.time_chained_multi(configs2, k1=4, k2=16, reps=5)
    flops = 5.0 * N * np.log2(N) * B_CHAIN
    for (tag, _), t in zip(good, ts2):
        print(f"{tag}: chained {t/(B_CHAIN*N)*1e12:.1f} ps/pt  "
              f"{flops/t/1e9:.0f} GFLOPS")


if __name__ == "__main__":
    main()
