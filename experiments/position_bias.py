"""Does time_chained_multi have a POSITION bias?

Round-5 anomaly: [8,128] read 25.5 ps/pt as the LAST of four arms
(rev1024.py) and 51.1 as the second of five (asym1024.py) in the same
session — the first same-block-interleaved contradiction on record.  If
chip state ramps within each rep cycle (clock/thermal recovery after
the sync pauses), arms late in the fixed per-rep order would
systematically read faster, biasing EVERY multi-arm race this repo has
run.

Probe: race FOUR IDENTICAL arms (same jitted [32,32] n=1024 kernel,
separate same-shape inputs so the chains are independent) through the
exact race protocol, twice.  Identical arms must read identical slopes;
any monotone spread by position is the bias.

Run ON CHIP: python experiments/position_bias.py
"""
import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from fftw3_tpu.ops import pallas_stockham as ps
from fftw3_tpu.utils import timing

N = 1024
B_LO, B_HI = 8192, 24576


def main():
    print(f"# backend={jax.default_backend()}", file=sys.stderr)
    fn = jax.jit(ps.build_pallas_c2c_split(
        {"alg": "pallas", "n": N, "radices": [32, 32],
         "tile_b": 128, "k2": "first", "gsplit": True},
        -1, np.float32))
    rng = np.random.default_rng(3)
    # pre-compile at both timing batches
    fn(jnp.zeros((B_LO, N), jnp.float32),
       jnp.zeros((B_LO, N), jnp.float32))[0].block_until_ready()
    fn(jnp.zeros((B_HI, N), jnp.float32),
       jnp.zeros((B_HI, N), jnp.float32))[0].block_until_ready()

    configs = []
    for _ in range(4):
        for b in (B_LO, B_HI):
            xr = jnp.asarray(rng.standard_normal((b, N)), jnp.float32)
            xi = jnp.asarray(rng.standard_normal((b, N)), jnp.float32)
            configs.append((fn, (xr, xi)))
    for block in range(2):
        ts = timing.time_chained_multi(configs, k1=4, k2=16, reps=7)
        for i in range(4):
            s = (ts[2 * i + 1] - ts[2 * i]) / ((B_HI - B_LO) * N)
            print(f"block{block} position{i}: {s*1e12:.1f} ps/pt")


if __name__ == "__main__":
    main()
