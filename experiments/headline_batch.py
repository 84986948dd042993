"""Is the headline's marginal-vs-chained gap (34.7 vs 44.1 ps/pt) fixed
per-call overhead (amortizable by batch) or HBM-pressure nonlinearity?

Chained ps/pt at B in {16384, 65536, 131072} for the ps[32,32] kernel;
if it falls with B, raise the headline config batch.
"""
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from fftw3_tpu.ops import pallas_stockham as ps
from fftw3_tpu.utils import timing


def main():
    n = 1024
    print(f"devices: {jax.devices()}", flush=True)
    fn = jax.jit(ps.build_pallas_c2c_split(
        {"alg": "pallas", "n": n, "radices": [32, 32], "gsplit": True,
         "k2": "first"}, -1, np.float32))
    rng = np.random.default_rng(1)
    vr = rng.standard_normal((128, n)).astype(np.float32)
    vi = rng.standard_normal((128, n)).astype(np.float32)
    ref = np.fft.fft((vr + 1j * vi).astype(np.complex128), axis=1)
    yr, yi = fn(vr, vi)
    err = np.max(np.abs(np.asarray(yr) + 1j * np.asarray(yi) - ref)
                 ) / np.max(np.abs(ref))
    print(f"relerr={err:.1e}", flush=True)
    for rep in range(2):
        for B in (16384, 65536, 131072):
            xr = jnp.asarray(rng.standard_normal((B, n)), jnp.float32)
            xi = jnp.asarray(rng.standard_normal((B, n)), jnp.float32)
            t = min(timing.time_chained(fn, (xr, xi)),
                    timing.time_chained(fn, (xr, xi)))
            print(f"rep{rep} B={B}: {t*1e12/(B*n):.1f} ps/pt "
                  f"({5*np.log2(n)/(t/B/n)/1e9:.0f} GFLOPS)", flush=True)


if __name__ == "__main__":
    main()
