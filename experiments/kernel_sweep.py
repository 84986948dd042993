import sys; sys.path.insert(0, "/root/repo")
"""Marginal-slope micro-bench for fused-kernel variants on the real chip.

Measures ps/point between two batch sizes (dispatch floor cancelled), per
CLAUDE.md measurement discipline.  Usage:
    python experiments/kernel_sweep.py baseline
    python experiments/kernel_sweep.py radix 64,16
    python experiments/kernel_sweep.py vmem 4096 67108864
"""
import sys
import numpy as np


def slope_ps_per_point(run, n, b1=2048, b2=6144):
    """Marginal ps/point between batches b1 and b2 via chained timing."""
    import jax, jax.numpy as jnp
    from fftw3_tpu.utils import timing
    ts = {}
    for b in (b1, b2):
        rng = np.random.default_rng(0)
        xr = jnp.asarray(rng.standard_normal((b, n)), jnp.float32)
        xi = jnp.asarray(rng.standard_normal((b, n)), jnp.float32)
        fn = jax.jit(run)
        ts[b] = timing.time_chained(fn, (xr, xi), k1=4, k2=20, reps=5)
    return (ts[b2] - ts[b1]) / ((b2 - b1) * n) * 1e12, ts


def main():
    import jax
    from fftw3_tpu.ops import pallas_stockham as ps

    mode = sys.argv[1] if len(sys.argv) > 1 else "baseline"
    n = int(sys.argv[2]) if len(sys.argv) > 2 and "," not in sys.argv[2] \
        else 1024

    if mode == "baseline":
        for rad in ([32, 32], [64, 16], [16, 64], [128, 8], [256, 4]):
            if int(np.prod(rad)) != n:
                continue
            try:
                apply = ps.build_pallas_c2c_split(
                    {"alg": "pallas", "n": n, "radices": rad}, -1, np.float32)
                s, ts = slope_ps_per_point(apply, n)
                print(f"n={n} radices={rad}: {s:.1f} ps/pt   {ts}")
            except Exception as e:
                print(f"n={n} radices={rad}: FAIL {str(e)[:120]}")
    elif mode == "verify":
        rad = [int(x) for x in sys.argv[2].split(",")]
        n = int(np.prod(rad))
        apply = ps.build_pallas_c2c_split(
            {"alg": "pallas", "n": n, "radices": rad}, -1, np.float32)
        rng = np.random.default_rng(0)
        xr = rng.standard_normal((256, n)).astype(np.float32)
        xi = rng.standard_normal((256, n)).astype(np.float32)
        yr, yi = jax.jit(apply)(xr, xi)
        ref = np.fft.fft((xr + 1j * xi).astype(np.complex128), axis=1)
        err = np.max(np.abs(np.asarray(yr) + 1j * np.asarray(yi) - ref)) \
            / np.max(np.abs(ref))
        print(f"n={n} radices={rad} relerr={err:.2e}")


if __name__ == "__main__":
    main()
