"""Round-4 second-half race (same-session interleaved slopes).

1. pallas4 outer-tile variants at n=4096 (tb 128/512/1024, [16,8] outer)
2. fused-r2c merged two-real-pipeline vs prod at n=2048
3. K2_MAX_BYTES lift at n=2048 (presplit freed the concat-of-casts VMEM)
4. inner-kernel [128,16] at n=2048 (INNER_NP_MAX probe under presplit)
"""
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from fftw3_tpu.ops import pallas_stockham as ps
from fftw3_tpu.utils import timing


def slopes_race(tag2fn, shape_lo, shape_hi, npts, reps=7, planes=2):
    """Interleaved marginal slopes; returns {tag: ps/pt}."""
    rng = np.random.default_rng(17)
    configs = []
    tags = list(tag2fn)
    for tag in tags:
        for shp in (shape_lo, shape_hi):
            args = tuple(jnp.asarray(rng.standard_normal(shp), jnp.float32)
                         for _ in range(planes))
            configs.append((tag2fn[tag], args))
    ts = timing.time_chained_multi(configs, k1=4, k2=16, reps=reps)
    out = {}
    for i, tag in enumerate(tags):
        out[tag] = (ts[2 * i + 1] - ts[2 * i]) / npts
    return out


def sec1_pallas4():
    n = 4096
    p4, q4 = ps.choose_fourstep(n)
    descs = {"pallas4": {"alg": "pallas4", "n": n, "p": p4, "q": q4},
             "tb512": {"alg": "pallas4", "n": n, "p": p4, "q": q4,
                       "tile_b": 512},
             "tb1024": {"alg": "pallas4", "n": n, "p": p4, "q": q4,
                        "tile_b": 1024},
             "tb512r168": {"alg": "pallas4", "n": n, "p": p4, "q": q4,
                           "tile_b": 512, "radices": [16, 8]}}
    rng = np.random.default_rng(3)
    vr = rng.standard_normal((128, n)).astype(np.float32)
    vi = rng.standard_normal((128, n)).astype(np.float32)
    ref = np.fft.fft((vr + 1j * vi).astype(np.complex128), axis=1)
    fns = {}
    for tag, d in descs.items():
        try:
            fn = jax.jit(ps.build_pallas_c2c_split_fourstep(
                d, -1, np.float32))
            yr, yi = fn(vr, vi)
            err = np.max(np.abs(np.asarray(yr) + 1j * np.asarray(yi) - ref)
                         ) / np.max(np.abs(ref))
            print(f"4096 {tag}: relerr={err:.1e}", flush=True)
            if err < 1e-3:
                fns[tag] = fn
        except Exception as exc:                       # noqa: BLE001
            print(f"4096 {tag}: FAIL {str(exc)[:90]}", flush=True)
    if len(fns) < 2:
        return
    for blk in range(2):
        sl = slopes_race(fns, (1024, n), (3072, n), (3072 - 1024) * n)
        for tag, s in sl.items():
            print(f"4096 blk{blk} {tag}: {s*1e12:.1f} ps/pt", flush=True)


def sec2_r2c_merge():
    n = 2048
    rng = np.random.default_rng(5)
    x = rng.standard_normal((256, n)).astype(np.float32)
    ref = np.fft.rfft(x.astype(np.float64), axis=1)
    base = {"alg": "pallas_r2c", "n": n}
    descs = {"prod": dict(base),
             "merge": dict(base, merge=True),
             "merge3232": dict(base, merge=True, radices=[32, 32]),
             "mergek2f": dict(base, merge=True, k2="force"),
             "k2force": dict(base, k2="force")}

    m = n // 2

    def mk(f):
        # chain-compatible: (B, n) real -> (B, n) real (time_chained_multi
        # feeds outputs back as inputs); the concat cost is identical
        # across arms so it cancels in the A/B slope
        @jax.jit
        def fn(a):
            z = f(a)
            return (jnp.concatenate([jnp.real(z)[:, :m],
                                     jnp.imag(z)[:, :m]], axis=1),)
        return fn

    fns = {}
    for tag, d in descs.items():
        try:
            f = ps.build_pallas_r2c(d, np.float32)
            vr, vi = jax.jit(lambda a, f=f: (jnp.real(f(a)),
                                             jnp.imag(f(a))))(x)
            err = np.max(np.abs(np.asarray(vr) + 1j * np.asarray(vi) - ref)
                         ) / np.max(np.abs(ref))
            print(f"r2c {tag}: relerr={err:.1e}", flush=True)
            if err < 1e-3:
                fns[tag] = mk(f)
        except Exception as exc:                       # noqa: BLE001
            print(f"r2c {tag}: FAIL {str(exc)[:90]}", flush=True)
    if len(fns) < 2:
        return
    for blk in range(2):
        sl = slopes_race(fns, (4096, n), (12288, n), (12288 - 4096) * n,
                         planes=1)
        for tag, s in sl.items():
            print(f"r2c blk{blk} {tag}: {s*1e12:.1f} ps/pt (per real pt)",
                  flush=True)


def sec3_k2_lift():
    n = 2048
    rng = np.random.default_rng(9)
    vr = rng.standard_normal((256, n)).astype(np.float32)
    vi = rng.standard_normal((256, n)).astype(np.float32)
    ref = np.fft.fft((vr + 1j * vi).astype(np.complex128), axis=1)
    k2cap0 = ps.K2_MAX_BYTES
    fns = {}
    try:
        fns["prod"] = jax.jit(ps.build_pallas_c2c_split(
            {"alg": "pallas", "n": n, "radices": [128, 16]},
            -1, np.float32))
        ps.K2_MAX_BYTES = 4 << 20
        fns["k2lift"] = jax.jit(ps.build_pallas_c2c_split(
            {"alg": "pallas", "n": n, "radices": [128, 16], "k2": "all"},
            -1, np.float32))
    finally:
        ps.K2_MAX_BYTES = k2cap0
    good = {}
    for tag, fn in fns.items():
        try:
            yr, yi = fn(vr, vi)
            err = np.max(np.abs(np.asarray(yr) + 1j * np.asarray(yi) - ref)
                         ) / np.max(np.abs(ref))
            print(f"k2lift2048 {tag}: relerr={err:.1e}", flush=True)
            if err < 1e-3:
                good[tag] = fn
        except Exception as exc:                       # noqa: BLE001
            print(f"k2lift2048 {tag}: FAIL {str(exc)[:90]}", flush=True)
    if len(good) < 2:
        return
    for blk in range(2):
        sl = slopes_race(good, (2048, n), (6144, n), (6144 - 2048) * n)
        for tag, s in sl.items():
            print(f"k2lift2048 blk{blk} {tag}: {s*1e12:.1f} ps/pt",
                  flush=True)


def sec4_inner128():
    # axis-(-2) kernel on the r2c axis-1 shape: (8, 2048, 1025-ish);
    # use lanes 1024 for clean tiling, the real pass masks the edge
    pre, n, L = 8, 2048, 1024
    rng = np.random.default_rng(13)
    xr = rng.standard_normal((pre, n, L)).astype(np.float32)
    xi = rng.standard_normal((pre, n, L)).astype(np.float32)
    ref = np.fft.fft((xr + 1j * xi).astype(np.complex128), axis=1)
    np_max0 = ps.INNER_NP_MAX
    fns = {}
    try:
        fns["inner6432"] = jax.jit(ps.build_pallas_c2c_split_inner(
            {"alg": "pallas_inner", "n": n, "radices": [64, 32]},
            -1, np.float32))
        ps.INNER_NP_MAX = n * 128
        fns["inner12816"] = jax.jit(ps.build_pallas_c2c_split_inner(
            {"alg": "pallas_inner", "n": n, "radices": [128, 16]},
            -1, np.float32))
    except Exception as exc:                           # noqa: BLE001
        print(f"inner build FAIL {str(exc)[:90]}", flush=True)
    finally:
        ps.INNER_NP_MAX = np_max0
    good = {}
    for tag, fn in fns.items():
        try:
            yr, yi = fn(xr, xi)
            err = np.max(np.abs(np.asarray(yr) + 1j * np.asarray(yi) - ref)
                         ) / np.max(np.abs(ref))
            print(f"inner2048 {tag}: relerr={err:.1e}", flush=True)
            if err < 1e-3:
                good[tag] = fn
        except Exception as exc:                       # noqa: BLE001
            print(f"inner2048 {tag}: FAIL {str(exc)[:90]}", flush=True)
    if len(good) < 2:
        return
    npts = (24 - 8) * n * L
    rngj = np.random.default_rng(21)
    configs = []
    tags = list(good)
    for tag in tags:
        for b in (8, 24):
            a = tuple(jnp.asarray(rngj.standard_normal((b, n, L)),
                                  jnp.float32) for _ in range(2))
            configs.append((good[tag], a))
    for blk in range(2):
        ts = timing.time_chained_multi(configs, k1=4, k2=16, reps=7)
        for i, tag in enumerate(tags):
            s = (ts[2 * i + 1] - ts[2 * i]) / npts
            print(f"inner2048 blk{blk} {tag}: {s*1e12:.1f} ps/pt",
                  flush=True)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    for name, fn in (("pallas4", sec1_pallas4), ("r2c_merge",
                                                 sec2_r2c_merge),
                     ("k2lift", sec3_k2_lift), ("inner128", sec4_inner128)):
        try:
            fn()
        except Exception as exc:                       # noqa: BLE001
            print(f"SECTION {name} FAIL: {str(exc)[:140]}", flush=True)


if __name__ == "__main__":
    main()
