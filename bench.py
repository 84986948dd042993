"""Benchmark harness — prints ONE JSON line for the driver.

Metric convention is FFTW's (reference ``fftw/libbench2/mflops.c``):
complex transforms score ``5*N*log2(N)/t`` "normalized flops", real/r2r
``2.5*N*log2(N)/t``; timing is min-of-k with repeat-doubling calibration
(``libbench2/timer.c:101-116``).

Every config is VERIFIED on the chip before it is timed (the ``bench -y``
analog, ``fftw/libbench2/verify-dft.c``): a small slice is transformed and
compared against a NumPy float64 oracle, and the max relative error is
reported next to the GFLOPS number.  This catches Mosaic miscompiles that
CPU interpret-mode tests cannot.

``vs_baseline`` is the fraction of the single-pass HBM-bandwidth roofline
(the BASELINE.md north-star: >=80% of the 5N*log2N roofline per chip):
an out-of-place c2c at minimum moves 16 bytes/point, so
roofline = 5*log2(N) * BW/16 convention-flops/s.

Usage: ``python bench.py [--quick] [--suite]``.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

#: verify tolerance on the chip (bf16x3 kernels measure ~1e-5; the FFTW
#: single contract is 1e-3, libbench2/bench-main.c:70)
VERIFY_TOL = 1e-3


def _bw_peak() -> float:
    """HBM bandwidth of the attached chip (bytes/s)."""
    import jax
    kind = getattr(jax.devices()[0], "device_kind", "cpu").lower()
    if "v5 lite" in kind or "v5e" in kind:
        return 8.19e11
    if "v5p" in kind or "v5" in kind:
        return 2.765e12
    if "v4" in kind:
        return 1.2e12
    if "v6" in kind or "trillium" in kind:
        return 1.64e12
    return 1.0e11  # CPU-ish fallback


def _timers():
    """min-of-2 independent timing passes: the medians inside
    time_chained/time_dispatched cancel sync jitter, but chip-state
    variance between passes does not — FFTW's protocol takes the MIN over
    repeats for exactly this reason (libbench2/timer.c:101-116)."""
    from fftw3_tpu.utils import timing

    def chained(fn, args, **kw):
        return min(timing.time_chained(fn, args, **kw),
                   timing.time_chained(fn, args, **kw))

    def dispatched(fn, args, **kw):
        return min(timing.time_dispatched(fn, args, **kw),
                   timing.time_dispatched(fn, args, **kw))
    return chained, dispatched


def _relerr(actual: np.ndarray, ref: np.ndarray) -> float:
    return float(np.max(np.abs(actual - ref)) / np.max(np.abs(ref)))


def _check(relerr: float, what: str, tol: float = VERIFY_TOL) -> float:
    if not (relerr < tol):
        raise AssertionError(
            f"ON-CHIP VERIFY FAILED for {what}: rel err {relerr:.2e} >= "
            f"{tol:g} (likely Mosaic miscompile)")
    return relerr


def bench_c2c_1d(n: int, batch: int, dtype="complex64"):
    import jax
    import jax.numpy as jnp

    import fftw3_tpu as ftpu

    rdt = jnp.float64 if dtype == "complex128" else jnp.float32
    plan = ftpu.plan_many_dft([n], howmany=batch, dtype=dtype)
    rng = np.random.default_rng(0)
    run = jax.jit(plan.apply_split)

    # -- verify on the chip before timing (bench -y analog) --
    vb = min(batch, 128)
    vr = rng.standard_normal((vb, n)).astype(rdt)
    vi = rng.standard_normal((vb, n)).astype(rdt)
    yr, yi = jax.jit(plan.apply_split)(vr, vi)
    ref = np.fft.fft((vr + 1j * vi).astype(np.complex128), axis=1)
    relerr = _check(_relerr(np.asarray(yr) + 1j * np.asarray(yi), ref),
                    f"c2c n={n} {dtype}",
                    1e-10 if dtype == "complex128" else VERIFY_TOL)

    xr = jnp.asarray(rng.standard_normal((batch, n)), rdt)
    xi = jnp.asarray(rng.standard_normal((batch, n)), rdt)
    time_chained, _ = _timers()
    t = time_chained(run, (xr, xi))
    flops = 5.0 * n * np.log2(n) * batch
    return flops / t, t, repr(plan), relerr


def bench_c2c_3d(n: int):
    import jax
    import jax.numpy as jnp

    import fftw3_tpu as ftpu

    plan = ftpu.plan_dft((n, n, n), dtype="complex64")
    rng = np.random.default_rng(0)
    run = jax.jit(plan.apply_split)

    xr = jnp.asarray(rng.standard_normal((n, n, n)), jnp.float32)
    xi = jnp.asarray(rng.standard_normal((n, n, n)), jnp.float32)
    yr, yi = run(xr, xi)
    ref = np.fft.fftn((np.asarray(xr) + 1j * np.asarray(xi))
                      .astype(np.complex128))
    relerr = _check(_relerr(np.asarray(yr) + 1j * np.asarray(yi), ref),
                    f"c2c 3d {n}^3")

    time_chained, _ = _timers()
    t = time_chained(run, (xr, xi))
    flops = 5.0 * (n ** 3) * np.log2(float(n) ** 3)
    return flops / t, t, repr(plan), relerr


def bench_r2c_2d(n: int, batch: int = 8):
    import jax
    import jax.numpy as jnp

    import fftw3_tpu as ftpu

    # batched: a single n^2 image is too little work to time stably
    # through the tunnel's dispatch jitter
    plan = ftpu.plan_dft_r2c((batch, n, n), axes=(1, 2), dtype="float32")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, n, n)), jnp.float32)

    @jax.jit
    def run(a):
        y = plan.apply(a)
        return jnp.real(y), jnp.imag(y)

    yr, yi = run(x)
    ref = np.fft.rfftn(np.asarray(x[:1]).astype(np.float64), axes=(1, 2))
    relerr = _check(
        _relerr(np.asarray(yr[:1]) + 1j * np.asarray(yi[:1]), ref),
        f"r2c 2d {n}^2")

    _, time_dispatched = _timers()
    t = time_dispatched(run, (x,))
    flops = 2.5 * (n * n) * np.log2(float(n) * n) * batch
    return flops / t, t, repr(plan), relerr


def bench_dct2(n: int, batch: int):
    """DCT-II at the chained-MARGINAL-slope protocol: time_chained at two
    batch sizes, interleaved per rep (time_chained_multi), report the
    per-point slope.  The single-batch chained number for this config
    showed a 1.7x session spread (BASELINE.md round 2) because the dense
    kind-matrix matmul is short enough for chip-state drift to dominate;
    the interleaved slope cancels both the dispatch floor and the drift."""
    import jax
    import jax.numpy as jnp

    import fftw3_tpu as ftpu
    from fftw3_tpu.utils import timing

    b1, b2 = batch // 4, batch
    plan = ftpu.plan_r2r((b2, n), ["redft10"], axes=(1,), dtype="float32")
    rng = np.random.default_rng(0)
    run = jax.jit(lambda a: (plan.apply(a),))

    x2 = jnp.asarray(rng.standard_normal((b2, n)), jnp.float32)
    y = np.asarray(run(x2)[0][:64])
    # FFTW REDFT10: X[k] = 2 sum_j x[j] cos(pi(j+1/2)k/n)
    j = np.arange(n)[:, None]
    k = np.arange(n)[None, :]
    M = 2.0 * np.cos(np.pi * (j + 0.5) * k / n)
    ref = np.asarray(x2[:64]).astype(np.float64) @ M
    relerr = _check(_relerr(y, ref), f"dct2 n={n}")

    plan1 = ftpu.plan_r2r((b1, n), ["redft10"], axes=(1,), dtype="float32")
    run1 = jax.jit(lambda a: (plan1.apply(a),))
    x1 = jnp.asarray(rng.standard_normal((b1, n)), jnp.float32)
    t1, t2 = timing.time_chained_multi([(run1, (x1,)), (run, (x2,))],
                                       reps=7)
    t = max(t2 - t1, 1e-12)                 # marginal time for b2-b1 rows
    flops = 2.5 * n * np.log2(float(n)) * (b2 - b1)
    return flops / t, t, repr(plan), relerr


def _with_retries(fn, attempts: int = 3):
    """The remote-TPU compile service occasionally returns transient HTTP
     500s; retry, then retry with the Pallas tier disabled (the XLA path
    always compiles) so the driver ALWAYS gets a metric."""
    from fftw3_tpu import config

    last = None
    for i in range(attempts):
        try:
            return fn()
        except Exception as exc:                       # noqa: BLE001
            last = exc
            print(f"# bench attempt {i + 1} failed: "
                  f"{str(exc).splitlines()[0][:120]}", file=sys.stderr)
            time.sleep(2.0)
    config.pallas_mode = "off"
    fftpu_forget()
    try:
        return fn()
    finally:
        config.pallas_mode = "auto"
        fftpu_forget()


def fftpu_forget():
    import fftw3_tpu
    fftw3_tpu.forget_wisdom()


def _bench_f64_1024():
    """BASELINE config #1 (`ocf1024`): 1-D c2c n=1024 DOUBLE.  f64 rides
    XLA's software emulation on TPU (no native f64 MXU); modest batch —
    emulated f64 is ~20x slower than f32."""
    import jax
    jax.config.update("jax_enable_x64", True)
    return bench_c2c_1d(1024, 512, dtype="complex128")


def main():
    quick = "--quick" in sys.argv
    suite = "--suite" in sys.argv
    bw = _bw_peak()

    # batch sized to amortize the fixed per-dispatch tunnel latency (the
    # driver measures through a remote-TPU tunnel with ~0.3 ms floor);
    # 64 Mi points of work puts device time well above that floor.
    n, batch = 1024, (256 if quick else 65536)
    gf, t, desc, re0 = _with_retries(lambda: bench_c2c_1d(n, batch))
    roofline = 5.0 * np.log2(n) * (bw / 16.0)
    details = {"c2c_1d_1024_b%d" % batch:
               {"gflops": gf / 1e9, "sec": t, "plan": desc, "relerr": re0}}

    if suite:
        for name, fn in [("c2c_3d_256", lambda: bench_c2c_3d(256)),
                         ("c2c_1d_4096_b4096",
                          lambda: bench_c2c_1d(4096, 4096)),
                         ("c2c_1d_1000_b32768",
                          lambda: bench_c2c_1d(1000, 32768)),
                         ("r2c_2d_2048", lambda: bench_r2c_2d(2048)),
                         ("dct2_512_b65536", lambda: bench_dct2(512, 65536)),
                         ("c2c_1d_1024_f64_b512", _bench_f64_1024)]:
            try:
                g2, t2, d2, rel = _with_retries(fn, attempts=2)
            except Exception as exc:                   # noqa: BLE001
                print(f"# {name}: FAILED {exc}", file=sys.stderr)
                continue
            details[name] = {"gflops": g2 / 1e9, "sec": t2, "plan": d2,
                             "relerr": rel}
            print(f"# {name}: {g2/1e9:.1f} GFLOPS ({t2*1e6:.0f} us) "
                  f"relerr={rel:.1e} {d2}", file=sys.stderr)

    print(json.dumps({
        "metric": "c2c_1d_n1024_batched_gflops",
        "value": round(gf / 1e9, 2),
        "unit": "GFLOPS(5NlogN)",
        "vs_baseline": round(gf / roofline, 4),
    }))
    for k, v in details.items():
        print(f"# {k}: {v['gflops']:.1f} GFLOPS ({v['sec']*1e6:.0f} us) "
              f"relerr={v['relerr']:.1e}", file=sys.stderr)
    from fftw3_tpu.planner import the_planner
    print(f"# planner stats: {the_planner.stats}", file=sys.stderr)


if __name__ == "__main__":
    main()
