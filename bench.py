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
    """3-D c2c with an in-bench A/B: prod vs a [16,16]-vpuall axis
    schedule injected through wisdom (at n=256 the planner's single-stage
    [256] is MXU-only — p=256 exceeds the VPU gate — so the pure-f32
    variant needs the two-stage split; the fused-2D builder honors
    desc-carried radices/vpu).  Each arm verified before timing."""
    import jax
    import jax.numpy as jnp

    import fftw3_tpu as ftpu

    rng = np.random.default_rng(0)
    xr = jnp.asarray(rng.standard_normal((n, n, n)), jnp.float32)
    xi = jnp.asarray(rng.standard_normal((n, n, n)), jnp.float32)
    ref = np.fft.fftn((np.asarray(xr) + 1j * np.asarray(xi))
                      .astype(np.complex128))

    def _sqrt_split():
        if n & (n - 1) or not (64 <= n <= 4096):
            raise ValueError("no two-stage split")
        h = 1 << ((n.bit_length() - 1) // 2)     # ~sqrt split, both pow2
        rad = [n // h, h]
        if any(r > 64 for r in rad):
            rad = [64, n // 64] if n // 64 <= 64 else None
        if rad is None:
            raise ValueError("no two-stage split")
        return rad

    def _inject(desc):
        from fftw3_tpu.planner import the_planner
        for b in (n * n, n):                     # per-axis vector sizes
            the_planner.wisdom[the_planner._key(
                "c2c", n, np.float32, b)] = {
                "desc": dict(desc), "patience": 99, "cost": 0.0}

    def inject_vpuall():
        _inject({"alg": "pallas", "n": n, "radices": _sqrt_split(),
                 "tile_b": 128, "vpu": "all"})

    def inject_mxu2():
        # plain presplit two-stage split (the [16,16]-class arm): under
        # presplit the k2 cross pass refills the MXU at small radices,
        # which moved the n=1024 optimum to [32,32] — race the analog
        _inject({"alg": "pallas", "n": n, "radices": _sqrt_split(),
                 "tile_b": 128})

    arms = [("prod", None)]
    if jax.default_backend() == "tpu":
        arms.append(("mxu2st", inject_mxu2))
        arms.append(("vpuall", inject_vpuall))
    cand = []
    for tag, setup in arms:
        try:
            ftpu.forget_wisdom()
            if setup is not None:
                setup()
            plan = ftpu.plan_dft((n, n, n), dtype="complex64")
        except Exception as exc:                       # noqa: BLE001
            print(f"# c2c3d {tag}: plan FAIL {str(exc)[:100]}",
                  file=sys.stderr)
            continue
        finally:
            ftpu.forget_wisdom()
        cand.append((tag, plan, jax.jit(plan.apply_split)))

    good = []
    for tag, plan, run in cand:
        try:
            yr, yi = run(xr, xi)
            err = _relerr(np.asarray(yr) + 1j * np.asarray(yi), ref)
            if tag == "prod":
                _check(err, f"c2c 3d {n}^3")
            if err < VERIFY_TOL:
                good.append((tag, plan, run, err))
            elif tag != "prod":
                print(f"# c2c3d {tag}: verify miss {err:.1e}",
                      file=sys.stderr)
        except Exception as exc:                       # noqa: BLE001
            if tag == "prod":
                raise
            print(f"# c2c3d {tag}: FAIL {str(exc)[:100]}", file=sys.stderr)
    assert good, "no verified c2c3d arm"

    time_chained, _ = _timers()
    flops = 5.0 * (n ** 3) * np.log2(float(n) ** 3)
    best = None
    for tag, plan, run, err in good:
        t = time_chained(run, (xr, xi))
        if len(good) > 1:
            print(f"# c2c3d {tag}: {flops/t/1e9:.0f} GFLOPS",
                  file=sys.stderr)
        if best is None or t < best[0]:
            best = (t, tag, plan, err)
    t, tag, plan, err = best
    if tag != "prod":
        print(f"# c2c3d: selected {tag}", file=sys.stderr)
    return flops / t, t, repr(plan), err


def bench_r2c_2d(n: int, batch: int = 8):
    """2-D r2c with an in-bench A/B over the round-3 inner-kernel
    candidates (the BASELINE >=700 target is VMEM-capped at a [64,32]
    inner schedule): prod, VPU final stage, and VPU + the INNER_NP_MAX
    bound widened to readmit [128,16] (the VPU stage drops the final
    stage's G/cross VMEM operands).  Each arm is verified before timing;
    the best verified arm's number is reported."""
    import jax
    import jax.numpy as jnp

    import fftw3_tpu as ftpu
    from fftw3_tpu import config
    from fftw3_tpu.ops import pallas_stockham as ps

    rng = np.random.default_rng(0)
    # batched: a single n^2 image is too little work to time stably
    # through the tunnel's dispatch jitter
    x = jnp.asarray(rng.standard_normal((batch, n, n)), jnp.float32)
    ref = np.fft.rfftn(np.asarray(x[:1]).astype(np.float64), axes=(1, 2))

    flag0, np_max0 = config.pallas_vpu_last, ps.INNER_NP_MAX
    pack0 = config.r2c_dc_nyquist_pack
    # pack arm: the DC/Nyquist lane-alignment pack is DEFAULT-OFF after
    # the round-4 on-chip miscompute finding (config.r2c_dc_nyquist_pack
    # doc); racing it verify-gated means the ~11% lane win returns by
    # itself the day the toolchain fixes the fusion bug.
    def inject_child(extra, c2c_extra=None):
        # pin the fused-r2c kernel's half-size schedule / variant fields
        # (the planner's static choice is [64,16]; under presplit [32,32]
        # won the n=1024 c2c sweep twice — the same stages run inside
        # pallas_r2c; "merge" runs the A/B two-real pipelines as one
        # double-lane-width _stages call).  ``c2c_extra`` additionally
        # pins the axis-1 c2c sub-plan (injected at every plausible batch
        # bucket — the sub-plan's vector size isn't knowable here).
        from fftw3_tpu.planner import the_planner
        desc = {"alg": "pallas_r2c", "n": n,
                "radices": ps.choose_radices(n // 2)}
        desc.update(extra)
        the_planner.wisdom[the_planner._key(
            "r2c", n, np.float32, batch * n)] = {
            "desc": desc, "patience": 99, "cost": 0.0}
        if c2c_extra:
            cdesc = {"alg": "pallas", "n": n,
                     "radices": ps.choose_radices(n)}
            cdesc.update(c2c_extra)
            for b in (batch * n, batch * (n // 2 + 1), batch * (n // 2)):
                the_planner.wisdom[the_planner._key(
                    "c2c", n, np.float32, b)] = {
                    "desc": cdesc, "patience": 99, "cost": 0.0}

    arms = [("prod", flag0, np_max0, pack0, None, None, False)]
    if jax.default_backend() == "tpu":
        arms.append(("r3232", flag0, np_max0, pack0,
                     {"radices": [32, 32]}, None, False))
        # k2force: presplit shrank the cross-pass VMEM; race the fused
        # K=4p pass on BOTH passes' stages past the static byte budget
        # (measured round 4: won one of two interleaved blocks, 56.0 vs
        # 61.6 ps/pt — session-dependent, so race it every driver run).
        # The desc["merge"] two-real-pipeline variant LOST both blocks
        # (66.8/67.5 vs 61.6/55.0 — the 256-lane form drops the flat
        # twiddle and raises VMEM pressure); capability kept, arm dropped.
        arms.append(("k2force", flag0, np_max0, pack0,
                     {"k2": "force"}, {"k2": "force"}, False))
        # wider axis-1 inner blocks on top of k2force (lanes 256 at
        # n=2048: 2 MB planes).  NOTE the budget must be 4x: at n=2048
        # the tle-doubling guard is n*tle*2 <= area, so the round-4 2x
        # arm left tle=128 and g=1 — geometrically IDENTICAL to k2force
        # (false arm; its 615-vs-610 "win" was noise between equal
        # kernels).  With the real 4x budget the (1, 2048, 256) block
        # CRASHES the Mosaic compiler (HTTP 500, measured 2026-08-20,
        # same VMEM class as bisect4096) — the arm stays as a compile-
        # gated canary that re-admits itself the day the toolchain's
        # scoped-VMEM handling moves.  The axis-1 inner pass is the r2c
        # config's structural tax; its excess is IN-STAGE, not DMA
        # (copy_inner.py: the strided/masked inner-layout copies measure
        # at or below the contiguous floor), every widening is
        # VMEM-dead, and the layout alternatives measured worse
        # (moveaxis 2750 us, swapped 2:1, pack 451-462 + miscompute).
        arms.append(("k2fwide", flag0, np_max0, pack0,
                     {"k2": "force"},
                     {"k2": "force", "inner_area": 4 * ps.INNER_AREA},
                     False))
        # measured 2026-08-20 and dropped: reversed inner schedule
        # [32,64] for the axis-1 pass tied k2force (618 vs 620 GFLOPS,
        # sequential protocol) — the inner radix order doesn't matter at
        # n=2048; not worth a driver-run compile slot.
        #
        # padalign (desc "pad_align" / config.inner_pad_align): the
        # axis-1 pass's unaligned-L handling — pad-to-aligned + slice
        # instead of the masked edge tile.  Measured same-run 2026-08-20:
        # 547 vs k2force's 630 — the XLA pad/slice of unaligned lanes
        # costs MORE than the masked-tile kernel pessimization.  Arm
        # dropped; capability kept (and the third confirmation that any
        # route touching the odd 1025th column costs ~1 ms at this size).
        # NOT raced: the swapped composition (r2c over axis -2 first +
        # last-axis c2c + Hermitian reconstruct, config.r2c_swapped) LOST
        # 2:1 on chip (288 vs 601 GFLOPS, 3 interleaved reps) — the
        # flip+roll+conj epilogue alone costs 1.4-1.8 ms at 2048^2
        # (experiments/r2c_swapped_attrib.py), eating the entire pass
        # saving.  Kept as an opt-in layout capability only.
        arms.append(("pack", flag0, np_max0, True, None, None, False))
        # dropped round 4: vpu (466) / vpuall (343) lost to prod (601) in
        # two independent driver runs, and vpu_wide's [128,16] inner
        # schedule crashes Mosaic even under presplit
        # (experiments/round4_race2.py) — INNER_NP_MAX stands
    def inject_c2c_only(c2c_extra):
        from fftw3_tpu.planner import the_planner
        cdesc = {"alg": "pallas", "n": n, "radices": ps.choose_radices(n)}
        cdesc.update(c2c_extra)
        for b in (batch * n, batch * (n // 2 + 1), batch * (n // 2)):
            the_planner.wisdom[the_planner._key(
                "c2c", n, np.float32, b)] = {
                "desc": cdesc, "patience": 99, "cost": 0.0}

    cand = []
    for tag, flag, np_max, pack, child_extra, c2c_extra, swap in arms:
        config.pallas_vpu_last = flag
        ps.INNER_NP_MAX = np_max
        config.r2c_dc_nyquist_pack = pack
        config.r2c_swapped = swap
        try:
            ftpu.forget_wisdom()
            if child_extra is not None:
                inject_child(child_extra, c2c_extra)
            elif c2c_extra is not None:
                inject_c2c_only(c2c_extra)
            plan = ftpu.plan_dft_r2c((batch, n, n), axes=(1, 2),
                                     dtype="float32")
        except Exception as exc:                       # noqa: BLE001
            print(f"# r2c2d {tag}: plan FAIL {str(exc)[:100]}",
                  file=sys.stderr)
            continue
        finally:
            config.pallas_vpu_last = flag0
            ps.INNER_NP_MAX = np_max0
            config.r2c_dc_nyquist_pack = pack0
            config.r2c_swapped = False

        def make(p):
            @jax.jit
            def run(a):
                y = p.apply(a)
                return jnp.real(y), jnp.imag(y)
            return run
        cand.append((tag, plan, make(plan)))
    ftpu.forget_wisdom()

    good = []
    relerr = None
    for tag, plan, run in cand:
        try:
            yr, yi = run(x)
            err = _relerr(np.asarray(yr[:1]) + 1j * np.asarray(yi[:1]),
                          ref)
            if tag == "prod":
                _check(err, f"r2c 2d {n}^2")
            if err < VERIFY_TOL:
                good.append((tag, plan, run, err))
            elif tag != "prod":
                print(f"# r2c2d {tag}: verify miss {err:.1e}",
                      file=sys.stderr)
        except Exception as exc:                       # noqa: BLE001
            if tag == "prod":
                raise
            print(f"# r2c2d {tag}: FAIL {str(exc)[:100]}", file=sys.stderr)
    assert good, "no verified r2c2d arm"

    _, time_dispatched = _timers()
    flops = 2.5 * (n * n) * np.log2(float(n) * n) * batch
    best = None
    for tag, plan, run, err in good:
        t = time_dispatched(run, (x,))
        if len(good) > 1:
            print(f"# r2c2d {tag}: {flops/t/1e9:.0f} GFLOPS",
                  file=sys.stderr)
        if best is None or t < best[0]:
            best = (t, tag, plan, err)
    t, tag, plan, err = best
    if tag != "prod":
        print(f"# r2c2d: selected {tag}", file=sys.stderr)
    return flops / t, t, repr(plan), err


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
    rng = np.random.default_rng(0)
    x2 = jnp.asarray(rng.standard_normal((b2, n)), jnp.float32)
    x1 = jnp.asarray(rng.standard_normal((b1, n)), jnp.float32)
    # FFTW REDFT10: X[k] = 2 sum_j x[j] cos(pi(j+1/2)k/n)
    j = np.arange(n)[:, None]
    k = np.arange(n)[None, :]
    M = 2.0 * np.cos(np.pi * (j + 0.5) * k / n)
    ref = np.asarray(x2[:64]).astype(np.float64) @ M

    def _mkplans(inject_half):
        from fftw3_tpu import config as _cfg
        from fftw3_tpu.ops import pallas_stockham as _ps
        from fftw3_tpu.planner import the_planner
        ftpu.forget_wisdom()
        if inject_half:
            for b in (b1, b2):
                if inject_half == "pallas" and _ps.r2c_applicable(
                        n, np.float32):
                    child = {"alg": "pallas_r2c", "n": n,
                             "radices": _ps.choose_radices(n // 2)}
                else:
                    child = the_planner.plan_r2c(n, np.float32, 0,
                                                 batch=b)
                the_planner.wisdom[the_planner._key(
                    "redft10", n, np.float32, b)] = {
                    "desc": {"alg": "redft10_half", "n": n,
                             "child": child},
                    "patience": 99, "cost": 0.0}
        p2 = ftpu.plan_r2r((b2, n), ["redft10"], axes=(1,),
                           dtype="float32")
        p1 = ftpu.plan_r2r((b1, n), ["redft10"], axes=(1,),
                           dtype="float32")
        ftpu.forget_wisdom()
        return p1, p2

    # The Makhoul half-size arms were raced once on chip (run 6) and
    # LOST 10x (prod dense 1616 GFLOPS slope vs half 175 / halfpallas
    # 139): at n=512 the dense kind-matrix matmul is MXU-saturated while
    # the half path pays gather/untangle sweeps.  Arms dropped; the
    # capability remains a planner candidate (redft10_half) for sizes
    # past the dense window.
    arms = {}
    for tag, inj in (("prod", False),):
        try:
            p1, p2 = _mkplans(inj)
            r1 = jax.jit(lambda a, p=p1: (p.apply(a),))
            r2 = jax.jit(lambda a, p=p2: (p.apply(a),))
            err = _relerr(np.asarray(r2(x2)[0][:64]), ref)
            if tag == "prod":
                relerr = _check(err, f"dct2 n={n}")
                plan = p2
            if err < VERIFY_TOL:
                arms[tag] = (r1, r2, p2, err)
            else:
                print(f"# dct2 {tag}: verify miss {err:.1e}",
                      file=sys.stderr)
        except Exception as exc:                       # noqa: BLE001
            if tag == "prod":
                raise
            print(f"# dct2 {tag}: FAIL {str(exc)[:100]}", file=sys.stderr)

    configs = []
    tags = list(arms)
    for tag in tags:
        r1, r2, _, _ = arms[tag]
        configs.extend([(r1, (x1,)), (r2, (x2,))])
    ts = timing.time_chained_multi(configs, reps=7)
    flops = 2.5 * n * np.log2(float(n)) * (b2 - b1)
    best = None
    for i, tag in enumerate(tags):
        t = max(ts[2 * i + 1] - ts[2 * i], 1e-12)   # marginal b2-b1 rows
        if len(tags) > 1:
            print(f"# dct2 {tag}: {flops/t/1e9:.0f} GFLOPS slope",
                  file=sys.stderr)
        if best is None or t < best[0]:
            best = (t, tag)
    t, tag = best
    if tag != "prod":
        print(f"# dct2: selected {tag}", file=sys.stderr)
    plan, relerr = arms[tag][2], arms[tag][3]
    return flops / t, t, repr(plan), relerr


def _with_retries(fn, attempts: int = 3):
    """The remote-TPU compile service occasionally returns transient HTTP
     500s; retry, then walk a fallback ladder — first the VPU final stage
    off (the newest moving part, if the autotune turned it on), then the
    whole Pallas tier off (the XLA path always compiles) — so the driver
    ALWAYS gets a metric."""
    from fftw3_tpu import config

    for i in range(attempts):
        try:
            return fn()
        except Exception as exc:                       # noqa: BLE001
            print(f"# bench attempt {i + 1} failed: "
                  f"{str(exc).splitlines()[0][:120]}", file=sys.stderr)
            time.sleep(2.0)
    if config.pallas_vpu_last:
        saved_vpu = config.pallas_vpu_last             # True or "all"
        config.pallas_vpu_last = False
        fftpu_forget()
        try:
            return fn()
        except Exception as exc:                       # noqa: BLE001
            print(f"# bench vpu-off fallback failed: "
                  f"{str(exc).splitlines()[0][:120]}", file=sys.stderr)
        finally:
            config.pallas_vpu_last = saved_vpu
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


def _autotune_headline(n: int = 1024, batch: int = 65536) -> None:
    """Same-session A/B of the queued round-3 kernel candidates, run once
    at bench start ON THE CHIP (the driver's bench run is the one
    guaranteed same-session context — CLAUDE.md measurement discipline:
    only interleaved marginal slopes are decision-grade through the
    tunnel).  Arms:

    * prod   — current default (bf16 hi/lo MXU stages)
    * vpu    — final Stockham stage as pure-f32 VPU radix-4/2 butterflies
      (the round-3 ablation attributed ~38 of ~52 ps/pt to the precision
      machinery this arm partially deletes)
    * vpuall — EVERY stage as VPU butterflies (no MXU matmul, no bf16
      cast anywhere; eligible when all radices are powers of two <= 64)
    * alt-radix variants — the re-sweep: free-ish VPU stages may move
      the radix optimum (e.g. [32,32] vs [64,16] at n=1024)

    Every arm is verified against a float64 oracle before timing; any
    failure drops the arm.  The winner sets ``config.pallas_vpu_last``
    and injects a desc-pinned wisdom entry at the headline batch bucket,
    so the real benchmark below plans straight onto it.  The whole pass
    is advisory: exceptions leave the defaults untouched.
    """
    import jax
    import jax.numpy as jnp

    from fftw3_tpu import config
    from fftw3_tpu.ops import pallas_stockham as ps
    from fftw3_tpu.utils import timing

    if jax.default_backend() != "tpu":
        return

    def _all_ok(rad):
        return all(ps._vpu_last_ok(r, 1) for r in rad)   # 2-5-smooth <=64

    rad0 = ps.choose_radices(n)
    # Arms (round 4): prod = presplit-G kernel (host-split bf16 Gh/GG
    # operands, fused k2 cross pass on every stage — measured 40.9 ps/pt
    # vs the legacy kernel's 52.4 same-session); nosplit = the legacy
    # in-kernel-cast kernel (the round-2/3 headline, only runnable from
    # compile cache — kept as the A/B record + insurance); vpu arms as
    # before.  Tuples: (tag, vpu, radices, k2, gsplit).
    tb0 = ps.tile_for(n)
    arms = [("prod", False, rad0, "first", True, tb0),
            ("nosplit", False, rad0, "all", False, tb0)]
    # plain presplit-MXU alt-radix arms FIRST: under presplit the radix
    # optimum moved (measured: [32,32] 49.3 vs [64,16] 63.5 ps/pt in the
    # same block — the k2 cross pass K=4p exactly fills the MXU at p=32);
    # the earlier logic raced eligible alts only as vpuall, which loses.
    # round-5 attribution (experiments/attrib1000.py + copy1000.py +
    # rev1000.py): the non-pow2 tax lives in any stage whose radix has
    # odd part >= 25 (n800 [32,25] 90.8 ps/pt == n1000 91.3 while
    # [32,20]/[40,32] run 27.5-49.4; copy/transpose probes cleared lane
    # alignment at <= 8 ps/pt; ALL 2-stage orders of 1000 sit at 84-101
    # because 5^3 cannot split below odd-part-25 over two stages).
    # Radix-order arms are a +-10% effect there — trim to one alt.
    max_arms = 3 if n % 128 else 5
    alts = ps.alternative_radices(n, k=6)
    for alt in alts:
        if alt == rad0 or len(alt) != 2 or len(arms) >= max_arms:
            continue
        arms.append((f"ps{alt}", False, alt, "first", True, tb0))
    # wide-row-tile arm (round 4): pallas4's outer kernel won 15-19% from
    # tile widening; re-try tb=256 here under presplit (the round-2
    # tb=256 loss predates the hoisted G casts).  128-multiples keep the
    # stage lane-merge reshape legal.  Pointless at unaligned n (the
    # lane tax dwarfs it) — aligned configs only.
    if n % 128 == 0:
        best_alt = alts[1] if len(alts) > 1 and len(alts[1]) == 2 else rad0
        arms.append((f"ps{best_alt}tb256", False, best_alt, "first", True,
                     256))
    if n == 1024:
        # asymmetric-split insurance (round 5): [8,128] won ONE
        # interleaved block at 25.5 ps/pt vs [32,32]'s 43.7 (rev1024),
        # then LOST the rigorous re-race (slope 51.1 vs 38.2, chained
        # 49.8 vs 39.5 — experiments/asym1024.py).  Two same-session
        # blocks disagreeing 2x means keep it in the driver race (the
        # race picks the winner, so the arm cannot regress the number)
        # until one form wins three sessions straight.
        arms.append(("ps[8,128]", False, [8, 128], "first", True, tb0))
    if _all_ok(rad0) and len(arms) < 7:
        arms.append(("vpuall", "all", rad0, "first", True, tb0))
    if len(arms) < 7:
        arms.append(("vpu", True, rad0, "first", True, tb0))
    # gated-by-canary arm: 3-stage schedules miscompile on the round-2..5
    # toolchains (choose_radices caps at 2); if the stage3 probe PASSes,
    # race a deep schedule (fewer twiddle bytes per stage)
    from fftw3_tpu import toolchain_probe
    if toolchain_probe.passed("stage3") and n == 1024:
        arms.append(("st3[16,8,8]", False, [16, 8, 8], "first", True, tb0))
    if toolchain_probe.passed("stage3") and n == 1000:
        # the round-5 attribution's escape hatch: [10,10,10] splits 5^3
        # into three odd-part-5 stages (every 2-stage schedule of 1000
        # carries an odd-part>=25 stage, the measured 2.6x tax)
        arms.append(("st3[10,10,10]", False, [10, 10, 10], "first", True,
                     tb0))
    fns = {}
    for tag, flag, rad, k2, gs, tb in arms:
        try:
            fns[tag] = jax.jit(ps.build_pallas_c2c_split(
                {"alg": "pallas", "n": n, "radices": list(rad),
                 "tile_b": tb, "vpu": flag, "k2": k2,
                 "gsplit": gs}, -1, np.float32))
        except Exception as exc:                       # noqa: BLE001
            print(f"# autotune {tag}: build FAIL {str(exc)[:100]}",
                  file=sys.stderr)

    tb_lo, tb_hi = 8192, 24576
    rng = np.random.default_rng(7)
    vr = rng.standard_normal((256, n)).astype(np.float32)
    vi = rng.standard_normal((256, n)).astype(np.float32)
    ref = np.fft.fft((vr + 1j * vi).astype(np.complex128), axis=1)
    # pre-compile at the timing batches (shape-specialized functions: an
    # arm can verify at 256 yet crash the remote compiler at the timing
    # shapes, killing the whole interleaved race — autotune4096 runs 6-7)
    pr_lo = jnp.zeros((tb_lo, n), jnp.float32)
    pr_hi = jnp.zeros((tb_hi, n), jnp.float32)
    good = []
    for tag, flag, rad, k2, gs, tb in arms:
        if tag not in fns:
            continue
        try:
            yr, yi = fns[tag](vr, vi)
            err = _relerr(np.asarray(yr) + 1j * np.asarray(yi), ref)
            print(f"# autotune {tag}: relerr={err:.1e}", file=sys.stderr)
            if err < VERIFY_TOL:
                fns[tag](pr_lo, pr_lo)[0].block_until_ready()
                fns[tag](pr_hi, pr_hi)[0].block_until_ready()
                good.append((tag, flag, rad, k2, gs, tb))
        except Exception as exc:                       # noqa: BLE001
            print(f"# autotune {tag}: verify/compile FAIL "
                  f"{str(exc)[:100]}", file=sys.stderr)
    if len(good) < 2 or good[0][0] != "prod":
        return                                         # nothing to decide

    from fftw3_tpu.planner import the_planner

    def _inject_arm(arm):
        tag_, flag_, rad_, k2_, gs_, tb_ = arm
        config.pallas_vpu_last = flag_
        the_planner.wisdom[the_planner._key("c2c", n, np.float32,
                                            batch)] = {
            "desc": {"alg": "pallas", "n": n, "radices": list(rad_),
                     "tile_b": tb_, "vpu": flag_, "k2": k2_,
                     "gsplit": gs_},
            "patience": 99, "cost": 0.0}

    b_lo, b_hi = tb_lo, tb_hi
    configs = []
    for tag, *_ in good:
        for b in (b_lo, b_hi):
            xr = jnp.asarray(rng.standard_normal((b, n)), jnp.float32)
            xi = jnp.asarray(rng.standard_normal((b, n)), jnp.float32)
            configs.append((fns[tag], (xr, xi)))
    try:
        ts = timing.time_chained_multi(configs, k1=4, k2=16, reps=7)
    except Exception as exc:                           # noqa: BLE001
        # timing needs fresh compiles at the timing batches; on a
        # transient remote-compile 500, fall back to the cross-session
        # winner if it verified this session (run-6 autotune4096
        # incident — same failure shape)
        print(f"# autotune timing failed: {str(exc)[:90]}",
              file=sys.stderr)
        win = next((a for a in good if a[0] == f"ps{[32, 32]}"), None)
        if win is not None and n == 1024:
            _inject_arm(win)
            print("# autotune: timing failed — injecting verified "
                  "ps[32, 32] (cross-session winner)", file=sys.stderr)
        return
    slopes = {}
    for i, (tag, *_) in enumerate(good):
        s = (ts[2 * i + 1] - ts[2 * i]) / ((b_hi - b_lo) * n)
        slopes[tag] = s
        print(f"# autotune {tag}: {s*1e12:.1f} ps/pt", file=sys.stderr)
    best_tag, best_slope = min(slopes.items(), key=lambda kv: kv[1])

    def _metric_line(slope, tag):
        # drift-resistant secondary metric (round-3 verdict): the
        # CONFIRMED winner's interleaved marginal slope, named so the
        # BENCH tail carries a number the session-to-session chained
        # drift cannot pollute (printed after the confirm block so a
        # single-block flier can never become the recorded slope)
        print(f"# headline_marginal_slope_ps_pt n={n}: {slope*1e12:.1f} "
              f"({tag})", file=sys.stderr)

    if best_tag == "prod":
        _metric_line(best_slope, "prod")
        print("# autotune: keeping prod defaults", file=sys.stderr)
        return
    # CONFIRMATION block (round 5): four IDENTICAL arms spread 39-58
    # ps/pt within one 7-rep block (experiments/position_bias.py), so a
    # single block can crown a noise-flier — [8,128] once read 25.5 vs
    # the control's 43.7 and lost the re-race 2x.  A non-prod winner
    # must beat prod AGAIN in a fresh two-arm block before its desc is
    # pinned into wisdom; ties/losses keep prod (a pinned flier would
    # poison every later plan at this batch bucket).
    try:
        c2 = [(fns[t], (jnp.asarray(rng.standard_normal((b, n)),
                                    jnp.float32),
                        jnp.asarray(rng.standard_normal((b, n)),
                                    jnp.float32)))
              for t in ("prod", best_tag) for b in (b_lo, b_hi)]
        t2 = timing.time_chained_multi(c2, k1=4, k2=16, reps=7)
        s_prod = (t2[1] - t2[0]) / ((b_hi - b_lo) * n)
        s_best = (t2[3] - t2[2]) / ((b_hi - b_lo) * n)
        print(f"# autotune confirm: prod {s_prod*1e12:.1f} vs "
              f"{best_tag} {s_best*1e12:.1f} ps/pt", file=sys.stderr)
        if s_best >= s_prod:
            _metric_line(s_prod, "prod")
            print("# autotune: win did not confirm — keeping prod",
                  file=sys.stderr)
            return
        _metric_line(s_best, best_tag)
    except Exception as exc:                           # noqa: BLE001
        print(f"# autotune confirm failed ({str(exc)[:80]}) — "
              "keeping prod", file=sys.stderr)
        return
    win = next(a for a in good if a[0] == best_tag)
    # the desc carries the variant ("vpu"/"k2") so the winning plan is
    # pinned independent of later global-flag flips (wisdom = unit of
    # choice)
    _inject_arm(win)
    _, flag, rad, k2, gs, tb = win
    print(f"# autotune: selected {best_tag} "
          f"(vpu_last={flag}, radices={list(rad)}, k2={k2}, gsplit={gs})",
          file=sys.stderr)


def _autotune_4096(batch: int = 4096) -> None:
    """Race pallas4 four-step VARIANTS for the n=4096 config.

    The single-kernel n=4096 route is DEAD on this toolchain — measured
    round 4 (experiments/bisect4096*.py): tb=128 blows scoped VMEM (the
    (tb, 4096) f32 I/O blocks alone are 4x2 MB double-buffered), and any
    tb < 128 crashes Mosaic because the stage reshape (2, n, TB) ->
    (2p, q*TB) lane-merges with inner block TB (legal only at
    128-multiples).  So the race is over pallas4's own knobs instead:
    the OUTER kernel's row tile (at q=128 the default 128-row blocks are
    64 KB — per-grid-step overhead dominates; 512/1024-row tiles amortize
    it) and the outer q-schedule.  A win injects a desc-pinned wisdom
    entry at the suite's batch bucket."""
    import jax
    import jax.numpy as jnp

    from fftw3_tpu.ops import pallas_stockham as ps
    from fftw3_tpu.utils import timing

    if jax.default_backend() != "tpu":
        return
    n = 4096
    p4, q4 = ps.choose_fourstep(n)
    descs = {"pallas4": {"alg": "pallas4", "n": n, "p": p4, "q": q4}}
    # tb ladder is monotone-in-noise up to 2048 (round-5: 89.7/84.9/82.3
    # ps/pt).  tb=4096 measured DEAD at the driver batch (2026-08-20):
    # verifies at B=256, then the B=4096 compile HTTP-500s (VMEM class,
    # 2 MB outer blocks) — the ladder ends at 2048.
    for tb in (512, 1024, 2048):
        descs[f"pallas4tb{tb}"] = {"alg": "pallas4", "n": n, "p": p4,
                                   "q": q4, "tile_b": tb}
    descs["pallas4tb512r168"] = {"alg": "pallas4", "n": n, "p": p4,
                                 "q": q4, "tile_b": 512,
                                 "radices": [16, 8]}
    # wider inner-pass blocks too (the p=32 leg's (32, 32, 128) blocks
    # are 0.5 MB; 4x the area budget halves its grid twice)
    descs["pallas4tb512ia4"] = {"alg": "pallas4", "n": n, "p": p4,
                                "q": q4, "tile_b": 512,
                                "inner_area": 4 * ps.INNER_AREA}
    fns = {}
    for tag, d in descs.items():
        try:
            fns[tag] = jax.jit(ps.build_pallas_c2c_split_fourstep(
                d, -1, np.float32))
        except Exception as exc:                       # noqa: BLE001
            print(f"# autotune4096 {tag}: build FAIL {str(exc)[:100]}",
                  file=sys.stderr)
    # gated-by-canary arm: the n=4096 SINGLE kernel is dead on the
    # round-4 toolchain for two measured reasons (tb>=128 blows scoped
    # VMEM, tb<128 lane-merges illegally — experiments/bisect4096*.py).
    # If the tb32 probe PASSes, sub-128 row tiles became legal and the
    # single-kernel route (one HBM pass instead of pallas4's three)
    # reopens at a VMEM-fitting tb=64.
    from fftw3_tpu import toolchain_probe
    if toolchain_probe.passed("tb32"):
        d1 = {"alg": "pallas", "n": n, "radices": [64, 64], "tile_b": 64}
        descs["single_tb64"] = d1
        try:
            fns["single_tb64"] = jax.jit(
                ps.build_pallas_c2c_split(d1, -1, np.float32))
        except Exception as exc:                       # noqa: BLE001
            print(f"# autotune4096 single_tb64: build FAIL "
                  f"{str(exc)[:100]}", file=sys.stderr)

    b_lo, b_hi = 1024, 3072
    rng = np.random.default_rng(11)
    vr = rng.standard_normal((256, n)).astype(np.float32)
    vi = rng.standard_normal((256, n)).astype(np.float32)
    ref = np.fft.fft((vr + 1j * vi).astype(np.complex128), axis=1)
    # pre-compile probes at BOTH timing batches: pallas_call functions
    # are shape-specialized, so an arm can verify at 256 yet crash the
    # remote compiler at the timing shapes — which killed the whole
    # interleaved race in runs 6-7.  Probing here drops just that arm.
    pr_lo = jnp.zeros((b_lo, n), jnp.float32)
    pr_hi = jnp.zeros((b_hi, n), jnp.float32)
    good = []
    for tag, fn in fns.items():
        try:
            yr, yi = fn(vr, vi)
            err = _relerr(np.asarray(yr) + 1j * np.asarray(yi), ref)
            print(f"# autotune4096 {tag}: relerr={err:.1e}",
                  file=sys.stderr)
            if err < VERIFY_TOL:
                fn(pr_lo, pr_lo)[0].block_until_ready()
                fn(pr_hi, pr_hi)[0].block_until_ready()
                good.append(tag)
        except Exception as exc:                       # noqa: BLE001
            print(f"# autotune4096 {tag}: verify/compile FAIL "
                  f"{str(exc)[:100]}", file=sys.stderr)
    if len(good) < 2 or good[0] != "pallas4":
        return

    from fftw3_tpu.planner import the_planner

    def _inject(tag):
        key = the_planner._key("c2c", n, np.float32, batch)
        the_planner.wisdom[key] = {
            "desc": descs[tag], "patience": 99, "cost": 0.0}

    configs = []
    for tag in good:
        for b in (b_lo, b_hi):
            xr = jnp.asarray(rng.standard_normal((b, n)), jnp.float32)
            xi = jnp.asarray(rng.standard_normal((b, n)), jnp.float32)
            configs.append((fns[tag], (xr, xi)))
    try:
        ts = timing.time_chained_multi(configs, k1=4, k2=16, reps=7)
    except Exception as exc:                           # noqa: BLE001
        # the timing chain needs FRESH compiles at the timing batches and
        # the remote compiler throws transient 500s (run-6 incident:
        # every arm verified, timing crashed, and the config silently
        # fell back to the unwidened pallas4 at 520 GFLOPS).  Fall back
        # to the cross-session winner IF it verified this session.
        print(f"# autotune4096 timing failed: {str(exc)[:90]}",
              file=sys.stderr)
        if "pallas4tb512" in good:
            _inject("pallas4tb512")
            print("# autotune4096: timing failed — injecting verified "
                  "pallas4tb512 (cross-session winner)", file=sys.stderr)
        return
    slopes = {}
    for i, tag in enumerate(good):
        s = (ts[2 * i + 1] - ts[2 * i]) / ((b_hi - b_lo) * n)
        slopes[tag] = s
        print(f"# autotune4096 {tag}: {s*1e12:.1f} ps/pt", file=sys.stderr)
    best_tag, _ = min(slopes.items(), key=lambda kv: kv[1])
    if best_tag == "pallas4":
        print("# autotune4096: keeping pallas4", file=sys.stderr)
        return
    if not best_tag.startswith("pallas4"):
        # structural winner (e.g. a canary-reopened single-kernel arm):
        # single-block slopes carry identical-arm noise of +-20%
        # (experiments/position_bias.py), so confirm in a fresh two-arm
        # block against the best four-step variant before pinning a
        # structurally different desc (tile_b variants of pallas4 are
        # interchangeable — a flier among them is harmless)
        ref_tag = min((t for t in slopes if t.startswith("pallas4")),
                      key=lambda t: slopes[t])
        try:
            c2 = [(fns[t], (jnp.asarray(rng.standard_normal((b, n)),
                                        jnp.float32),
                            jnp.asarray(rng.standard_normal((b, n)),
                                        jnp.float32)))
                  for t in (ref_tag, best_tag) for b in (b_lo, b_hi)]
            t2 = timing.time_chained_multi(c2, k1=4, k2=16, reps=7)
            s_ref = (t2[1] - t2[0]) / ((b_hi - b_lo) * n)
            s_best = (t2[3] - t2[2]) / ((b_hi - b_lo) * n)
            print(f"# autotune4096 confirm: {ref_tag} {s_ref*1e12:.1f} "
                  f"vs {best_tag} {s_best*1e12:.1f} ps/pt",
                  file=sys.stderr)
            if s_best >= s_ref:
                best_tag = ref_tag
        except Exception as exc:                       # noqa: BLE001
            print(f"# autotune4096 confirm failed ({str(exc)[:80]}) — "
                  f"using {ref_tag}", file=sys.stderr)
            best_tag = ref_tag
        if best_tag == "pallas4":
            print("# autotune4096: keeping pallas4", file=sys.stderr)
            return
    _inject(best_tag)
    print(f"# autotune4096: selected {best_tag}", file=sys.stderr)


def _bench_4096():
    """Autotune immediately before the config (other suite configs call
    forget_wisdom in their own A/B loops, which would wipe an injection
    made earlier at suite start)."""
    try:
        _autotune_4096(4096)
    except Exception as exc:                           # noqa: BLE001
        print(f"# autotune4096 failed: {str(exc)[:120]}", file=sys.stderr)
    return bench_c2c_1d(4096, 4096)


def _bench_1000():
    """BASELINE config: non-pow2 n=1000.  The [40,25]/[50,20] schedules
    are 2-5-smooth, so the radix-5 VPU butterflies make them all-VPU
    eligible — autotune the variant at this n before timing (the n=1024
    winner's flag may not transfer: different radix mix)."""
    try:
        _autotune_headline(1000, 32768)
    except Exception as exc:                           # noqa: BLE001
        print(f"# autotune1000 failed: {str(exc)[:120]}", file=sys.stderr)
    return bench_c2c_1d(1000, 32768)


def _bench_f64_1024():
    """BASELINE config #1 (`ocf1024`): 1-D c2c n=1024 DOUBLE.  Races the
    planner's ESTIMATE choice (the df32 XLA pipeline — per-stage HBM
    sweeps of the four f32 planes) against the fused Pallas df32 kernel
    (`df32p`, one HBM pass), both verified at the 1e-10 double contract.
    A df32p Mosaic compile failure just drops the arm.  x64 is restored
    OFF afterwards: ambient x64 leaked into every later suite config in
    the first round-4 driver run and (pre-_x64_off fix) crashed their
    Pallas compiles."""
    import jax
    jax.config.update("jax_enable_x64", True)
    try:
        return _bench_f64_1024_inner()
    finally:
        jax.config.update("jax_enable_x64", False)


def _bench_f64_1024_inner():
    import jax
    import jax.numpy as jnp

    import fftw3_tpu as ftpu
    from fftw3_tpu.planner import the_planner

    # batch 8192: at 512 the df32p call is ~50-150 us of device time —
    # under the >~1 ms-per-iteration timing guidance — and the published
    # number flapped 176->576 GFLOPS between driver runs.  16x the work
    # puts the chain iteration at ~0.8-1.5 ms.
    n, batch = 1024, 8192
    rng = np.random.default_rng(0)

    def inject():
        from fftw3_tpu.ops import df32
        key = the_planner._key("c2c", n, np.float64, batch)
        the_planner.wisdom[key] = {
            "desc": {"alg": "df32p", "n": n,
                     "radices": df32.df32p_radices(n)},
            "patience": 99, "cost": 0.0}

    arms = [("prod", None)]
    if jax.default_backend() == "tpu":
        arms.append(("df32p", inject))

    vb = 128
    vr = rng.standard_normal((vb, n))
    vi = rng.standard_normal((vb, n))
    ref = np.fft.fft(vr + 1j * vi, axis=1)
    xr = jnp.asarray(rng.standard_normal((batch, n)), jnp.float64)
    xi = jnp.asarray(rng.standard_normal((batch, n)), jnp.float64)

    good = []
    for tag, setup in arms:
        try:
            ftpu.forget_wisdom()
            if setup is not None:
                setup()
            plan = ftpu.plan_many_dft([n], howmany=batch,
                                      dtype="complex128")
            run = jax.jit(plan.apply_split)
            yr, yi = run(vr.astype(np.float64), vi.astype(np.float64))
            err = _relerr(np.asarray(yr) + 1j * np.asarray(yi), ref)
            if tag == "prod":
                _check(err, f"c2c n={n} complex128", 1e-10)
            if err < 1e-10:
                good.append((tag, plan, run, err))
            else:
                print(f"# f64 {tag}: verify miss {err:.1e}",
                      file=sys.stderr)
        except Exception as exc:                       # noqa: BLE001
            if tag == "prod":
                raise
            print(f"# f64 {tag}: FAIL {str(exc)[:100]}", file=sys.stderr)
        finally:
            ftpu.forget_wisdom()
    assert good, "no verified f64 arm"

    time_chained, _ = _timers()
    flops = 5.0 * n * np.log2(n) * batch
    best = None
    for tag, plan, run, err in good:
        t = time_chained(run, (xr, xi))
        if len(good) > 1:
            print(f"# f64 {tag}: {flops/t/1e9:.1f} GFLOPS",
                  file=sys.stderr)
        if best is None or t < best[0]:
            best = (t, tag, plan, err)
    t, tag, plan, err = best
    if tag != "prod":
        print(f"# f64: selected {tag}", file=sys.stderr)
    # drift-resistant secondary metric (round-5 verdict item 6): the
    # winner's interleaved marginal slope, like the headline's — the
    # chained f64 number spread 4.4x across sessions (176-576 GFLOPS)
    # before the batch fix, and a single chained value cannot show drift
    run_best = next((rn for tg, p, rn, e in good if tg == tag), None)
    if run_best is not None and jax.default_backend() == "tpu":
        try:
            from fftw3_tpu.utils import timing
            b_lo, b_hi = 4096, 12288
            cfgs = []
            for b in (b_lo, b_hi):
                br = jnp.asarray(rng.standard_normal((b, n)), jnp.float64)
                bi = jnp.asarray(rng.standard_normal((b, n)), jnp.float64)
                cfgs.append((run_best, (br, bi)))
            ts = timing.time_chained_multi(cfgs, k1=4, k2=16, reps=5)
            slope = (ts[1] - ts[0]) / ((b_hi - b_lo) * n)
            print(f"# f64_marginal_slope_ps_pt: {slope*1e12:.1f} ({tag})",
                  file=sys.stderr)
        except Exception as exc:                       # noqa: BLE001
            print(f"# f64 slope measurement failed: {str(exc)[:100]}",
                  file=sys.stderr)
    return flops / t, t, repr(plan), err


#: wall-clock budget (s) for the default suite pass — the driver's bench
#: run must always terminate; remaining configs are SKIPPED (with a
#: stderr line, no silent caps) once the budget is spent.
SUITE_BUDGET_S = 2400.0


def main():
    quick = "--quick" in sys.argv
    # The suite runs BY DEFAULT (round-3 verdict: every BASELINE target
    # except the headline had zero driver evidence because the driver
    # never passes --suite).  --headline-only restores the old behavior.
    suite = not quick and "--headline-only" not in sys.argv
    t_start = time.time()
    bw = _bw_peak()

    # batch sized to amortize the fixed per-dispatch tunnel latency (the
    # driver measures through a remote-TPU tunnel with ~0.3 ms floor);
    # 64 Mi points of work puts device time well above that floor.
    n, batch = 1024, (256 if quick else 65536)
    if not quick:
        # toolchain canaries FIRST: every dead-end gate was measured on
        # one compiler version; the probes notice a fix (one PASS/FAIL
        # stderr line each, recorded in the driver BENCH tail) and the
        # autotunes below re-admit the gated arms on PASS.
        try:
            from fftw3_tpu import toolchain_probe
            toolchain_probe.run_probes()
        except Exception as exc:                       # noqa: BLE001
            print(f"# toolchain probes failed: {str(exc)[:120]}",
                  file=sys.stderr)
    if not quick:
        try:
            _autotune_headline(n, batch)
        except Exception as exc:                       # noqa: BLE001
            from fftw3_tpu import config
            config.pallas_vpu_last = False
            print(f"# autotune failed, defaults kept: {str(exc)[:120]}",
                  file=sys.stderr)
    gf, t, desc, re0 = _with_retries(lambda: bench_c2c_1d(n, batch))
    roofline = 5.0 * np.log2(n) * (bw / 16.0)
    details = {"c2c_1d_1024_b%d" % batch:
               {"gflops": gf / 1e9, "sec": t, "plan": desc, "relerr": re0}}

    if suite:
        # ordered by BASELINE priority: the f64 tier (df32p's first
        # on-chip outing) and n=4096 first, in case the budget runs out
        for name, fn in [("c2c_1d_1024_f64_b8192", _bench_f64_1024),
                         ("c2c_1d_4096_b4096", _bench_4096),
                         ("r2c_2d_2048", lambda: bench_r2c_2d(2048)),
                         ("c2c_3d_256", lambda: bench_c2c_3d(256)),
                         ("c2c_1d_1000_b32768", _bench_1000),
                         ("dct2_512_b65536", lambda: bench_dct2(512, 65536))]:
            if time.time() - t_start > SUITE_BUDGET_S:
                print(f"# {name}: SKIPPED (suite budget "
                      f"{SUITE_BUDGET_S:.0f}s spent)", file=sys.stderr)
                continue
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
