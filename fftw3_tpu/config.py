"""Global numeric configuration.

TPU MXUs execute f32 matmuls as one-pass bf16 by default, which breaks
FFTW's single-precision accuracy contract (max rel err <= 1e-3,
``fftw/libbench2/bench-main.c:70``).  XLA-path transform contractions
default to ``Precision.HIGH`` (bf16x3: measured rel err ~1e-5, 2.5x faster
than the 6-pass HIGHEST); f64 transforms are unaffected (XLA's f64
emulation ignores the f32 precision enum — verified ~1e-15 on-chip).
Set ``matmul_precision = "highest"`` for ~1e-7 single precision, or
``"default"`` for raw one-pass bf16 speed (fails the 1e-3 contract).
"""
from __future__ import annotations

import jax

#: 'high' (bf16x3, default: meets the 1e-3 contract at ~1e-5)
#: | 'highest' (bf16x6, ~1e-7) | 'default' (bf16x1, fast, ~5e-3)
matmul_precision: str = "high"

#: Pallas codelet tier mode: 'auto' (compiled on TPU, interpreted elsewhere)
#: | 'on' (always compiled) | 'interpret' | 'off' (planner skips it)
pallas_mode: str = "auto"

#: MXU arithmetic inside the fused Pallas kernels: 'bf16x3' (default —
#: operands split hi+lo bf16; the stacked stage matmul runs as an hh pass
#: plus a fused cross-term pass, rel err ~5e-6) | 'highest' (6-pass f32,
#: rel err ~1e-7, slower)
pallas_matmul: str = "bf16x3"

#: Ship the bf16 hi/lo split of every stage matrix G as host-prepared
#: operands (Gh + pre-concatenated [Gh|Gl]) instead of casting f32 G
#: inside the kernel each grid step.  Measured round 4 (same-session
#: interleaved slopes, n=1024 [64,16]): 52.4 -> 40.9 ps/pt (-22%), and
#: it removes the concat-of-casts whose fresh Mosaic compile crashes on
#: done>1 stages, re-enabling the fused k2 cross pass everywhere.
#: Applies only under pallas_matmul == "bf16x3".
pallas_presplit_g: bool = True

#: Run the LAST Stockham stage of the fused Pallas kernels as pure-f32
#: VPU butterflies (radix-4/2 adds + a handful of twiddle cmuls) instead
#: of the bf16 hi/lo MXU matmul.  The round-3 ablation (BASELINE.md)
#: showed the stage cost is the precision machinery (hi/lo casts + the
#: K=4p cross pass, ~2/3 of kernel compute at n=1024), which VPU
#: butterflies need none of; a small radix also underfills the MXU rows
#: (2p < 128).  Applies when the final radix is a power of two <= 32.
#: Default off until the on-chip A/B lands (flip per measurement).
pallas_vpu_last: bool = False

#: Route plan-time host work (ESTIMATE search, hashing, wisdom) through the
#: native C++ tier when the shared library is available (fftw3_tpu/native.py)
use_native: bool = True

#: MEASURE-mode problem sizing: total points per timing array.  Large
#: enough that device time per dispatch rises above the tunnel's ~0.3 ms
#: dispatch floor; tests drop it to keep interpret-mode timing cheap.
measure_points: int = 1 << 23

#: FFTW_RANDOM_ESTIMATOR analog (fftw/fftw_api.c:15090-15104): an integer
#: seed makes the planner's cost estimator return deterministic
#: pseudo-random values, so repeated planning under different seeds walks
#: plans the calibrated estimator would never pick — the fuzzer's tool for
#: exercising every solver composition path.  None = off (real costs).
random_estimator = None

#: Disable the compensated-f32 double-float tier for complex128/f64 plans
#: (ops/df32.py): with ``strict_f64 = True`` every f64 plan computes in
#: true (XLA-emulated) f64 arithmetic, ~1e-16 instead of ~1e-13 — at
#: roughly 25-100x the cost on TPU, which has no f64 units.
strict_f64: bool = False

#: MEASURE hysteresis: a measured winner must satisfy
#: t_winner < measure_hysteresis * t_estimate_choice to override the
#: ESTIMATE ranking (fftw evaluates plans purely by time; this engine
#: keeps a margin because timing noise varies by transport).  None = auto:
#: 0.7 through the remote axon tunnel, whose chip-state drift flips
#: near-ties (2-3x swings lasting minutes — measured round 2), 0.95 on
#: locally-attached backends where a 5-25%% MEASURE win is real signal.
#: Set 1.0 to always trust the measurement.
measure_hysteresis = None

#: DC/Nyquist column pack for rank>=2 r2c (plan.py): carries the two real
#: columns of the halved spectrum through the non-last c2c passes in ONE
#: complex column, restoring a 128-multiple lane count.  DEFAULT OFF
#: (round 4): the packed composition SILENTLY MISCOMPUTES on the real
#: chip at large sizes — (8, 2048, 2048) r2c gives rel err ~1 in the
#: mid columns while every isolated stage (pack alone, the c2c pass on
#: the packed width, unpack) verifies at 2e-5, and the same composition
#: passes at (2, 2048, 2048) and (8, 512, 512).  A backend fusion
#: miscompile, not a math bug (all CPU tests pass with the pack on).
#: bench.py races a verify-gated pack-on arm so the lane-alignment win
#: returns automatically if a toolchain update fixes it.
#: One-file repro / re-enable probe: experiments/repro_pack_2048.py.
r2c_dc_nyquist_pack: bool = False

#: Unaligned-L handling in the axis-(-2) inner kernel (round 5).  A
#: masked edge lane tile pessimizes the whole compiled stage kernel
#: ~2.5x per tile (experiments/r2c_decomp.py), but the alternative —
#: zero-pad to the next 128-multiple + slice back — pays XLA copy
#: passes over unaligned-lane layouts that measured the SAME ~1 ms
#: class at 2048x1025 (fold-normalized 2.92x vs the masked path's
#: 2.59-3.09x — a wash; third confirmation that ANY route touching the
#: odd column costs ~1 ms there, after the pack gathers and the
#: moveaxis passes).  False = masked-tile kernel (historical), True =
#: pad-to-aligned.  bench races both at driver time via this flag.
inner_pad_align: bool = False

#: SWAPPED rank-2 r2c composition (plan.py): r2c over axis -2 first (the
#: transpose-free axis-(-2) r2c kernel), then the fast LAST-AXIS c2c over
#: the half spectrum's rows, then one XLA Hermitian-reconstruct epilogue
#: to the contract layout (half on the last axis).  Trades the expensive
#: inner c2c pass (axis -2 over ~n/2 lanes) for a last-axis c2c at ~half
#: the row count.  DEFAULT OFF and NOT bench-raced: measured round 4 at
#: 2048^2 it LOSES 2:1 (288 vs 601 GFLOPS, 3 interleaved reps) — the
#: Hermitian-reconstruct epilogue alone costs 1.4-1.8 ms
#: (experiments/r2c_swapped_attrib.py: inner r2c 1601 us, c2c pass
#: 2714 us, epilogue 1395-1836 us vs prod's 3070 us total).  Kept as an
#: opt-in LAYOUT option: a consumer that can read the
#: [half axis -2, full last] layout directly (TRANSPOSED_OUT spirit)
#: would skip the epilogue entirely.
r2c_swapped: bool = False

#: Surface best-effort failures instead of silently degrading.  When True,
#: paths that normally fall back (the threads-tier parallel executor, which
#: mirrors FFTW's silent serial fallback for loops with fewer iterations
#: than threads) re-raise their exception instead of returning the serial
#: plan.  Tests enable this so engine bugs cannot hide behind the fallback.
debug: bool = False


def resolved_measure_hysteresis() -> float:
    if measure_hysteresis is not None:
        return float(measure_hysteresis)
    import os
    # tunnel-attached = the axon platform is requested AND jax actually
    # backs onto it (the axon backend registers as "tpu"); a process that
    # forced jax_platforms=cpu times locally even under the axon container
    tunneled = "axon" in os.environ.get("JAX_PLATFORMS", "").lower() \
        and jax.default_backend() == "tpu"
    return 0.7 if tunneled else 0.95


def precision():
    return {"highest": jax.lax.Precision.HIGHEST,
            "high": jax.lax.Precision.HIGH}.get(
        matmul_precision, jax.lax.Precision.DEFAULT)
