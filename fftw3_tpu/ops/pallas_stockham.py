"""Fused Stockham FFT as a single Pallas TPU kernel — the codelet tier.

This replaces the reference's generated-codelet forest (SURVEY.md §2.6,
``fftw/dft_scalar/codelets/`` + 11 SIMD ISA dirs, kernel signatures
``kdft``/``kdftw`` at ``fftw/fftw_api.h:1771-1835``) with ONE parametric
kernel family, and its genfft generator (§2.10) with :func:`choose_radices`:
*generate, count ops, let the planner choose* — but the "generation" is a
radix schedule, not 42k lines of unrolled C.

Why fusion is the win on TPU: the XLA path runs each Cooley-Tukey stage as a
separate matmul+twiddle, and XLA does not fuse matmul chains, so an
n = r1*...*rk transform makes k round trips to HBM.  FFTs are
bandwidth-bound; this kernel keeps a (TILE_B, n) block of the batch resident
in VMEM through *all* stages — one HBM read + one HBM write per point, the
speed-of-light minimum (the same reasoning as FFTW's buffered solvers that
tile through cache, ``fftw/fftw_api.c:1829-2062``, taken to its limit).

**Layout strategy (Mosaic-constrained).**  The batch lives in the LANE
dimension; all FFT index gymnastics happen in major/sublane dimensions,
because Mosaic (this toolchain) supports: 2-D matmuls, 2-D transposes,
reshapes/permutes that leave the lane dim intact, and lane merges/splits at
128-multiples — but not lane-splitting reshapes to small factors, and its
>2-D dot_general miscompiles (verified empirically).  So the kernel:

1. loads a natural ``(TB, n)`` block, 2-D-transposes it in VMEM to
   ``(n, TB)`` (batch -> lanes),
2. runs the Stockham iteration with invariant array ``(rest, done, TB)``::

       for radix p (q = rest // p):
           A: (2, p, q, done, TB)     -- STACKED (re, im), major split
           Y = G_p @ A as ONE real matmul (2p, 2p) @ (2p, q*done*TB),
               G = [[Fr, -Fi], [Fi, Fr]]  (schoolbook complex product as
               a block matrix; 2 bf16 hi/lo MXU passes per stage)
           Y *= w[k1, j2] = exp(sign*2pi*i*j2*k1/rest)   (VPU; flat or
               broadcast layout per FLAT_TW_MAX_BYTES)
           A = Y permuted (2, q, p, done, TB) -> (2, q*p*done, TB)

   computing X[k_done + done*(k1 + p*k2)] — autosorted, no bit reversal,
3. transposes ``(n, TB)`` back and stores.

Split complex (re, im) f32 planes, stacked through the stage loop so the
complex contraction is one real MXU op.  All trig constants are computed on the host in float64
(twiddle accuracy contract of ``fftw/fftw_api.c:18850-19040``) and streamed
in as kernel operands (fetched once: their block index never changes).
"""
from __future__ import annotations

import math
from functools import partial
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import config
from ..utils import primes
from . import matrices

#: largest stage radix (one (r, r) DFT-matrix contraction on the MXU)
MAX_RADIX = 256
#: single-stage (whole-transform matmul) ceiling: measured cheaper than any
#: two-stage split up to here (round-2 stacked kernels: [256] beats
#: [16,16] 44-47 vs 54-58 ps/pt — no twiddle/permute VMEM sweeps)
MAX_SINGLE = 256


def _stage_cost(p: int) -> float:
    """Measured FIRST-stage cost curve on v5e (ps/pt): narrow contractions
    pay ~230/p (MXU K-underutilization + pass overhead), wide ones ~p/9
    (linear flops)."""
    return 230.0 / p + p / 9.0


def _stage2_cost(q: int) -> float:
    """Measured SECOND-stage cost curve under the stacked-G kernels: the
    last stage's matmul M is p*TB (large), making its linear term much
    steeper than the first stage's.  Fit of the round-2 interleaved sweep:
    (64,16) beats (32,32) at n=1024 (45 vs 54 ps/pt) and (128,16) beats
    (64,32) at n=2048 (58 vs 76) — the optimum sits at q ~ 16.
    Keep in sync with the C++ mirror (pallas_stage2_cost)."""
    return 230.0 / q + float(q)
#: fused-kernel applicability window.  Below MIN_N a single direct matmul
#: (XLA) already runs in one pass; above MAX_N the ~15 live (n, TILE_B)
#: f32 planes exceed the 16 MB scoped-VMEM limit — the planner then
#: composes `mixed` stages around a pallas child.
MIN_N = 128
MAX_N = 2048


def tile_for(n: int) -> int:
    """Batch-lane tile.  128 lanes measured fastest across sizes (256
    raised VMEM pressure round 1 and measured 128 ps/pt under the stacked
    kernels round 2; 64 is below the minimum f32 lane width)."""
    return 128


def choose_radices(n: int) -> List[int]:
    """Factor n into a one- or two-stage radix schedule by the measured
    stage-cost curve (mirrors fftw_choose_radix's role,
    fftw/fftw_api.c:15750-15915, under TPU cost rules; policy duplicated in
    the C++ tier — keep in sync).

    Schedules are limited to <= 2 stages: this Mosaic toolchain miscompiles
    deeper pipelines, and two radices <= 256 cover every n <= 65536 with
    256-smooth structure (the fused-kernel VMEM window ends far earlier).
    Two-stage picks minimize s1(p) + s2(q) (asymmetric: the stages have
    different matmul shapes under the stacked-G kernel) with both radices
    >= 8 when possible (radices 2/4 measured catastrophic: +40-90 ps/pt).
    """
    if n <= MAX_SINGLE:
        return [n]
    best = None
    best_cost = None
    for p in sorted(primes.divisors(n), reverse=True):
        q = n // p
        if not (q >= 2 and p >= q and p <= MAX_RADIX):
            continue
        cost = _stage_cost(p) + _stage2_cost(q)
        if q < 8:
            cost += 1000.0                  # last resort only
        if best is None or cost < best_cost:
            best, best_cost = [p, q], cost
    if best is None:
        raise ValueError(f"{n} has no two-factor schedule with radices "
                         f"<= {MAX_RADIX}")
    return best


def backend_allows(rdtype) -> bool:
    """The n-independent part of the applicability gate: f32 only, and a
    TPU backend unless interpret mode is forced (testing)."""
    if config.pallas_mode == "off":
        return False
    if config.pallas_mode == "auto" and jax.default_backend() != "tpu":
        return False
    return np.dtype(rdtype) == np.float32   # f64 -> XLA-path solvers


def alternative_radices(n: int, k: int = 3) -> List[List[int]]:
    """Up to k alternative schedules for MEASURE-mode timing, cost-ranked
    (single-stage when allowed, then the best two-factor splits)."""
    outs: List[List[int]] = []
    if n <= MAX_RADIX:
        outs.append([n])
    pairs = []
    for p in primes.divisors(n):
        q = n // p
        if q >= 8 and p >= q and p <= MAX_RADIX:
            pairs.append((p, q))
    pairs.sort(key=lambda pq: _stage_cost(pq[0]) + _stage2_cost(pq[1]))
    outs.extend([list(pq) for pq in pairs])
    return outs[:k]


def applicable(n: int, rdtype) -> bool:
    """Planner applicability predicate (the solver's `applicable` analog).

    Like FFTW's per-solver ``applicable()`` gates (alignment/stride
    predicates, SURVEY.md §2.7), this encodes layout constraints: f32 only,
    VMEM-resident sizes, two-stage-factorable n, and a TPU backend (unless
    interpret mode is forced for testing).
    """
    if not backend_allows(rdtype):
        return False
    if n < MIN_N or n > MAX_N:
        return False
    try:
        choose_radices(n)
    except ValueError:
        return False
    return True


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------

#: lane-replicated ("flat") twiddle byte budget.  The flat layout keeps the
#: stage twiddle as a (p, q*L) operand multiplied on the 2-D matmul-output
#: view directly — measured ~13-25 ps/pt faster at n=1024 than the (p,q,1)
#: VPU broadcast (no reshape/broadcast relayout) — at the price of
#: q*L*p*8 bytes of VMEM.  Above the budget fall back to the broadcast.
#: 1.5 MB: n=1024 (1 MB) gets the flat form; n=2048 (2 MB) measured 180 KB
#: over the 16 MB scoped-VMEM limit with it, so it keeps the broadcast.
FLAT_TW_MAX_BYTES = (3 << 20) // 2


def _x64_off():
    """Scope for TRACING/INVOKING Pallas kernels: 32-bit index semantics
    regardless of the ambient jax_enable_x64.  MEASURED (round 4): any
    fresh Mosaic compile of these kernels traced under x64 crashes
    tpu_compile_helper (HTTP 500, exit 1) — the identical kernel traced
    with x64 off compiles and verifies.  The kernels are all-f32 anyway,
    so 32-bit tracing changes nothing numerically; it also protects
    users who enable x64 globally (e.g. for f64 oracles) from losing the
    whole Pallas tier to compiler crashes.  CONDITIONAL on the ambient
    flag so the default (x64 off) path is bit-identical to the pre-wrap
    code — entering the context unconditionally perturbed the jit cache
    key and forced recompiles of long-cached kernels."""
    import contextlib
    if jax.config.jax_enable_x64:
        return jax.enable_x64(False)
    return contextlib.nullcontext()


def _flat_tw_lanes(n: int, radices: Sequence[int], lanes: int):
    """Lane count to replicate stage twiddles to, or 0 for broadcast form."""
    if len(radices) < 2:
        return 0
    p = radices[0]
    if p * (n // p) * lanes * 8 > FLAT_TW_MAX_BYTES:
        return 0
    return lanes


def _stage_consts(n: int, radices: Sequence[int], sign: int,
                  tw_lanes: int = 0, presplit: bool = False):
    """Host-side f64-accurate constants per stage: the stacked complex
    stage matrix G = [[Fr, -Fi], [Fi, Fr]] (2p, 2p), then the twiddle.

    G realizes the whole complex contraction as ONE real matmul over the
    stacked (re, im) planes — 2 bf16 MXU passes per stage instead of the
    6 of a per-product Karatsuba (the MXU is K-underutilized at these
    radices, so the doubled K is nearly free; measured 57 -> 39 ps/pt at
    n=1024, sandwiched A/B/A).

    ``presplit`` (round 4, default on for bf16x3): ship the bf16 hi/lo
    split of G as TWO host-prepared operands — Gh (2p, 2p) bf16 and the
    pre-concatenated GG = [Gh | Gl] (2p, 4p) bf16 — instead of one f32 G
    the kernel casts every grid step.  Measured same-session at n=1024
    [64,16]: 52.4 -> 40.9 ps/pt (-22%) AND it removes the in-kernel
    concat-of-casts whose fresh Mosaic compile crashes on done>1 stages
    (K2_DEFAULT note), re-enabling the fused cross pass everywhere.

    Twiddle laid out [k1, j2] to broadcast over (p, q, done, TB) directly,
    or — with ``tw_lanes = L > 0`` — pre-replicated to the flat (p, q*L)
    layout applied on the 2-D view (see FLAT_TW_MAX_BYTES).
    """
    out = []
    rest = n
    first = True
    for p in radices:
        q = rest // p
        F = matrices.dft_matrix(p, sign)
        Fr = np.ascontiguousarray(F.real)
        Fi = np.ascontiguousarray(F.imag)
        G = np.block([[Fr, -Fi], [Fi, Fr]]).astype(np.float32)
        if presplit:
            Gh32 = G.astype(jnp.bfloat16).astype(np.float32)
            Gh = np.ascontiguousarray(G.astype(jnp.bfloat16))
            Gl = np.ascontiguousarray((G - Gh32).astype(jnp.bfloat16))
            consts = [Gh, np.ascontiguousarray(
                np.concatenate([Gh, Gl], axis=1))]
        else:
            consts = [np.ascontiguousarray(G, np.float32)]
        if q > 1:
            e = np.mod(np.outer(np.arange(p, dtype=np.int64),
                                np.arange(q, dtype=np.int64)), rest)
            w = np.exp(sign * 2j * np.pi * e / rest)
            wr = np.ascontiguousarray(w.real, np.float32)
            wi = np.ascontiguousarray(w.imag, np.float32)
            if tw_lanes and first:     # flat form only for the done==1 stage
                wr = np.ascontiguousarray(
                    np.repeat(wr[:, :, None], tw_lanes, 2).reshape(
                        p, q * tw_lanes))
                wi = np.ascontiguousarray(
                    np.repeat(wi[:, :, None], tw_lanes, 2).reshape(
                        p, q * tw_lanes))
            consts += [wr, wi]
        out.append(consts)
        rest = q
        first = False
    return out


#: byte budget for the k2 Karatsuba form's stacked cross-term operand
#: (a (2p, M) bf16 concat).  Within budget, the Fh@xl + Fl@xh cross terms
#: run as ONE K=2p matmul — the MXU is K-underutilized at these radices,
#: so two stacked K=p passes cost like one (measured -17 ps/pt at n=1024
#: same-session).  n=2048's extra concat planes blew scoped VMEM, so the
#: budget excludes it (falls back to the 3-pass form).
K2_MAX_BYTES = 768 << 10

#: Which stages may use the fused k2 cross pass: "first" (default),
#: "all", or "off".  MEASURED TOOLCHAIN CRASH (round 4, 2026-08-19): the
#: k2 concat on a stage with done > 1 (operand fed by the inter-stage
#: permute) makes tpu_compile_helper exit 1 (HTTP 500) on every FRESH
#: Mosaic compile — first-stage k2, the 3-pass form, and HIGHEST all
#: compile fine, and previously-cached full-k2 executables still run.
#: Wisdom/autotune can pin "all" per-plan via desc["k2"] (the cached
#: headline kernel), so nothing regresses where the cache holds.
#: One-file repro / re-enable probe: experiments/repro_k2_done1.py;
#: bench.py runs it as a canary each driver run (toolchain_probe).
K2_DEFAULT = "first"


def _k2_stage_ok(k2mode: str, done: int) -> bool:
    return k2mode in ("all", "force") or (k2mode == "first" and done == 1)


def _k2_bytes_ok(k2mode: str, nbytes: int) -> bool:
    """``force`` (desc-carried, autotune-injected) overrides the
    K2_MAX_BYTES budget: presplit shrank the cross-pass VMEM (the GG
    operand ships pre-concatenated), so shapes the static budget excludes
    (n=2048's 1 MB first stage) can be raced per-plan without moving the
    global cap."""
    return k2mode == "force" or nbytes <= K2_MAX_BYTES


def _gmm(G, X, k2=True):
    """The stacked stage matmul: (2p, 2p) @ (2p, M) on the MXU.

    Runs either as a precision-pinned f32 matmul (config.pallas_matmul
    "highest": 6-pass, ~1e-7) or — the default — hand-rolled bf16 hi/lo
    (Mosaic lacks Precision.HIGH): the hi*hi pass plus, under ``k2``, the
    two cross terms Fh@Xl + Fl@Xh fused into ONE K=4p pass (at p=32 the
    cross pass K=128 exactly fills the systolic array).  The dropped
    lo*lo term is ~2^-16 relative; measured rel err ~5e-6 end-to-end.
    ``k2=False`` keeps 3 separate passes (VMEM-constrained sizes: the
    stacked cross operand is an extra (4p, M) bf16 buffer).
    """
    if config.pallas_matmul != "bf16x3":
        # Mosaic supports DEFAULT and HIGHEST but NOT HIGH — pin HIGHEST
        # here rather than config.precision() (which maps the global
        # matmul_precision="high" to the unsupported enum; measured:
        # "Unsupported dot precision: HIGH" at compile)
        return jnp.dot(G, X, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
    Gh = G.astype(jnp.bfloat16)
    Gl = (G - Gh.astype(jnp.float32)).astype(jnp.bfloat16)
    Xh = X.astype(jnp.bfloat16)
    Xl = (X - Xh.astype(jnp.float32)).astype(jnp.bfloat16)

    def d(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32)
    if k2:
        GG = jnp.concatenate([Gh, Gl], axis=1)
        XX = jnp.concatenate([Xl, Xh], axis=0)
        return d(Gh, Xh) + d(GG, XX)
    return d(Gh, Xh) + (d(Gh, Xl) + d(Gl, Xh))


def _use_presplit() -> bool:
    """Build-time snapshot: presplit G operands only make sense for the
    hand-rolled bf16 hi/lo arithmetic (the HIGHEST path keeps f32 G)."""
    return config.pallas_presplit_g and config.pallas_matmul == "bf16x3"


def _gmm_ps(Gh, GG, X, k2=True):
    """Presplit form of _gmm: Gh (2p, 2p) bf16 and GG = [Gh | Gl]
    (2p, 4p) bf16 arrive as host-prepared VMEM operands — zero G-side
    cast/concat work in the kernel, and the k2 cross pass compiles on
    every stage (the done>1 crash was the concat of in-kernel casts)."""
    Xh = X.astype(jnp.bfloat16)
    Xl = (X - Xh.astype(jnp.float32)).astype(jnp.bfloat16)

    def d(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32)
    if k2:
        XX = jnp.concatenate([Xl, Xh], axis=0)
        return d(Gh, Xh) + d(GG, XX)
    p2 = Gh.shape[1]
    Gl = GG[:, p2:]
    return d(Gh, Xh) + (d(Gh, Xl) + d(Gl, Xh))


def _gmm_ps_real(Gh, GG, X, p):
    """Presplit contraction for REAL input (r2c kernels' stages): only
    the left p columns of each split participate; contiguous slices of
    the bf16 operands, 3-pass form (the half-real first stage is cheap
    and slicing the pre-concatenated GG for k2 would need a non-
    contiguous gather)."""
    Xh = X.astype(jnp.bfloat16)
    Xl = (X - Xh.astype(jnp.float32)).astype(jnp.bfloat16)

    def d(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32)
    p2 = Gh.shape[1]
    Ghl = Gh[:, :p]
    Gll = GG[:, p2:p2 + p]
    return d(Ghl, Xh) + (d(Ghl, Xl) + d(Gll, Xh))


def _vpu_dft(xr, xi, m, sign):
    """Pure-f32 VPU DFT over axis 0 of an (m, R) split-complex pair,
    natural output order.  Recursive radix-4 (radix-2 tail, radix-5 for
    the 5-smooth part) DIT: the 2/4 butterflies touch only +-1/+-i
    coefficients (adds and plane swaps), the 5-butterfly is the standard
    real-rotation form (4 cos/sin scalar literals); the level twiddles
    are tiny host constants inlined as Mosaic literals.  No bf16
    precision machinery — this is the codelet role (reference
    ``fftw/dft_scalar/codelets/n1_16.c``, ``n1_5.c``) done as VPU
    elementwise chains instead of an MXU contraction, for the small final
    radix where 2p < 128 underfills the systolic rows anyway."""
    if m == 1:
        return xr, xi
    if m % 4 == 0:
        r = 4
    elif m % 2 == 0:
        r = 2
    elif m % 5 == 0:
        r = 5
    else:
        assert m % 3 == 0, m      # gate admits 2-3-5-smooth only
        r = 3
    q = m // r
    R = xr.shape[-1]
    xr3 = xr.reshape(r, q, R)      # x[j1*q + j2] at [j1, j2]
    xi3 = xi.reshape(r, q, R)
    if r == 2:
        br = [xr3[0] + xr3[1], xr3[0] - xr3[1]]
        bi = [xi3[0] + xi3[1], xi3[0] - xi3[1]]
    elif r == 3:
        # X1/X2 = u -+ i*sign*S3*t3 with u = x0 - t1/2 (fftw n1_3.c role)
        S3 = np.float32(np.sqrt(3.0) / 2.0)
        H = np.float32(0.5)
        t1r, t1i = xr3[1] + xr3[2], xi3[1] + xi3[2]
        t3r, t3i = xr3[1] - xr3[2], xi3[1] - xi3[2]
        ur, ui = xr3[0] - H * t1r, xi3[0] - H * t1i
        vr_, vi_ = S3 * t3r, S3 * t3i
        if sign < 0:
            br = [xr3[0] + t1r, ur + vi_, ur - vi_]
            bi = [xi3[0] + t1i, ui - vr_, ui + vr_]
        else:
            br = [xr3[0] + t1r, ur - vi_, ur + vi_]
            bi = [xi3[0] + t1i, ui + vr_, ui - vr_]
    elif r == 5:
        # X[k1] = u_k +- i*sign*v_k with u = x0 + c1*t1 + c2*t2 etc.
        # (fftw's n1_5.c role); all four rotations are scalar literals
        C1 = np.float32(np.cos(2 * np.pi / 5))
        S1 = np.float32(np.sin(2 * np.pi / 5))
        C2 = np.float32(np.cos(4 * np.pi / 5))
        S2 = np.float32(np.sin(4 * np.pi / 5))
        t1r, t1i = xr3[1] + xr3[4], xi3[1] + xi3[4]
        t2r, t2i = xr3[2] + xr3[3], xi3[2] + xi3[3]
        t3r, t3i = xr3[1] - xr3[4], xi3[1] - xi3[4]
        t4r, t4i = xr3[2] - xr3[3], xi3[2] - xi3[3]
        u1r = xr3[0] + C1 * t1r + C2 * t2r
        u1i = xi3[0] + C1 * t1i + C2 * t2i
        u2r = xr3[0] + C2 * t1r + C1 * t2r
        u2i = xi3[0] + C2 * t1i + C1 * t2i
        v1r = S1 * t3r + S2 * t4r
        v1i = S1 * t3i + S2 * t4i
        v2r = S2 * t3r - S1 * t4r
        v2i = S2 * t3i - S1 * t4i
        if sign < 0:               # X1 = u1 - i v1, X2 = u2 - i v2, ...
            br = [xr3[0] + t1r + t2r,
                  u1r + v1i, u2r + v2i, u2r - v2i, u1r - v1i]
            bi = [xi3[0] + t1i + t2i,
                  u1i - v1r, u2i - v2r, u2i + v2r, u1i + v1r]
        else:
            br = [xr3[0] + t1r + t2r,
                  u1r - v1i, u2r - v2i, u2r + v2i, u1r + v1i]
            bi = [xi3[0] + t1i + t2i,
                  u1i + v1r, u2i + v2r, u2i - v2r, u1i - v1r]
    else:
        t0r, t0i = xr3[0] + xr3[2], xi3[0] + xi3[2]
        t1r, t1i = xr3[0] - xr3[2], xi3[0] - xi3[2]
        t2r, t2i = xr3[1] + xr3[3], xi3[1] + xi3[3]
        t3r, t3i = xr3[1] - xr3[3], xi3[1] - xi3[3]
        if sign < 0:               # omega_4 = -i: t3 * -i = (t3i, -t3r)
            u3r, u3i = t3i, -t3r
        else:                      # omega_4 = +i
            u3r, u3i = -t3i, t3r
        br = [t0r + t2r, t1r + u3r, t0r - t2r, t1r - u3r]
        bi = [t0i + t2i, t1i + u3i, t0i - t2i, t1i - u3i]
    if q > 1:
        # level twiddle w = omega_m^{j2*k1}, applied as SCALAR row cmuls
        # (Pallas kernels cannot capture array constants); most rows snap
        # to +-1/+-i and cost a negation/swap at most
        for k1 in range(1, r):
            rr, ri = [], []
            for j2 in range(q):
                w = np.exp(sign * 2j * np.pi * ((j2 * k1) % m) / m)
                for exact in (1, -1, 1j, -1j):
                    if abs(w - exact) < 1e-12:
                        w = exact
                        break
                xr_j = br[k1][j2:j2 + 1]
                xi_j = bi[k1][j2:j2 + 1]
                if w == 1:
                    rr.append(xr_j)
                    ri.append(xi_j)
                elif w == -1:
                    rr.append(-xr_j)
                    ri.append(-xi_j)
                elif w == 1j:
                    rr.append(-xi_j)
                    ri.append(xr_j)
                elif w == -1j:
                    rr.append(xi_j)
                    ri.append(-xr_j)
                else:
                    wr = np.float32(w.real)
                    wi = np.float32(w.imag)
                    rr.append(xr_j * wr - xi_j * wi)
                    ri.append(xr_j * wi + xi_j * wr)
            br[k1] = jnp.concatenate(rr, axis=0)
            bi[k1] = jnp.concatenate(ri, axis=0)
    zs = [_vpu_dft(br[k1], bi[k1], q, sign) for k1 in range(r)]
    # X[k1 + r*k2] at child k1, row k2 -> stack k1 minor under k2
    yr = jnp.stack([z[0] for z in zs], axis=1).reshape(m, R)
    yi = jnp.stack([z[1] for z in zs], axis=1).reshape(m, R)
    return yr, yi


def _vpu_last_ok(p: int, sign: int) -> bool:
    """Gate for the VPU stage path: radix 2-3-5-smooth and <= 64 (the
    butterfly recursion covers radices 4/2/5/3).  ``sign`` here is the
    build-time snapshot the kernel builders take of
    ``config.pallas_vpu_last`` (0 when the flag was off at plan build —
    the flag must NOT be read at trace time, or a plan built under one
    setting would silently retrace under another)."""
    if sign == 0 or p > 64:
        return False
    m = p
    for f in (2, 3, 5):
        while m % f == 0:
            m //= f
    return m == 1


def _vpu_sign(sign: int, vpu) -> int:
    """Encode the VPU-stage variant into the kernel ``sign`` channel:
    0 = MXU everywhere, +-1 = final stage as VPU butterflies
    (``vpu is True``), +-2 = EVERY eligible stage as VPU butterflies
    (``vpu == "all"`` — no G matmul, no bf16 hi/lo casts anywhere the
    radix is a power of two <= 64).  One channel so the variant threads
    through every kernel partial unchanged."""
    if not vpu:
        return 0
    return sign * (2 if vpu == "all" else 1)


def _stages(radices, n, tb, crefs, ar, ai, tw_lanes=0, sign=0,
            k2mode=K2_DEFAULT, presplit=False):
    """Shared Stockham stage loop on (n, TB) values (transform index in
    major/sublane dims, TB lanes).  ``tw_lanes == tb`` selects the flat
    first-stage twiddle (see FLAT_TW_MAX_BYTES).

    The (re, im) planes travel STACKED as one (2, rest*done, TB) array:
    each stage's complex contraction is a single real (2p, 2p) matmul
    over the major-merged (2p, q*done*TB) view (G matrix, see
    _stage_consts), and the inter-stage permute moves both planes in one
    major-dim transpose."""
    done = 1
    rest = n
    ci = 0
    # sign channel: 0 = MXU stages; +-1 = final stage VPU; +-2 = every
    # eligible stage VPU (see _vpu_sign).  tsign is the TRANSFORM sign
    # the butterfly twiddles need.
    vpu_all = abs(sign) == 2
    tsign = 0 if sign == 0 else (1 if sign > 0 else -1)
    # ai=None: REAL input (the r2c kernels) — the first stage contracts
    # only the left (p-column) block of G, halving its MXU work instead
    # of multiplying a zero imaginary plane
    st = ar[None] if ai is None \
        else jnp.concatenate([ar[None], ai[None]], 0)  # (2, n, TB)
    for si, p in enumerate(radices):
        q = rest // p
        M = q * done * tb
        if (st.shape[0] == 2 and _vpu_last_ok(p, sign)
                and (q == 1 or vpu_all)):
            # stage as pure-f32 VPU butterflies (no G matmul, no hi/lo
            # casts); crefs hold the unused G — skip it (two operands
            # under presplit).  The (p, M) view matches the matmul's
            # contraction layout exactly, so the twiddle/permute code
            # below is shared.
            ci += 2 if presplit else 1
            st2 = st.reshape(2, p, M)
            yr, yi = _vpu_dft(st2[0], st2[1], p, tsign)
            if q == 1:
                st = jnp.concatenate([yr.reshape(1, p * done, tb),
                                      yi.reshape(1, p * done, tb)], 0)
                done *= p
                rest = q
                continue
            y = jnp.concatenate([yr, yi], 0)          # (2p, M)
        elif presplit:
            Gh = crefs[ci][...]
            GG = crefs[ci + 1][...]
            ci += 2
            # presplit operands kill the in-kernel G cast+concat, so the
            # k2 cross pass is compile-safe on EVERY stage — "first"
            # means "all" here (only "off" still disables it)
            k2ok = k2mode != "off"
            if st.shape[0] == 1:
                y = _gmm_ps_real(Gh, GG, st.reshape(p, M), p)
            else:
                y = _gmm_ps(Gh, GG, st.reshape(2 * p, M),
                            k2=(k2ok and _k2_bytes_ok(k2mode, 4 * p * M)))
        else:
            G = crefs[ci][...]
            ci += 1
            # contraction over (c, j1): the (2, p, ...) major pair merges
            # to rows of ONE 2-D matmul on (2p, q*done*TB)
            k2ok = _k2_stage_ok(k2mode, done)
            if st.shape[0] == 1:
                y = _gmm(G[:, :p], st.reshape(p, M),
                         k2=(k2ok and _k2_bytes_ok(k2mode, 2 * p * M)))
            else:
                y = _gmm(G, st.reshape(2 * p, M),
                         k2=(k2ok and _k2_bytes_ok(k2mode, 4 * p * M)))
        if q > 1:
            if done == 1 and tw_lanes == tb:
                # flat twiddle on the 2-D matmul-output view (no
                # reshape/broadcast relayout before the VPU pass)
                wr = crefs[ci][...]
                wi = crefs[ci + 1][...]
                ci += 2
                y3 = y.reshape(2, p, M)
                tr = y3[0] * wr - y3[1] * wi
                ti = y3[0] * wi + y3[1] * wr
                y = jnp.concatenate([tr[None], ti[None]], 0)
            else:
                sh = (p, q) + ((1, 1) if done > 1 else (1,))
                wr = crefs[ci][...].reshape(sh)
                wi = crefs[ci + 1][...].reshape(sh)
                ci += 2
                y3 = y.reshape((2, p, q) +
                               ((done, tb) if done > 1 else (tb,)))
                tr = y3[0] * wr - y3[1] * wi
                ti = y3[0] * wi + y3[1] * wr
                y = jnp.concatenate([tr[None], ti[None]], 0)
            if done == 1:
                st = jnp.transpose(y.reshape(2, p, q, tb),
                                   (0, 2, 1, 3)).reshape(2, q * p, tb)
            else:
                # (2, p, q, done, TB) -> (2, q, p, done, TB)
                st = jnp.transpose(y.reshape(2, p, q, done, tb),
                                   (0, 2, 1, 3, 4)).reshape(
                    2, q * p * done, tb)
        else:
            st = y.reshape(2, p * done, tb)   # p-major: the final order
        done *= p
        rest = q
    return st[0], st[1]


def _kernel(radices, n, tb, pretwiddle, tw_lanes, store_kp, sign, k2mode,
            presplit, *refs):
    """Last-axis form: blocks (TB, n); transpose to batch-in-lanes and
    back inside VMEM (measured: the 2-D transposes are free).

    With ``pretwiddle`` the first two consts are a (TB, n) complex multiply
    applied to the natural-layout input block — the four-step twiddle fused
    into this kernel's load phase."""
    xr_ref, xi_ref = refs[0], refs[1]
    yr_ref, yi_ref = refs[-2], refs[-1]
    crefs = refs[2:-2]
    xr = xr_ref[...]
    xi = xi_ref[...]
    if pretwiddle:
        p = pretwiddle
        twr = crefs[0][...].reshape(1, p, n)   # (p, n) const, broadcast
        twi = crefs[1][...].reshape(1, p, n)   # over the tb//p row groups
        crefs = crefs[2:]
        xr3 = xr.reshape(tb // p, p, n)
        xi3 = xi.reshape(tb // p, p, n)
        xr3, xi3 = xr3 * twr - xi3 * twi, xr3 * twi + xi3 * twr
        xr = xr3.reshape(tb, n)
        xi = xi3.reshape(tb, n)
    ar, ai = _stages(radices, n, tb, crefs,
                     jnp.transpose(xr), jnp.transpose(xi),
                     tw_lanes=tw_lanes, sign=sign, k2mode=k2mode,
                     presplit=presplit)
    if store_kp:
        # four-step fused store: rows are (b, k1) pairs with k1 = row mod
        # p; emit (g, n, p) blocks so the (B, p, q) -> (B, q, p) output
        # transpose happens in VMEM instead of as a third HBM pass
        kp = store_kp
        g = tb // kp
        yr_ref[...] = jnp.transpose(
            jnp.transpose(ar).reshape(g, kp, n), (0, 2, 1))
        yi_ref[...] = jnp.transpose(
            jnp.transpose(ai).reshape(g, kp, n), (0, 2, 1))
        return
    yr_ref[...] = jnp.transpose(ar)
    yi_ref[...] = jnp.transpose(ai)


def _kernel_inner(radices, n, g, tl, tw_lanes, sign, k2mode, presplit,
                  *refs):
    """Axis -2 form: blocks (G, n, TL); the trailing dims already are the
    lanes.  G leading rows share one grid step (small n would otherwise
    drown in per-block overhead); they fold into the lane dimension via a
    major-dim swap + 128-multiple lane merge (both Mosaic-supported)."""
    xr_ref, xi_ref = refs[0], refs[1]
    yr_ref, yi_ref = refs[-2], refs[-1]
    if g == 1:
        ar, ai = _stages(radices, n, tl, refs[2:-2], xr_ref[0], xi_ref[0],
                         tw_lanes=tw_lanes, sign=sign, k2mode=k2mode,
                         presplit=presplit)
        yr_ref[0] = ar
        yi_ref[0] = ai
        return
    xr = jnp.transpose(xr_ref[...], (1, 0, 2)).reshape(n, g * tl)
    xi = jnp.transpose(xi_ref[...], (1, 0, 2)).reshape(n, g * tl)
    ar, ai = _stages(radices, n, g * tl, refs[2:-2], xr, xi,
                     tw_lanes=tw_lanes, sign=sign, k2mode=k2mode,
                     presplit=presplit)
    yr_ref[...] = jnp.transpose(ar.reshape(n, g, tl), (1, 0, 2))
    yi_ref[...] = jnp.transpose(ai.reshape(n, g, tl), (1, 0, 2))


def _make_call(n: int, radices: Sequence[int], sign: int, tb: int,
               interpret: bool, pretwiddle_p: int = 0,
               store_transposed: bool = False, vpu=None,
               k2mode=K2_DEFAULT, gsplit=None):
    """pretwiddle_p > 0: fuse the four-step twiddle w[k1, j2] =
    exp(sign*2pi*i*k1*j2/(p*n)) into the load phase, where k1 = global row
    index mod p.  Requires p | tb or tb | p (power-of-two p).

    ``store_transposed`` (with pretwiddle_p = p): write (B/p, n, p) output
    blocks — the four-step's (b, k1, k2) -> (b, k2, k1) reordering done in
    VMEM at store time, saving the composition's third HBM pass."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    tw_lanes = _flat_tw_lanes(n, radices, tb)
    presplit = _use_presplit() if gsplit is None else bool(gsplit)
    consts = _stage_consts(n, radices, sign, tw_lanes, presplit=presplit)
    flat_consts = [c for stage in consts for c in stage]
    const_specs = [pl.BlockSpec(c.shape, lambda i: (0, 0),
                                memory_space=pltpu.VMEM)
                   for c in flat_consts]
    if pretwiddle_p:
        p = pretwiddle_p
        assert p <= tb and tb % p == 0, "pretwiddle needs p | TB"
        N = p * n
        e = np.mod(np.outer(np.arange(p, dtype=np.int64),
                            np.arange(n, dtype=np.int64)), N)
        w = np.exp(sign * 2j * np.pi * e / N)           # (p, n): compact —
        # the kernel broadcasts it over the tb//p row groups (a tiled
        # (tb, n) constant inflated the MLIR by MBs and broke compiles)
        tw_specs = [pl.BlockSpec((p, n), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM)] * 2
        flat_consts = [np.ascontiguousarray(w.real, np.float32),
                       np.ascontiguousarray(w.imag, np.float32)] \
            + flat_consts
        const_specs = tw_specs + const_specs
    store_kp = pretwiddle_p if store_transposed else 0
    if store_kp:
        assert pretwiddle_p and tb % pretwiddle_p == 0
    if vpu is None:
        vpu = config.pallas_vpu_last       # build-time snapshot
    kernel = partial(_kernel, tuple(radices), n, tb, pretwiddle_p,
                     tw_lanes, store_kp, _vpu_sign(sign, vpu), k2mode,
                     presplit)

    data_spec = pl.BlockSpec((tb, n), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    flops_per_block = int(6 * n * sum(radices) * tb)

    def run(xr, xi):
        B = xr.shape[0]
        grid = (B // tb,)
        if store_kp:
            gb = tb // store_kp
            out_spec = pl.BlockSpec((gb, n, store_kp),
                                    lambda i: (i, 0, 0),
                                    memory_space=pltpu.VMEM)
            out_shape = [jax.ShapeDtypeStruct((B // store_kp, n, store_kp),
                                              jnp.float32)] * 2
            out_specs = [out_spec, out_spec]
        else:
            out_shape = [jax.ShapeDtypeStruct((B, n), jnp.float32)] * 2
            out_specs = [data_spec, data_spec]
        fn = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[data_spec, data_spec] + const_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=flops_per_block * grid[0],
                bytes_accessed=int(4 * B * n * 4),
                transcendentals=0),
        )
        with _x64_off():
            return fn(xr, xi, *flat_consts)

    return run


#: axis-(-2) kernel working-set budget in points (n * effective lanes).
#: Half the 1-D kernel's window: the 3-D<->2-D relayouts add live planes
#: (g=1024 at n=2 blew the 16 MB scoped-VMEM limit).
INNER_AREA = MAX_N * 64


#: the axis-(-2) form keeps more live planes than the last-axis form (the
#: 3-D blocks + relayouts); n * first-radix above this measured bound
#: blows scoped VMEM (n=2048 with p=128 fails; p=64 fits)
INNER_NP_MAX = 2048 * 64


def _inner_radices(n: int, radices: Sequence[int]) -> List[int]:
    """Re-choose the schedule under the inner form's tighter VMEM bound
    (same cost curves, capped first radix); keep the given schedule when
    it already fits."""
    if len(radices) < 2 or n * radices[0] <= INNER_NP_MAX:
        return list(radices)
    best = None
    best_cost = None
    for p in sorted(primes.divisors(n), reverse=True):
        q = n // p
        if not (q >= 2 and p >= q and p <= MAX_RADIX
                and n * p <= INNER_NP_MAX):
            continue
        cost = _stage_cost(p) + _stage2_cost(q)
        if q < 8:
            cost += 1000.0
        if best is None or cost < best_cost:
            best, best_cost = [p, q], cost
    return best if best is not None else list(radices)


def _make_call_inner(n: int, radices: Sequence[int], sign: int, tl: int,
                     interpret: bool, vpu=None, k2mode=K2_DEFAULT,
                     gsplit=None, area=None):
    """pallas_call factory for the axis -2 form: data (pre, n, L), blocks
    (G, n, TL) — no HBM-level transposes (the lanes ARE the trailing
    dims); G leading rows amortize per-block overhead for small n.
    ``area`` overrides the INNER_AREA working-set budget (desc-carried:
    small-n inner passes like pallas4's p=32 leg can afford wider
    blocks)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if vpu is None:
        vpu = config.pallas_vpu_last       # build-time snapshot
    vsign = _vpu_sign(sign, vpu)
    presplit = _use_presplit() if gsplit is None else bool(gsplit)
    area0 = INNER_AREA if area is None else int(area)

    def make_fn(pre, L):
        # budget an (n x lanes) working set ~ the 1-D kernel's: first widen
        # the lane tile (cheap), then group leading rows.  L need not be a
        # tile multiple: Pallas masks the partial edge block, and row-FFT
        # math is lane-independent.
        area = area0
        tle = tl
        while tle * 2 <= L and n * tle * 2 <= area:
            tle *= 2
        g = max(1, area // (n * tle))
        g = 1 << (g.bit_length() - 1)
        while pre % g:
            g //= 2
        lanes = tle if g == 1 else g * tle
        tw_lanes = _flat_tw_lanes(n, radices, lanes)
        consts = _stage_consts(n, radices, sign, tw_lanes,
                               presplit=presplit)
        flat_consts = [c for stage in consts for c in stage]
        kernel = partial(_kernel_inner, tuple(radices), n, g, tle,
                         tw_lanes, vsign, k2mode, presplit)
        data_spec = pl.BlockSpec((g, n, tle), lambda i, j: (i, 0, j),
                                 memory_space=pltpu.VMEM)
        const_specs = [pl.BlockSpec(c.shape, lambda i, j: (0, 0),
                                    memory_space=pltpu.VMEM)
                       for c in flat_consts]
        grid = (pre // g, -(-L // tle))
        out_shape = [jax.ShapeDtypeStruct((pre, n, L), jnp.float32)] * 2
        return (pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[data_spec, data_spec] + const_specs,
            out_specs=[data_spec, data_spec],
            out_shape=out_shape,
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=int(6 * n * sum(radices) * g * tle)
                * grid[0] * grid[1],
                bytes_accessed=int(4 * pre * n * L * 4),
                transcendentals=0),
        ), flat_consts)

    def run(xr, xi):
        pre, _, L = xr.shape
        fn, consts = make_fn(pre, L)
        with _x64_off():
            return fn(xr, xi, *consts)

    return run


#: lane-tile for the axis -2 kernel
INNER_TILE_L = 128

#: VMEM-resident point budget for the fused 2-D kernel (both axes of a
#: (n1, n2) tile transformed in one HBM pass; ~10 live f32 plane-pairs)
MAX_2D_POINTS = 300_000


def _kernel_2d(rad1, rad2, n1, n2, g, tw1, tw2, sign, k2mode, presplit,
               *refs):
    """Fused 2-D form: block (g, n1, n2); FFT over BOTH trailing axes in
    one pass.  x -> T -> stages(n2) over sublanes [g*n1 lanes] -> T ->
    stages(n1) [g*n2 lanes] -> out; the 2-D transposes live in VMEM
    (free).  g > 1 lane-concatenates g planes so per-grid-step overhead
    amortizes and the stage matmuls widen (the pallas4 tile_b lesson —
    legal because n1, n2 are 128-multiples, see applicable_2d).
    Constant refs: stage consts for n2, then for n1."""
    xr_ref, xi_ref = refs[0], refs[1]
    yr_ref, yi_ref = refs[-2], refs[-1]
    ncr2 = _n_consts(rad2, presplit)
    crefs2 = refs[2:2 + ncr2]
    crefs1 = refs[2 + ncr2:-2]
    if g == 1:
        ar = jnp.transpose(xr_ref[0])      # (n2, n1)
        ai = jnp.transpose(xi_ref[0])
    else:
        ar = jnp.concatenate(
            [jnp.transpose(xr_ref[k]) for k in range(g)], axis=1)
        ai = jnp.concatenate(
            [jnp.transpose(xi_ref[k]) for k in range(g)], axis=1)
    ar, ai = _stages(rad2, n2, g * n1, crefs2, ar, ai,   # FFT along n2
                     tw_lanes=tw2, sign=sign, k2mode=k2mode,
                     presplit=presplit)
    if g == 1:
        ar = jnp.transpose(ar)             # (n1, K2)
        ai = jnp.transpose(ai)
    else:
        ar = jnp.concatenate(
            [jnp.transpose(ar[:, k * n1:(k + 1) * n1]) for k in range(g)],
            axis=1)
        ai = jnp.concatenate(
            [jnp.transpose(ai[:, k * n1:(k + 1) * n1]) for k in range(g)],
            axis=1)
    ar, ai = _stages(rad1, n1, g * n2, crefs1, ar, ai,   # FFT along n1
                     tw_lanes=tw1, sign=sign, k2mode=k2mode,
                     presplit=presplit)
    if g == 1:
        yr_ref[0] = ar
        yi_ref[0] = ai
    else:
        for k in range(g):
            yr_ref[k] = ar[:, k * n2:(k + 1) * n2]
            yi_ref[k] = ai[:, k * n2:(k + 1) * n2]


def _n_consts(radices, presplit: bool = False) -> int:
    """Number of constant arrays a radix schedule consumes (one stacked G
    — or the Gh/GG pair under presplit — per stage + twiddle pair for
    every stage but the last)."""
    per_g = 2 if presplit else 1
    return (per_g + 2) * len(radices) - 2


def _make_call_2d(n1: int, n2: int, rad1, rad2, sign: int, interpret: bool,
                  vpu=None, k2mode=K2_DEFAULT, gsplit=None, tile_g=1):
    """``tile_g`` groups that many leading planes per block (desc-carried
    "tile_b" on 2-D-fused descs); clamped to the MAX_2D_POINTS VMEM
    budget and to a divisor of the batch at call time."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    presplit = _use_presplit() if gsplit is None else bool(gsplit)
    if vpu is None:
        vpu = config.pallas_vpu_last       # build-time snapshot
    vsign = _vpu_sign(sign, vpu)
    tile_g0 = max(1, int(tile_g))

    def make_fn(pre):
        g = tile_g0
        while g > 1 and (pre % g or g * n1 * n2 > MAX_2D_POINTS):
            g //= 2
        tw2 = _flat_tw_lanes(n2, rad2, g * n1)
        tw1 = _flat_tw_lanes(n1, rad1, g * n2)
        c2 = [c for st in _stage_consts(n2, rad2, sign, tw2,
                                        presplit=presplit) for c in st]
        c1 = [c for st in _stage_consts(n1, rad1, sign, tw1,
                                        presplit=presplit) for c in st]
        flat_consts = c2 + c1
        kernel = partial(_kernel_2d, tuple(rad1), tuple(rad2), n1, n2, g,
                         tw1, tw2, vsign, k2mode, presplit)
        data_spec = pl.BlockSpec((g, n1, n2), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM)
        const_specs = [pl.BlockSpec(c.shape, lambda i: (0, 0),
                                    memory_space=pltpu.VMEM)
                       for c in flat_consts]
        flops_per_block = int(6 * g * (n2 * sum(rad2) * n1
                                       + n1 * sum(rad1) * n2))
        out_shape = [jax.ShapeDtypeStruct((pre, n1, n2), jnp.float32)] * 2
        return (pl.pallas_call(
            kernel,
            grid=(pre // g,),
            in_specs=[data_spec, data_spec] + const_specs,
            out_specs=[data_spec, data_spec],
            out_shape=out_shape,
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=flops_per_block * (pre // g),
                bytes_accessed=int(4 * pre * n1 * n2 * 4),
                transcendentals=0),
        ), flat_consts)

    def run(xr, xi):
        pre = xr.shape[0]
        fn, flat_consts = make_fn(pre)
        with _x64_off():
            return fn(xr, xi, *flat_consts)

    return run


def applicable_2d(n1: int, n2: int, rdtype) -> bool:
    """Can the fused 2-D kernel take the last two transform axes whole?"""
    if not backend_allows(rdtype):
        return False
    if n1 % 128 or n2 % 128:               # both act as lane dims in turn
        return False
    if n1 * n2 > MAX_2D_POINTS:
        return False
    try:
        choose_radices(n1), choose_radices(n2)
    except ValueError:
        return False
    return n1 <= MAX_N and n2 <= MAX_N


def build_pallas_c2c_split_2d(n1: int, n2: int, sign: int, rdtype,
                              desc1=None, desc2=None):
    """Split-complex apply transforming BOTH trailing axes of
    (..., n1, n2) in one fused kernel pass.

    ``desc1``/``desc2`` are the per-axis planner descriptors; their
    ``radices`` and ``vpu`` pins are honored (wisdom steers the fused
    kernel too, e.g. a measured [16,16]-vpuall beating the [256] single
    stage at n=256), still re-capped by the inner form's VMEM bound."""
    desc1, desc2 = desc1 or {}, desc2 or {}
    rad1 = _inner_radices(n1, desc1.get("radices") or choose_radices(n1))
    rad2 = _inner_radices(n2, desc2.get("radices") or choose_radices(n2))
    mode = config.pallas_mode
    if mode == "auto":
        interpret = jax.default_backend() != "tpu"
    elif mode == "interpret":
        interpret = True
    else:
        interpret = False
    vpu = desc1.get("vpu", desc2.get("vpu"))   # pin for fwd + lazy adjoint
    if vpu is None:
        vpu = config.pallas_vpu_last
    k2mode = desc1.get("k2", desc2.get("k2", K2_DEFAULT))
    gsplit = desc1.get("gsplit", desc2.get("gsplit"))
    # "tile_b" counts leading ROWS everywhere; one (n1, n2) plane is n1
    # rows, so the fused form groups tile_b//n1 planes per block — the
    # pallas4 tile_b lesson applied to the 3-D plan's trailing-axes pass
    # (ADVICE r4: this knob must actually reach the kernel).  The legacy
    # row-tile value 128 maps to g=1, i.e. the historical geometry.
    tile_g = max(1, (desc1.get("tile_b", desc2.get("tile_b")) or 128)
                 // n1)
    call = _make_call_2d(n1, n2, rad1, rad2, sign, interpret, vpu=vpu,
                         k2mode=k2mode, gsplit=gsplit, tile_g=tile_g)
    adj_call = [None]

    def _run(xr, xi, c):
        lead = xr.shape[:-2]
        pre = int(np.prod(lead)) if lead else 1
        yr, yi = c(xr.reshape(pre, n1, n2), xi.reshape(pre, n1, n2))
        return yr.reshape(*lead, n1, n2), yi.reshape(*lead, n1, n2)

    @jax.custom_vjp
    def apply(xr, xi):
        return _run(xr, xi, call)

    def fwd(xr, xi):
        return apply(xr, xi), None

    def bwd(_, g):
        if adj_call[0] is None:
            adj_call[0] = _make_call_2d(n1, n2, rad1, rad2, -sign, interpret,
                                        k2mode=k2mode, gsplit=gsplit,
                                        vpu=vpu, tile_g=tile_g)
        return _run(g[0], g[1], adj_call[0])

    apply.defvjp(fwd, bwd)
    return apply


def build_pallas_c2c_split_inner(desc: Dict, sign: int, rdtype):
    """Split-complex apply over axis -2 of (..., n, L) arrays.  Used by
    multi-axis plans for every non-last transform axis: zero moveaxis
    passes, zero in-kernel transposes.  Returns None if the layout is
    unsuitable (caller falls back to the moveaxis path).

    Unaligned L (the 2-D r2c plan's half-spectrum trail L = n/2+1 is the
    canonical case): ONE masked edge lane tile pessimizes the WHOLE
    stage kernel ~2.5x per tile (experiments/r2c_decomp.py at n=2048:
    L=1025 1623-1885 us vs L=1024 658-712 — while copy-only masked
    tiles are nearly free, experiments/copy_inner.py, so it is the
    compiled kernel that degrades, not the edge DMA), so unaligned
    inputs are zero-PADDED to the next lane-tile multiple and the
    result sliced back — two cheap copy passes buy an all-aligned
    kernel.  (A dense-matrix edge peel was tried first and is SLOWER:
    four HIGHEST-precision einsums re-read the (n, n) operand ~6x
    each.)  Keeps the rdft2 rank-geq2 role
    (/root/reference/fftw/fftw_api.c:5552-6190) off the slow path."""
    n = desc["n"]
    radices = _inner_radices(n, desc.get("radices") or choose_radices(n))
    mode = config.pallas_mode
    if mode == "auto":
        interpret = jax.default_backend() != "tpu"
    elif mode == "interpret":
        interpret = True
    else:
        interpret = False
    tl = INNER_TILE_L
    vpu = desc.get("vpu")                  # pin for fwd AND lazy adjoint;
    if vpu is None:                        # desc overrides config default
        vpu = config.pallas_vpu_last
    k2mode = desc.get("k2", K2_DEFAULT)
    gsplit = desc.get("gsplit")
    iarea = desc.get("inner_area")
    pad_align = desc.get("pad_align")      # desc-carried variant pin;
    if pad_align is None:                  # else build-time config snap
        pad_align = config.inner_pad_align
    call = _make_call_inner(n, radices, sign, tl, interpret, vpu=vpu,
                            k2mode=k2mode, gsplit=gsplit, area=iarea)
    adj_call = [None]

    def _run(xr, xi, c):
        lead = xr.shape[:-2]
        L = xr.shape[-1]
        pre = int(np.prod(lead)) if lead else 1
        xr3 = xr.reshape(pre, n, L)
        xi3 = xi.reshape(pre, n, L)
        w = L % INNER_TILE_L if pad_align else 0
        if w:
            # pad-to-aligned (VJP note: transpose of slice∘F∘pad is
            # pad∘F_opp∘slice, which is exactly this same _run with the
            # adjoint call — the custom bwd below stays correct)
            pad = INNER_TILE_L - w
            xr3 = jnp.pad(xr3, ((0, 0), (0, 0), (0, pad)))
            xi3 = jnp.pad(xi3, ((0, 0), (0, 0), (0, pad)))
        yr, yi = c(xr3, xi3)
        if w:
            yr = yr[..., :L]
            yi = yi[..., :L]
        return yr.reshape(*lead, n, L), yi.reshape(*lead, n, L)

    @jax.custom_vjp
    def apply(xr, xi):
        return _run(xr, xi, call)

    def fwd(xr, xi):
        return apply(xr, xi), None

    def bwd(_, g):
        if adj_call[0] is None:
            adj_call[0] = _make_call_inner(n, radices, -sign, tl, interpret,
                                           vpu=vpu, k2mode=k2mode,
                                           gsplit=gsplit, area=iarea)
        return _run(g[0], g[1], adj_call[0])

    apply.defvjp(fwd, bwd)
    return apply


def inner_applicable(desc: Dict, trail: int) -> bool:
    """Can the axis -2 kernel serve a transform whose trailing-dims product
    is `trail`?  Any trail >= one lane tile works: Pallas masks the partial
    edge block, and row-FFT math is lane-independent (garbage lanes in the
    padding cannot contaminate real ones)."""
    return desc.get("alg") == "pallas" and trail >= INNER_TILE_L


def build_pallas_c2c_split(desc: Dict, sign: int, rdtype):
    """Split-complex apply for {"alg": "pallas", "n": n, "radices": [...]}.

    Handles arbitrary leading batch dims; pads the flattened batch up to the
    TILE_B multiple.  Falls back to interpret mode off-TPU (tests) unless
    config.pallas_mode forces otherwise.
    """
    n = desc["n"]
    radices = desc.get("radices") or choose_radices(n)
    assert math.prod(radices) == n, (radices, n)
    # tb honored verbatim, including sub-128 values: they crash Mosaic on
    # toolchains with the lane-merge restriction (bisect4096), and that
    # crash must stay VISIBLE — the tb32 canary probe and the n=4096
    # single-kernel autotune arms build exactly these descs to detect a
    # toolchain fix (an early round-5 guard silently rewrote tb<128 to
    # tile_for(n) here and turned the probe into a false PASS)
    tb = desc.get("tile_b") or tile_for(n)
    mode = config.pallas_mode
    if mode == "auto":
        interpret = jax.default_backend() != "tpu"
    elif mode == "interpret":
        interpret = True
    else:
        interpret = False
    # variant pin for fwd AND lazy adjoint: an explicit desc["vpu"] (a
    # wisdom entry recording the measured winner) overrides the config
    # default — the descriptor is the unit of wisdom, so the solver
    # variant must be serializable with it
    vpu = desc.get("vpu")
    if vpu is None:
        vpu = config.pallas_vpu_last
    k2mode = desc.get("k2", K2_DEFAULT)
    gsplit = desc.get("gsplit")
    call = _make_call(n, radices, sign, tb, interpret, vpu=vpu,
                      k2mode=k2mode, gsplit=gsplit)
    # VJP of an unnormalized DFT is the opposite-sign unnormalized DFT
    # (the real-split map [[A,-B],[B,A]] has transpose [[A,B],[-B,A]],
    # i.e. conj(F) = F_{-sign}); built lazily, only if grads are taken.
    adj_call = [None]

    def _run(xr, xi, c):
        shp = xr.shape[:-1]
        B = int(np.prod(shp)) if shp else 1
        xr2 = xr.reshape(B, n)
        xi2 = xi.reshape(B, n)
        Bp = -(-B // tb) * tb
        if Bp != B:
            xr2 = jnp.pad(xr2, ((0, Bp - B), (0, 0)))
            xi2 = jnp.pad(xi2, ((0, Bp - B), (0, 0)))
        yr, yi = c(xr2, xi2)
        return yr[:B].reshape(*shp, n), yi[:B].reshape(*shp, n)

    @jax.custom_vjp
    def apply(xr, xi):
        return _run(xr, xi, call)

    def fwd(xr, xi):
        return apply(xr, xi), None

    def bwd(_, g):
        if adj_call[0] is None:
            adj_call[0] = _make_call(n, radices, -sign, tb, interpret,
                                     vpu=vpu, k2mode=k2mode,
                                     gsplit=gsplit)
        return _run(g[0], g[1], adj_call[0])

    apply.defvjp(fwd, bwd)
    return apply


# ---------------------------------------------------------------------------
# fused r2c kernel: pack -> half-size c2c stages -> untangle, one HBM pass
# (the rdft2-ct-hc2c codelet role, fftw/fftw_api.c:5552-6190, fused whole)
# ---------------------------------------------------------------------------

def _kernel_r2c(radices, n, tb, tw_lanes, vsign, k2mode, presplit,
                merge, *refs):
    """Block (tb, n) real in -> (tb, n//2+1) re/im out.

    The radix-2 DIT identity with real half-signals: A = DFT_m(even
    samples), B = DFT_m(odd samples), then X[k] = A[k] + w^k B[k] for
    k = 0..m with A[m] := A[0] — no Hermitian reversal needed anywhere
    (Mosaic has no `rev` primitive).  Two half-size real-input transforms
    cost ~4/3 of one complex one and the whole thing stays a single HBM
    pass.

    ``merge``: run the A and B pipelines as ONE double-lane-width
    _stages call (every stage op is lane-independent) — half the matmul
    invocations and per-stage fixed costs; the recombine slices the lane
    halves back apart (tb-aligned).
    """
    # refs = (x, w_re, w_im, *stage_consts, y_re, y_im)
    x_ref = refs[0]
    wr_ref, wi_ref = refs[1], refs[2]
    crefs = refs[3:-2]
    yr_ref, yi_ref = refs[-2], refs[-1]
    m = n // 2

    v = jnp.transpose(x_ref[...])              # (n, tb)
    v = v.reshape(m, 2 * tb)                   # row j: [x[2j,:], x[2j+1,:]]
    if merge:
        cr, ci = _stages(radices, m, 2 * tb, crefs, v, None,
                         tw_lanes=tw_lanes, sign=vsign, k2mode=k2mode,
                         presplit=presplit)
        ar, br = cr[:, :tb], cr[:, tb:]
        ai, bi = ci[:, :tb], ci[:, tb:]
    else:
        ar, ai = _stages(radices, m, tb, crefs, v[:, :tb], None,  # A (real)
                         tw_lanes=tw_lanes, sign=vsign, k2mode=k2mode,
                         presplit=presplit)
        br, bi = _stages(radices, m, tb, crefs, v[:, tb:], None,  # B (real)
                         tw_lanes=tw_lanes, sign=vsign, k2mode=k2mode,
                         presplit=presplit)
    afr = jnp.concatenate([ar, ar[0:1]], axis=0)          # (m+1, tb)
    afi = jnp.concatenate([ai, ai[0:1]], axis=0)
    bfr = jnp.concatenate([br, br[0:1]], axis=0)
    bfi = jnp.concatenate([bi, bi[0:1]], axis=0)
    wr = wr_ref[...]                           # w[k] = exp(-2pi i k/n)
    wi = wi_ref[...]
    xr = afr + wr * bfr - wi * bfi
    xi = afi + wr * bfi + wi * bfr
    yr_ref[...] = jnp.transpose(xr)
    yi_ref[...] = jnp.transpose(xi)


def _make_call_r2c(n: int, radices, tb: int, interpret: bool,
                   vpu=None, k2mode=K2_DEFAULT, gsplit=None, merge=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m = n // 2
    tw_lanes = _flat_tw_lanes(m, radices, 2 * tb if merge else tb)
    presplit = _use_presplit() if gsplit is None else bool(gsplit)
    consts = _stage_consts(m, radices, -1, tw_lanes, presplit=presplit)
    k = np.arange(m + 1, dtype=np.int64)
    w = np.exp(-2j * np.pi * k / n)
    flat_consts = [np.ascontiguousarray(w.real, np.float32).reshape(m + 1, 1),
                   np.ascontiguousarray(w.imag, np.float32).reshape(m + 1, 1)]
    flat_consts += [c for stage in consts for c in stage]
    if vpu is None:
        vpu = config.pallas_vpu_last   # build-time snapshot
    kernel = partial(_kernel_r2c, tuple(radices), n, tb, tw_lanes,
                     _vpu_sign(-1, vpu), k2mode, presplit, bool(merge))

    in_spec = pl.BlockSpec((tb, n), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((tb, m + 1), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    const_specs = [pl.BlockSpec(c.shape, lambda i: (0, 0),
                                memory_space=pltpu.VMEM)
                   for c in flat_consts]

    def run(x):
        B = x.shape[0]
        out_shape = [jax.ShapeDtypeStruct((B, m + 1), jnp.float32)] * 2
        fn = pl.pallas_call(
            kernel,
            grid=(B // tb,),
            in_specs=[in_spec] + const_specs,
            out_specs=[out_spec, out_spec],
            out_shape=out_shape,
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=int(6 * m * sum(radices) * B),
                bytes_accessed=int(4 * B * n * 2),
                transcendentals=0),
        )
        with _x64_off():
            return fn(x, *flat_consts)

    return run


def _kernel_r2c_inner(radices, n, g, tl, tw_lanes, vsign, k2mode, presplit,
                      *refs):
    """Axis-(-2) r2c: blocks (g, n, TL) real -> (g, n//2+1, TL) re/im.

    Same half-signal DIT identity as _kernel_r2c (A = DFT_m over even
    rows, B over odd rows, X[k] = A[k] + w^k B[k]) but with the
    transform on the SUBLANE axis and TL trailing lanes — no HBM or
    in-VMEM transposes at all.  The even/odd de-interleave is the free
    sublane reshape (n, L) -> (m, 2L); A/B are the lane halves
    (L = g*TL is a 128-multiple, so the slices are legal).

    This is what makes the SWAPPED 2-D r2c composition possible: r2c
    over axis -2 first, then the (fast) last-axis c2c over the half
    spectrum's rows.  Role: rdft2 rank-geq2 with the real axis leading
    (/root/reference/fftw/fftw_api.c:5552-6190), done TPU-layout-first.
    """
    x_ref = refs[0]
    wr_ref, wi_ref = refs[1], refs[2]
    crefs = refs[3:-2]
    yr_ref, yi_ref = refs[-2], refs[-1]
    m = n // 2

    if g == 1:
        v = x_ref[0]                               # (n, TL)
        L = tl
    else:
        v = jnp.transpose(x_ref[...], (1, 0, 2)).reshape(n, g * tl)
        L = g * tl
    v2 = v.reshape(m, 2 * L)          # row j: [x[2j, :] | x[2j+1, :]]
    ar, ai = _stages(radices, m, L, crefs, v2[:, :L], None,
                     tw_lanes=tw_lanes, sign=vsign, k2mode=k2mode,
                     presplit=presplit)
    br, bi = _stages(radices, m, L, crefs, v2[:, L:], None,
                     tw_lanes=tw_lanes, sign=vsign, k2mode=k2mode,
                     presplit=presplit)
    afr = jnp.concatenate([ar, ar[0:1]], axis=0)          # (m+1, L)
    afi = jnp.concatenate([ai, ai[0:1]], axis=0)
    bfr = jnp.concatenate([br, br[0:1]], axis=0)
    bfi = jnp.concatenate([bi, bi[0:1]], axis=0)
    wr = wr_ref[...]                  # w[k] = exp(-2pi i k/n), (m+1, 1)
    wi = wi_ref[...]
    xr = afr + wr * bfr - wi * bfi
    xi = afi + wr * bfi + wi * bfr
    if g == 1:
        yr_ref[0] = xr
        yi_ref[0] = xi
    else:
        yr_ref[...] = jnp.transpose(xr.reshape(m + 1, g, tl), (1, 0, 2))
        yi_ref[...] = jnp.transpose(xi.reshape(m + 1, g, tl), (1, 0, 2))


def _make_call_r2c_inner(n: int, radices, tl: int, interpret: bool,
                         vpu=None, k2mode=K2_DEFAULT, gsplit=None):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m = n // 2
    presplit = _use_presplit() if gsplit is None else bool(gsplit)
    if vpu is None:
        vpu = config.pallas_vpu_last
    vsign = _vpu_sign(-1, vpu)

    def make_fn(pre, L):
        # same working-set budgeting as the c2c inner form, on the
        # half-size transform (two real pipelines of m)
        area = INNER_AREA
        tle = tl
        while tle * 2 <= L and n * tle * 2 <= area:
            tle *= 2
        g = max(1, area // (n * tle))
        g = 1 << (g.bit_length() - 1)
        while pre % g:
            g //= 2
        lanes = tle if g == 1 else g * tle
        tw_lanes = _flat_tw_lanes(m, radices, lanes)
        consts = _stage_consts(m, radices, -1, tw_lanes, presplit=presplit)
        k = np.arange(m + 1, dtype=np.int64)
        w = np.exp(-2j * np.pi * k / n)
        flat_consts = [
            np.ascontiguousarray(w.real, np.float32).reshape(m + 1, 1),
            np.ascontiguousarray(w.imag, np.float32).reshape(m + 1, 1)]
        flat_consts += [c for stage in consts for c in stage]
        kernel = partial(_kernel_r2c_inner, tuple(radices), n, g, tle,
                         tw_lanes, vsign, k2mode, presplit)
        in_spec = pl.BlockSpec((g, n, tle), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((g, m + 1, tle), lambda i, j: (i, 0, j),
                                memory_space=pltpu.VMEM)
        const_specs = [pl.BlockSpec(c.shape, lambda i, j: (0, 0),
                                    memory_space=pltpu.VMEM)
                       for c in flat_consts]
        grid = (pre // g, -(-L // tle))
        out_shape = [jax.ShapeDtypeStruct((pre, m + 1, L), jnp.float32)] * 2
        return (pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[in_spec] + const_specs,
            out_specs=[out_spec, out_spec],
            out_shape=out_shape,
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=int(6 * m * sum(radices) * g * tle)
                * grid[0] * grid[1],
                bytes_accessed=int(4 * pre * n * L * 2),
                transcendentals=0),
        ), flat_consts)

    def run(x):
        pre, _, L = x.shape
        fn, consts = make_fn(pre, L)
        with _x64_off():
            return fn(x, *consts)

    return run


def r2c_inner_applicable(n: int, trail: int, rdtype) -> bool:
    """Gate for the axis-(-2) r2c form: even n, half-size in the kernel
    window, and 128-multiple trailing lanes."""
    return (n % 2 == 0 and applicable(n // 2, rdtype)
            and trail % INNER_TILE_L == 0)


def build_pallas_r2c_inner(desc: Dict, rdtype):
    """Split-complex apply over axis -2: real (..., n, L) ->
    (re, im) each (..., n//2+1, L), one kernel pass, no transposes."""
    n = desc["n"]
    m = n // 2
    radices = _inner_radices(m, desc.get("radices") or choose_radices(m))
    assert math.prod(radices) == m
    mode = config.pallas_mode
    if mode == "auto":
        interpret = jax.default_backend() != "tpu"
    elif mode == "interpret":
        interpret = True
    else:
        interpret = False
    call = _make_call_r2c_inner(n, radices, INNER_TILE_L, interpret,
                                vpu=desc.get("vpu"),
                                k2mode=desc.get("k2", K2_DEFAULT),
                                gsplit=desc.get("gsplit"))

    def apply(x):
        shp = x.shape
        pre = int(np.prod(shp[:-2])) if len(shp) > 2 else 1
        x3 = x.reshape(pre, n, shp[-1])
        yr, yi = call(x3)
        out = shp[:-2] + (m + 1, shp[-1])
        return yr.reshape(out), yi.reshape(out)

    return apply


def r2c_applicable(n: int, rdtype) -> bool:
    """Fused r2c gate: even n with a half-size in the c2c kernel window."""
    return n % 2 == 0 and applicable(n // 2, rdtype)


def build_pallas_r2c(desc: Dict, rdtype):
    """Complex-out apply for {"alg": "pallas_r2c", "n": n, "radices": [..]}:
    real (..., n) -> complex (..., n//2+1), one kernel pass."""
    n = desc["n"]
    m = n // 2
    radices = desc.get("radices") or choose_radices(m)
    assert math.prod(radices) == m
    tb = desc.get("tile_b") or 128
    mode = config.pallas_mode
    if mode == "auto":
        interpret = jax.default_backend() != "tpu"
    elif mode == "interpret":
        interpret = True
    else:
        interpret = False
    call = _make_call_r2c(n, radices, tb, interpret,
                          vpu=desc.get("vpu"),
                          k2mode=desc.get("k2", K2_DEFAULT),
                          gsplit=desc.get("gsplit"),
                          merge=desc.get("merge", False))

    def _fwd_only(x):
        shp = x.shape[:-1]
        B = int(np.prod(shp)) if shp else 1
        x2 = x.reshape(B, n)
        Bp = -(-B // tb) * tb
        if Bp != B:
            x2 = jnp.pad(x2, ((0, Bp - B), (0, 0)))
        yr, yi = call(x2)
        out = yr[:B] + 1j * yi[:B]
        return out.reshape(*shp, m + 1)

    # VJP (the kernel itself is not differentiable; the c2c builders all
    # carry custom VJPs, and the real kernels must too or jax.grad
    # through an r2c plan dies ON CHIP while passing in interpret mode).
    # y[k] = sum_j x[j] e^{-2pi i jk/n} for k <= m; under JAX's
    # complex-cotangent convention (cotangents of complex outputs arrive
    # pre-conjugated — verified numerically against jnp.fft.rfft's vjp)
    # the adjoint is
    #   xbar[j] = Re( DFT_n(zero-padded g) )[j]
    # — one forward c2c n-point kernel on the padded cotangent.
    adj = [None]

    @jax.custom_vjp
    def apply(x):
        return _fwd_only(x)

    def fwd(x):
        return apply(x), None

    def bwd(_, g):
        if adj[0] is None:
            # planner-grade c2c child: n may exceed the single-kernel
            # window (r2c of 4096 needs a c2c-4096 adjoint -> pallas4)
            from ..planner import the_planner
            from . import c2c as c2c_ops
            adj[0] = c2c_ops.build_c2c_split(
                the_planner.plan_c2c(n, rdtype, 0), -1, rdtype)
        gr = jnp.real(g)
        gi = jnp.imag(g)
        pad = [(0, 0)] * (g.ndim - 1) + [(0, n - (m + 1))]
        xr, _ = adj[0](jnp.pad(gr, pad), jnp.pad(gi, pad))
        return (xr,)

    apply.defvjp(fwd, bwd)
    return apply


# ---------------------------------------------------------------------------
# fused c2r kernel: the exact inverse, also reversal-free and one HBM pass.
# Identity (verified exactly): with X' = X[0:m], v^k = exp(+2pi i k/n),
#   P = T_+(X'),  H = T_+(v^k X'),
#   y[2j]   = 2 Re P[j] + Re X[m] - Re X[0]
#   y[2j+1] = 2 Re H[j] - Re X[m] - Re X[0]
# (imaginary parts of the DC/Nyquist bins drop out, matching pocketfft/FFTW)
# ---------------------------------------------------------------------------

def _kernel_c2r(radices, n, tb, tw_lanes, vsign, k2mode, presplit,
                merge, *refs):
    """Blocks: (tb, m+1) re/im in -> (tb, n) real out.

    ``merge``: the P and H pipelines share one double-lane-width _stages
    call (lane-independent stage ops), mirroring _kernel_r2c."""
    xr_ref, xi_ref = refs[0], refs[1]
    vr_ref, vi_ref = refs[2], refs[3]
    crefs = refs[4:-1]
    y_ref = refs[-1]
    m = n // 2

    xr = jnp.transpose(xr_ref[...])            # (m+1, tb)
    xi = jnp.transpose(xi_ref[...])
    xpr, xpi = xr[:m], xi[:m]                  # X' rows 0..m-1
    vr = vr_ref[...]                           # (m, 1)
    vi = vi_ref[...]
    if merge:
        cr, _ci = _stages(
            radices, m, 2 * tb, crefs,
            jnp.concatenate([xpr, xpr * vr - xpi * vi], axis=1),
            jnp.concatenate([xpi, xpr * vi + xpi * vr], axis=1),
            tw_lanes=tw_lanes, sign=vsign, k2mode=k2mode,
            presplit=presplit)
        pr, hr = cr[:, :tb], cr[:, tb:]
    else:
        pr, _pi = _stages(radices, m, tb, crefs, xpr, xpi,   # P = T_+(X')
                          tw_lanes=tw_lanes, sign=vsign, k2mode=k2mode,
                          presplit=presplit)
        hr, _hi = _stages(radices, m, tb, crefs,
                          xpr * vr - xpi * vi, xpr * vi + xpi * vr,
                          tw_lanes=tw_lanes, sign=vsign, k2mode=k2mode,
                          presplit=presplit)
    dc = xr[0:1]                               # Re X[0] row
    ny = xr[m:m + 1]                           # Re X[m] row
    ye = 2.0 * pr + ny - dc                    # (m, tb)
    yo = 2.0 * hr - ny - dc
    y = jnp.concatenate([ye, yo], axis=1)      # (m, 2*tb): [even | odd]
    y_ref[...] = jnp.transpose(y.reshape(n, tb))


def _make_call_c2r(n: int, radices, tb: int, interpret: bool,
                   vpu=None, k2mode=K2_DEFAULT, gsplit=None, merge=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m = n // 2
    tw_lanes = _flat_tw_lanes(m, radices, 2 * tb if merge else tb)
    presplit = _use_presplit() if gsplit is None else bool(gsplit)
    consts = _stage_consts(m, radices, +1, tw_lanes,     # T_+ stages
                           presplit=presplit)
    k = np.arange(m, dtype=np.int64)
    v = np.exp(2j * np.pi * k / n)
    flat_consts = [np.ascontiguousarray(v.real, np.float32).reshape(m, 1),
                   np.ascontiguousarray(v.imag, np.float32).reshape(m, 1)]
    flat_consts += [c for stage in consts for c in stage]
    if vpu is None:
        vpu = config.pallas_vpu_last       # build-time snapshot
    kernel = partial(_kernel_c2r, tuple(radices), n, tb, tw_lanes,
                     _vpu_sign(+1, vpu), k2mode, presplit, bool(merge))

    in_spec = pl.BlockSpec((tb, m + 1), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((tb, n), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    const_specs = [pl.BlockSpec(c.shape, lambda i: (0, 0),
                                memory_space=pltpu.VMEM)
                   for c in flat_consts]

    def run(xr, xi):
        B = xr.shape[0]
        fn = pl.pallas_call(
            kernel,
            grid=(B // tb,),
            in_specs=[in_spec, in_spec] + const_specs,
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((B, n), jnp.float32),
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=int(12 * m * sum(radices) * B),
                bytes_accessed=int(4 * B * n * 2),
                transcendentals=0),
        )
        with _x64_off():
            return fn(xr, xi, *flat_consts)

    return run


def build_pallas_c2r(desc: Dict, rdtype):
    """Real-out apply for {"alg": "pallas_c2r", "n": n, "radices": [..]}:
    complex (..., n//2+1) -> real (..., n), one kernel pass."""
    n = desc["n"]
    m = n // 2
    radices = desc.get("radices") or choose_radices(m)
    assert math.prod(radices) == m
    tb = desc.get("tile_b") or 128
    mode = config.pallas_mode
    if mode == "auto":
        interpret = jax.default_backend() != "tpu"
    elif mode == "interpret":
        interpret = True
    else:
        interpret = False
    call = _make_call_c2r(n, radices, tb, interpret,
                          vpu=desc.get("vpu"),
                          k2mode=desc.get("k2", K2_DEFAULT),
                          gsplit=desc.get("gsplit"),
                          merge=desc.get("merge", False))

    def _fwd_only(X):
        xr = jnp.real(X)
        xi = jnp.imag(X)
        shp = xr.shape[:-1]
        B = int(np.prod(shp)) if shp else 1
        xr2 = xr.reshape(B, m + 1)
        xi2 = xi.reshape(B, m + 1)
        Bp = -(-B // tb) * tb
        if Bp != B:
            xr2 = jnp.pad(xr2, ((0, Bp - B), (0, 0)))
            xi2 = jnp.pad(xi2, ((0, Bp - B), (0, 0)))
        y = call(xr2, xi2)
        return y[:B].reshape(*shp, n)

    # VJP.  The kernel computes (identity block comment above)
    #   y[j] = Xr[0] + (-1)^j Xr[m]
    #          + sum_{k=1}^{m-1} 2 (Xr[k] cos t - Xi[k] sin t),
    # t = 2pi jk/n — DC/Nyquist imag parts drop out.  The adjoint under
    # JAX's complex-cotangent convention is a weighted forward r2c of the
    # real cotangent: Xbar = w * conj(R(gbar)) with w = [1, 2,...,2, 1]
    # and the DC/Nyquist imaginary parts zeroed (they are unused inputs).
    # (conj: R(g)[k] = sum g cos - i sum g sin, while the gradient needs
    # +i sum... — the correctness test pins the convention against
    # interpret-mode autodiff of the kernel itself.)
    adj = [None]
    w_np = np.full((m + 1,), 2.0, np.float32)
    w_np[0] = w_np[m] = 1.0

    @jax.custom_vjp
    def apply(X):
        return _fwd_only(X)

    def fwd(X):
        return apply(X), None

    def bwd(_, g):
        if adj[0] is None:
            from ..planner import the_planner
            from . import real as real_ops
            adj[0] = real_ops.build_r2c(
                the_planner.plan_r2c(n, rdtype, 0), rdtype)
        Y = adj[0](g) * w_np
        # JAX cotangent for complex primals carries the conjugate
        Y = jnp.conj(Y)
        zero_im = jnp.real(Y).astype(Y.dtype)
        edge = jnp.concatenate([zero_im[..., :1], Y[..., 1:m],
                                zero_im[..., m:m + 1]], axis=-1)
        return (edge,)

    apply.defvjp(fwd, bwd)
    return apply


# ---------------------------------------------------------------------------
# four-step composition for n beyond the single-kernel VMEM window:
# pass 1 = axis-(-2) kernel (FFT over p), pass 2 = last-axis kernel with the
# four-step twiddle fused into its load phase (FFT over q), one XLA
# transpose for the output ordering.  3 HBM passes vs ~9 for the staged
# XLA composition.  (The distributed six-step's on-chip sibling.)
# ---------------------------------------------------------------------------

def choose_fourstep(n: int):
    """(p, q) with p a power of two in [8, 128] (the row-phase twiddle
    mapping needs p | TB, and p < 8 stages are catastrophic — measured
    338 ps/pt at (2,2048) vs 160 at (32,128) for n=4096), q a
    128-multiple in the fused-kernel window.  Prefers the LARGEST p: the
    measured sweep ranks (32,128) < (16,256) < (8,512) at n=4096.
    Returns None if no such split exists."""
    best = None
    for p in (8, 16, 32, 64, 128):
        if n % p:
            continue
        q = n // p
        if q % INNER_TILE_L or q < MIN_N or q > MAX_N:
            continue
        try:
            choose_radices(q), choose_radices(p)
        except ValueError:
            continue
        if best is None or p > best[0]:
            best = (p, q)
    return best


def fourstep_applicable(n: int, rdtype) -> bool:
    if not backend_allows(rdtype):
        return False
    return n > MAX_N and choose_fourstep(n) is not None


def build_pallas_c2c_split_fourstep(desc: Dict, sign: int, rdtype):
    """Split apply for {"alg": "pallas4", "n": n, "p": p, "q": q}."""
    n, p, q = desc["n"], desc["p"], desc["q"]
    assert p * q == n
    rad_p = choose_radices(p)
    rad_q = desc.get("radices") or choose_radices(q)
    mode = config.pallas_mode
    if mode == "auto":
        interpret = jax.default_backend() != "tpu"
    elif mode == "interpret":
        interpret = True
    else:
        interpret = False
    # outer-pass row tile: at q <= 256 the default 128-row blocks are tiny
    # (a (128, q) block is 64 KB at q=128) and the grid drowns in per-step
    # overhead; desc["tile_b"] lets the autotune widen it (any 128-multiple
    # with p | tb keeps every lane-merge reshape legal)
    tb = desc.get("tile_b") or 128
    # fused transposed store only at p == 128: the (g, q, p) out block's
    # lane dim is p, and narrow lanes make the store a net loss (measured
    # same-session: p=32 fused 187 vs 133 ps/pt; p=128 fused 143 vs 165)
    fstore = (p == tb)
    vpu = config.pallas_vpu_last           # pin for fwd AND lazy adjoint
    k2mode = desc.get("k2", K2_DEFAULT)
    gsplit = desc.get("gsplit")
    iarea = desc.get("inner_area")         # wider inner blocks (autotuned)
    inner = _make_call_inner(p, rad_p, sign, INNER_TILE_L, interpret,
                             vpu=vpu, k2mode=k2mode, gsplit=gsplit,
                             area=iarea)
    outer = _make_call(q, rad_q, sign, tb, interpret, pretwiddle_p=p,
                       store_transposed=fstore, vpu=vpu, k2mode=k2mode,
                       gsplit=gsplit)
    adj = [None]

    def _run(xr, xi, calls):
        c_in, c_out = calls
        lead = xr.shape[:-1]
        B = int(np.prod(lead)) if lead else 1
        xr3 = xr.reshape(B, p, q)
        xi3 = xi.reshape(B, p, q)
        # batch padding so B*p is a TB multiple AND row index mod p is
        # preserved (pad whole batch entries)
        unit = max(1, tb // p)
        Bp = -(-B // unit) * unit
        if Bp != B:
            xr3 = jnp.pad(xr3, ((0, Bp - B), (0, 0), (0, 0)))
            xi3 = jnp.pad(xi3, ((0, Bp - B), (0, 0), (0, 0)))
        ar, ai = c_in(xr3, xi3)                    # FFT over p (axis -2)
        ar2 = ar.reshape(Bp * p, q)
        ai2 = ai.reshape(Bp * p, q)
        zr, zi = c_out(ar2, ai2)                   # twiddle + FFT over q
        if fstore:
            # emitted (Bp, q, p): X[k1 + p*k2] at [b, k2, k1] — the
            # k2-major flatten is a free reshape
            zr = zr.reshape(Bp, n)[:B].reshape(*lead, n)
            zi = zi.reshape(Bp, n)[:B].reshape(*lead, n)
            return zr, zi
        zr = zr.reshape(Bp, p, q)[:B]
        zi = zi.reshape(Bp, p, q)[:B]
        # X[k1 + p*k2] lives at [k1, k2] -> k2-major flatten
        zr = jnp.swapaxes(zr, -1, -2).reshape(*lead, n)
        zi = jnp.swapaxes(zi, -1, -2).reshape(*lead, n)
        return zr, zi

    @jax.custom_vjp
    def apply(xr, xi):
        return _run(xr, xi, (inner, outer))

    def fwd(xr, xi):
        return apply(xr, xi), None

    def bwd(_, g):
        if adj[0] is None:
            adj[0] = (_make_call_inner(p, rad_p, -sign, INNER_TILE_L,
                                       interpret, vpu=vpu, k2mode=k2mode,
                                       gsplit=gsplit, area=iarea),
                      _make_call(q, rad_q, -sign, tb, interpret,
                                 pretwiddle_p=p, store_transposed=fstore,
                                 vpu=vpu, k2mode=k2mode, gsplit=gsplit))
        return _run(g[0], g[1], adj[0])

    apply.defvjp(fwd, bwd)
    return apply
