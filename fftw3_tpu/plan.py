"""Problem and Plan ADTs.

The TPU-native analogs of FFTW's ``problem``/``plan`` abstract data types
(reference ``fftw/fftw_api.h:599-692``).  A :class:`Problem` is a logical
transform spec (shape, axes, kinds, precision) — strides and vector ranks are
expressed by the array shape itself, since JAX arrays are logical values.
A :class:`Plan` is an immutable, jittable pure function plus introspection
(op counts, printable tree), built from planner descriptors.

Multidimensional transforms compose 1-D axis passes exactly like FFTW's
rank-geq2 solvers (fftw/fftw_api.c:4436-4570): XLA fuses the interleaving
transposes, so "apply along axis" is a moveaxis + batched last-axis transform.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import kinds as K
from . import planner as planner_mod
from .ops import c2c as c2c_ops
from .ops import r2r as r2r_ops
from .ops import real as real_ops


def _along_axis(fn: Callable, axis: int) -> Callable:
    """Lift a last-axis transform to an arbitrary axis."""
    def apply(x):
        if axis in (-1, x.ndim - 1):
            return fn(x)
        y = jnp.moveaxis(x, axis, -1)
        y = fn(y)
        return jnp.moveaxis(y, -1, axis)
    return apply


def _c2c_stage(desc: Dict, sign: int, rdtype, axis: int,
               shape: Tuple[int, ...]) -> Callable:
    """One c2c axis pass.  Non-last axes whose trailing-dims product is a
    lane multiple use the transpose-free axis -2 Pallas kernel (the
    trailing dims ARE the lane dimension — no moveaxis HBM passes);
    everything else lifts the last-axis transform with moveaxis.

    Axes are applied right-relative so extra *leading* batch dims at call
    time Just Work (plans embed in larger jitted programs)."""
    from .ops import pallas_stockham

    neg = axis - len(shape)                  # right-relative axis (< 0)
    trail = 1
    for s in shape[axis + 1:]:
        trail *= s
    if neg != -1 and pallas_stockham.inner_applicable(desc, trail):
        inner = pallas_stockham.build_pallas_c2c_split_inner(desc, sign,
                                                             rdtype)

        def apply_inner(xr, xi):
            s = xr.shape
            cut = xr.ndim + neg + 1          # runtime position after axis
            xr2 = xr.reshape(*s[:cut], trail)
            xi2 = xi.reshape(*s[:cut], trail)
            yr, yi = inner(xr2, xi2)
            return yr.reshape(s), yi.reshape(s)
        return apply_inner
    fn = c2c_ops.build_c2c_split(desc, sign, rdtype)
    return _along_axis_split(fn, neg)


def _try_r2c_swapped(problem, pl, patience, rdtype, _vec, descriptors,
                     stages):
    """SWAPPED rank-2 r2c composition (config.r2c_swapped, bench-raced):

    r2c over AXIS -2 first (transpose-free axis-(-2) r2c kernel), then
    the fast LAST-AXIS c2c over the (n_a/2+1)-row half spectrum, then one
    XLA Hermitian-reconstruct epilogue back to the contract layout (half
    spectrum on the LAST axis).  The transforms commute, and real input
    gives X[u, v] = conj(X[n_a-u, (n_l-v) % n_l]), so the missing rows
    u > n_a/2 are a flip+roll+conj gather of the computed ones.

    Wins when the axis-(-2) c2c pass is the bottleneck (2048^2: the inner
    form is VMEM-capped at a [64,32] schedule while the last-axis kernel
    runs [128,16]+k2) — the c2c pass shrinks to ~half the rows AND moves
    to the faster kernel form, at the price of ~1.5 HBM sweeps of
    epilogue.  Role: rdft2 rank-geq2 with the real axis leading,
    /root/reference/fftw/fftw_api.c:5552-6190.

    Returns the output-shape list (mutating descriptors/stages) or None
    when inapplicable — the caller falls through to the normal
    last-axis-first composition.
    """
    from . import config as _config
    from .ops import pallas_stockham as _ps
    shape, axes = problem.shape, problem.axes
    nd = len(shape)
    if not (_config.r2c_swapped and len(axes) == 2
            and axes[0] == nd - 2 and axes[1] == nd - 1):
        return None
    n_a, n_l = shape[axes[0]], shape[axes[1]]
    if not _ps.r2c_inner_applicable(n_a, n_l, rdtype):
        return None
    m_a, m_l = n_a // 2, n_l // 2
    rdesc = pl.plan_r2c(n_a, rdtype, patience, batch=_vec(axes[0]))
    if rdesc.get("alg") != "pallas_r2c":
        return None        # planner chose a non-kernel path; keep normal
    idesc = dict(rdesc, alg="pallas_r2c_inner")
    descriptors[axes[0]] = idesc
    inner = _ps.build_pallas_r2c_inner(idesc, rdtype)

    def r2c_stage(x):
        yr, yi = inner(x)
        return yr + 1j * yi
    stages.append(r2c_stage)
    cdesc = pl.plan_c2c(n_l, rdtype, patience, batch=_vec(axes[1]))
    descriptors[axes[1]] = cdesc
    pass_shape = shape[:-2] + (m_a + 1, n_l)
    stages.append(_complex_of_split(
        _c2c_stage(cdesc, K.FORWARD, rdtype, nd - 1, pass_shape)))

    def reconstruct(C):
        # D[..., u', v] = C[..., u', (n_l - v) % n_l]
        D = jnp.roll(jnp.flip(C, axis=-1), 1, axis=-1)[..., :m_l + 1]
        top = C[..., :, :m_l + 1]                   # rows u <= m_a
        bot = jnp.conj(jnp.flip(D[..., 1:m_a, :], axis=-2))
        return jnp.concatenate([top, bot], axis=-2)
    stages.append(reconstruct)
    out = list(shape)
    out[-1] = m_l + 1
    return out


def _complex_of_split(split_fn: Callable) -> Callable:
    """Lift a split-complex stage to a complex-array stage (the split and
    recombine fuse into the neighboring XLA ops)."""
    def apply(x):
        yr, yi = split_fn(jnp.real(x), jnp.imag(x))
        return yr + 1j * yi
    return apply


def _along_axis_split(fn: Callable, axis: int) -> Callable:
    """Lift a split-complex last-axis transform to an arbitrary axis."""
    def apply(xr, xi):
        if axis in (-1, xr.ndim - 1):
            return fn(xr, xi)
        yr, yi = fn(jnp.moveaxis(xr, axis, -1), jnp.moveaxis(xi, axis, -1))
        return jnp.moveaxis(yr, -1, axis), jnp.moveaxis(yi, -1, axis)
    return apply


@dataclass(frozen=True)
class Problem:
    """Logical transform specification (problem ADT analog)."""
    shape: Tuple[int, ...]
    axes: Tuple[int, ...]
    kind: str                      # 'c2c' | 'r2c' | 'c2r' | 'r2r'
    sign: int = K.FORWARD          # c2c only
    r2r_kinds: Tuple[K.Kind, ...] = ()   # per-axis, r2r only
    rdtype: str = "float32"        # base real precision

    def __post_init__(self):
        ax = tuple(a % len(self.shape) for a in self.axes)
        object.__setattr__(self, "axes", ax)
        if self.kind == "r2r" and len(self.r2r_kinds) != len(ax):
            raise ValueError("need one r2r kind per transform axis")

    @property
    def transform_sizes(self) -> Tuple[int, ...]:
        return tuple(self.shape[a] for a in self.axes)

    def tag(self) -> str:
        bits = [self.kind, "x".join(map(str, self.shape)),
                ",".join(map(str, self.axes)), str(self.sign), self.rdtype]
        if self.kind == "r2r":
            bits.append("+".join(k.value for k in self.r2r_kinds))
        return ":".join(bits)


class Plan:
    """Executable plan: immutable pytree of composed axis transforms."""

    def __init__(self, problem: Problem, descriptors: Dict[int, Dict],
                 apply_fn: Callable, in_shape: Tuple[int, ...],
                 out_shape: Tuple[int, ...], out_dtype,
                 apply_split: Optional[Callable] = None):
        self.problem = problem
        self.descriptors = descriptors          # axis -> planner descriptor
        self._apply = apply_fn
        self.in_shape = in_shape
        self.out_shape = out_shape
        self.out_dtype = out_dtype
        #: split-complex entry point (c2c only): (xr, xi) -> (yr, yi).
        #: Tunnel-friendly and avoids complex at the program boundary.
        self.apply_split = apply_split
        self._jitted = jax.jit(apply_fn)
        #: multi-device execute path (the fftw/threads engine analog),
        #: attached by make_plan when plan_with_nthreads(k>1) is active —
        #: see parallel/smp.py.  apply/apply_split stay serial-pure.
        self._par_fn: Optional[Callable] = None

    # -- execution (fftw_execute + new-array execute, fftw_api.c:428-487) --
    def __call__(self, x) -> jnp.ndarray:
        return self.execute(x)

    def execute(self, x) -> jnp.ndarray:
        x = jnp.asarray(x)
        if tuple(x.shape) != self.in_shape:
            raise ValueError(
                f"plan expects shape {self.in_shape}, got {x.shape}")
        if self._par_fn is not None:
            return self._par_fn(x)
        return self._jitted(x)

    @property
    def apply(self) -> Callable:
        """The raw (unjitted) pure function, for embedding in larger jits."""
        return self._apply

    # -- introspection (fftw_flops/fftw_cost, fftw_api.c:489-509) ----------
    def flops(self) -> Tuple[float, float, float]:
        """(add, mul, fma) counts for one full execution."""
        total = {"add": 0.0, "mul": 0.0, "fma": 0.0}
        shape = list(self.problem.shape)
        for axis, desc in self.descriptors.items():
            n = shape[axis]
            batch = int(np.prod(shape)) // max(n, 1)
            ops = _opcount_of(self.problem, axis, desc)
            for k in total:
                total[k] += batch * ops[k]
        return (total["add"], total["mul"], total["fma"])

    def cost(self) -> float:
        a, m, f = self.flops()
        return a + m + 2 * f

    def __repr__(self) -> str:
        inner = " ".join(
            f"[axis {a}: {planner_mod.sprint_desc(d)}]"
            for a, d in sorted(self.descriptors.items()))
        return (f"(plan {self.problem.kind} {self.problem.shape} "
                f"axes={self.problem.axes} {inner})")

    def print_plan(self) -> None:
        print(repr(self))


def _opcount_of(problem: Problem, axis: int, desc: Dict) -> Dict[str, float]:
    if problem.kind == "c2c":
        return c2c_ops.c2c_opcount(desc)
    if problem.kind == "r2c":
        if axis == problem.axes[-1]:
            return real_ops.r2c_opcount(desc)
        return c2c_ops.c2c_opcount(desc)
    if problem.kind == "c2r":
        if axis == problem.axes[-1]:
            return real_ops.c2r_opcount(desc)
        return c2c_ops.c2c_opcount(desc)
    return r2r_ops.r2r_opcount(desc)


# ---------------------------------------------------------------------------
# plan construction (fftw_mkapiplan analog, fftw/fftw_api.c:265-423)
# ---------------------------------------------------------------------------

def make_plan(problem: Problem, flags: int = K.ESTIMATE,
              planner: Optional[planner_mod.Planner] = None) -> Plan:
    pl = planner or planner_mod.the_planner
    patience = K.patience_of_flags(flags)
    if flags & K.WISDOM_ONLY:
        # FFTW_WISDOM_ONLY: plan only from existing wisdom, else fail
        # (fftw3.h:487; the reference planner returns NULL).  Serialized
        # by the api lock, so the temporary mode flag is safe.
        pl.wisdom_only = True
        try:
            plan = _make_plan_inner(problem, flags, pl, patience)
        finally:
            pl.wisdom_only = False
    else:
        plan = _make_plan_inner(problem, flags, pl, patience)
    from . import threads
    if threads.planner_nthreads() > 1:
        # fftw_plan_with_nthreads engine (parallel/smp.py): plans created
        # under an nthreads hint execute over a local device mesh
        from .parallel import smp
        plan._par_fn = smp.parallel_executor(plan)
    return plan


def _make_plan_inner(problem: Problem, flags: int,
                     pl: planner_mod.Planner, patience: int) -> Plan:
    rdtype = np.dtype(problem.rdtype)
    ctype = c2c_ops.complex_dtype(rdtype)
    shape = problem.shape
    axes = problem.axes

    descriptors: Dict[int, Dict] = {}
    stages = []  # callables composed left-to-right
    in_shape = shape
    npoints = int(np.prod(shape)) if shape else 1

    def _vec(a):
        # vector size seen by the axis-a pass: everything except axis a
        return max(1, npoints // max(shape[a], 1))

    if problem.kind == "c2c":
        # split-complex through the whole multi-axis pipeline: one
        # real/imag split at entry, one combine at exit (TPU-native form)
        from .ops import pallas_stockham

        split_stages = []
        rest_axes = list(axes)
        nd = len(shape)
        # fuse the trailing axis pair into ONE kernel pass when both axes
        # would be pallas-served anyway (2 HBM passes -> 1)
        if (len(rest_axes) >= 2 and rest_axes[-2:] == [nd - 2, nd - 1]
                and pallas_stockham.applicable_2d(shape[nd - 2],
                                                  shape[nd - 1], rdtype)):
            d1 = pl.plan_c2c(shape[nd - 2], rdtype, patience,
                             batch=_vec(nd - 2))
            d2 = pl.plan_c2c(shape[nd - 1], rdtype, patience,
                             batch=_vec(nd - 1))
            if d1.get("alg") == "pallas" and d2.get("alg") == "pallas":
                descriptors[nd - 2] = d1
                descriptors[nd - 1] = d2
                fused = pallas_stockham.build_pallas_c2c_split_2d(
                    shape[nd - 2], shape[nd - 1], problem.sign, rdtype,
                    desc1=d1, desc2=d2)
                rest_axes = rest_axes[:-2]
                trailing2d = fused
            else:
                trailing2d = None
        else:
            trailing2d = None
        for a in rest_axes:
            desc = pl.plan_c2c(shape[a], rdtype, patience, batch=_vec(a))
            descriptors[a] = desc
            split_stages.append(
                _c2c_stage(desc, problem.sign, rdtype, a, shape))
        if trailing2d is not None:
            split_stages.append(trailing2d)

        def apply_split(xr, xi):
            for s in split_stages:
                xr, xi = s(xr, xi)
            return xr, xi

        def apply_c2c(x):
            yr, yi = apply_split(jnp.real(x), jnp.imag(x))
            return yr + 1j * yi

        return Plan(problem, descriptors, apply_c2c, shape, shape, ctype,
                    apply_split=apply_split)

    elif problem.kind == "r2c":
        last = axes[-1]
        n_last = shape[last]
        nd = len(shape)
        swapped = _try_r2c_swapped(problem, pl, patience, rdtype, _vec,
                                   descriptors, stages)
        if swapped is not None:
            out_shape, out_dtype = tuple(swapped), ctype

            def apply_sw(x, _st=tuple(stages)):
                for s in _st:
                    x = s(x)
                return x
            return Plan(problem, descriptors, apply_sw, shape, out_shape,
                        out_dtype)
        desc = pl.plan_r2c(n_last, rdtype, patience, batch=_vec(last))
        descriptors[last] = desc
        stages.append(_along_axis(real_ops.build_r2c(desc, rdtype),
                                  last - nd))
        out = list(shape)
        out[last] = n_last // 2 + 1
        # DC/Nyquist column pack (TPU lane alignment): after the last-axis
        # r2c of even n the trailing extent is n/2+1 — an ODD lane count
        # that costs a whole extra (mostly-masked) lane block in every
        # non-last Pallas pass (2048^2 r2c: 9 blocks where 8 suffice;
        # 256^3: 2 where 1 does).  Columns 0 and n/2 are REAL there, so
        # the classic two-real-FFTs pack (col0 + i*colN/2) carries both
        # through every remaining c2c pass in ONE column, restoring an
        # exact 128-multiple, and one conj-flip untangle at the end
        # recovers the two spectra.  Role matched (not mechanism):
        # rdft2 buffered/ct handling of the (r0, rn/2) pair,
        # /root/reference/fftw/fftw_api.c:5552-6190.
        from . import config as _config
        pack = (_config.r2c_dc_nyquist_pack
                and n_last % 2 == 0 and n_last >= 4 and len(axes) > 1
                and last == nd - 1)
        if pack:
            half = n_last // 2
            pshape = list(shape)
            pshape[last] = half

            def pack_stage(x, _h=half):
                z0 = (jnp.real(x[..., :1])
                      + 1j * jnp.real(x[..., _h:_h + 1]))
                return jnp.concatenate([z0, x[..., 1:_h]], axis=-1)
            stages.append(pack_stage)
            pass_shape = tuple(pshape)
        else:
            pass_shape = tuple(out)
        # non-last axes run on the HALVED complex array: use the
        # transpose-free axis stage (the axis-(-2) kernel when the
        # trailing layout allows) via a split-complex lift
        for a in axes[:-1]:
            d = pl.plan_c2c(shape[a], rdtype, patience, batch=_vec(a))
            descriptors[a] = d
            stages.append(_complex_of_split(
                _c2c_stage(d, K.FORWARD, rdtype, a, pass_shape)))
        if pack:
            neg_axes = tuple(a - nd for a in axes[:-1])

            def unpack_stage(y, _na=neg_axes):
                z = y[..., 0]
                zn = z
                for a in _na:
                    # index negation k -> (-k) mod n along each
                    # transformed non-last axis: flip + roll(1).  z has
                    # the trailing lane dim sliced away, so the
                    # right-relative axis shifts by one.
                    zn = jnp.roll(jnp.flip(zn, axis=a + 1), 1, axis=a + 1)
                zc = jnp.conj(zn)
                A = 0.5 * (z + zc)
                B = -0.5j * (z - zc)
                return jnp.concatenate(
                    [A[..., None], y[..., 1:], B[..., None]], axis=-1)
            stages.append(unpack_stage)
        out_shape, out_dtype = tuple(out), ctype

    elif problem.kind == "c2r":
        # problem.shape is the *logical real* shape; input is halved complex.
        last = axes[-1]
        n_last = shape[last]
        nd = len(shape)
        ins = list(shape)
        ins[last] = n_last // 2 + 1
        # NOTE: no DC/Nyquist pack on the INVERSE (unlike the r2c branch).
        # Packing columns 0 and n/2 before the backward passes assumes
        # they are conjugate-symmetric along every non-last axis — true
        # only for Hermitian-VALID input.  Spectral-derivative workloads
        # routinely feed technically-invalid spectra (e.g. irfft2 of
        # i*ky*W leaves imaginary junk in the y-Nyquist row), and both
        # numpy and the reference (rank>=2 c2r = full c2c passes on
        # non-last axes, fftw_api.c:5552-6190) USE that content; a pack
        # would silently project it away (caught by the Navier-Stokes
        # distributed-vs-single test at 1.8e-3 per step).
        for a in axes[:-1]:
            d = pl.plan_c2c(shape[a], rdtype, patience, batch=_vec(a))
            descriptors[a] = d
            stages.append(_complex_of_split(
                _c2c_stage(d, K.BACKWARD, rdtype, a, tuple(ins))))
        desc = pl.plan_c2r(n_last, rdtype, patience, batch=_vec(last))
        descriptors[last] = desc
        stages.append(_along_axis(real_ops.build_c2r(desc, rdtype),
                                  last - nd))
        in_shape = tuple(ins)
        out_shape, out_dtype = shape, rdtype

    elif problem.kind == "r2r":
        nd = len(shape)
        for a, kind in zip(axes, problem.r2r_kinds):
            desc = pl.plan_r2r(kind, shape[a], rdtype, patience,
                               batch=_vec(a))
            descriptors[a] = desc
            stages.append(_along_axis(r2r_ops.build_r2r(desc, rdtype),
                                      a - nd))
        out_shape, out_dtype = shape, rdtype

    else:
        raise ValueError(f"unknown problem kind {problem.kind!r}")

    def apply_fn(x):
        for s in stages:
            x = s(x)
        return x

    return Plan(problem, descriptors, apply_fn, in_shape, out_shape,
                out_dtype)
