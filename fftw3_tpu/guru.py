"""Guru / guru64 / advanced ("many") API surface.

The reference's three planner tiers (basic / advanced / guru,
``fftw/fftw_api.c:560-790, 642-772, 1172-1533``) differ only in how much
memory-layout freedom they expose: embedded supersets (``inembed``/
``onembed``), strides, distances, split re/im arrays, and arbitrary
transform/vector rank mixes.  JAX arrays are logical values, so layout
freedom maps onto *shapes, axes, slicing and views* instead of pointer
arithmetic; these wrappers implement FFTW's semantics on top of the core
planner so user code translates mechanically:

* ``iodim(n, is, os)``    -> an entry of ``dims``/``howmany_dims``; strides
  are honored by building a strided *view* of the logical input.
* split arrays            -> first-class here (the engine's native internal
  representation is split re/im): ``plan_guru_split_dft``.
* guru64                  -> same functions (Python ints are arbitrary
  precision); aliases provided for source compatibility.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence, Tuple, Union

import jax.numpy as jnp
import numpy as np

from . import api
from . import kinds as K


@dataclass(frozen=True)
class iodim:
    """fftw_iodim analog: size + input/output strides in ELEMENTS.

    Strides are logical row-major element strides; 0 means "contiguous
    row-major default" (the dwim rule of the bench harness).
    """
    n: int
    is_: int = 0
    os_: int = 0


iodim64 = iodim   # guru64: same type, Python ints are unbounded


def _dims_to_shape(dims: Sequence) -> Tuple[int, ...]:
    out = []
    for d in dims:
        out.append(d.n if isinstance(d, iodim) else int(d))
    return tuple(out)


def _has_strides(dims) -> bool:
    return any(isinstance(d, iodim) and (d.is_ != 0 or d.os_ != 0)
               for d in dims)


def _stride_index_grid(all_dims, use_output: bool) -> np.ndarray:
    """Element-offset grid of a strided iodim layout (dwim rule: stride 0
    means contiguous row-major from the right)."""
    sizes = [d.n for d in all_dims]
    strides = []
    default = 1
    for d in reversed(all_dims):
        st = (d.os_ if use_output else d.is_) or default
        strides.append(st)
        default = st * d.n
    strides = strides[::-1]
    idx = np.zeros(sizes, np.int64)
    for ax, (sz, st) in enumerate(zip(sizes, strides)):
        shp = [1] * len(sizes)
        shp[ax] = sz
        idx = idx + st * np.arange(sz, dtype=np.int64).reshape(shp)
    return idx


class StridedGuruPlan:
    """Guru plan over FLAT buffers with explicit iodim strides — FFTW's
    actual guru memory model (fftw/fftw_api.c:1172-1533), BOTH sides:

    * input: the plan gathers the strided view from the flat input buffer
      (plus an optional element offset);
    * output: with explicit ``os`` strides the result is scattered into a
      flat output buffer at the strided positions (positions outside the
      layout are zero, or preserved when the caller passes ``out=`` —
      FFTW's "untouched" semantics expressed functionally).

    Without ``os`` strides the result comes back in contiguous logical
    layout.
    """

    def __init__(self, plan, dims, howmany_dims):
        self._plan = plan
        all_dims = tuple(howmany_dims) + tuple(dims)
        self._idx = _stride_index_grid(all_dims, use_output=False)
        self._has_os = any(d.os_ for d in all_dims)
        if self._has_os:
            self._idx_out = _stride_index_grid(all_dims, use_output=True)
            self.out_size = int(self._idx_out.max()) + 1
        else:
            self._idx_out = None
            self.out_size = None
        self.in_shape = tuple(d.n for d in all_dims)
        self.out_shape = plan.out_shape
        self.problem = plan.problem
        self._jitted = None            # cached jits (no per-call retrace)
        self._jitted_out = None

    @property
    def apply(self):
        plan = self._plan
        idx = self._idx
        idx_out = self._idx_out
        out_size = self.out_size

        def fn(flat, offset=0, out=None):
            y = plan.apply(flat[idx + offset])
            if idx_out is None:
                return y
            if out is None:
                # a fresh buffer has no surrounding context, so the element
                # offset applies only to caller-provided buffers (scatter
                # at offset into a too-small fresh buffer would silently
                # drop elements — JAX clamps out-of-bounds scatters)
                return jnp.zeros((out_size,), y.dtype).at[idx_out].set(y)
            return out.at[idx_out + offset].set(y)
        return fn

    def execute(self, flat, offset: int = 0, out=None):
        import jax
        flat = jnp.asarray(flat)
        if out is not None:
            if self._jitted_out is None:
                self._jitted_out = jax.jit(self.apply)
            return self._jitted_out(flat, offset, jnp.asarray(out))
        if self._jitted is None:
            self._jitted = jax.jit(lambda f, o: self.apply(f, o))
        return self._jitted(flat, offset)

    __call__ = execute

    def __repr__(self):
        return f"(strided-guru{'-os' if self._has_os else ''} " \
               f"{self._plan!r})"


def plan_guru_dft(dims: Sequence, howmany_dims: Sequence = (),
                  sign: int = K.FORWARD, flags: int = K.ESTIMATE,
                  dtype="complex64"):
    """fftw_plan_guru_dft analog: rank = len(dims) transform over arrays of
    shape howmany_dims + dims (vector dims leading, row-major).

    With explicit iodim input strides, returns a :class:`StridedGuruPlan`
    operating on a flat buffer (FFTW's guru memory model); otherwise a
    regular shape-indexed Plan."""
    shape = _dims_to_shape(howmany_dims) + _dims_to_shape(dims)
    axes = tuple(range(len(howmany_dims), len(shape)))
    plan = api.plan_dft(shape, axes, sign, flags, dtype)
    if _has_strides(tuple(howmany_dims) + tuple(dims)):
        nd = [d if isinstance(d, iodim) else iodim(int(d)) for d in dims]
        nh = [d if isinstance(d, iodim) else iodim(int(d))
              for d in howmany_dims]
        return StridedGuruPlan(plan, nd, nh)
    return plan


def plan_guru_dft_r2c(dims: Sequence, howmany_dims: Sequence = (),
                      flags: int = K.ESTIMATE, dtype="float32"):
    shape = _dims_to_shape(howmany_dims) + _dims_to_shape(dims)
    axes = tuple(range(len(howmany_dims), len(shape)))
    return api.plan_dft_r2c(shape, axes, flags, dtype)


def plan_guru_dft_c2r(dims: Sequence, howmany_dims: Sequence = (),
                      flags: int = K.ESTIMATE, dtype="float32"):
    shape = _dims_to_shape(howmany_dims) + _dims_to_shape(dims)
    axes = tuple(range(len(howmany_dims), len(shape)))
    return api.plan_dft_c2r(shape, axes, flags, dtype)


def plan_guru_r2r(dims: Sequence, kinds: Sequence[Union[K.Kind, str]],
                  howmany_dims: Sequence = (), flags: int = K.ESTIMATE,
                  dtype="float32"):
    shape = _dims_to_shape(howmany_dims) + _dims_to_shape(dims)
    axes = tuple(range(len(howmany_dims), len(shape)))
    return api.plan_r2r(shape, list(kinds), axes, flags, dtype)


# guru64 aliases (fftw_plan_guru64_*): identical semantics in Python
plan_guru64_dft = plan_guru_dft
plan_guru64_dft_r2c = plan_guru_dft_r2c
plan_guru64_dft_c2r = plan_guru_dft_c2r
plan_guru64_r2r = plan_guru_r2r


class SplitPlan:
    """Split re/im plan (fftw_plan_guru_split_dft analog).

    FFTW's split format keeps real and imaginary parts in separate arrays —
    which is this engine's native internal representation, so the split
    guru API is the zero-overhead one.
    """

    def __init__(self, plan):
        self._plan = plan
        self.in_shape = plan.in_shape
        self.out_shape = plan.out_shape
        self.problem = plan.problem
        self._jitted = None            # cached jit (no per-call retrace)

    @property
    def apply(self):
        return self._plan.apply_split

    def execute(self, ri, ii):
        ri = jnp.asarray(ri)
        ii = jnp.asarray(ii)
        if tuple(ri.shape) != self.in_shape:
            raise ValueError(f"plan expects shape {self.in_shape}, "
                             f"got {ri.shape}")
        import jax
        if self._jitted is None:
            self._jitted = jax.jit(self._plan.apply_split)
        return self._jitted(ri, ii)

    def __call__(self, ri, ii):
        return self.execute(ri, ii)

    def __repr__(self):
        return "(split " + repr(self._plan) + ")"


def plan_guru_split_dft(dims: Sequence, howmany_dims: Sequence = (),
                        sign: int = K.FORWARD, flags: int = K.ESTIMATE,
                        dtype="float32") -> SplitPlan:
    cdt = "complex64" if np.dtype(dtype) == np.float32 else "complex128"
    return SplitPlan(plan_guru_dft(dims, howmany_dims, sign, flags, cdt))


plan_guru64_split_dft = plan_guru_split_dft


# ---------------------------------------------------------------------------
# Advanced "many" API with embed/stride/dist semantics
# (fftw_plan_many_dft, fftw/fftw_api.c:642-772)
# ---------------------------------------------------------------------------

class ManyPlan:
    """A plan over FFTW advanced-layout buffers.

    The caller passes the *physical* array of shape ``(howmany,) + inembed``
    (row-major, ``idist`` = product of inembed by default); the plan slices
    the embedded transform block ``[..., :n_k]``, transforms, and embeds the
    result into ``(howmany,) + onembed`` (zero-padded outside the block,
    matching "untouched" semantics as closely as value semantics allow).
    """

    def __init__(self, n, howmany, sign, flags, dtype, kind,
                 inembed, onembed, r2r_kinds=None):
        self.n = tuple(n)
        self.howmany = howmany
        self.inembed = tuple(inembed) if inembed else self.n
        self.onembed = tuple(onembed) if onembed else None
        for e, t in zip(self.inembed, self.n):
            if e < t:
                raise ValueError("inembed must be >= n")
        shape = (howmany,) + self.n
        axes = tuple(range(1, len(self.n) + 1))
        if kind == "c2c":
            self.plan = api.plan_dft(shape, axes, sign, flags, dtype)
        elif kind == "r2c":
            self.plan = api.plan_dft_r2c(shape, axes, flags, dtype)
        elif kind == "c2r":
            self.plan = api.plan_dft_c2r(shape, axes, flags, dtype)
        else:
            self.plan = api.plan_r2r(shape, r2r_kinds, axes, flags, dtype)
        self.in_shape = (howmany,) + self.inembed if inembed \
            else self.plan.in_shape
        logical_in = self.plan.in_shape[1:]
        self._crop = tuple(slice(0, t) for t in logical_in)
        if self.onembed:
            for e, t in zip(self.onembed, self.plan.out_shape[1:]):
                if e < t:
                    raise ValueError("onembed must be >= transform output")

    def execute(self, x):
        x = jnp.asarray(x)
        if tuple(x.shape) != self.in_shape:
            raise ValueError(f"plan expects {self.in_shape}, got {x.shape}")
        block = x[(slice(None),) + self._crop]
        y = self.plan.execute(block)
        if self.onembed:
            pads = [(0, 0)] + [(0, e - s) for e, s in
                               zip(self.onembed, y.shape[1:])]
            y = jnp.pad(y, pads)
        return y

    __call__ = execute

    @property
    def apply(self):
        plan = self.plan
        crop = self._crop
        onembed = self.onembed

        def fn(x):
            y = plan.apply(x[(slice(None),) + crop])
            if onembed:
                pads = [(0, 0)] + [(0, e - s) for e, s in
                                   zip(onembed, y.shape[1:])]
                y = jnp.pad(y, pads)
            return y
        return fn

    @property
    def apply_split(self):
        if self.plan.apply_split is None:
            return None
        plan = self.plan
        crop = (slice(None),) + self._crop

        def fn(xr, xi):
            return plan.apply_split(xr[crop], xi[crop])
        return fn

    def flops(self):
        return self.plan.flops()

    def cost(self):
        return self.plan.cost()

    def print_plan(self):
        print(repr(self))

    def __repr__(self):
        return (f"(many howmany={self.howmany} inembed={self.inembed} "
                f"{self.plan!r})")


def plan_many_dft(n: Sequence[int], howmany: int,
                  inembed: Optional[Sequence[int]] = None,
                  onembed: Optional[Sequence[int]] = None,
                  sign: int = K.FORWARD, flags: int = K.ESTIMATE,
                  dtype="complex64") -> ManyPlan:
    return ManyPlan(n, howmany, sign, flags, dtype, "c2c", inembed, onembed)


def plan_many_dft_r2c(n, howmany, inembed=None, onembed=None,
                      flags: int = K.ESTIMATE, dtype="float32") -> ManyPlan:
    return ManyPlan(n, howmany, K.FORWARD, flags, dtype, "r2c",
                    inembed, onembed)


def plan_many_dft_c2r(n, howmany, inembed=None, onembed=None,
                      flags: int = K.ESTIMATE, dtype="float32") -> ManyPlan:
    return ManyPlan(n, howmany, K.BACKWARD, flags, dtype, "c2r",
                    inembed, onembed)


def plan_many_r2r(n, howmany, kinds, inembed=None, onembed=None,
                  flags: int = K.ESTIMATE, dtype="float32") -> ManyPlan:
    return ManyPlan(n, howmany, K.FORWARD, flags, dtype, "r2r",
                    inembed, onembed, r2r_kinds=list(kinds))


# ---------------------------------------------------------------------------
# New-array execute functions (fftw_execute_dft etc., fftw_api.c:428-487).
# The "alignment check" of the reference becomes a shape/dtype check.
# ---------------------------------------------------------------------------

def execute_dft(plan, x):
    if plan.problem.kind != "c2c":
        raise ValueError("execute_dft requires a c2c plan")
    return plan.execute(x)


def execute_split_dft(plan, ri, ii):
    if plan.problem.kind != "c2c":
        raise ValueError("execute_split_dft requires a c2c plan")
    import jax
    # cache the jitted split apply on the plan (one trace per plan, like
    # Plan.execute; a bare jax.jit here would retrace every call)
    fn = getattr(plan, "_jitted_split", None)
    if fn is None:
        fn = jax.jit(plan.apply_split)
        plan._jitted_split = fn
    return fn(jnp.asarray(ri), jnp.asarray(ii))


def execute_dft_r2c(plan, x):
    if plan.problem.kind != "r2c":
        raise ValueError("execute_dft_r2c requires an r2c plan")
    return plan.execute(x)


def execute_dft_c2r(plan, x):
    if plan.problem.kind != "c2r":
        raise ValueError("execute_dft_c2r requires a c2r plan")
    return plan.execute(x)


def execute_r2r(plan, x):
    if plan.problem.kind != "r2r":
        raise ValueError("execute_r2r requires an r2r plan")
    return plan.execute(x)


def execute_split_dft_r2c(plan, x):
    """fftw_execute_split_dft_r2c analog (new-array execute on an r2c
    plan, split output): real array in -> (re, im) arrays out.  Accepts a
    SplitR2CPlan or any r2c plan."""
    if isinstance(plan, SplitR2CPlan):
        return plan.execute(x)
    if plan.problem.kind != "r2c":
        raise ValueError("execute_split_dft_r2c requires an r2c plan")
    w = getattr(plan, "_split_wrap", None)     # one trace per plan
    if w is None:
        w = plan._split_wrap = SplitR2CPlan(plan)
    return w.execute(x)


def execute_split_dft_c2r(plan, ri, ii):
    """fftw_execute_split_dft_c2r analog: (re, im) arrays in -> real
    array out.  Accepts a SplitC2RPlan or any c2r plan."""
    if isinstance(plan, SplitC2RPlan):
        return plan.execute(ri, ii)
    if plan.problem.kind != "c2r":
        raise ValueError("execute_split_dft_c2r requires a c2r plan")
    w = getattr(plan, "_split_wrap", None)     # one trace per plan
    if w is None:
        w = plan._split_wrap = SplitC2RPlan(plan)
    return w.execute(ri, ii)


class SplitR2CPlan:
    """Split-output r2c plan: real in -> (re, im) arrays out
    (fftw_plan_guru_split_dft_r2c analog)."""

    def __init__(self, plan):
        self._plan = plan
        self.in_shape = plan.in_shape
        self.problem = plan.problem
        self._jitted = None            # cached jit (no per-call retrace)

    def execute(self, x):
        import jax
        if self._jitted is None:
            self._jitted = jax.jit(
                lambda a: (lambda y: (jnp.real(y), jnp.imag(y)))(
                    self._plan.apply(a)))
        return self._jitted(jnp.asarray(x))

    __call__ = execute


class SplitC2RPlan:
    """Split-input c2r plan: (re, im) arrays in -> real out
    (fftw_plan_guru_split_dft_c2r analog)."""

    def __init__(self, plan):
        self._plan = plan
        self.in_shape = plan.in_shape
        self.problem = plan.problem
        self._jitted = None            # cached jit (no per-call retrace)

    def execute(self, ri, ii):
        import jax
        if self._jitted is None:
            self._jitted = jax.jit(lambda a, b: self._plan.apply(a + 1j * b))
        return self._jitted(jnp.asarray(ri), jnp.asarray(ii))

    __call__ = execute


def plan_guru_split_dft_r2c(dims: Sequence, howmany_dims: Sequence = (),
                            flags: int = K.ESTIMATE,
                            dtype="float32") -> SplitR2CPlan:
    return SplitR2CPlan(plan_guru_dft_r2c(dims, howmany_dims, flags, dtype))


def plan_guru_split_dft_c2r(dims: Sequence, howmany_dims: Sequence = (),
                            flags: int = K.ESTIMATE,
                            dtype="float32") -> SplitC2RPlan:
    return SplitC2RPlan(plan_guru_dft_c2r(dims, howmany_dims, flags, dtype))


plan_guru64_split_dft_r2c = plan_guru_split_dft_r2c
plan_guru64_split_dft_c2r = plan_guru_split_dft_c2r
