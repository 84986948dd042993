"""Distributed transforms over a TPU mesh — the fftw/mpi tier, TPU-native.

FFTW-MPI distributes arrays in 1-d blocks over ranks and moves data with
global transposes implemented by three interchangeable MPI solvers
(pairwise sendrecv / alltoall / recursive, reference ``fftw/mpi/transpose-*.c``,
SURVEY.md section 2.9).  Here the mesh replaces the communicator, a
``PartitionSpec`` replaces the block distribution, and the global transpose is
a *resharding*: ``lax.all_to_all`` (or a ``ppermute`` ring) inside
``shard_map``, riding ICI.  Because all_to_all delivers chunks in peer order,
the "transposed" output is simply the same logical array with a different
PartitionSpec — FFTW's ``TRANSPOSED_OUT`` trick (skip half the communication,
``mpi/dft-rank-geq2-transposed.c``) becomes free layout choice.

Solvers:

* :func:`plan_dft_dist` rank >= 2 — slab decomposition: local FFTs over
  non-sharded axes, one global transpose, FFT over the formerly sharded axis
  (``mpi/dft-rank-geq2.c`` analog), optional transposed-out.
* :func:`plan_dft_1d_dist` — the six-step distributed 1-D DFT: transpose,
  local DFT, twiddle, transpose, local DFT, transpose (``mpi/dft-rank1.c``
  analog) with FFTW's SCRAMBLED_OUT option to skip the final transpose.
* batch-sharded transforms (``dft-rank1-bigvec`` analog) need no machinery:
  a local plan under shard_map; :func:`plan_dft_dist` handles it when the
  sharded axis is not a transform axis.

Wisdom note: plans must be identical across hosts; descriptors come from the
deterministic ESTIMATE path or from broadcast wisdom (``fftw_mpi_gather/
broadcast_wisdom`` analog: host 0 plans, others import).
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from .. import kinds as K
from .. import planner as planner_mod
from ..ops import c2c as c2c_ops
from ..ops import matrices


# ---------------------------------------------------------------------------
# local_size helpers (mpi/block.c analog)
# ---------------------------------------------------------------------------

def default_block(n: int, nproc: int) -> int:
    """FFTW's default 1-d block: ceil(n/P) (mpi/block.c)."""
    return (n + nproc - 1) // nproc


def local_size_1d(n: int, nproc: int, rank: int) -> Tuple[int, int]:
    """(local_n, local_start) of `rank` under the default block."""
    b = default_block(n, nproc)
    start = min(rank * b, n)
    return min(b, n - start), start


def _transpose_a2a(x, axis_name: str, split_axis: int, concat_axis: int):
    """Global transpose via all-to-all (transpose-alltoall analog)."""
    return jax.lax.all_to_all(x, axis_name, split_axis=split_axis,
                              concat_axis=concat_axis, tiled=True)


def _transpose_ppermute(x, axis_name: str, split_axis: int, concat_axis: int):
    """Global transpose as a P-1-step ppermute ring (transpose-pairwise
    analog, mpi/transpose-pairwise.c:49-100): each step rotates blocks one
    hop; block j lands after j hops.  Same result as all_to_all; gives the
    planner a second communication schedule to time (SURVEY.md section 5,
    'communication algorithm selection is inside the autotuning loop')."""
    P_ = jax.lax.axis_size(axis_name)
    me = jax.lax.axis_index(axis_name)
    parts = jnp.stack(jnp.split(x, P_, axis=split_axis))  # chunks by dest
    acc = jnp.zeros_like(parts)
    acc = jax.lax.dynamic_update_index_in_dim(
        acc, jnp.take(parts, me, axis=0), me, axis=0)
    # P-1 rounds; in round k every rank sends exactly the chunk addressed
    # k hops ahead directly to its destination — the stall-free round-robin
    # schedule of transpose-pairwise (one send + one recv per rank per round).
    for k in range(1, P_):
        perm = [(i, (i + k) % P_) for i in range(P_)]
        send = jnp.take(parts, (me + k) % P_, axis=0)
        recv = jax.lax.ppermute(send, axis_name, perm)
        src = (me - k) % P_        # block from source s lands at position s
        acc = jax.lax.dynamic_update_index_in_dim(acc, recv, src, axis=0)
    chunks = [jnp.take(acc, i, axis=0) for i in range(P_)]
    return jnp.concatenate(chunks, axis=concat_axis)


_TRANSPOSE_IMPLS = {"all_to_all": _transpose_a2a,
                    "ppermute": _transpose_ppermute}


class DistPlan:
    """Executable distributed plan over global jax.Arrays."""

    def __init__(self, fn: Callable, mesh: Mesh, in_spec: P, out_spec: P,
                 global_shape: Tuple[int, ...], desc: str):
        self.mesh = mesh
        self.in_spec = in_spec
        self.out_spec = out_spec
        self.global_shape = global_shape
        self.desc = desc
        self._fn = jax.jit(jax.shard_map(fn, mesh=mesh, in_specs=in_spec,
                                         out_specs=out_spec))

    def __call__(self, x):
        return self._fn(x)

    @property
    def apply(self):
        return self._fn

    def input_sharding(self) -> NamedSharding:
        return NamedSharding(self.mesh, self.in_spec)

    def output_sharding(self) -> NamedSharding:
        return NamedSharding(self.mesh, self.out_spec)

    def __repr__(self):
        return f"(dist-plan {self.desc} {self.global_shape} {self.in_spec})"


def plan_dft_dist(shape: Sequence[int], mesh: Mesh, axis_name: str = "x",
                  axes: Optional[Sequence[int]] = None,
                  sign: int = K.FORWARD, shard_axis: int = 0,
                  transposed_out: bool = False, flags: int = K.ESTIMATE,
                  dtype="complex64",
                  transpose_method: str = "all_to_all") -> DistPlan:
    """Slab-decomposed distributed c2c DFT, rank >= 1.

    `shape` is the global array shape; the array is sharded along
    `shard_axis` over mesh axis `axis_name`.  If `shard_axis` is not a
    transform axis this reduces to purely-local plans (bigvec analog).
    With ``transposed_out=True`` the result is sharded along the swap axis
    instead — no final global transpose (TRANSPOSED_OUT analog).
    """
    shape = tuple(shape)
    ndim = len(shape)
    axes = tuple(a % ndim for a in
                 (range(ndim) if axes is None else axes))
    shard_axis %= ndim
    nproc = mesh.shape[axis_name]
    rdtype = np.float32 if np.dtype(dtype) in (np.complex64, np.float32) \
        else np.float64
    patience = K.patience_of_flags(flags)
    pl = planner_mod.the_planner
    transpose = _TRANSPOSE_IMPLS[transpose_method]

    in_spec = P(*[axis_name if i == shard_axis else None
                  for i in range(ndim)])

    if shard_axis not in axes:
        # batch-sharded: all transform axes local (dft-rank1-bigvec analog)
        local_shape = list(shape)
        local_shape[shard_axis] //= nproc
        builders = [(a, c2c_ops.build_c2c(pl.plan_c2c(shape[a], rdtype,
                                                      patience), sign, rdtype))
                    for a in axes]

        def local_fn(x):
            for a, fn in builders:
                x = _apply_along(fn, x, a)
            return x
        return DistPlan(local_fn, mesh, in_spec, in_spec, shape,
                        "bigvec-local")

    if len(axes) == 1:
        return _plan_six_step(shape, mesh, axis_name, axes[0], sign,
                              flags, rdtype, transpose, in_spec,
                              scrambled_out=transposed_out)

    if shape[shard_axis] % nproc:
        raise ValueError(f"shard axis extent {shape[shard_axis]} not "
                         f"divisible by mesh size {nproc}")
    # pick the swap axis: another transform axis (prefer the next one)
    others = [a for a in axes if a != shard_axis]
    swap = others[0]
    if shape[swap] % nproc:
        raise ValueError(f"swap axis extent {shape[swap]} not divisible "
                         f"by mesh size {nproc}")

    # local plans: transform axes != shard_axis on the local slab, then the
    # shard axis after the global transpose
    fns_local = [(a, c2c_ops.build_c2c(pl.plan_c2c(shape[a], rdtype,
                                                   patience), sign, rdtype))
                 for a in others]
    fn_shard = c2c_ops.build_c2c(pl.plan_c2c(shape[shard_axis], rdtype,
                                             patience), sign, rdtype)

    def local_fn(x):
        # 1. FFT over all locally-complete transform axes
        for a, fn in fns_local:
            x = _apply_along(fn, x, a)
        # 2. global transpose: gather shard_axis, scatter swap axis
        x = transpose(x, axis_name, split_axis=swap, concat_axis=shard_axis)
        # 3. FFT over the (now local) shard axis
        x = _apply_along(fn_shard, x, shard_axis)
        if not transposed_out:
            x = transpose(x, axis_name, split_axis=shard_axis,
                          concat_axis=swap)
        return x

    out_axis = swap if transposed_out else shard_axis
    out_spec = P(*[axis_name if i == out_axis else None
                   for i in range(ndim)])
    return DistPlan(local_fn, mesh, in_spec, out_spec, shape,
                    f"slab[{transpose_method}]"
                    + ("-transposed_out" if transposed_out else ""))


def plan_dft_1d_dist(n: int, mesh: Mesh, axis_name: str = "x",
                     sign: int = K.FORWARD, flags: int = K.ESTIMATE,
                     dtype="complex64", scrambled_out: bool = False,
                     transpose_method: str = "all_to_all",
                     batch_shape: Tuple[int, ...] = ()) -> DistPlan:
    """Distributed 1-D DFT of size n, sharded over its only axis
    (six-step, mpi/dft-rank1.c analog).  Input shape: batch_shape + (n,)."""
    shape = tuple(batch_shape) + (n,)
    rdtype = np.float32 if np.dtype(dtype) in (np.complex64, np.float32) \
        else np.float64
    transpose = _TRANSPOSE_IMPLS[transpose_method]
    in_spec = P(*([None] * len(batch_shape) + [axis_name]))
    return _plan_six_step(shape, mesh, axis_name, len(shape) - 1, sign,
                          flags, rdtype, transpose, in_spec, scrambled_out)


def _plan_six_step(shape, mesh, axis_name, axis, sign, flags, rdtype,
                   transpose, in_spec, scrambled_out):
    """Six-step 1-D DFT over a sharded axis: n = R*C viewed as an (R, C)
    matrix; out[c + R*d] = F_C_d( w^{rc} * F_R_c(x[r, c]) ) (four-step
    identity; radix choice analog of mpi/choose-radix.c)."""
    if axis != len(shape) - 1:
        raise NotImplementedError("six-step expects the sharded transform "
                                  "axis last; move it with jnp.moveaxis")
    n = shape[-1]
    nproc = mesh.shape[axis_name]
    patience = K.patience_of_flags(flags)
    pl = planner_mod.the_planner
    # choose R ~ sqrt(n) with nproc | R and nproc | C
    R = _choose_six_step_radix(n, nproc)
    C = n // R
    pl_R = c2c_ops.build_c2c(pl.plan_c2c(R, rdtype, patience), sign, rdtype)
    pl_C = c2c_ops.build_c2c(pl.plan_c2c(C, rdtype, patience), sign, rdtype)
    ctype = c2c_ops.complex_dtype(rdtype)
    # full twiddle (R, C) built on host in f64, sharded along C like the
    # post-transpose layout (device-dependent constants travel as operands)
    W = np.asarray(matrices.twiddle_2d(R, C, sign), dtype=ctype)

    nb = len(shape) - 1

    def local_fn(x, w):
        # x local: batch + (n/P,) == batch + (R/P, C) rows of the matrix
        bshape = x.shape[:-1]
        x = x.reshape(*bshape, R // nproc, C)
        # step 1: transpose -> (R, C/P): gather rows, scatter cols
        x = transpose(x, axis_name, split_axis=nb + 1, concat_axis=nb)
        # step 2: DFT_R down the rows (axis nb), batched over local cols
        x = _apply_along(pl_R, x, nb)
        # step 3: twiddle w^{rc} (w is the local C/P-slice of W)
        x = x * w
        # step 4: transpose back -> (R/P, C)
        x = transpose(x, axis_name, split_axis=nb, concat_axis=nb + 1)
        # step 5: DFT_C along the rows (axis nb+1, local)
        x = _apply_along(pl_C, x, nb + 1)
        if scrambled_out:
            # layout: out[c + R*d] at matrix position [c, d]; flattened local
            # block is the c-major "scrambled" order (SCRAMBLED_OUT analog)
            return x.reshape(*bshape, (R // nproc) * C)
        # step 6: local transpose (c,d)->(d,c) + global transpose for the
        # natural contiguous-k sharding
        x = jnp.swapaxes(x, nb, nb + 1)                  # (C, R/P)
        x = transpose(x, axis_name, split_axis=nb, concat_axis=nb + 1)
        return x.reshape(*bshape, C // nproc * R)

    w_spec = P(*([None] * nb + [None, axis_name]))
    out_spec = in_spec

    class _SixStep(DistPlan):
        def __init__(self):
            self.mesh = mesh
            self.in_spec = in_spec
            self.out_spec = out_spec
            self.global_shape = shape
            self.desc = f"six-step R={R} C={C}" + \
                (" scrambled" if scrambled_out else "")
            inner = jax.shard_map(local_fn, mesh=mesh,
                                  in_specs=(in_spec, w_spec),
                                  out_specs=out_spec)
            wdev = jax.device_put(
                W.reshape((1,) * nb + W.shape),
                NamedSharding(mesh, w_spec))
            self._fn = jax.jit(lambda x: inner(x, wdev))

    return _SixStep()


def _choose_six_step_radix(n: int, nproc: int) -> int:
    """R ~ sqrt(n) with nproc | R and nproc | n/R (mpi/choose-radix.c)."""
    from ..utils import primes
    best = None
    for R in primes.divisors(n):
        C = n // R
        if R % nproc or C % nproc:
            continue
        score = abs(np.log2(R * R / n))
        if best is None or score < best[0]:
            best = (score, R)
    if best is None:
        raise ValueError(f"six-step needs {nproc}^2 | {n} (choose a padded "
                         f"size or a smaller mesh)")
    return best[1]


def _apply_along(fn, x, axis):
    if axis == x.ndim - 1:
        return fn(x)
    x = jnp.moveaxis(x, axis, -1)
    x = fn(x)
    return jnp.moveaxis(x, -1, axis)
