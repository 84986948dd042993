"""SMP-threads API parity shims (``fftw/threads/api.c`` analog).

FFTW's threads layer (reference ``fftw/threads/``, SURVEY.md §2.8) adds a
worker pool plus solvers that shard batch loops across threads.  On TPU,
intra-chip parallelism is owned by XLA (grid parallelism inside kernels,
vectorized batching), so these functions keep the *API contract* — user code
calling ``fftw_init_threads``/``fftw_plan_with_nthreads`` translates 1:1 —
while the requested thread count maps onto the only meaningful knob: it is
recorded and exposed so distributed planners may use it as a per-host
device-count hint.

``make_planner_thread_safe`` is real: the planner mutates shared wisdom, so
plan creation takes a lock (the public API already serializes through
``api._lock``; this upgrades it to an RLock explicitly).
"""
from __future__ import annotations

import threading as _threading

_nthreads: int = 1
_initialized: bool = False


def init_threads() -> int:
    """fftw_init_threads analog (threads/api.c:38-56).  Always succeeds."""
    global _initialized
    _initialized = True
    return 1


def plan_with_nthreads(n: int) -> None:
    """fftw_plan_with_nthreads analog (threads/api.c:69-80): records the
    requested parallelism.  XLA owns single-chip parallelism, so n has no
    single-chip effect; distributed planners may read it as a hint."""
    global _nthreads
    if n < 1:
        raise ValueError("nthreads must be >= 1")
    _nthreads = int(n)


def planner_nthreads() -> int:
    """fftw_planner_nthreads analog."""
    return _nthreads


def make_planner_thread_safe() -> None:
    """fftw_make_planner_thread_safe analog (threads/api.c:82-85).
    Planning is already serialized by the API lock; kept for parity."""
    from . import api
    if not isinstance(api._lock, type(_threading.RLock())):
        api._lock = _threading.RLock()


def cleanup_threads() -> None:
    """fftw_cleanup_threads analog."""
    global _nthreads, _initialized
    _nthreads = 1
    _initialized = False
