"""Device timing that survives the axon TPU tunnel.

On this backend ``block_until_ready`` returns before the remote device has
actually finished, and any sizable device->host fetch pays hundreds of ms of
tunnel latency.  The honest protocol (libbench2/timer.c min-of-k analog,
hardened):

* chain iterations through a data dependency so nothing can be elided,
* synchronize once at the end by fetching a jit-sliced 1-element view
  (4 bytes over the tunnel),
* run two chain lengths and difference them, cancelling the fixed
  dispatch+sync latency,
* take the min over repetitions.
"""
from __future__ import annotations

import time
from typing import Callable, Sequence

import jax
import numpy as np

_slice1 = None


def sync(out) -> None:
    """Force completion of everything `out` depends on (4-byte fetch)."""
    global _slice1
    if _slice1 is None:
        _slice1 = jax.jit(lambda t: t.ravel()[:1])
    leaf = jax.tree.leaves(out)[0]
    np.asarray(_slice1(leaf))


def time_chained(fn: Callable, args: Sequence, k1: int = 4, k2: int = 36,
                 reps: int = 3) -> float:
    """Seconds per call of ``fn`` whose output tuple feeds its inputs."""
    out = fn(*args)
    sync(out)

    def chain(k):
        cur = out
        t0 = time.perf_counter()
        for _ in range(k):
            cur = fn(*cur)
        sync(cur)
        return time.perf_counter() - t0

    best = float("inf")
    for _ in range(reps):
        best = min(best, (chain(k2) - chain(k1)) / (k2 - k1))
    return best


def time_dispatched(fn: Callable, args: Sequence, k1: int = 4, k2: int = 36,
                    reps: int = 3) -> float:
    """Like :func:`time_chained` for fns whose output cannot feed the input:
    K independent dispatches (in-order device execution), one final sync."""
    out = fn(*args)
    sync(out)

    def run(k):
        t0 = time.perf_counter()
        for _ in range(k):
            out = fn(*args)
        sync(out)
        return time.perf_counter() - t0

    best = float("inf")
    for _ in range(reps):
        best = min(best, (run(k2) - run(k1)) / (k2 - k1))
    return best
