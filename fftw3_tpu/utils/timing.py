"""Device timing that survives the axon TPU tunnel.

On this backend ``block_until_ready`` returns before the remote device has
actually finished, any sizable device->host fetch pays hundreds of ms of
tunnel latency, and a single synchronization round trip costs ~0.5-1 s with
hundreds of microseconds of jitter.  The honest protocol
(libbench2/timer.c min-of-k analog, hardened):

* chain iterations through a data dependency so nothing can be elided,
* synchronize once at the end by fetching a jit-sliced 1-element view
  (4 bytes over the tunnel),
* run two chain lengths back-to-back and difference them, cancelling the
  fixed dispatch+sync latency,
* take the MEDIAN over repeated paired differences (the sync jitter is
  symmetric, so the median is unbiased where a min/max is not), and
* if the jitter swamps the signal (non-positive median), double the chain
  length and retry so the signal grows until it dominates.

Chained values grow without bound for unnormalized transforms (sqrt(n) RMS
gain per iteration, saturating to inf after ~20 iterations).  This is
intentional: TPU vector/matrix arithmetic is value-independent (verified —
chained-inf timings match finite-data marginal-slope measurements), and
scaling the output back would add an HBM pass that distorts the very
quantity being measured.
"""
from __future__ import annotations

import statistics
import time
from typing import Callable, Sequence

import jax
import numpy as np

_slice1 = None
_sum1 = None


def sync(out) -> None:
    """Force completion of everything `out` depends on (4-byte fetch).
    Fetches the real part: complex arrays cannot cross the tunnel.
    Multi-device (sharded) outputs sync through a scalar reduction —
    slicing a sharded dim is unimplemented, and the sum depends on every
    shard, so nothing can be elided."""
    global _slice1, _sum1
    leaf = jax.tree.leaves(out)[0]
    if getattr(leaf, "sharding", None) is not None \
            and len(leaf.sharding.device_set) > 1:
        if _sum1 is None:
            import jax.numpy as jnp
            _sum1 = jax.jit(lambda t: jnp.real(t).sum())
        np.asarray(_sum1(leaf))
        return
    if _slice1 is None:
        import jax.numpy as jnp
        _slice1 = jax.jit(lambda t: jnp.real(t).ravel()[:1])
    np.asarray(_slice1(leaf))


def _median_diff(run, k1: int, k2: int, reps: int) -> float:
    samples = []
    for _ in range(reps):
        t1 = run(k1)
        t2 = run(k2)
        samples.append((t2 - t1) / (k2 - k1))
    return statistics.median(samples)


def time_chained(fn: Callable, args: Sequence, k1: int = 8, k2: int = 40,
                 reps: int = 5) -> float:
    """Seconds per call of ``fn`` whose output tuple feeds its inputs."""
    args = tuple(jax.device_put(a) if isinstance(a, np.ndarray) else a
                 for a in args)
    out = fn(*args)
    sync(out)

    def chain(k):
        cur = out
        t0 = time.perf_counter()
        for _ in range(k):
            cur = fn(*cur)
        sync(cur)
        return time.perf_counter() - t0

    for attempt in range(3):
        est = _median_diff(chain, k1, k2, reps)
        if est > 0:
            return est
        k1, k2 = k2, k2 * 2            # grow the signal past the jitter
    return max(est, 1e-12)


def time_chained_multi(configs, k1: int = 8, k2: int = 40,
                       reps: int = 5):
    """Marginal chained time per call for SEVERAL (fn, args) configs,
    interleaved: every rep times the short and long chain of every config
    before the next rep starts, so slow chip-state drift (minutes-scale
    2-3x swings, measured through the tunnel) lands on all configs alike
    and cancels in the per-config median of paired differences.  This is
    the decision-grade form of a same-session A/B/A sandwich for more than
    two arms.  Returns a list of seconds-per-call aligned with configs."""
    chains = []
    for fn, args in configs:
        args = tuple(jax.device_put(a) if isinstance(a, np.ndarray) else a
                     for a in args)
        out = fn(*args)
        sync(out)

        def chain(k, fn=fn, out=out):
            cur = out
            t0 = time.perf_counter()
            for _ in range(k):
                cur = fn(*cur)
            sync(cur)
            return time.perf_counter() - t0
        chains.append(chain)
    samples = [[] for _ in chains]
    for _ in range(reps):
        for i, chain in enumerate(chains):
            t1 = chain(k1)
            t2 = chain(k2)
            samples[i].append((t2 - t1) / (k2 - k1))
    return [statistics.median(s) for s in samples]


def time_dispatched(fn: Callable, args: Sequence, k1: int = 8, k2: int = 40,
                    reps: int = 5) -> float:
    """Like :func:`time_chained` for fns whose output cannot feed the input:
    K independent dispatches (in-order device execution), one final sync."""
    # commit args to the device once: numpy args would otherwise pay a
    # host->device transfer (huge through the tunnel) on EVERY call
    args = tuple(jax.device_put(a) if isinstance(a, np.ndarray) else a
                 for a in args)
    out = fn(*args)
    sync(out)

    def run(k):
        t0 = time.perf_counter()
        for _ in range(k):
            out = fn(*args)
        sync(out)
        return time.perf_counter() - t0

    for attempt in range(3):
        est = _median_diff(run, k1, k2, reps)
        if est > 0:
            return est
        k1, k2 = k2, k2 * 2
    return max(est, 1e-12)
