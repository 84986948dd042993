"""Shared interleaved-race helpers for experiments.

Timing discipline (CLAUDE.md): through the axon tunnel only SAME-BLOCK
interleaved comparisons are decision-grade — chip-state drift moves the
same compiled kernel 2-3x between blocks within an hour.  These helpers
run every arm's short and long chain inside every rep so the drift lands
on all arms alike and cancels in the per-arm median of paired differences
(the multi-arm A/B/A sandwich, fftw/libbench2/timer.c:101-116 analog).
"""
from __future__ import annotations

import statistics
import time


def interleaved_chain_race(named_chains, k1=4, k2=16, reps=7, quiet=False):
    """Race arbitrary chain callables.  ``named_chains`` is a list of
    (tag, chain) where ``chain(k)`` runs k chained calls and returns the
    wall seconds (including one trailing sync).  Returns {tag: sec/call}
    (median of paired (t2-t1)/(k2-k1) differences)."""
    samples = {tag: [] for tag, _ in named_chains}
    for rep in range(reps):
        for tag, chain in named_chains:
            t1 = chain(k1)
            t2 = chain(k2)
            samples[tag].append((t2 - t1) / (k2 - k1))
        if not quiet:
            print(f"  rep {rep + 1}/{reps} done", flush=True)
    return {tag: statistics.median(s) for tag, s in samples.items()}


def make_chain(fn, out0, sync):
    """Standard chain closure: output tuple feeds the inputs."""
    def chain(k):
        cur = out0
        t0 = time.perf_counter()
        for _ in range(k):
            cur = fn(*cur)
        sync(cur)
        return time.perf_counter() - t0
    return chain
