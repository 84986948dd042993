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


def radix_slope_race(N, arms, b_lo=8192, b_hi=24576, desc_extra=None):
    """Shared body of the reversed-radix experiments (rev1024/rev1000 —
    they differed only in N and ARMS; ADVICE r4 asked for one source of
    truth for the verify gate + timing protocol).  Builds one presplit
    kernel per radix schedule, verifies vs numpy, pre-compiles at BOTH
    timing batches (pallas_call is shape-specialized), then prints
    interleaved marginal slopes in ps/pt."""
    import sys

    import numpy as np
    import jax
    import jax.numpy as jnp

    from fftw3_tpu.ops import pallas_stockham as ps
    from fftw3_tpu.utils import timing

    print(f"# backend={jax.default_backend()}", file=sys.stderr)
    rng = np.random.default_rng(3)
    vr = rng.standard_normal((256, N)).astype(np.float32)
    vi = rng.standard_normal((256, N)).astype(np.float32)
    ref = np.fft.fft((vr + 1j * vi).astype(np.complex128), axis=1)

    pr_lo = jnp.zeros((b_lo, N), jnp.float32)
    pr_hi = jnp.zeros((b_hi, N), jnp.float32)
    good = []
    for rad in arms:
        tag = str(rad)
        desc = {"alg": "pallas", "n": N, "radices": rad,
                "tile_b": 128, "k2": "first", "gsplit": True}
        desc.update(desc_extra or {})
        try:
            fn = jax.jit(ps.build_pallas_c2c_split(desc, -1, np.float32))
            yr, yi = fn(vr, vi)
            err = float(np.max(np.abs(
                (np.asarray(yr) + 1j * np.asarray(yi)) - ref))
                / np.max(np.abs(ref)))
            print(f"# {tag}: relerr={err:.1e}", file=sys.stderr)
            if err < 1e-4:
                fn(pr_lo, pr_lo)[0].block_until_ready()
                fn(pr_hi, pr_hi)[0].block_until_ready()
                good.append((tag, fn))
        except Exception as exc:                       # noqa: BLE001
            print(f"# {tag}: FAIL {str(exc)[:140]}", file=sys.stderr)

    if len(good) < 2:
        print("# fewer than 2 arms; no race", file=sys.stderr)
        return
    configs = []
    rng2 = np.random.default_rng(4)
    for tag, fn in good:
        for b in (b_lo, b_hi):
            xr = jnp.asarray(rng2.standard_normal((b, N)), jnp.float32)
            xi = jnp.asarray(rng2.standard_normal((b, N)), jnp.float32)
            configs.append((fn, (xr, xi)))
    ts = timing.time_chained_multi(configs, k1=4, k2=16, reps=7)
    for i, (tag, _) in enumerate(good):
        s = (ts[2 * i + 1] - ts[2 * i]) / ((b_hi - b_lo) * N)
        print(f"{tag}: {s*1e12:.1f} ps/pt")
