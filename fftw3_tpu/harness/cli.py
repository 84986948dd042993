"""The ``bench`` binary analog (``fftw/libbench2/bench-main.c`` +
``fftw/tests/fftw-bench.c``)::

    python -m fftw3_tpu.harness -s c1024            # speed
    python -m fftw3_tpu.harness -y c1024 -y r256    # verify
    python -m fftw3_tpu.harness -oestimate -opatient ...
    python -m fftw3_tpu.harness --paranoid -y 32x64
    python -m fftw3_tpu.harness -owisdom -s c4096   # wis.dat read/write

Speed output follows the reference's ``report_benchmark`` shape:
``Problem: <p>, setup: <t>, time: <t>, ``mflops``: <x>``.
"""
from __future__ import annotations

import argparse
import contextlib
import sys
import time

import numpy as np

from .. import api
from .. import kinds as K
from .mflops import mflops
from .problem import make_plan, parse_problem
from .verify import VerificationError, verify_problem

WISFILE = "wis.dat"


def _speed(pstring: str, flags: int, verbose: int, dtype: str) -> None:
    from ..utils import timing

    import jax
    import jax.numpy as jnp

    prob = parse_problem(pstring)
    t0 = time.perf_counter()
    plan = make_plan(prob, flags, dtype)
    setup = time.perf_counter() - t0
    rng = np.random.default_rng(0)
    rdt = np.float32 if dtype in ("float32", "complex64") else np.float64
    complex_in = prob.kind in ("c2c", "c2r")
    complex_out = prob.kind in ("c2c", "r2c")
    apply = plan.apply

    # split complex at the host boundary (axon tunnel: no complex transfers)
    def wrap(fn):
        def run(*parts):
            y = fn(parts[0] + 1j * parts[1]) if complex_in else fn(parts[0])
            return (jnp.real(y), jnp.imag(y)) if complex_out else (y,)
        return run

    fn = jax.jit(wrap(apply))
    args = [jnp.asarray(rng.standard_normal(plan.in_shape), rdt)]
    if complex_in:
        args.append(jnp.asarray(rng.standard_normal(plan.in_shape), rdt))
    t = timing.time_dispatched(fn, tuple(args), k1=2, k2=10, reps=3)
    mf = mflops(prob, t)
    print(f"Problem: {pstring}, setup: {setup:.2f} s, time: {t:.3e} s, "
          f"``mflops'': {mf:.5g}")
    if verbose >= 2:
        plan.print_plan()


def _verify(pstring: str, flags: int, verbose: int, dtype: str,
            paranoid_mode: bool, rounds: int) -> None:
    rdtype = "float64" if dtype in ("float64", "complex128") else "float32"
    ctx = contextlib.nullcontext()
    if paranoid_mode:
        from .paranoid import paranoid
        ctx = paranoid()
    with ctx:
        res = verify_problem(pstring, flags=flags, rounds=rounds,
                             rdtype=rdtype)
    if verbose >= 1:
        print(f"{pstring} {res.max_err:.3e}")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        prog="fftw3_tpu.harness", add_help=True,
        description="FFTW-style bench/verify harness on the TPU engine")
    ap.add_argument("-s", "--speed", action="append", default=[],
                    metavar="PROBLEM")
    ap.add_argument("-y", "--verify", action="append", default=[],
                    metavar="PROBLEM")
    ap.add_argument("-v", "--verbose", type=int, nargs="?", const=1,
                    default=0)
    ap.add_argument("-o", "--option", action="append", default=[],
                    help="estimate|measure|patient|exhaustive|"
                         "wisdom|paranoid|nthreads=N")
    ap.add_argument("--paranoid", action="store_true")
    ap.add_argument("--double", action="store_true",
                    help="float64/complex128 transforms")
    ap.add_argument("--rounds", type=int, default=4)
    args = ap.parse_args(argv)

    flags = K.ESTIMATE
    use_wisdom = False
    for opt in args.option:
        o = opt.lower()
        if o == "estimate":
            flags = K.ESTIMATE
        elif o == "measure":
            flags = K.MEASURE
        elif o == "patient":
            flags = K.PATIENT
        elif o == "exhaustive":
            flags = K.EXHAUSTIVE
        elif o == "wisdom":
            use_wisdom = True
        elif o == "paranoid":
            args.paranoid = True
        elif o.startswith("nthreads="):
            from .. import threads
            threads.plan_with_nthreads(int(o.split("=", 1)[1]))
        else:
            ap.error(f"unknown -o option {opt!r}")

    if use_wisdom:
        api.import_wisdom_from_filename(WISFILE)

    dtype = "complex128" if args.double else "complex64"
    status = 0
    for p in args.verify:
        try:
            _verify(p, flags, args.verbose, dtype, args.paranoid,
                    args.rounds)
        except (VerificationError, ValueError) as exc:
            print(f"FAILED {p}: {exc}", file=sys.stderr)
            status = 1
    for p in args.speed:
        _speed(p, flags, args.verbose, dtype)

    if use_wisdom:
        api.export_wisdom_to_filename(WISFILE)
    return status


if __name__ == "__main__":
    sys.exit(main())
