"""Accuracy measurement (the ``accuracy_test`` harness of
``fftw/libbench2/verify.h:55-64``): L1 / L2 / Linf error columns of a
transform against the float64 dense oracle, plus the same norms for the
round trip (fwd then unnormalized inverse / N).

Used for codelet-accuracy regression tracking: run
``python -m fftw3_tpu.harness.accuracy c1024 r512 k512e10 ...`` and diff
the columns between versions.
"""
from __future__ import annotations

import sys
from dataclasses import dataclass
from typing import Dict

import numpy as np

from .. import kinds as K
from .problem import BenchProblem, parse_problem
from .verify import _Closure, _oracle_1d


@dataclass
class AccuracyResult:
    problem: str
    norms: Dict[str, float]

    def __repr__(self):
        cols = " ".join(f"{k}={v:.3e}" for k, v in self.norms.items())
        return f"(accuracy {self.problem} {cols})"


def _norms(err: np.ndarray, ref: np.ndarray, prefix: str) -> Dict[str, float]:
    scale = max(float(np.linalg.norm(ref.ravel(), 2)), 1e-300)
    return {
        f"{prefix}l1": float(np.sum(np.abs(err))) /
        max(float(np.sum(np.abs(ref))), 1e-300),
        f"{prefix}l2": float(np.linalg.norm(err.ravel(), 2)) / scale,
        f"{prefix}linf": float(np.max(np.abs(err))) /
        max(float(np.max(np.abs(ref))), 1e-300),
    }


def accuracy_test(prob_or_str, flags: int = K.ESTIMATE,
                  rdtype: str = "float32", seed: int = 0) -> AccuracyResult:
    prob = parse_problem(prob_or_str) if isinstance(prob_or_str, str) \
        else prob_or_str
    rng = np.random.default_rng(seed)
    cl = _Closure(prob, flags, rdtype)
    oracle = _oracle_1d(prob, cl.rdtype)
    x = cl.rand_input(rng)
    got = np.asarray(cl.apply(x), np.complex128)
    if prob.kind == "c2r":
        # no direct oracle for half-spectrum input; measure the round trip
        from .. import api
        import jax
        fwd = api.plan_dft_r2c(prob.shape, prob.axes, dtype=str(cl.rdtype))
        xr = rng.uniform(-0.5, 0.5, prob.shape)
        rt = jax.jit(lambda a: cl.plan.apply(fwd.apply(a)))
        y = np.asarray(rt(xr.astype(cl.rdtype)), np.float64)
        ref = prob.logical_n * xr
        return AccuracyResult(prob.pstring, _norms(y - ref, ref, ""))
    want = oracle(x if cl.complex_in else np.asarray(x, np.float64))
    return AccuracyResult(prob.pstring, _norms(got - want, want, ""))


def main(argv=None) -> int:
    args = list(sys.argv[1:] if argv is None else argv)
    double = "--double" in args
    probs = [a for a in args if not a.startswith("-")]
    if not probs:
        print("usage: python -m fftw3_tpu.harness.accuracy [--double] "
              "PROBLEM ...", file=sys.stderr)
        return 2
    for p in probs:
        res = accuracy_test(p, rdtype="float64" if double else "float32")
        print(res)
    return 0


if __name__ == "__main__":
    sys.exit(main())
