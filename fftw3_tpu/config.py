"""Global numeric configuration.

TPU MXUs execute f32 matmuls as bf16 multi-pass by default, which breaks
FFTW's single-precision accuracy contract (max rel err <= 1e-3,
``fftw/libbench2/bench-main.c:70``).  All transform contractions therefore
default to ``Precision.HIGHEST`` (bf16x6 on the MXU — still MXU-rate, ~3x
the flops of one pass, and bandwidth-bound FFTs rarely notice).  Set
``matmul_precision = "default"`` to trade accuracy for raw MXU throughput.
"""
from __future__ import annotations

import jax

#: 'highest' (accuracy contract, default) | 'default' (fast, ~bf16)
matmul_precision: str = "highest"

#: Pallas codelet tier mode: 'auto' (compiled on TPU, interpreted elsewhere)
#: | 'on' (always compiled) | 'interpret' | 'off' (planner skips it)
pallas_mode: str = "auto"

#: MXU arithmetic inside the fused Pallas kernels: 'bf16x3' (default —
#: operands split hi+lo, 3 one-pass bf16 matmuls per product, rel err
#: ~1e-5, 12% faster) | 'highest' (6-pass, rel err ~1e-7)
pallas_matmul: str = "bf16x3"

#: Route plan-time host work (ESTIMATE search, hashing, wisdom) through the
#: native C++ tier when the shared library is available (fftw3_tpu/native.py)
use_native: bool = True


def precision():
    return {"highest": jax.lax.Precision.HIGHEST,
            "high": jax.lax.Precision.HIGH}.get(
        matmul_precision, jax.lax.Precision.DEFAULT)
