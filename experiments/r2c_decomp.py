"""Decompose the r2c 2048^2 plan with CHAINED interleaved timing.

inner_form.py overturned the axis-1 story: at aligned L=1024 the inner
[64,32] kernel is the FASTEST form measured (41.3 ps/pt vs last-axis
48-49).  If the axis-1 pass at the real L=1025 also runs ~43, the two
passes sum to ~2230 us and the plan's measured ~3000 us has ~800 us
unattributed — the fused r2c pass's real-pipeline overhead, the masked
1025-lane stage interaction, or inter-pass XLA glue.  Time each piece
in ONE interleaved block (chained, so dispatched-timing pollution —
which inflated the round-4 decomposition numbers — is excluded):

  full      the production r2c plan (8, 2048, 2048) axes=(1,2), k2force
  fused     the last-axis pallas_r2c pass alone on (8*2048, 2048) real
  inner1025 the axis-1 c2c inner pass alone on (8, 2048, 1025) splits
  inner1024 same at L=1024 (the masked-edge delta under stages)

Run ON CHIP: python experiments/r2c_decomp.py
"""
import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

import fftw3_tpu as ftpu
from fftw3_tpu.ops import pallas_stockham as ps
from fftw3_tpu.utils import timing

N = 2048
B = 8


def main():
    print(f"# backend={jax.default_backend()}", file=sys.stderr)
    rng = np.random.default_rng(0)
    arms = []

    # full plan (complex out stays on device; chain via the split planes)
    from fftw3_tpu.planner import the_planner
    desc = {"alg": "pallas_r2c", "n": N, "radices": [64, 16],
            "k2": "force"}
    the_planner.wisdom[the_planner._key("r2c", N, np.float32, B * N)] = {
        "desc": desc, "patience": 99, "cost": 0.0}
    plan = ftpu.plan_dft_r2c((B, N, N), axes=(1, 2), dtype="float32")
    ftpu.forget_wisdom()
    print(f"# plan: {plan!r}", file=sys.stderr)

    def _fold(re):
        # cheap chainable real->real fold: one lane-concat copy pass
        return jnp.concatenate([re, re[..., :N - N // 2 - 1]],
                               axis=-1) * 1e-3

    @jax.jit
    def full(x):
        y = plan.apply(x)
        return (_fold(jnp.real(y)),)
    x0 = jnp.asarray(rng.standard_normal((B, N, N)), jnp.float32)
    full(x0)[0].block_until_ready()
    arms.append(("full+fold", full, (x0,), B * N * N))

    # fused r2c last-axis pass alone
    r2c_call = ps.build_pallas_r2c(dict(desc), np.float32)

    @jax.jit
    def fused(x):
        y = r2c_call(x.reshape(B * N, N))
        return (_fold(jnp.real(y)).reshape(B, N, N),)
    fused(x0)[0].block_until_ready()
    arms.append(("fused+fold", fused, (x0,), B * N * N))

    # the fold epilogue alone (so its cost subtracts out)
    @jax.jit
    def fold(x):
        return (_fold(x[..., :N // 2 + 1]),)
    fold(x0)[0].block_until_ready()
    arms.append(("fold", fold, (x0,), B * N * N))

    # axis-1 inner c2c at L=1025 and L=1024
    for L in (1025, 1024):
        ap = ps.build_pallas_c2c_split_inner(
            {"alg": "pallas", "n": N, "radices": [64, 32], "k2": "force",
             "gsplit": True}, -1, np.float32)
        fn = jax.jit(ap)
        xr = jnp.asarray(rng.standard_normal((B, N, L)), jnp.float32)
        xi = jnp.asarray(rng.standard_normal((B, N, L)), jnp.float32)
        fn(xr, xi)[0].block_until_ready()
        arms.append((f"inner{L}", fn, (xr, xi), B * N * L))

    configs = [(fn, a) for _, fn, a, _ in arms]
    ts = timing.time_chained_multi(configs, k1=4, k2=16, reps=7)
    for (tag, _, _, pts), t in zip(arms, ts):
        print(f"{tag}: {t*1e6:.0f} us/call  {t/pts*1e12:.2f} ps/pt")


if __name__ == "__main__":
    main()
