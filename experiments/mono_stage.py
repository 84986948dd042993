"""Mono-matmul Stockham stage: ONE MXU pass per stage (K=6p) replacing
hh-pass + cross-pass + f32 add, and ONE concat of cast pieces replacing
the stack/restack concats.

Current stage (round 2): Xh/Xl casts -> XX concat -> dot(Gh,Xh) ->
dot(GG,XX) -> add -> twiddle (per-plane) -> restack concat -> permute.
~8 full-working-set VMEM ops.

Mono stage: casts -> XXX=concat([rh,ih,rl,il,rh,ih]) -> dot(GGG,XXX)
[GGG = [Gh|Gh|Gl] host-precomputed] -> twiddle on row slices ->
per-plane permute (feeds next stage's concat directly).
Saves per stage: one dot-output write, the add (r2+w1), the restack
(r+w) ~= 3 sweeps ~= 6-8 ps/pt over 2 stages if sweeps cost ~2.7 ps/pt.

Variant bf16perm additionally casts BEFORE the permute so the permute
moves 4 bf16 half-planes (same bytes) and stage 2 needs no casts.

Usage: python experiments/mono_stage.py [n]
"""
import sys

sys.path.insert(0, "/root/repo")

import numpy as np


def _ggg(p, sign):
    from fftw3_tpu.ops import matrices
    F = matrices.dft_matrix(p, sign)
    G = np.block([[F.real, -F.imag], [F.imag, F.real]]).astype(np.float32)
    import jax.numpy as jnp
    Gh64 = np.asarray(jnp.asarray(G).astype(jnp.bfloat16)).astype(np.float64)
    Gh = Gh64.astype(np.float32)
    Gl = (G.astype(np.float64) - Gh64).astype(np.float32)
    # ship f32, cast to bf16 in-kernel (exact: values already bf16-grid)
    return np.concatenate([Gh, Gh, Gl], axis=1)  # (2p, 6p)


def _tw_flat(p, q, rest, sign, tb, permuted=False):
    e = np.mod(np.outer(np.arange(p, dtype=np.int64),
                        np.arange(q, dtype=np.int64)), rest)
    w = np.exp(sign * 2j * np.pi * e / rest)
    wr = w.real.astype(np.float32)
    wi = w.imag.astype(np.float32)
    if permuted:
        wr, wi = wr.T.copy(), wi.T.copy()      # (q, p)
        wr = np.repeat(wr[:, :, None], tb, 2).reshape(q, p * tb)
        wi = np.repeat(wi[:, :, None], tb, 2).reshape(q, p * tb)
    else:
        wr = np.repeat(wr[:, :, None], tb, 2).reshape(p, q * tb)
        wi = np.repeat(wi[:, :, None], tb, 2).reshape(p, q * tb)
    return np.ascontiguousarray(wr), np.ascontiguousarray(wi)


def make_mono(n, radices, sign, tb, bf16perm=False, interpret=False):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert len(radices) == 2
    p, q = radices
    GGG1 = _ggg(p, sign)
    GGG2 = _ggg(q, sign)
    wr1, wi1 = _tw_flat(p, q, n, sign, tb)
    flat_consts = [GGG1, wr1, wi1, GGG2]

    def split(x):
        h = x.astype(jnp.bfloat16)
        l = (x - h.astype(jnp.float32)).astype(jnp.bfloat16)
        return h, l

    def kernel(xr_ref, xi_ref, g1_ref, wr_ref, wi_ref, g2_ref,
               yr_ref, yi_ref):
        ar = jnp.transpose(xr_ref[...])                  # (n, tb)
        ai = jnp.transpose(xi_ref[...])
        M1 = q * tb
        r2 = ar.reshape(p, M1)
        i2 = ai.reshape(p, M1)
        rh, rl = split(r2)
        ih, il = split(i2)
        X1 = jnp.concatenate([rh, ih, rl, il, rh, ih], 0)   # (6p, M1)
        G1 = g1_ref[...].astype(jnp.bfloat16)
        y = jnp.dot(G1, X1, preferred_element_type=jnp.float32)  # (2p, M1)
        wr = wr_ref[...]
        wi = wi_ref[...]
        tr = y[:p] * wr - y[p:] * wi
        ti = y[:p] * wi + y[p:] * wr
        M2 = p * tb
        if bf16perm:
            trh, trl = split(tr)
            tih, til = split(ti)

            def perm(z):
                return jnp.transpose(z.reshape(p, q, tb),
                                     (1, 0, 2)).reshape(q, M2)
            X2 = jnp.concatenate([perm(trh), perm(tih), perm(trl),
                                  perm(til), perm(trh), perm(tih)], 0)
        else:
            pr = jnp.transpose(tr.reshape(p, q, tb), (1, 0, 2)).reshape(q, M2)
            pi_ = jnp.transpose(ti.reshape(p, q, tb), (1, 0, 2)).reshape(q, M2)
            prh, prl = split(pr)
            pih, pil = split(pi_)
            X2 = jnp.concatenate([prh, pih, prl, pil, prh, pih], 0)
        G2 = g2_ref[...].astype(jnp.bfloat16)
        y2 = jnp.dot(G2, X2, preferred_element_type=jnp.float32)  # (2q, M2)
        yr_ref[...] = jnp.transpose(y2[:q].reshape(n, tb))
        yi_ref[...] = jnp.transpose(y2[q:].reshape(n, tb))

    data_spec = pl.BlockSpec((tb, n), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    const_specs = [pl.BlockSpec(c.shape, lambda i: (0, 0),
                                memory_space=pltpu.VMEM)
                   for c in flat_consts]

    def run(xr, xi):
        B = xr.shape[0]
        fn = pl.pallas_call(
            kernel,
            grid=(B // tb,),
            in_specs=[data_spec, data_spec] + const_specs,
            out_specs=[data_spec, data_spec],
            out_shape=[jax.ShapeDtypeStruct((B, n), jnp.float32)] * 2,
            interpret=interpret,
        )
        return fn(xr, xi, *flat_consts)

    return run


def main():
    import jax
    import jax.numpy as jnp

    from fftw3_tpu.ops import pallas_stockham as ps
    from fftw3_tpu.utils import timing

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    rng = np.random.default_rng(0)
    rad = ps.choose_radices(n)
    interp = jax.default_backend() != "tpu"

    prod = ps.build_pallas_c2c_split(
        {"alg": "pallas", "n": n, "radices": rad}, -1, np.float32)
    variants = [(f"prod r{rad}", prod),
                ("mono", make_mono(n, rad, -1, 128, interpret=interp)),
                ("mono_bf16perm",
                 make_mono(n, rad, -1, 128, bf16perm=True,
                           interpret=interp))]

    good = []
    for tag, run in variants:
        xr = rng.standard_normal((256, n)).astype(np.float32)
        xi = rng.standard_normal((256, n)).astype(np.float32)
        try:
            yr, yi = jax.jit(run)(xr, xi)
            ref = np.fft.fft((xr + 1j * xi).astype(np.complex128), axis=1)
            err = np.max(np.abs(np.asarray(yr) + 1j * np.asarray(yi) - ref)
                         ) / np.max(np.abs(ref))
            print(f"{tag}: relerr={err:.1e}", flush=True)
            if err < 1e-4:
                good.append((tag, run))
        except Exception as e:
            print(f"{tag}: FAIL {str(e)[:200]}", flush=True)
    if interp:
        return

    # fully interleaved marginal-slope A/B: per config, per batch size —
    # only the per-rep-interleaved protocol survives chip-state drift
    configs = []
    for tag, run in good:
        for b in (8192, 24576):
            xrb = jnp.asarray(rng.standard_normal((b, n)), jnp.float32)
            xib = jnp.asarray(rng.standard_normal((b, n)), jnp.float32)
            configs.append((jax.jit(run), (xrb, xib)))
    ts = timing.time_chained_multi(configs, k1=4, k2=16, reps=9)
    for i, (tag, _) in enumerate(good):
        s = (ts[2 * i + 1] - ts[2 * i]) / (16384 * n) * 1e12
        print(f"{tag}: {s:.1f} ps/pt  "
              f"(t8k={ts[2*i]*1e3:.2f}ms t24k={ts[2*i+1]*1e3:.2f}ms)",
              flush=True)


if __name__ == "__main__":
    main()
