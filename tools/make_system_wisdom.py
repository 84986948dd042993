"""Regenerate wisdom/v5e.json from the round-4/5 ON-CHIP measured winners.

FFTW ships system wisdom (/etc/fftw/wisdom, fftw-wisdom -o); this is the
TPU-v5e analog: the descriptors that won same-session interleaved races
on real hardware (BASELINE.md round 4), keyed over the batch buckets the
regimes were measured in.  Load with
``FFTW3_TPU_SYSTEM_WISDOM=wisdom/v5e.json`` + ``import_system_wisdom()``
or ``import_wisdom_from_filename``.

Winners drift +-15% between sessions (CLAUDE.md measurement discipline),
so these are DEFAULTS that beat the static cost model, not guarantees —
bench.py still re-races arms at driver time and its injections override.
"""
import json
import sys


def _live_sig():
    """The signature wisdom keys must carry for the CURRENT runtime —
    device kind + toolchain versions (round-5: the signature stamps
    jax/jaxlib/platform_version so a compiler upgrade retires the file
    instead of serving stale kernel geometries).  Must be generated ON
    the target toolchain (run inside the axon container with the chip
    reachable)."""
    sys.path.insert(0, ".")
    from fftw3_tpu.planner import _device_signature
    sig = _device_signature()
    if not sig.startswith("tpu-"):
        raise SystemExit(
            f"refusing to stamp non-TPU signature {sig!r}: system wisdom "
            "must be generated on the target toolchain (chip attached)")
    return sig


SIG = None   # resolved in main() from the live runtime
PM = 2     # PATIENT: honored at ESTIMATE/MEASURE/PATIENT requests

ROWS = []


def put(kind, n, dtype, buckets, desc, cost):
    ROWS.append((kind, n, dtype, list(buckets), desc, cost))


# headline kernel: presplit [32,32] won three driver sessions (34.7 /
# 41.7 / 50.6 ps/pt slopes, always ahead of [64,16] prod)
put("c2c", 1024, "float32", range(3, 9),
    {"alg": "pallas", "n": 1024, "radices": [32, 32], "tile_b": 128,
     "k2": "first", "gsplit": True}, 4.5e-08)

# n=4096 four-step with the widened outer row tile: the tb ladder is
# monotone-in-noise up to 2048 (round-5 blocks: tb512 89.7 / tb1024
# 84.9 / tb2048 82.3 ps/pt; race4096 chained: 796 GFLOPS at tb2048) —
# autotune still races 512/1024/2048/4096 at driver time
put("c2c", 4096, "float32", range(4, 8),
    {"alg": "pallas4", "n": 4096, "p": 32, "q": 128, "tile_b": 2048},
    3.5e-07)

# n=2048 with the forced fused cross pass (the k2force r2c arm won two
# driver runs: 609/613.8 vs prod 591/~597)
put("c2c", 2048, "float32", (6, 7),
    {"alg": "pallas", "n": 2048, "radices": [128, 16], "k2": "force"},
    1.1e-07)
put("r2c", 2048, "float32", (6, 7),
    {"alg": "pallas_r2c", "n": 2048, "radices": [64, 16],   # half-size m
     "k2": "force"}, 6.0e-08)

# f64 tier: the fused double-float Pallas kernel (df32p) beat the XLA
# df32 pipeline in every measured block (176 vs 150.6; 575.8 vs 137.2;
# 201.9 vs 135.1) at 6.1e-15 — 50-135x the emulated-f64 4.2 GFLOPS
put("c2c", 1024, "float64", range(3, 8),
    {"alg": "df32p", "n": 1024, "radices": [64, 16]}, 2.6e-07)

# n=1000: [40,25] won the round-5 all-orders race (83.6 ps/pt vs
# [50,20] 91.9, rev1000.py interleaved) and the round-5 driver-style
# autotune (97.2 vs 98.9); order is a +-10% effect — the tax itself is
# the odd-part->=25 stage (BASELINE.md round-5 attribution)
put("c2c", 1000, "float32", range(4, 8),
    {"alg": "pallas", "n": 1000, "radices": [40, 25], "tile_b": 128,
     "k2": "first", "gsplit": True}, 9.5e-08)


def main(path="wisdom/v5e.json"):
    sig = _live_sig()
    entries = {}
    for kind, n, dtype, buckets, desc, cost in ROWS:
        for b in buckets:
            entries[f"{kind}:{n}:{dtype}:{sig}:b{b}"] = {
                "desc": desc, "patience": PM, "cost": cost}
    doc = {"format": "fftw3-tpu-wisdom-2", "signature": sig,
           "entries": entries}
    with open(path, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
    print(f"wrote {len(entries)} entries to {path} (sig {sig})")


if __name__ == "__main__":
    main(*sys.argv[1:])
