"""A/B: reversed two-stage radix orders at n=1024 (headline config).

`alternative_radices` only emits p >= q pairs, so [16,64] and [8,128]
have never been raced — the stages are asymmetric (stage-1 carries the
flat-twiddle first-stage form; stage 2 the done>1 cross structure), so
order genuinely changes the kernel.  [32,32] presplit is the standing
winner at 34.7 ps/pt.  Interleaved marginal slopes, verified arms only
(shared body: experiments/_race.py radix_slope_race).

Run ON CHIP: python experiments/rev1024.py
"""
import sys

sys.path.insert(0, "/root/repo")

from _race import radix_slope_race

if __name__ == "__main__":
    radix_slope_race(1024, [[32, 32], [64, 16], [16, 64], [8, 128]])
