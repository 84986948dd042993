"""A/B: reversed two-stage radix orders at n=1000 (non-pow2 config).

`alternative_radices` only emits p >= q pairs, but the two stages have
ASYMMETRIC matmul shapes under the stacked-G kernel, and the presplit
round-4 win moved the n=1024 optimum from [64,16] to [32,32] — evidence
the static ranking misorders under presplit.  The q > p half of the
space has never been raced on chip.  n=1000's slope is 94.3 ps/pt (vs
34.7 at n=1024): the radix tax is the dominant cost, so order may
matter.  Interleaved marginal slopes, verified arms only (shared body:
experiments/_race.py radix_slope_race; the tax attribution lives in
experiments/attrib1000.py).

Run ON CHIP: python experiments/rev1000.py
"""
import sys

sys.path.insert(0, "/root/repo")

from _race import radix_slope_race

if __name__ == "__main__":
    radix_slope_race(1000, [[50, 20], [20, 50], [40, 25], [25, 40],
                            [8, 125]])
