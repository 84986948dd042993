"""Distributed (multi-chip) tier: shard_map slab/six-step solvers over a
jax mesh with all_to_all / ppermute-ring global transposes (fftw/mpi analog).
"""
from .dist import (  # noqa: F401
    DistPlan, default_block, local_size_1d, plan_dft_1d_dist, plan_dft_dist)
