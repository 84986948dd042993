"""Distributed (multi-chip) tier: shard_map slab/pencil/six-step solvers
over a jax mesh with all_to_all / ppermute-ring / recursive-halving global
transposes (fftw/mpi analog), plus the local_size oracle family, standalone
distributed transpose plans, measured transpose-algorithm selection, and
multi-host wisdom synchronization.
"""
from .dist import (  # noqa: F401
    DistPlan, alloc_local, default_block, execute_dft, execute_dft_c2r,
    execute_dft_r2c, execute_r2r, init, local_size, local_size_1d,
    local_size_2d, local_size_many_1d, local_size_many_transposed,
    local_size_transposed, mpi_cleanup,
    local_size_2d_transposed, local_size_3d, local_size_3d_transposed,
    local_size_many, measure_transpose_method, plan_dft_1d_dist,
    plan_dft_c2r_dist, plan_dft_dist, plan_dft_pencil, plan_dft_r2c_dist,
    plan_r2r_dist, plan_transpose)
from .wisdom_sync import broadcast_wisdom, gather_wisdom  # noqa: F401
