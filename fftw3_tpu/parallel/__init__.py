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
from .mpi_api import (  # noqa: F401  (fftw3-mpi.h-named conveniences)
    cleanup, ddim, plan_dft, plan_dft_1d, plan_dft_2d, plan_dft_3d,
    plan_dft_c2r, plan_dft_c2r_2d, plan_dft_c2r_3d, plan_dft_r2c,
    plan_dft_r2c_2d, plan_dft_r2c_3d, plan_many_dft, plan_many_dft_c2r,
    plan_many_dft_r2c, plan_many_r2r, plan_many_transpose, plan_r2r,
    plan_r2r_2d, plan_r2r_3d)
