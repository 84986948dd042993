"""Spectral application models built on the engine: fast convolution /
correlation, Poisson solvers (periodic / Dirichlet / Neumann), spectral
derivatives and filters, and the distributed spectral-filter training step.
"""
from .convolution import fftconvolve, fftcorrelate  # noqa: F401
from .poisson import (laplacian_periodic, solve_dirichlet,  # noqa: F401
                      solve_neumann, solve_periodic)
from .spectral import (derivative, distributed_filter_step,  # noqa: F401
                       gradient, lowpass_transfer, spectral_filter)
from .navier_stokes import (distributed_step_fn,  # noqa: F401
                            step_fn as navier_stokes_step,
                            taylor_green_vorticity)
