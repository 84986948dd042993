"""Test configuration: run on a virtual 8-device CPU mesh with x64 enabled.

The container's sitecustomize imports jax at interpreter start with
JAX_PLATFORMS=axon (one real TPU behind a tunnel), so plain env vars are too
late; jax.config.update still works because no backend client exists yet.
Correctness tests run on CPU (f64 oracle + 8 virtual devices for the
distributed tier — the standard JAX multi-device-without-hardware trick,
SURVEY.md section 4).  Set FFTW3_TPU_TEST_BACKEND=axon to run on the chip.
"""
import os

_backend = os.environ.get("FFTW3_TPU_TEST_BACKEND", "cpu")
if _backend == "cpu":
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if _backend == "cpu":
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


def tol_for(dtype) -> float:
    """FFTW verify tolerances: 1e-3 single, 1e-10 double
    (libbench2/bench-main.c:70)."""
    return 1e-3 if np.dtype(dtype) in (np.float32, np.complex64) else 1e-10
