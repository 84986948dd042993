"""Distributed real/r2r/pencil/transpose tier on the virtual 8-device CPU
mesh (the check.pl --mpi analog widened to the rdft/rdft2 solver mirrors)."""
import jax
import numpy as np
import pytest
from jax.sharding import NamedSharding
from jax.sharding import PartitionSpec as P

from fftw3_tpu.ops import matrices
from fftw3_tpu.parallel import (broadcast_wisdom, gather_wisdom,
                                local_size_2d_transposed, local_size_many,
                                measure_transpose_method, plan_dft_c2r_dist,
                                plan_dft_pencil, plan_dft_r2c_dist,
                                plan_r2r_dist, plan_transpose)


def relerr(a, b):
    return np.max(np.abs(np.asarray(a) - b)) / (np.max(np.abs(b)) or 1.0)


def make_mesh(p):
    return jax.make_mesh((p,), ("x",))


def sharded(x, mesh, spec):
    return jax.device_put(x, NamedSharding(mesh, spec))


@pytest.mark.parametrize("p", [1, 2, 4])
@pytest.mark.parametrize("method", ["all_to_all", "ppermute", "recurse"])
def test_r2c_dist_3d(rng, p, method):
    mesh = make_mesh(p)
    shape = (8, 12, 30)                    # complex last = 16, 16 % 4 == 0
    x = rng.standard_normal(shape)
    plan = plan_dft_r2c_dist(shape, mesh, dtype="float64",
                             transpose_method=method)
    y = plan(sharded(x, mesh, plan.in_spec))
    ref = np.fft.rfftn(x)
    assert relerr(y, ref) < 1e-10


@pytest.mark.parametrize("p", [2, 4])
def test_r2c_transposed_out(rng, p):
    mesh = make_mesh(p)
    shape = (8, 12, 30)
    x = rng.standard_normal(shape)
    plan = plan_dft_r2c_dist(shape, mesh, dtype="float64",
                             transposed_out=True)
    y = plan(sharded(x, mesh, plan.in_spec))
    assert relerr(y, np.fft.rfftn(x)) < 1e-10
    assert y.sharding.spec == plan.out_spec


@pytest.mark.parametrize("p", [1, 2, 4])
def test_c2r_dist_roundtrip(rng, p):
    mesh = make_mesh(p)
    shape = (8, 12, 30)
    x = rng.standard_normal(shape)
    fwd = plan_dft_r2c_dist(shape, mesh, dtype="float64")
    inv = plan_dft_c2r_dist(shape, mesh, dtype="float64")
    y = inv(fwd(sharded(x, mesh, fwd.in_spec)))
    n = np.prod(shape)
    assert relerr(y, n * x) < 1e-10


@pytest.mark.parametrize("p", [1, 2, 4])
def test_r2r_dist_2d(rng, p):
    mesh = make_mesh(p)
    shape = (8, 16)
    x = rng.standard_normal(shape)
    plan = plan_r2r_dist(shape, ["redft10", "rodft10"], mesh,
                         dtype="float64")
    y = plan(sharded(x, mesh, plan.in_spec))
    ref = (matrices.r2r_matrix("redft10", 8).T @ x) \
        @ matrices.r2r_matrix("rodft10", 16)
    assert relerr(y, ref) < 1e-10


@pytest.mark.parametrize("p", [2, 4])
@pytest.mark.parametrize("scrambled", [False, True])
def test_plan_transpose(rng, p, scrambled):
    mesh = make_mesh(p)
    n0, n1 = 8, 12
    x = rng.standard_normal((n0, n1))
    plan = plan_transpose(n0, n1, mesh, scrambled_out=scrambled,
                          dtype="float64")
    y = np.asarray(plan(sharded(x, mesh, plan.in_spec)))
    if scrambled:
        # each rank's block is the pre-local-transpose layout; reassemble
        got = np.concatenate(
            [y[i * n0 // 1:][: n0, j * n1 // p:(j + 1) * n1 // p]
             for j in range(1) for i in range(1)], axis=0)
        assert y.shape[0] * y.shape[1] == n0 * n1
    else:
        assert y.shape == (n1, n0)
        assert relerr(y, x.T) < 1e-12


def test_pencil_3d(rng):
    mesh = jax.make_mesh((2, 4), ("y", "z"))
    shape = (8, 8, 16)
    x = (rng.standard_normal(shape)
         + 1j * rng.standard_normal(shape)).astype("complex128")
    plan = plan_dft_pencil(shape, mesh, dtype="complex128")
    y = plan(sharded(x, mesh, plan.in_spec))
    assert relerr(y, np.fft.fftn(x)) < 1e-10
    assert y.sharding.spec == plan.out_spec


def test_pencil_then_transpose_chain(rng):
    """TRANSPOSED output of the pencil plan is a usable layout: chained
    spectral round trip recovers n*x without extra rearrangement."""
    mesh = jax.make_mesh((2, 2), ("y", "z"))
    shape = (8, 8, 8)
    x = (rng.standard_normal(shape)
         + 1j * rng.standard_normal(shape)).astype("complex128")
    fwd = plan_dft_pencil(shape, mesh, sign=-1, dtype="complex128")
    y = fwd(sharded(x, mesh, fwd.in_spec))
    # inverse: run the pencil plan backward on the transposed layout by
    # building a plan for the permuted logical shape
    import jax.numpy as jnp
    inv = plan_dft_pencil(shape, mesh, sign=+1, dtype="complex128")
    z = inv(jax.device_put(np.asarray(y), inv.input_sharding()))
    n = np.prod(shape)
    # two pencil passes leave data in doubly-permuted layout == original
    assert relerr(np.asarray(z), n * x) < 1e-10


def test_local_size_helpers():
    (ln0, s0), (ln1, s1) = local_size_2d_transposed(10, 12, 4, 3)
    assert (ln0, s0) == (1, 9)
    assert (ln1, s1) == (3, 9)
    assert local_size_many((10, 4), 1, None, 4, 0) == (3, 0)
    assert local_size_many((10, 4), 1, 5, 4, 1) == (5, 5)


def test_measure_transpose_method():
    mesh = make_mesh(4)
    best = measure_transpose_method(mesh, "x", (2, 8, 16),
                                    dtype=np.complex64)
    assert best in ("all_to_all", "ppermute", "recurse")


def test_wisdom_sync_single_process():
    # single-process: both are no-ops that must not fail
    broadcast_wisdom()
    gather_wisdom()


@pytest.mark.parametrize("k", [1, 2, 4])
def test_slab_overlap_chunks(rng, k):
    """Communication/compute-overlap chunking preserves exactness."""
    from fftw3_tpu.parallel import plan_dft_dist
    mesh = make_mesh(4)
    shape = (8, 8, 12)
    x = (rng.standard_normal(shape)
         + 1j * rng.standard_normal(shape)).astype("complex128")
    plan = plan_dft_dist(shape, mesh, dtype="complex128", overlap_chunks=k)
    y = plan(sharded(x, mesh, plan.in_spec))
    assert relerr(y, np.fft.fftn(x)) < 1e-10


def test_slab_overlap_transposed_out(rng):
    from fftw3_tpu.parallel import plan_dft_dist
    mesh = make_mesh(2)
    shape = (8, 8, 12)
    x = (rng.standard_normal(shape)
         + 1j * rng.standard_normal(shape)).astype("complex128")
    plan = plan_dft_dist(shape, mesh, dtype="complex128", overlap_chunks=3,
                         transposed_out=True)
    y = plan(sharded(x, mesh, plan.in_spec))
    assert relerr(y, np.fft.fftn(x)) < 1e-10


def test_fuzz_dist_bounded():
    """check.pl --mpi analog: random distributed problems stay green."""
    from fftw3_tpu.harness.fuzz import run_fuzz_dist
    assert run_fuzz_dist(count=10, seed=3) == 0


def test_transpose_method_measure(rng):
    """transpose_method='measure' autotunes the communication algorithm."""
    from fftw3_tpu.parallel import plan_dft_dist
    mesh = make_mesh(4)
    shape = (8, 8, 12)
    x = (rng.standard_normal(shape)
         + 1j * rng.standard_normal(shape)).astype("complex128")
    plan = plan_dft_dist(shape, mesh, dtype="complex128",
                         transpose_method="measure")
    y = plan(sharded(x, mesh, plan.in_spec))
    assert relerr(y, np.fft.fftn(x)) < 1e-10
