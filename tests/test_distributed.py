"""Distributed-tier correctness on a virtual 8-device CPU mesh.

The fftw/mpi analog of check.pl --mpi (SURVEY.md section 4, item 5):
multi-node testing without a cluster, P=1 equivalence, transposed/scrambled
layouts, and both communication backends.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding
from jax.sharding import PartitionSpec as P

import fftw3_tpu as ftpu
from fftw3_tpu.parallel import (default_block, local_size_1d,
                                plan_dft_1d_dist, plan_dft_dist)


def relerr(a, b):
    return np.max(np.abs(np.asarray(a) - b)) / (np.max(np.abs(b)) or 1.0)


def make_mesh(p):
    return jax.make_mesh((p,), ("x",))


def sharded(x, mesh, spec):
    return jax.device_put(x, NamedSharding(mesh, spec))


@pytest.fixture
def x3d(rng):
    s = (16, 8, 12)
    return (rng.standard_normal(s) + 1j * rng.standard_normal(s)) \
        .astype("complex128")


@pytest.mark.parametrize("p", [1, 2, 4])
@pytest.mark.parametrize("method", ["all_to_all", "ppermute"])
def test_slab_3d(x3d, p, method):
    mesh = make_mesh(p)
    plan = plan_dft_dist(x3d.shape, mesh, axes=None, dtype="complex128",
                         transpose_method=method)
    xg = sharded(x3d, mesh, plan.in_spec)
    y = plan(xg)
    ref = np.fft.fftn(x3d)
    assert relerr(y, ref) < 1e-10
    assert y.sharding.spec == plan.out_spec


@pytest.mark.parametrize("p", [2, 4])
def test_slab_transposed_out(x3d, p):
    """TRANSPOSED_OUT analog: same logical result, different sharding,
    one fewer global transpose."""
    mesh = make_mesh(p)
    plan = plan_dft_dist(x3d.shape, mesh, dtype="complex128",
                         transposed_out=True)
    xg = sharded(x3d, mesh, plan.in_spec)
    y = plan(xg)
    assert relerr(y, np.fft.fftn(x3d)) < 1e-10
    assert y.sharding.spec == P(None, "x", None)


def test_slab_2d_backward(rng):
    mesh = make_mesh(4)
    s = (8, 16)
    x = (rng.standard_normal(s) + 1j * rng.standard_normal(s))
    plan = plan_dft_dist(s, mesh, sign=ftpu.BACKWARD, dtype="complex128")
    y = plan(sharded(x, mesh, plan.in_spec))
    ref = np.fft.ifft2(x) * np.prod(s)
    assert relerr(y, ref) < 1e-10


def test_batch_sharded_bigvec(rng):
    """Sharded batch axis, local transforms (dft-rank1-bigvec analog)."""
    mesh = make_mesh(4)
    x = (rng.standard_normal((8, 32)) + 1j * rng.standard_normal((8, 32)))
    plan = plan_dft_dist((8, 32), mesh, axes=(1,), shard_axis=0,
                         dtype="complex128")
    y = plan(sharded(x, mesh, plan.in_spec))
    assert relerr(y, np.fft.fft(x, axis=1)) < 1e-10


@pytest.mark.parametrize("p", [2, 4])
@pytest.mark.parametrize("n", [64, 256, 1440])
@pytest.mark.parametrize("method", ["all_to_all", "ppermute"])
def test_six_step_1d(rng, p, n, method):
    mesh = make_mesh(p)
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n))
    plan = plan_dft_1d_dist(n, mesh, dtype="complex128",
                            transpose_method=method)
    y = plan(sharded(x, mesh, plan.in_spec))
    assert relerr(y, np.fft.fft(x)) < 1e-10


def test_six_step_batched(rng):
    mesh = make_mesh(4)
    n = 256
    x = (rng.standard_normal((3, n)) + 1j * rng.standard_normal((3, n)))
    plan = plan_dft_1d_dist(n, mesh, dtype="complex128", batch_shape=(3,))
    y = plan(sharded(x, mesh, plan.in_spec))
    assert relerr(y, np.fft.fft(x, axis=-1)) < 1e-10


def test_six_step_scrambled_out(rng):
    """SCRAMBLED_OUT analog: output in (c,d)-major order, 2 transposes."""
    mesh = make_mesh(2)
    n = 64
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n))
    plan = plan_dft_1d_dist(n, mesh, dtype="complex128", scrambled_out=True)
    y = np.asarray(plan(sharded(x, mesh, plan.in_spec)))
    ref = np.fft.fft(x)
    # out[c + R*d] stored at matrix position [c, d]: undo the scramble
    R = int(plan.desc.split("R=")[1].split()[0])
    C = n // R
    unscrambled = y.reshape(R, C).T.reshape(n)
    assert relerr(unscrambled, ref) < 1e-10


def test_p1_equals_serial(rng):
    """dft-serial analog: P=1 distributed == serial plan."""
    mesh = make_mesh(1)
    x = (rng.standard_normal((8, 8)) + 1j * rng.standard_normal((8, 8)))
    dp = plan_dft_dist((8, 8), mesh, dtype="complex128")
    sp = ftpu.plan_dft((8, 8), dtype="complex128")
    np.testing.assert_allclose(np.asarray(dp(sharded(x, mesh, dp.in_spec))),
                               np.asarray(sp(x)), rtol=1e-12, atol=1e-12)


def test_local_size_helpers():
    assert default_block(100, 8) == 13
    total = sum(local_size_1d(100, 8, r)[0] for r in range(8))
    assert total == 100
    n, start = local_size_1d(100, 8, 7)
    assert start + n <= 100


def test_grad_through_dist_plan(rng):
    """Distributed plans are differentiable (training-step viability)."""
    mesh = make_mesh(2)
    x = rng.standard_normal((8, 8, 8))
    plan = plan_dft_dist((8, 8, 8), mesh, dtype="complex128")
    xg = sharded(x.astype("complex128"), mesh, plan.in_spec)

    def loss(v):
        return jnp.sum(jnp.abs(plan.apply(v)) ** 2)

    with jax.set_mesh(mesh):
        g = jax.grad(loss, holomorphic=False)(xg)
    assert g.shape == (8, 8, 8)
