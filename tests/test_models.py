"""Tests for the spectral application models."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fftw3_tpu import models


class TestConvolution:
    @pytest.mark.parametrize("mode", ["full", "same", "valid"])
    def test_1d_real(self, rng, mode):
        x = rng.standard_normal(50)
        y = rng.standard_normal(7)
        got = np.asarray(models.fftconvolve(x, y, mode))
        want = np.convolve(x, y, mode)
        assert np.max(np.abs(got - want)) < 1e-6

    def test_2d_complex(self, rng):
        x = rng.standard_normal((12, 15)) + 1j * rng.standard_normal((12, 15))
        y = rng.standard_normal((3, 4)) + 1j * rng.standard_normal((3, 4))
        got = np.asarray(models.fftconvolve(x, y, "full"))
        want = np.zeros((14, 18), complex)
        for i in range(3):
            for j in range(4):
                want[i:i + 12, j:j + 15] += y[i, j] * x
        assert np.max(np.abs(got - want)) < 1e-6

    def test_correlate(self, rng):
        x = rng.standard_normal(20)
        y = rng.standard_normal(5)
        got = np.asarray(models.fftcorrelate(x, y, "full"))
        want = np.correlate(x, y, "full")
        assert np.max(np.abs(got - want)) < 1e-6

    def test_batched_axes(self, rng):
        x = rng.standard_normal((4, 30))
        y = rng.standard_normal((4, 6))
        got = np.asarray(models.fftconvolve(x, y, "full", axes=(1,)))
        for b in range(4):
            want = np.convolve(x[b], y[b], "full")
            assert np.max(np.abs(got[b] - want)) < 1e-6


class TestPoisson:
    def test_periodic_2d(self, rng):
        f = rng.standard_normal((16, 24))
        f -= f.mean()
        u = models.solve_periodic(f)
        r = np.asarray(models.laplacian_periodic(u))
        assert np.max(np.abs(r - f)) < 1e-8

    def test_dirichlet_1d_matrix(self, rng):
        n = 17
        f = rng.standard_normal(n)
        u = np.asarray(models.solve_dirichlet(f))
        # verify against the dense Dirichlet stencil
        A = (np.diag(-2.0 * np.ones(n)) + np.diag(np.ones(n - 1), 1)
             + np.diag(np.ones(n - 1), -1))
        assert np.max(np.abs(A @ u - f)) < 1e-8

    def test_neumann_2d(self, rng):
        f = rng.standard_normal((12, 12))
        f -= f.mean()
        u = np.asarray(models.solve_neumann(f))
        # Neumann stencil: reflect at boundaries
        up = np.pad(u, 1, mode="edge")
        r = (up[2:, 1:-1] + up[:-2, 1:-1] + up[1:-1, 2:] + up[1:-1, :-2]
             - 4 * u)
        assert np.max(np.abs(r - f)) < 1e-8


class TestSpectral:
    def test_derivative_sine(self):
        n = 64
        t = np.arange(n) * (2 * np.pi / n)
        x = np.sin(3 * t)
        d = np.asarray(models.derivative(x, 1, spacing=2 * np.pi / n))
        assert np.max(np.abs(d - 3 * np.cos(3 * t))) < 1e-5

    def test_second_derivative(self):
        n = 32
        t = np.arange(n) * (2 * np.pi / n)
        x = np.cos(2 * t)
        d2 = np.asarray(models.derivative(x, 2, spacing=2 * np.pi / n))
        assert np.max(np.abs(d2 + 4 * np.cos(2 * t))) < 1e-4

    def test_gradient(self, rng):
        x = rng.standard_normal((16, 16))
        gx, gy = models.gradient(x)
        assert gx.shape == x.shape and gy.shape == x.shape

    def test_lowpass_filter_removes_high_freq(self):
        n = 64
        t = np.arange(n) * (2 * np.pi / n)
        x = np.sin(2 * t) + np.sin(20 * t)
        H = models.lowpass_transfer((n,), cutoff=0.1)   # keeps k<=6
        y = np.asarray(models.spectral_filter(x, H))
        assert np.max(np.abs(y - np.sin(2 * t))) < 1e-4

    def test_distributed_filter_step(self, rng):
        mesh = jax.make_mesh((4,), ("x",))
        B, N = 2, 8
        step, h, in_sh = models.distributed_filter_step(mesh, (B, N))
        xr = jax.device_put(
            rng.standard_normal((B, N, N, N)).astype(np.float32), in_sh)
        xi = jax.device_put(
            rng.standard_normal((B, N, N, N)).astype(np.float32), in_sh)
        h1, l1 = step(h, xr, xi)
        assert float(l1) < 1e-10      # identity filter reconstructs exactly
        h2, l2 = step(h1 + 0.1, xr, xi)
        assert float(l2) > 0          # perturbed filter: nonzero loss


class TestNavierStokes:
    """Pseudo-spectral 2-D NS: Taylor-Green decays analytically (the
    nonlinear term vanishes exactly for this flow)."""

    def test_taylor_green_decay(self):
        ny = nx = 64
        nu, dt = 0.05, 0.01
        step = jax.jit(models.navier_stokes_step(ny, nx, nu, dt))
        w = jnp.asarray(models.taylor_green_vorticity(ny, nx, kappa=2))
        w0 = np.asarray(w)
        for _ in range(50):
            w = step(w)
        expect = w0 * np.exp(-2.0 * nu * 4 * 50 * dt)
        got = np.asarray(w)
        assert np.max(np.abs(got - expect)) / np.max(np.abs(expect)) < 2e-3

    def test_energy_decays_generic_flow(self, rng):
        ny = nx = 32
        step = jax.jit(models.navier_stokes_step(ny, nx, nu=0.02, dt=0.01))
        w = jnp.asarray(rng.standard_normal((ny, nx)).astype(np.float32))
        w = w - jnp.mean(w)
        e0 = float(jnp.sum(w * w))
        for _ in range(20):
            w = step(w)
        e1 = float(jnp.sum(w * w))
        assert np.isfinite(e1) and e1 < e0      # viscous dissipation

    def test_distributed_matches_single(self, rng):
        mesh = jax.make_mesh((4,), ("x",))
        ny = nx = 32
        nu, dt = 0.03, 0.01
        dstep, in_sh = models.distributed_step_fn(ny, nx, nu, dt, mesh)
        sstep = jax.jit(models.navier_stokes_step(ny, nx, nu, dt))
        w0 = rng.standard_normal((ny, nx)).astype(np.float32)
        w_d = jax.device_put(w0, in_sh)
        w_s = jnp.asarray(w0)
        for _ in range(5):
            w_d = dstep(w_d)
            w_s = sstep(w_s)
        a, b = np.asarray(w_d), np.asarray(w_s)
        assert np.max(np.abs(a - b)) / np.max(np.abs(b)) < 1e-4
