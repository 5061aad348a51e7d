"""Mesh-sharded FFT vs dense reference on an 8-virtual-device CPU mesh
(SURVEY.md §4: multi-device tests via xla_force_host_platform_device_count)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from barcode_tpu.grid.spec import GridSpec
from barcode_tpu.grid import fourier
from barcode_tpu.forward import lpt
from barcode_tpu.parallel import sharded_fft

G = GridSpec.cube(16, 160.0)


@pytest.fixture(scope="module")
def mesh():
    devs = jax.devices()
    assert len(devs) >= 8, "conftest must provide 8 virtual CPU devices"
    return Mesh(np.asarray(devs[:8]), axis_names=(sharded_fft.AXIS,))


def test_sharded_rfft_roundtrip(mesh):
    rfft3, irfft3, _, _ = sharded_fft.make_sharded_ops(G, mesh)
    x = jax.random.normal(jax.random.key(0), G.shape)
    xs = sharded_fft.shard_real(x, mesh)
    y = irfft3(rfft3(xs))
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)


def test_sharded_rfft_matches_dense(mesh):
    rfft3, _, _, _ = sharded_fft.make_sharded_ops(G, mesh)
    x = jax.random.normal(jax.random.key(1), G.shape)
    F_sharded = np.asarray(rfft3(sharded_fft.shard_real(x, mesh)))
    F_dense = np.asarray(fourier.rfft3(x))
    np.testing.assert_allclose(F_sharded, F_dense, atol=1e-3)


def test_sharded_convolve_matches_dense(mesh):
    _, _, convolve, _ = sharded_fft.make_sharded_ops(G, mesh)
    x = jax.random.normal(jax.random.key(2), G.shape)

    def kernel(kx, ky, kz):
        return jnp.exp(-(kx * kx + ky * ky + kz * kz) * 3.0)

    y_sharded = np.asarray(convolve(sharded_fft.shard_real(x, mesh), kernel))
    y_dense = np.asarray(fourier.smooth(x, G, jnp.sqrt(6.0), filtertype=1))
    np.testing.assert_allclose(y_sharded, y_dense, atol=1e-4)


def test_sharded_displacement_matches_dense(mesh):
    _, _, _, displacement = sharded_fft.make_sharded_ops(G, mesh)
    x = jax.random.normal(jax.random.key(3), G.shape)
    psi_sharded = np.asarray(displacement(sharded_fft.shard_real(x, mesh)))
    psi_dense = np.asarray(fourier.displacement_from_phi(x, G))
    # the sharded path skips Nyquist zeroing refinements? no — compare loosely
    np.testing.assert_allclose(psi_sharded, psi_dense, atol=2e-4)
