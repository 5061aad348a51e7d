"""Mesh-sharded 3D real FFTs (slab decomposition over a 'grid' mesh axis).

The reference has no domain decomposition at all (fftw_mpi unused,
SURVEY.md §5.7); grids beyond single-chip HBM require sharding one grid
axis across devices.  This is the FFT analogue of sequence parallelism:
axis-local transforms + an all-to-all transpose over ICI.

Layout convention:
  real space:     x sharded along axis 0 (x-slabs), shape/dev (N1/D, N2, N3)
  fourier space:  half-complex, sharded along axis 1 (ky-slabs),
                  shape/dev (N1, N2/D, N3//2+1)

sharded_rfft3:  local rfft over (y,z) -> all_to_all transpose -> local fft
                over x.
sharded_irfft3: exact inverse.

Everything is written for use inside jax.shard_map over a Mesh with a
'grid' axis; `make_sharded_ops` returns jitted host-callable wrappers.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from barcode_tpu.grid.spec import GridSpec

AXIS = "grid"


def _rfft3_local(x_slab, n_dev: int, axis_name: str = AXIS):
    """Inside shard_map: x_slab (N1/D, N2, N3) -> (N1, N2/D, N3h)."""
    # 1. local transforms over the unsharded axes
    f = jnp.fft.rfft(x_slab, axis=2)
    f = jnp.fft.fft(f, axis=1)
    # 2. transpose: tiled all-to-all splits y into D blocks (device d keeps
    #    block d) and concatenates the received x-slabs in device order
    f = jax.lax.all_to_all(f, axis_name, split_axis=1, concat_axis=0, tiled=True)
    # now shape (N1, N2/D, N3h)
    # 3. transform over the (now local) full x axis
    return jnp.fft.fft(f, axis=0)


def _irfft3_local(f_slab, n_dev: int, n3: int, axis_name: str = AXIS):
    """Inside shard_map: (N1, N2/D, N3h) -> (N1/D, N2, N3)."""
    f = jnp.fft.ifft(f_slab, axis=0)
    # inverse transpose: split x into D blocks, gather y
    f = jax.lax.all_to_all(f, axis_name, split_axis=0, concat_axis=1, tiled=True)
    # now (N1/D, N2, N3h)
    f = jnp.fft.ifft(f, axis=1)
    return jnp.fft.irfft(f, n=n3, axis=2)


def kvec_sharded(g: GridSpec, n_dev: int, dev_index, dtype=jnp.float32):
    """k-vectors for the Fourier layout (x full, y sharded, z rfft)."""
    ky_full = (2 * jnp.pi) * jnp.fft.fftfreq(g.N2, d=g.L2 / g.N2).astype(dtype)
    n2_loc = g.N2 // n_dev
    ky = jax.lax.dynamic_slice(ky_full, (dev_index * n2_loc,), (n2_loc,))
    kx = (2 * jnp.pi) * jnp.fft.fftfreq(g.N1, d=g.L1 / g.N1).astype(dtype)
    kz = (2 * jnp.pi) * jnp.fft.rfftfreq(g.N3, d=g.L3 / g.N3).astype(dtype)
    return kx[:, None, None], ky[None, :, None], kz[None, None, :]


def make_sharded_ops(g: GridSpec, mesh: Mesh, axis_name: str = AXIS):
    """Jitted sharded ops over `mesh` (1D, named `axis_name`):
    rfft3(x), irfft3(F), convolve(x, kernel_fn), displacement(phi).

    kernel_fn(kx, ky, kz) -> multiplier, evaluated on the local k-block.
    """
    n_dev = mesh.devices.size
    x_spec = P(axis_name, None, None)
    f_spec = P(None, axis_name, None)

    @jax.jit
    @partial(jax.shard_map, mesh=mesh, in_specs=(x_spec,), out_specs=f_spec)
    def rfft3(x):
        return _rfft3_local(x, n_dev, axis_name)

    @jax.jit
    @partial(jax.shard_map, mesh=mesh, in_specs=(f_spec,), out_specs=x_spec)
    def irfft3(F):
        return _irfft3_local(F, n_dev, g.N3, axis_name)

    def convolve(x, kernel_fn):
        @jax.jit
        @partial(jax.shard_map, mesh=mesh, in_specs=(x_spec,), out_specs=x_spec)
        def _conv(x):
            F = _rfft3_local(x, n_dev, axis_name)
            kx, ky, kz = kvec_sharded(g, n_dev, jax.lax.axis_index(axis_name), x.dtype)
            F = F * kernel_fn(kx, ky, kz)
            return _irfft3_local(F, n_dev, g.N3, axis_name)

        return _conv(x)

    def displacement(phi):
        """Psi_i = irfft[-i k_i / k^2 rfft(phi)], x-slab sharded in and out;
        the three component inverse transforms share one forward transform."""
        @jax.jit
        @partial(jax.shard_map, mesh=mesh, in_specs=(x_spec,),
                 out_specs=P(None, None, axis_name, None))
        def _fwd(phi):
            F = _rfft3_local(phi, n_dev, axis_name)
            dev = jax.lax.axis_index(axis_name)
            kx, ky, kz = kvec_sharded(g, n_dev, dev, jnp.float32)
            k2 = kx * kx + ky * ky + kz * kz
            guard = k2 > 1e-14
            inv_k2 = jnp.where(guard, 1.0 / jnp.where(guard, k2, 1.0), 0.0)
            # Nyquist zeroing for odd derivatives (gradient.cpp:157-211),
            # by index so float comparisons never matter
            n2_loc = g.N2 // n_dev
            mx = jnp.where(jnp.arange(g.N1) == g.N1 // 2, 0.0, 1.0)[:, None, None]
            my = jnp.where(dev * n2_loc + jnp.arange(n2_loc) == g.N2 // 2,
                           0.0, 1.0)[None, :, None]
            mz = jnp.where(jnp.arange(g.N3 // 2 + 1) == g.N3 // 2,
                           0.0, 1.0)[None, None, :]
            base = (-1j) * F * inv_k2 * (mx * my * mz)
            return jnp.stack([base * kx, base * ky, base * kz], axis=0)

        F3 = _fwd(phi)

        @jax.jit
        @partial(jax.shard_map, mesh=mesh,
                 in_specs=(P(None, None, axis_name, None),), out_specs=P(None, axis_name, None, None))
        def _bwd(F3):
            return jnp.stack([
                _irfft3_local(F3[i], n_dev, g.N3, axis_name) for i in range(3)
            ])

        return _bwd(F3)

    return rfft3, irfft3, convolve, displacement


def shard_real(x, mesh: Mesh, axis_name: str = AXIS):
    return jax.device_put(x, NamedSharding(mesh, P(axis_name, None, None)))
