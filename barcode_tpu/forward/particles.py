"""Particle displacement and redshift-space mapping.

Parity: disp_part (/root/reference/barlib/src/disp_part.cc:34-158) and
calc_pos_rsd (/root/reference/barlib/src/rsd.cc:18-69).  Particles are one
per cell at cell centers (the reference's reggrid=true path; its random
in-cell path is marked broken, disp_part.cc:105-121); positions are arrays
of shape (3,) + grid shape.
"""
from __future__ import annotations

import jax.numpy as jnp

from barcode_tpu.grid.spec import GridSpec


def lagrangian_positions(g: GridSpec, dtype=jnp.float32):
    """Cell-center positions q = (i + 1/2) d."""
    d1, d2, d3 = g.cell
    x = (jnp.arange(g.N1, dtype=dtype) + 0.5) * d1
    y = (jnp.arange(g.N2, dtype=dtype) + 0.5) * d2
    z = (jnp.arange(g.N3, dtype=dtype) + 0.5) * d3
    return jnp.stack(jnp.meshgrid(x, y, z, indexing="ij"))


def wrap(pos, g: GridSpec):
    """Periodic wrap to [0, L) per axis (pacman_coordinate, pacman.cpp:20)."""
    L = jnp.asarray([g.L1, g.L2, g.L3], dtype=pos.dtype).reshape(3, 1, 1, 1)
    return jnp.mod(pos, L)


def displace(psi, g: GridSpec):
    """pos = wrap(q + Psi) (disp_part, reggrid path)."""
    return wrap(lagrangian_positions(g, psi.dtype) + psi, g)


def rsd_plane_parallel(pos, vel_z, g: GridSpec, ascale: float, hubble: float,
                       periodic: bool = True):
    """Plane-parallel RSD: s_z = z + v_z / (a H), wrapped.

    Parity: calc_pos_rsd planepar branch (rsd.cc:49-66); Hub = 100 E(a) in
    h km/s/Mpc, v in km/s, distances Mpc/h.
    """
    znew = pos[2] + vel_z / (hubble * ascale)
    if periodic:
        znew = jnp.mod(znew, g.L3)
    return pos.at[2].set(znew)


def rsd_radial(pos, vel, g: GridSpec, obs_xyz, ascale: float, hubble: float):
    """Radial RSD w.r.t. observer at obs_xyz: r_new = r + (v.r_hat)/(a H).

    Parity: calc_pos_rsd non-planepar branch (rsd.cc:37-48); the reference
    refuses periodic wrap here, and so do we (no wrap applied).
    """
    obs = jnp.asarray(obs_xyz, dtype=pos.dtype).reshape(3, 1, 1, 1)
    rel = pos - obs
    r = jnp.sqrt(jnp.sum(rel * rel, axis=0))
    r_safe = jnp.where(r > 0, r, 1.0)
    ruxv = jnp.sum(rel * vel, axis=0) / r_safe / (hubble * ascale)
    return rel / r_safe * (r + ruxv) + obs
