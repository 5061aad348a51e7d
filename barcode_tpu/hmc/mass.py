"""HMC mass matrices (momentum preconditioners).

Parity: Hamiltonian_mass (/root/reference/barlib/src/HMC_mass.cc:315-368):
  0: real-space ones (no preconditioning)
  1: FS inverse power spectrum
  2: FS inverse P + likelihood-force spectrum  (likeli_force_mass :127)
  3: FS inverse P + *mean* likelihood force (Wang+13, :145)
  4: FS P(k) itself
  5/6/60: Jasche+13 1st-order real-space expansion — the reference's
  implementation is an O(N^2) per-cell loop with per-cell FFTs
  (:230-306), cached to disk because it is so slow; SURVEY.md §6 flags it
  for algorithmic redesign rather than porting.  Implemented here as the
  equivalent single-convolution form in jasche_mass (see docstring).

Which side (FS/RS) each type uses follows struct_hamil.h:270-310.
"""
from __future__ import annotations

import jax.numpy as jnp

from barcode_tpu.grid.spec import GridSpec
from barcode_tpu.grid import fourier
from barcode_tpu.hmc.state import MassState

FS_TYPES = {1, 2, 3, 4, 5}
RS_TYPES = {0, 5, 6, 60}


def mass_flags(mass_type: int):
    return mass_type in FS_TYPES, mass_type in RS_TYPES


def _inv_power(power_rfft):
    return jnp.where(power_rfft > 0.0, 1.0 / jnp.where(power_rfft > 0.0, power_rfft, 1.0), 0.0)


def _spectrum_to_grid(g: GridSpec, kmode, power, nbin: int):
    """Broadcast a binned spectrum back onto the rfft |k| grid
    (Hamiltonian_mass_likeli_force, HMC_mass.cc:372-407: out[l] =
    likeli_power[bin(l)], zero at DC)."""
    kk = jnp.sqrt(fourier.k_squared(g))
    dk = g.kmax / nbin
    bins = jnp.minimum(jnp.floor(kk / dk).astype(jnp.int32), nbin - 1)
    vals = power[bins]
    return jnp.where(kk > 0.0, vals, 0.0)


def compute_mass(g: GridSpec, mass_type: int, power_rfft, nbin: int = 200,
                 likeli_force=None, mass_factor: float = 1.0) -> MassState:
    """Build the MassState.  `likeli_force` (grad of -log L at the current
    signal, grid shape) is required for types 2 and 3."""
    mass_f = jnp.zeros_like(power_rfft)
    mass_r = 0.0
    if mass_type == 0:
        mass_r = 1.0
    elif mass_type == 1:
        mass_f = _inv_power(power_rfft)
    elif mass_type in (2, 3):
        if likeli_force is None:
            raise ValueError(f"mass_type {mass_type} needs the likelihood force")
        kmode, power, nmode = fourier.measure_spectrum(likeli_force, g, nbin)
        invP = _inv_power(power_rfft)
        if mass_type == 2:
            force_grid = _spectrum_to_grid(g, kmode, power, nbin)
            mass_f = 2.0 * invP + jnp.sqrt(invP * force_grid)
        else:
            # mean force over k, volume-weighted (HMC_mass.cc:145-160)
            dk = g.kmax / nbin
            w = 4.0 * jnp.pi * kmode * kmode * dk
            force_mean = jnp.sum(w * power) / jnp.sum(w)
            mass_f = 2.0 * invP + jnp.sqrt(invP * force_mean)
    elif mass_type == 4:
        mass_f = power_rfft
    else:
        raise ValueError(f"mass_type {mass_type} not implemented")
    fs, rs = mass_flags(mass_type)
    if fs:
        mass_f = mass_f * mass_factor  # testing knob (HMC_mass.cc:357-359)
    return MassState(mass_f=mass_f if fs else jnp.zeros_like(power_rfft),
                     mass_r=mass_r if rs else 0.0)


def apply_minv(p, g: GridSpec, mass_type: int, mass: MassState):
    """M^-1 p: FS part IFFT[(V/N)/mass_f FFT(p)] + RS part p/mass_r
    (Hamiltonian_EoM step 2a, HMC.cc:298-327 + HMC_help.cc:16-64)."""
    fs, rs = mass_flags(mass_type)
    out = jnp.zeros_like(p)
    if fs:
        out = out + fourier.convolve_inv_corr(p, g, mass.mass_f)
    if rs:
        inv = jnp.where(mass.mass_r > 0.0, 1.0 / jnp.where(mass.mass_r > 0.0, mass.mass_r, 1.0), 0.0)
        out = out + inv * p
    return out


def kinetic(p, g: GridSpec, mass_type: int, mass: MassState):
    """1/2 p . M^-1 p (kinetic_term, HMC.cc:64-121)."""
    return 0.5 * jnp.sum(p * apply_minv(p, g, mass_type, mass))


def draw_momenta(key, g: GridSpec, mass_type: int, mass: MassState, dtype=jnp.float32):
    """p ~ N(0, M): FS mass -> GRF with spectrum mass_f
    (create_GARFIELD(mass_f), HMC_momenta.cc:52-54); RS mass ->
    N(0, sqrt(mass_r)) per cell (:77-92); sum if both."""
    import jax

    from barcode_tpu import random_fields

    fs, rs = mass_flags(mass_type)
    p = jnp.zeros(g.shape, dtype)
    k1, k2 = jax.random.split(key)
    if fs:
        p = p + random_fields.grf(k1, g, mass.mass_f, dtype)
    if rs:
        p = p + jnp.sqrt(mass.mass_r) * jax.random.normal(k2, g.shape, dtype)
    return p
