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


def jasche_response_kernel(g: GridSpec, h: float):
    """G(q) = IFFT[ sum_a (-i k_a / k^2) FFT(grad_a W4) ](q): the response of
    the h-assembly to a unit particle at lattice offset q (grad W4 sampled
    at cell centers relative to a particle at a cell center)."""
    from barcode_tpu.forward import assign

    d = jnp.asarray(g.cell).reshape(3, 1, 1, 1)
    # min-image lattice offsets from the origin cell center
    def centered(n, dd):
        i = jnp.arange(n)
        return jnp.where(i <= n // 2, i, i - n).astype(jnp.float32) * dd

    rx = centered(g.N1, g.cell[0])[:, None, None]
    ry = centered(g.N2, g.cell[1])[None, :, None]
    rz = centered(g.N3, g.cell[2])[None, None, :]
    r = jnp.sqrt(rx * rx + ry * ry + rz * rz)
    q = r / h
    # dW4/dr / r  (so grad = (dW/dr/r) * r_vec), norm 1/(pi h^4) per
    # grad_SPH_kernel_3D_h_units (SPH_kernel.cpp:148-208)
    norm = 1.0 / (jnp.pi * h**4)
    q_safe = jnp.where(q > 1e-12, q, 1.0)
    partial = jnp.where(
        q > 2.0, 0.0,
        jnp.where(q > 1.0,
                  -0.75 * (q_safe - 2.0) ** 2 / q_safe,
                  2.25 * q_safe - 3.0)) * norm / h  # /h: d/dr = (1/h) d/dq
    r_safe = jnp.where(r > 0, r, 1.0)
    gx = partial * jnp.where(r > 0, rx / r_safe, 0.0)
    gy = partial * jnp.where(r > 0, ry / r_safe, 0.0)
    gz = partial * jnp.where(r > 0, rz / r_safe, 0.0)

    hC = 0.0
    kx, ky, kz = fourier.kvec(g)
    k2 = kx * kx + ky * ky + kz * kz
    guard = k2 > 0
    inv_k2 = jnp.where(guard, 1.0 / jnp.where(guard, k2, 1.0), 0.0)
    mask = fourier.nyquist_mask(g)
    for comp, kl in ((gx, kx), (gy, ky), (gz, kz)):
        hC = hC + (-1j) * kl * inv_k2 * mask * fourier.rfft3(comp)
    return fourier.irfft3(hC, g)


def jasche_diagonal_mass(g: GridSpec, window, noise, h: float,
                         rho_c: float = 1.0):
    """1st-order diagonal likelihood-force mass (Jasche+13).

    The reference computes C_ii = sum_l w_l/sigma_l^2 [D_l(i)]^2 with an
    O(N^2) loop of per-cell FFT triplets, cached to disk because it takes
    hours (likeli_force_1st_order_diagonal_mass, HMC_mass.cc:230-306;
    SURVEY.md hard-part #6 mandates redesign).  On the unperturbed lattice
    D_l(q) = G(q - l) is translation-invariant, so the whole thing is ONE
    convolution:  C = (w/sigma^2) * G^2, i.e. 2 FFTs:

        C = IFFT[ FFT(w/sigma^2) . FFT(G^2) ] * (rho_c V/N)^2.

    The reference evaluates D_l at the *displaced* particle positions; since
    the mass is only a preconditioner (it never changes the stationary
    distribution), the lattice approximation trades that refinement for a
    ~N^2/2 speedup.
    """
    G2 = jasche_response_kernel(g, h) ** 2
    f = window / (noise * noise)
    C = fourier.irfft3(fourier.rfft3(f) * fourier.rfft3(G2), g)
    scale = (rho_c * g.vol / g.N) ** 2
    return jnp.maximum(C * scale, 0.0)


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
                 likeli_force=None, mass_factor: float = 1.0,
                 window=None, noise=None, kernel_h: float = 0.0,
                 burned_in: bool = True) -> MassState:
    """Build the MassState.  `likeli_force` (grad of -log L at the current
    signal, grid shape) is required for types 2 and 3; `window`, `noise`
    and `kernel_h` for the Jasche types 5/6/60."""
    mass_f = jnp.zeros_like(power_rfft)
    mass_r = 0.0
    if mass_type == 0:
        mass_r = 1.0
    elif mass_type == 1:
        mass_f = _inv_power(power_rfft)
    elif mass_type in (5, 6, 60):
        if mass_type == 5:
            mass_f = _inv_power(power_rfft)
        if mass_type == 60 and not burned_in:
            # type 0 until burn-in (HMC_mass.cc:346-356)
            mass_r = 1.0
        else:
            if window is None or noise is None or kernel_h <= 0:
                raise ValueError(f"mass_type {mass_type} needs window/noise/kernel_h")
            mass_r = jasche_diagonal_mass(g, window, noise, kernel_h)
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
