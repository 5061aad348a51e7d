"""Mass assignment (particle -> grid deposit) and grid -> particle gathers.

TPU-native redesign of /root/reference/barlib/src/massFunctions.cc and
interpolate_grid.cpp.  The reference scatters with OpenMP atomics (documented
run-to-run nondeterminism, main.cc:86-90); here deposits are deterministic
XLA scatter-adds over a *static* stencil, fully differentiable w.r.t.
particle positions (the weights are smooth; the cell assignment is
piecewise-constant, so jax.grad gives the exact a.e. gradient of the
discrete model).

Particles are implicit: one per cell, carried as position arrays of grid
shape (from forward.particles).  All deposits assume unit masses unless a
`weights` grid is given, and periodic boundary conditions.

Kernels (input.par `masskernel`): 0 NGP, 1 CIC, 2 TSC, 3 SPH (Monaghan W4
spline, radius 2h) — plus 'sph_ft': TSC deposit convolved with the
closed-form Fourier W4, the deposit whose exact adjoint is the reference's
own fast gradient path (calc_h=3, HMC_models_testing.cpp:54-188).
"""
from __future__ import annotations

import math

import jax.numpy as jnp

from barcode_tpu.grid.spec import GridSpec
from barcode_tpu.grid import fourier


def _flat_idx(ix, iy, iz, g: GridSpec):
    return (ix * g.N2 + iy) * g.N3 + iz


def _scatter_stencil(pos, g: GridSpec, base_fn, offsets, weight_fn, weights=None):
    """Deposit sum over a static stencil.

    base_fn(pos_over_d) -> (base indices (3,...), frac (3,...));
    weight_fn(frac, offset) -> per-particle weight for that offset.
    """
    d = jnp.asarray(g.cell, dtype=pos.dtype).reshape(3, 1, 1, 1)
    u = pos / d  # position in cell units
    base, frac = base_fn(u)
    rho = jnp.zeros(g.N, dtype=pos.dtype)
    n = jnp.asarray([g.N1, g.N2, g.N3]).reshape(3, 1, 1, 1)
    for off in offsets:
        o = jnp.asarray(off).reshape(3, 1, 1, 1)
        idx = (base + o) % n
        w = weight_fn(frac, off)
        if weights is not None:
            w = w * weights
        flat = _flat_idx(idx[0], idx[1], idx[2], g).reshape(-1)
        rho = rho.at[flat].add(w.reshape(-1))
    return rho.reshape(g.shape)


# ---------------------------------------------------------------------------
# NGP
# ---------------------------------------------------------------------------

def ngp_deposit(pos, g: GridSpec, weights=None):
    """Nearest grid point (getDensity_NGP, massFunctions.cc:49-98)."""
    def base_fn(u):
        base = jnp.floor(u).astype(jnp.int32)
        return base, u - base

    return _scatter_stencil(
        pos, g, base_fn, [(0, 0, 0)], lambda f, o: jnp.ones_like(f[0]), weights
    )


# ---------------------------------------------------------------------------
# CIC
# ---------------------------------------------------------------------------

def cic_deposit(pos, g: GridSpec, weights=None):
    """Cloud-in-cell, 8-point (getDensity_CIC, massFunctions.cc:100-164;
    cell convention of getCICcells: base = floor(x/d - 1/2))."""
    def base_fn(u):
        v = u - 0.5
        base = jnp.floor(v).astype(jnp.int32)
        return base, v - base

    def weight_fn(frac, off):
        w = 1.0
        for a in range(3):
            w = w * jnp.where(off[a] == 0, 1.0 - frac[a], frac[a])
        return w

    offsets = [(i, j, k) for i in (0, 1) for j in (0, 1) for k in (0, 1)]
    return _scatter_stencil(pos, g, base_fn, offsets, weight_fn, weights)


def cic_gather(field, pos, g: GridSpec):
    """CIC interpolation of a grid field at particle positions
    (interpolate_CIC, interpolate_grid.cpp:82-120)."""
    d = jnp.asarray(g.cell, dtype=pos.dtype).reshape(3, 1, 1, 1)
    v = pos / d - 0.5
    base = jnp.floor(v).astype(jnp.int32)
    frac = v - base
    n = jnp.asarray([g.N1, g.N2, g.N3]).reshape(3, 1, 1, 1)
    out = jnp.zeros(pos.shape[1:], dtype=field.dtype)
    flat_field = field.reshape(-1)
    for off in [(i, j, k) for i in (0, 1) for j in (0, 1) for k in (0, 1)]:
        o = jnp.asarray(off).reshape(3, 1, 1, 1)
        idx = (base + o) % n
        w = jnp.ones_like(frac[0])
        for a in range(3):
            w = w * jnp.where(off[a] == 0, 1.0 - frac[a], frac[a])
        out = out + w * flat_field[_flat_idx(idx[0], idx[1], idx[2], g)]
    return out


# ---------------------------------------------------------------------------
# TSC
# ---------------------------------------------------------------------------

def _tsc_axis_weight(dx, s):
    """TSC per-axis weight for offset s in {-1,0,1}; dx = distance from the
    containing cell's center in cell units, |dx| <= 1/2.  The distance from
    the particle to the offset cell's center is |dx - s|, so
    w = 0.5*(1.5 - |dx - s|)^2 (interpolate_grid.cpp:163-168, where the
    reference's s=+1 weights accidentally use dz for all axes — fixed here)."""
    if s == 0:
        return 0.75 - dx * dx
    return 0.5 * (1.5 - jnp.abs(dx - s)) ** 2


def tsc_deposit(pos, g: GridSpec, weights=None):
    """Triangular-shaped-cloud, 27-point (getDensity_TSC,
    massFunctions.cc:167-364)."""
    def base_fn(u):
        base = jnp.floor(u).astype(jnp.int32)
        return base, u - base - 0.5  # distance from cell center, in [-1/2, 1/2)

    def weight_fn(frac, off):
        w = 1.0
        for a in range(3):
            w = w * _tsc_axis_weight(frac[a], off[a])
        return w

    offsets = [(i, j, k) for i in (-1, 0, 1) for j in (-1, 0, 1) for k in (-1, 0, 1)]
    return _scatter_stencil(pos, g, base_fn, offsets, weight_fn, weights)


def tsc_gather(field, pos, g: GridSpec):
    """TSC interpolation at particle positions.

    Parity: interpolate_TSC (interpolate_grid.cpp:134-202) with the reference
    bug fixed: its wx[2]/wy[2] weights use dz instead of dx/dy
    (interpolate_grid.cpp:166-168) — flagged do-not-replicate in SURVEY.md.
    """
    d = jnp.asarray(g.cell, dtype=pos.dtype).reshape(3, 1, 1, 1)
    u = pos / d
    base = jnp.floor(u).astype(jnp.int32)
    dx = u - base - 0.5
    n = jnp.asarray([g.N1, g.N2, g.N3]).reshape(3, 1, 1, 1)
    out = jnp.zeros(pos.shape[1:], dtype=field.dtype)
    flat_field = field.reshape(-1)
    for off in [(i, j, k) for i in (-1, 0, 1) for j in (-1, 0, 1) for k in (-1, 0, 1)]:
        o = jnp.asarray(off).reshape(3, 1, 1, 1)
        idx = (base + o) % n
        w = _tsc_axis_weight(dx[0], off[0]) * _tsc_axis_weight(dx[1], off[1]) * _tsc_axis_weight(dx[2], off[2])
        out = out + w * flat_field[_flat_idx(idx[0], idx[1], idx[2], g)]
    return out


# ---------------------------------------------------------------------------
# SPH (Monaghan W4 cubic spline, kernel radius 2h)
# ---------------------------------------------------------------------------

def w4(q):
    """Monaghan W4 spline (unnormalized shape; the 1/(pi h^3) norm is applied
    by callers).  Parity: SPH_kernel_3D, massFunctions.cc:366-385."""
    q = jnp.abs(q)
    inner = 1.0 - 1.5 * q * q + 0.75 * q * q * q
    outer = 0.25 * jnp.maximum(2.0 - q, 0.0) ** 3
    return jnp.where(q <= 1.0, inner, jnp.where(q <= 2.0, outer, 0.0))


def sph_stencil(g: GridSpec, h: float):
    """Static list of cell offsets within kernel reach 2h (+half-cell margin),
    as in SPH_kernel_3D_cells (/root/reference/barlib/src/SPH_kernel.cpp:
    62-102)."""
    d1, d2, d3 = g.cell
    reach = 2.0 * h
    r1 = int(reach / d1) + 1
    r2 = int(reach / d2) + 1
    r3 = int(reach / d3) + 1
    out = []
    for i in range(-r1, r1 + 1):
        for j in range(-r2, r2 + 1):
            for k in range(-r3, r3 + 1):
                dx = (abs(i) - 0.5) * d1
                dy = (abs(j) - 0.5) * d2
                dz = (abs(k) - 0.5) * d3
                if dx * dx + dy * dy + dz * dz <= reach * reach:
                    out.append((i, j, k))
    return out


def sph_deposit(pos, g: GridSpec, h: float, weights=None):
    """Exact SPH scatter: rho(c) = sum_p m_p W4(|x_p - x_c|/h)/(pi h^3) over
    the static stencil (getDensity_SPH, massFunctions.cc:391-495).

    O(|stencil|) fused elementwise passes + scatter-adds; deterministic.
    """
    d = jnp.asarray(g.cell, dtype=pos.dtype).reshape(3, 1, 1, 1)
    u = pos / d
    base = jnp.floor(u).astype(jnp.int32)
    n = jnp.asarray([g.N1, g.N2, g.N3]).reshape(3, 1, 1, 1)
    norm = 1.0 / (math.pi * h**3)
    rho = jnp.zeros(g.N, dtype=pos.dtype)
    for off in sph_stencil(g, h):
        o = jnp.asarray(off).reshape(3, 1, 1, 1)
        idx = (base + o) % n
        # distance from particle to that cell's center
        cc = (base + o + 0.5) * d
        diff = pos - cc  # no pacman needed: |off * d| <= 2h + d/2 << L/2
        r = jnp.sqrt(diff[0] ** 2 + diff[1] ** 2 + diff[2] ** 2)
        w = w4(r / h) * norm
        if weights is not None:
            w = w * weights
        flat = _flat_idx(idx[0], idx[1], idx[2], g).reshape(-1)
        rho = rho.at[flat].add(w.reshape(-1))
    return rho.reshape(g.shape)


import functools
import numpy as _np


@functools.lru_cache(maxsize=32)
def _w4_fourier_host(g: GridSpec, h: float):
    """Closed-form 3D Fourier transform of the normalized W4 kernel on the
    half-complex grid, normalized to 1 at k=0.

    Parity: the SPH_kernel_F expression of likelihood_calc_V_SPH_fourier_TSC
    (/root/reference/barlib/src/HMC_models_testing.cpp:100-111), with
    kappa = |k| h:
        W4_hat = 24/kappa^6 * (3 + cos(2kappa) - kappa sin kappa
                               + cos kappa (kappa sin kappa - 4))
    which -> 1 as kappa -> 0 (verified against a numerical radial transform
    in tests/test_forward.py).

    The numerator cancels to O(kappa^6) from O(1) terms, so this must be
    evaluated in float64; the grid is static, so it is computed once on the
    host and baked into the jitted computation as a constant.
    """
    def freqs(n, L):
        return 2.0 * _np.pi * _np.fft.fftfreq(n, d=L / n)

    kx = freqs(g.N1, g.L1)[:, None, None]
    ky = freqs(g.N2, g.L2)[None, :, None]
    kz = (2.0 * _np.pi * _np.fft.rfftfreq(g.N3, d=g.L3 / g.N3))[None, None, :]
    kap = _np.sqrt(kx * kx + ky * ky + kz * kz) * h
    kap_safe = _np.where(kap > 1e-8, kap, 1.0)
    ksink = kap_safe * _np.sin(kap_safe)
    W = 24.0 * (3.0 + _np.cos(2 * kap_safe) - ksink
                + _np.cos(kap_safe) * (ksink - 4.0)) / kap_safe**6
    W = _np.where(kap > 1e-8, W, 1.0)
    return _np.asarray(W, _np.float32)


def w4_fourier(g: GridSpec, h: float):
    return jnp.asarray(_w4_fourier_host(g, float(h)))


def sph_ft_deposit(pos, g: GridSpec, h: float, weights=None):
    """Fast SPH: TSC deposit convolved with the closed-form W4 transform.

    This is the deposit whose exact jax.grad adjoint reproduces the
    reference's fast gradient (calc_h=3: W4-convolve then TSC-gather,
    HMC_models_testing.cpp:54-188).  2 extra FFTs instead of a ~57-cell
    scatter stencil.
    """
    rho = tsc_deposit(pos, g, weights)
    return fourier.irfft3(w4_fourier(g, h) * fourier.rfft3(rho), g)


# ---------------------------------------------------------------------------
# dispatch + overdensity
# ---------------------------------------------------------------------------

def deposit(pos, g: GridSpec, masskernel, h: float = 0.0, weights=None):
    """masskernel: 0/'ngp', 1/'cic', 2/'tsc', 3/'sph', 'sph_ft'."""
    mk = {0: "ngp", 1: "cic", 2: "tsc", 3: "sph"}.get(masskernel, masskernel)
    if mk == "ngp":
        return ngp_deposit(pos, g, weights)
    if mk == "cic":
        return cic_deposit(pos, g, weights)
    if mk == "tsc":
        return tsc_deposit(pos, g, weights)
    if mk == "sph":
        return sph_deposit(pos, g, h, weights)
    if mk == "sph_ft":
        return sph_ft_deposit(pos, g, h, weights)
    raise ValueError(f"unknown masskernel {masskernel}")


def overdens(rho):
    """delta = rho/mean(rho) - 1 (overdens, massFunctions.cc:30-47)."""
    return rho / jnp.mean(rho) - 1.0
