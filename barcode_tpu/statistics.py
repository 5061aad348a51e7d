"""Field statistics beyond the 1D power spectrum: correlation functions and
2D (perp/parallel) spectra.

Parity sources: measure_corr_grid (/root/reference/tools/corr_fct.cc:20-84),
measure_spec2D (/root/reference/tools/2D_powspec.cc:26-110), measure_corr2D
(/root/reference/tools/2D_corr_fct.cc:23-130).  All binning is done with
deterministic segment-sums instead of OpenMP atomics.

1D P(k) lives in grid/fourier.py (measure_spectrum).
"""
from __future__ import annotations

import jax.numpy as jnp

from barcode_tpu.grid.spec import GridSpec
from barcode_tpu.grid import fourier


def _center_on_origin(n: int, d: float):
    """Signed distance of cell i from the origin, min-image
    (pacman_center_on_origin, pacman.cpp)."""
    i = jnp.arange(n)
    return jnp.where(i <= n // 2, i, i - n).astype(jnp.float32) * d


def correlation_3d(x, g: GridSpec):
    """3D correlation grid xi(r) = (1/N^2) sum_k |delta_k|^2 e^{ikr}."""
    X = fourier.rfft3(x)
    return fourier.irfft3((X.real**2 + X.imag**2).astype(X.dtype), g).real / g.N


def _r_grid(g: GridSpec):
    d1, d2, d3 = g.cell
    rx = _center_on_origin(g.N1, d1)[:, None, None]
    ry = _center_on_origin(g.N2, d2)[None, :, None]
    rz = _center_on_origin(g.N3, d3)[None, None, :]
    return rx, ry, rz


def _bin_3d(values, coord_bins, nbin_total: int):
    flat = coord_bins.reshape(-1)
    seg = lambda v: jnp.zeros(nbin_total + 1, v.dtype).at[flat].add(v.reshape(-1))[:nbin_total]
    ones = jnp.ones_like(values)
    return seg(values), seg(ones)


def measure_correlation(x, g: GridSpec, nbin: int):
    """Spherically averaged xi(r) (measure_corr_grid, corr_fct.cc:20-84).

    rmax = sqrt(3) L/2; returns (rmode, corr, nmode)."""
    xi3 = correlation_3d(x, g)
    rx, ry, rz = _r_grid(g)
    rr = jnp.sqrt(rx * rx + ry * ry + rz * rz)
    rmax = jnp.sqrt(3.0) * g.L1 / 2.0
    dr = rmax / nbin
    bins = jnp.minimum(jnp.floor(rr / dr).astype(jnp.int32), nbin)
    rsum, nmode = _bin_3d(jnp.broadcast_to(rr, g.shape), bins, nbin)
    csum, _ = _bin_3d(xi3, bins, nbin)
    good = nmode > 0
    safe = jnp.where(good, nmode, 1.0)
    return (jnp.where(good, rsum / safe, 0.0),
            jnp.where(good, csum / safe, 0.0),
            nmode)


def measure_spectrum_2d(x, g: GridSpec, nbin: int):
    """P(k_perp, k_par), plane-parallel LOS along z
    (measure_spec2D, 2D_powspec.cc:26-110; its non-planepar branch raises,
    and so does nothing here — it does not exist).

    Returns (kmode, power, nmode), each [nbin, nbin] with perp varying along
    axis 0 (row-major index npar + nbin*nperp like the reference).
    Normalization V/(4 pi N^2) follows the reference (its own TODO doubts
    it; kept for parity).
    """
    X = fourier.rfft3(x)
    p_mode = X.real**2 + X.imag**2
    kx, ky, kz = fourier.kvec(g)
    kperp = jnp.sqrt(kx * kx + ky * ky)
    kpar = jnp.abs(kz)
    ktot = jnp.sqrt(kperp**2 + kpar**2)
    # hermitian multiplicity along the rfft z-axis
    n3h = g.N3 // 2 + 1
    iz = jnp.arange(n3h)
    mult = jnp.where((iz > 0) & ~((g.N3 % 2 == 0) & (iz == g.N3 // 2)), 2.0, 1.0)[None, None, :]

    dk = g.kmax / (nbin - 1)
    bperp = jnp.floor(kperp / dk).astype(jnp.int32)
    bpar = jnp.floor(kpar / dk).astype(jnp.int32)
    valid = (bperp < nbin) & (bpar < nbin)
    idx = jnp.where(valid, bpar + nbin * bperp, nbin * nbin)

    def seg(v):
        v = jnp.broadcast_to(v, g.rshape)
        return jnp.zeros(nbin * nbin + 1, jnp.float32).at[idx.reshape(-1)].add(
            v.reshape(-1))[: nbin * nbin].reshape(nbin, nbin)

    nmode = seg(mult)
    ksum = seg(mult * ktot)
    psum = seg(mult * p_mode)
    norm = g.vol / (4.0 * jnp.pi) / (float(g.N) ** 2)
    good = nmode > 0
    safe = jnp.where(good, nmode, 1.0)
    return (jnp.where(good, ksum / safe, 0.0),
            jnp.where(good, norm * psum / safe, 0.0),
            nmode)


def measure_correlation_2d(x, g: GridSpec, nbin: int):
    """xi(sigma, pi): 2D correlation, perp on axis 0, par (LOS=z) on axis 1
    (measure_corr2D, 2D_corr_fct.cc:23-130).  rmax = sqrt(3) L/2 shared by
    both axes like the reference."""
    xi3 = correlation_3d(x, g)
    rx, ry, rz = _r_grid(g)
    rperp = jnp.sqrt(rx * rx + ry * ry)
    rpar = jnp.abs(rz)
    rtot = jnp.sqrt(rperp**2 + rpar**2)
    rmax = jnp.sqrt(3.0) * g.L1 / 2.0
    dr = rmax / nbin
    bperp = jnp.floor(rperp / dr).astype(jnp.int32)
    bpar = jnp.floor(rpar / dr).astype(jnp.int32)
    valid = (bperp < nbin) & (bpar < nbin)
    idx = jnp.where(valid, bpar + nbin * bperp, nbin * nbin)

    def seg(v):
        v = jnp.broadcast_to(v, g.shape)
        return jnp.zeros(nbin * nbin + 1, jnp.float32).at[idx.reshape(-1)].add(
            v.reshape(-1))[: nbin * nbin].reshape(nbin, nbin)

    nmode = seg(jnp.ones(g.shape))
    rsum = seg(rtot)
    csum = seg(xi3)
    good = nmode > 0
    safe = jnp.where(good, nmode, 1.0)
    return (jnp.where(good, rsum / safe, 0.0),
            jnp.where(good, csum / safe, 0.0),
            nmode)


def gelman_rubin(chains_samples):
    """Split-R-hat over [n_chains, n_samples, ...] sample stacks — the
    cross-chain convergence diagnostic the single-chain reference cannot
    compute (SURVEY.md §5.8 names it as a TPU-native extension)."""
    x = jnp.asarray(chains_samples)
    m, n = x.shape[0] * 2, x.shape[1] // 2
    x = x[:, : 2 * n].reshape((m, n) + x.shape[2:])
    mean_c = x.mean(axis=1)
    var_c = x.var(axis=1, ddof=1)
    W = var_c.mean(axis=0)
    B = n * mean_c.var(axis=0, ddof=1)
    var_post = (n - 1) / n * W + B / n
    return jnp.sqrt(var_post / W)
