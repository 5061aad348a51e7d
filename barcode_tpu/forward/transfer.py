"""Density-field transfer functions: rank-order mappings and tabulated
Fourier-space transfer convolutions.

Parity: rankorder.cc:17-60 (Leclercq+13 ZA/2LPT -> N-body density mappings;
unused in the reference's main path but part of its surface) and the
TRANSF/TRANSFSC compile-option machinery (transf.cpp:22-184 — the reference
author marks its normalization "probably wrong"; here the transfer is the
plain multiplier T(k) interpolated from a table, plus the same
nonlinear-scale estimate).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from barcode_tpu.grid.spec import GridSpec
from barcode_tpu.grid import fourier


def rankorder_leclercq_za(delta_za):
    """delta_ZA -> delta_Nbody (Leclercq+13), piecewise power law
    (rankorder.cc:17-27)."""
    delta_th = (0.610 / 0.371) ** (1.0 / (1.752 - 1.424))
    x = jnp.maximum(delta_za + 1.0, 0.0)
    low = 0.610 * x**1.424 - 1.0
    high = 0.371 * x**1.752 - 1.0
    return jnp.where(delta_za < delta_th, low, high)


def rankorder_leclercq_2lpt(delta_2lpt):
    """delta_2LPT -> delta_Nbody (rankorder.cc:29-39)."""
    delta_th = (0.642 / 0.257) ** (1.0 / (1.922 - 1.401))
    x = jnp.maximum(delta_2lpt + 1.0, 0.0)
    low = 0.642 * x**1.401 - 1.0
    high = 0.257 * x**1.922 - 1.0
    return jnp.where(delta_2lpt < delta_th, low, high)


def k_nonlinear(k_table, p_table) -> float:
    """kNL where the integrated dimensionless variance reaches 1
    (transf.cpp:76-97: sum 4 pi dk k^2 P/(4 pi) over the table)."""
    k = np.asarray(k_table, np.float64)
    p = np.asarray(p_table, np.float64)
    dk = np.diff(k, prepend=k[0])
    cum = np.cumsum(dk * k * k * p)
    ix = np.searchsorted(cum, 1.0)
    return float(k[min(ix, len(k) - 1)])


def apply_transfer_table(x, g: GridSpec, k_table, t_table):
    """Multiply a field by a tabulated isotropic transfer function T(|k|)
    (the convcompb pattern, convolution.cpp:380-403, without the disk
    round-trip)."""
    kk = jnp.sqrt(fourier.k_squared(g))
    T = jnp.interp(kk, jnp.asarray(k_table, jnp.float32),
                   jnp.asarray(t_table, jnp.float32))
    return fourier.irfft3(T * fourier.rfft3(x), g)
