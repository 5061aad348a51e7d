"""Hand-assembled likelihood gradient — the reference's analytic h-term.

The primary gradient in this framework is jax.grad of the discrete psi
(model/posterior.py).  This module re-derives the chain-rule adjoint the way
the reference does (likelihood_grad_log_like + likelihood_calc_h_SPH with
the fast calc_h=3 Fourier/TSC variant, /root/reference/barlib/src/
HMC_models.cc:312-471 and HMC_models_testing.cpp:54-188), for the
Zel'dovich + Fourier-SPH forward model:

    h(q) = adj(Psi-solve) . sum_i adj(deposit_i) [ W4 (*) dL/ddelta_x ]

with two deliberate differences from the reference, both *exactness* fixes:
  * the overdensity normalization rho_mean = mean(rho) is differentiated
    through (the reference treats it as a constant);
  * the deposit adjoint differentiates the discrete TSC weights (the
    reference interpolates the continuum-kernel derivative, which is why
    its input.par warns calc_h 0/1 are 'WRONG' and 2/3 only approximate).

With these, the result equals jax.grad to float tolerance (tested in
tests/test_adjoint.py) — validating both the autodiff path and this
re-derivation of the reference's math at once.
"""
from __future__ import annotations

import jax.numpy as jnp

from barcode_tpu.grid.spec import GridSpec
from barcode_tpu.grid import fourier
from barcode_tpu.forward import assign, lpt, particles
from barcode_tpu.forward.lag2eul import ForwardConfig, GrowthParams, kernel_h
from barcode_tpu.model import likelihoods
from barcode_tpu.model.likelihoods import ObsData
from barcode_tpu import cosmo as cosmo_mod


def _tsc_weight_grad_gather(field, pos, g: GridSpec):
    """V_i(p) = sum_o d(w_o)/d(pos_i) * field(base_p + o): the deposit's
    position-adjoint, one rolled-stack gather with derivative weights."""
    base, dx = assign._tsc_base_frac(pos, g)
    d = jnp.asarray(g.cell, dtype=pos.dtype).reshape(3, 1, 1, 1)

    def axis_w(a, s):
        return assign._tsc_axis_weight(dx[a], s)

    def axis_dw(a, s):
        # d/dpos_a of the per-axis weight; dx = pos/d - base - 0.5
        if s == 0:
            return -2.0 * dx[a] / d[a, 0, 0, 0]
        return -(1.5 - jnp.abs(dx[a] - s)) * jnp.sign(dx[a] - s) / d[a, 0, 0, 0]

    weight_sets = []
    for i in range(3):
        ws = []
        for off in assign._TSC_OFFSETS:
            w = 1.0
            for a in range(3):
                term = axis_dw(a, off[a]) if a == i else axis_w(a, off[a])
                w = w * term
            ws.append(w)
        weight_sets.append(ws)
    return jnp.stack(assign._stencil_gather_multi(
        field, base, weight_sets, assign._TSC_OFFSETS, g))


def grad_log_like_analytic(delta_lag, g: GridSpec, fc: ForwardConfig,
                           gp: GrowthParams, obs: ObsData, likelihood: int):
    """d psi_like / d delta_lag for sfmodel=1 (Zel'dovich), masskernel
    'sph_ft', optional plane-parallel RSD."""
    assert fc.sfmodel == 1 and fc.masskernel == "sph_ft"
    h = kernel_h(fc, g)

    # ---- forward (shared residuals, like the reference's Lag2Eul rerun) ----
    psi = lpt.zeldovich_psi(delta_lag, g, gp.D1)
    pos = particles.displace(psi, g)
    if fc.rsd:
        f1 = gp.cpecvel / (gp.hubble * gp.ascale)  # == fgrow (rsd.cc:40-57)
        pos = pos.at[2].set(jnp.mod(pos[2] + f1 * psi[2], g.L3))
    rho = assign.tsc_deposit(pos, g)
    W4 = assign.w4_fourier(g, h)
    rho_s = fourier.irfft3(W4 * fourier.rfft3(rho), g)
    rho_mean = jnp.mean(rho_s)
    delta_x = rho_s / rho_mean - 1.0

    # ---- adjoint ----
    # 1. dL/ddelta_x (partial_f_delta_x_log_like)
    part_like = likelihoods.partial_f_delta_x(likelihood, delta_x, obs)
    # 2. through overdens: g_rho = p/m - (sum p*rho_s)/(m^2 N)
    g_rho = part_like / rho_mean - jnp.sum(part_like * rho_s) / (rho_mean**2 * g.N)
    # 3. through the W4 convolution (self-adjoint real multiplier)
    g_tsc = fourier.irfft3(W4 * fourier.rfft3(g_rho), g)
    # 4. through the TSC deposit: per-particle force V_i
    V = _tsc_weight_grad_gather(g_tsc, pos, g)
    if fc.rsd:
        # z-position got (1 + f1) * psi_z (likelihood_calc_V_SPH:295-301)
        V = V.at[2].multiply(1.0 + f1)
    # 5. through Psi = irfft[-i k/k^2 rfft(-D1 s)]:
    #    h(k) = -D1 * sum_i conj(-i k_i/k^2) V_i(k) = -D1 sum_i (+i k_i/k^2) V_i(k)
    #    (the reference's grad_inv_lap_FS produces -i k/k^2 and then flips the
    #    total sign with zeldovich_norm = -1, HMC_models.cc:458-463)
    mask = fourier.nyquist_mask(g)
    kx, ky, kz = fourier.kvec(g)
    k2 = kx * kx + ky * ky + kz * kz
    guard = k2 > 1e-14
    inv_k2 = jnp.where(guard, 1.0 / jnp.where(guard, k2, 1.0), 0.0)
    VC = fourier.rfft3(V)  # one batched rfft over the 3 components
    hC = ((1j) * inv_k2 * mask
          * (kx * VC[0] + ky * VC[1] + kz * VC[2]))
    return -gp.D1 * fourier.irfft3(hC, g)
