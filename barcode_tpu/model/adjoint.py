"""Hand-assembled likelihood gradient — the reference's analytic h-term.

The primary gradient in this framework is jax.grad of the discrete psi
(model/posterior.py).  This module re-derives the chain-rule adjoint the way
the reference does (likelihood_grad_log_like + likelihood_calc_h_SPH with
the fast calc_h=3 Fourier/TSC variant, /root/reference/barlib/src/
HMC_models.cc:312-471 and HMC_models_testing.cpp:54-188), for all three
structure-formation models (the reference's h-term spans its sfmodels via
the shared Lag2Eul rerun, Lag2Eul.cc:318-332):

    h(q) = adj(sfmodel chain) . sum_i adj(deposit_i) [ W4 (*) dL/ddelta_x ]

where adj(sfmodel chain) is
  * Zel'dovich: the conjugate -i k/k^2 solve times -D1;
  * 2LPT: the above plus the second-order source adjoint (_adj_m2v — the
    p_ab = d_a d_b phi multipliers are real-symmetric, hence self-adjoint);
  * ALPT: the Gaussian long/short blend (self-adjoint real multiplier)
    splitting the cotangent between the 2LPT divergence and the clipped
    spherical-collapse nonlinearity f'(psilin) = 1/sqrt(1 + 2 psilin / 3)
    (zero on the collapsed branch), preceded by the cellbound transpose
    0.5 (I + roll(-1)).

Two deliberate differences from the reference, both *exactness* fixes:
  * the overdensity normalization rho_mean = mean(rho) is differentiated
    through (the reference treats it as a constant);
  * the deposit adjoint differentiates the discrete TSC weights (the
    reference interpolates the continuum-kernel derivative, which is why
    its input.par warns calc_h 0/1 are 'WRONG' and 2/3 only approximate).

With these, the result equals jax.grad to float tolerance for every sfmodel
(tested in tests/test_adjoint.py) — validating both the autodiff path and
this independent re-derivation of the reference's math at once.
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


def _adj_m2v(u, delta_lag, g: GridSpec):
    """Adjoint of the 2LPT second-order source m2v(delta) (fft scheme,
    lpt._second_order_source): m2v = sum_{i<j} (p_ii p_jj - p_ij^2) with
    p_ab = irfft[(k_a k_b / k^2) rfft delta].  dm2v/dp_aa = sum_{b!=a} p_bb,
    dm2v/dp_ab = -2 p_ab (a < b); each p_ab multiplier is real-symmetric,
    hence self-adjoint.  Parity: the chain the reference's calc_m2v_mem
    builds forward (EqSolvers.cc:373-422), transposed."""
    kx, ky, kz = fourier.kvec(g)
    k2 = kx * kx + ky * ky + kz * kz
    inv_k2 = jnp.where(k2 > 0, 1.0 / jnp.where(k2 > 0, k2, 1.0), 0.0)
    base = fourier.rfft3(delta_lag) * inv_k2
    Ms = (kx * kx, ky * ky, kz * kz, kx * ky, kx * kz, ky * kz)
    pxx, pyy, pzz, pxy, pxz, pyz = fourier.irfft3(
        jnp.stack([M * base for M in Ms]), g)
    S = jnp.stack([u * (pyy + pzz), u * (pxx + pzz), u * (pxx + pyy),
                   -2.0 * u * pxy, -2.0 * u * pxz, -2.0 * u * pyz])
    SC = fourier.rfft3(S)  # one batched rfft over the 6 cotangent fields
    acc = (Ms[0] * SC[0] + Ms[1] * SC[1] + Ms[2] * SC[2]
           + Ms[3] * SC[3] + Ms[4] * SC[4] + Ms[5] * SC[5]) * inv_k2
    return fourier.irfft3(acc, g)


def grad_log_like_analytic(delta_lag, g: GridSpec, fc: ForwardConfig,
                           gp: GrowthParams, obs: ObsData, likelihood: int):
    """d psi_like / d delta_lag for sfmodel 1/2/3 (fft deriv scheme, no
    TRANSF kernels), masskernel 'sph_ft', optional plane-parallel RSD."""
    assert fc.sfmodel in (1, 2, 3) and fc.masskernel == "sph_ft"
    assert fc.deriv_scheme == "fft"
    assert not fc.rsd or fc.rsd_planepar
    h = kernel_h(fc, g)

    # ---- forward (shared residuals, like the reference's Lag2Eul rerun) ----
    psi = lpt.lpt_psi(delta_lag, g, fc.sfmodel, gp.D1, gp.D2, fc.slength)
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
    if fc.sfmodel == 3:
        # cellbound C = 0.5 (I + roll(+1)) -> C^T = 0.5 (I + roll(-1))
        V = 0.5 * (V + jnp.roll(V, (-1, -1, -1), (-3, -2, -1)))
    # 5. through Psi = irfft[-i k/k^2 rfft(div)]: conjugate multiplier
    #    g_div(k) = sum_i (+i k_i/k^2) V_i(k)
    #    (the reference's grad_inv_lap_FS produces -i k/k^2 and then flips the
    #    total sign with zeldovich_norm = -1, HMC_models.cc:458-463)
    mask = fourier.nyquist_mask(g)
    kx, ky, kz = fourier.kvec(g)
    k2 = kx * kx + ky * ky + kz * kz
    guard = k2 > 1e-14
    inv_k2 = jnp.where(guard, 1.0 / jnp.where(guard, k2, 1.0), 0.0)
    VC = fourier.rfft3(V)  # one batched rfft over the 3 components
    gdiv_C = ((1j) * inv_k2 * mask
              * (kx * VC[0] + ky * VC[1] + kz * VC[2]))

    # 6. through the model-specific divergence
    if fc.sfmodel == 1:
        # div = -D1 delta
        return -gp.D1 * fourier.irfft3(gdiv_C, g)
    if fc.sfmodel == 2:
        # div = -D1 delta + D2 m2v(delta)
        g_div = fourier.irfft3(gdiv_C, g)
        return -gp.D1 * g_div + gp.D2 * _adj_m2v(g_div, delta_lag, g)
    # ALPT: div = K o div_2LPT + (1 - K) o div_SC; the Gaussian blend is a
    # real-symmetric multiplier (self-adjoint), batched into one irfft
    K = jnp.exp(-fourier.k_squared(g) * (fc.slength * fc.slength) / 2.0)
    g2, gsc = fourier.irfft3(jnp.stack([K * gdiv_C, (1.0 - K) * gdiv_C]), g)
    # div_SC = f(psilin), psilin = -D1 delta; f'(a) = 1/sqrt(1 + 2a/3) on
    # the live branch, 0 where collapsed (the clip's double-where guard,
    # lpt.spherical_collapse_div_psi)
    arg = 1.0 + (2.0 / 3.0) * (-gp.D1 * delta_lag)
    fprime = jnp.where(arg > 0.0,
                       1.0 / jnp.sqrt(jnp.where(arg > 0.0, arg, 1.0)), 0.0)
    return (-gp.D1 * g2 + gp.D2 * _adj_m2v(g2, delta_lag, g)
            - gp.D1 * fprime * gsc)
