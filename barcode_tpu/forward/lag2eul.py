"""The full forward model: Lagrangian density -> Eulerian density.

Parity: Lag2Eul / Lag2Eul_rsd_zeldovich
(/root/reference/barlib/src/Lag2Eul.cc:318-332, 338-426):
  delta_lag -> LPT displacement Psi -> particles q + Psi (periodic wrap)
  [-> RSD shift using v = c_pecvel * Psi, Zel'dovich velocities]
  -> mass-assignment deposit -> overdensity.

Entirely differentiable: jax.grad of any scalar of the output is the exact
adjoint of this discrete pipeline (the reference hand-derives an approximate
adjoint instead, HMC_models.cc:312-471).
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from barcode_tpu.grid.spec import GridSpec
from barcode_tpu.forward import lpt, particles, assign


@dataclasses.dataclass(frozen=True)
class ForwardConfig:
    """Static configuration of the forward model."""

    sfmodel: int = 1          # 1 Zel'dovich, 2 2LPT, 3 ALPT
    masskernel: object = 3    # 0 ngp / 1 cic / 2 tsc / 3 sph / 'sph_ft'
    rsd: bool = False         # redshift-space mapping
    rsd_planepar: bool = True  # plane-parallel (z-axis) vs radial w.r.t.
    observer: tuple = (0.0, 0.0, 0.0)  # xobs/yobs/zobs (rsd.cc:18-69)
    origin: tuple = (0.0, 0.0, 0.0)  # box lower-left corner xllc/yllc/zllc
                              # (init_par.cc:124, threaded into Lag2Eul /
                              # disp_part).  Positions here are box-relative,
                              # so the origin only enters the radial-RSD
                              # observer geometry: obs_eff = observer - origin.
                              # DELIBERATE DEVIATION: the reference passes
                              # xobs unmodified to calc_pos_rsd (rsd.cc:36)
                              # against *box-relative* positions, i.e. strict
                              # parity would be obs_eff = observer even when
                              # xllc != 0 — but the reference is internally
                              # inconsistent there (getDensity_* subtracts min
                              # from those same positions), so we interpret
                              # xobs/yobs/zobs as absolute-frame coordinates.
    periodic: bool = True
    slength: float = 4.0      # ALPT long/short split scale [Mpc/h]
    kernel_h_rel: float = 1.0  # SPH kernel scale in mean-cell units
    deriv_scheme: str = "fft"  # 2LPT source derivatives: 'fft' (GFFT) or
                               # 'findif' (GFINDIFF 4th-order stencil)
    pallas_deposit: bool = False  # Pallas block-kernel TSC deposit (tsc/sph_ft)
    pallas_halo: int = 8      # halo contract: max |displacement| in cells + 1
    pallas_block: tuple = (8, 8)   # gather-kernel output block (BX, BY)
    pallas_block_dep: tuple | None = None  # deposit-kernel block; None ->
                               # (16,16) when the grid divides it (hardware
                               # optimum, artifacts/sweep_r3_kernels.json),
                               # else pallas_block
    pallas_bf16_grad: bool = False  # bf16 MXU dots in the backward gather:
                               # force-path only — leapfrog stays reversible
                               # and MH accepts on exact f32 psi, so the
                               # sampled measure is unchanged (~4x kernel rate)
    pallas_bf16_dep: bool = False  # bf16 dots in the deposit too: ~2^-9
                               # relative rounding of the density feeds psi
                               # itself — a documented speed/accuracy knob
    pallas_tail_k: int = 0     # halo-tail split (assign.make_tsc_deposit_fast):
                               # > 0 lets pallas_halo be a small quantile
                               # bound; up to this many contract violators
                               # per deposit are handled exactly through a
                               # compacted XLA 27-point path


@dataclasses.dataclass(frozen=True)
class GrowthParams:
    """Scalar cosmology inputs of the forward model (config-time floats)."""

    D1: float
    D2: float
    ascale: float
    cpecvel: float  # displacement -> velocity factor (cosmo.c_pecvel)
    hubble: float   # 100 E(a), h km/s/Mpc


def kernel_h(fc: ForwardConfig, g: GridSpec) -> float:
    """SPH kernel scale h = h_rel * mean cell size (init_par.cc:373-381)."""
    return fc.kernel_h_rel * g.cell_avg


def lag2eul(delta_lag, g: GridSpec, fc: ForwardConfig, gp: GrowthParams,
            return_pos: bool = False, transfer=None, delta_C=None):
    """delta_lag -> (delta_eul [, pos]) with unit-mass regular-grid particles.

    `transfer` = optional (t_zeld, t_2lpt) rfft-layout FS kernels applied to
    the linear field / 2LPT source on the non-Zel'dovich path — the TRANSF
    build's auxtransfzeld/auxtransf2lpt convolutions (Lag2Eul.cc:174-191).
    `delta_C` = optional precomputed rfft3(delta_lag), shared with the prior
    energy by model/posterior.make_psi (round-5 FFT dedupe)."""
    psi = lpt.lpt_psi(delta_lag, g, fc.sfmodel, gp.D1, gp.D2, fc.slength,
                      deriv_scheme=fc.deriv_scheme, transfer=transfer,
                      delta_C=delta_C)
    pos = particles.displace(psi, g)
    if fc.rsd:
        # v = c_pecvel * Psi (Zel'dovich-only velocities, Lag2Eul.cc:375-381)
        if fc.rsd_planepar:
            vel_z = gp.cpecvel * psi[2]
            pos = particles.rsd_plane_parallel(pos, vel_z, g, gp.ascale,
                                               gp.hubble, fc.periodic)
        else:
            obs_eff = tuple(o - c for o, c in zip(fc.observer, fc.origin))
            pos = particles.rsd_radial(pos, gp.cpecvel * psi, g, obs_eff,
                                       gp.ascale, gp.hubble)
    mk = {0: "ngp", 1: "cic", 2: "tsc", 3: "sph"}.get(fc.masskernel, fc.masskernel)
    if fc.pallas_deposit and mk in ("tsc", "sph_ft"):
        dep = assign.make_tsc_deposit_fast(
            g, halo=fc.pallas_halo, block=tuple(fc.pallas_block),
            bf16_fwd=fc.pallas_bf16_dep, bf16_bwd=fc.pallas_bf16_grad,
            block_dep=(tuple(fc.pallas_block_dep)
                       if fc.pallas_block_dep else None),
            tail_k=fc.pallas_tail_k)
        rho = dep(pos)
        if mk == "sph_ft":
            from barcode_tpu.grid import fourier as _f
            rho = _f.irfft3(assign.w4_fourier(g, kernel_h(fc, g)) * _f.rfft3(rho), g)
    else:
        rho = assign.deposit(pos, g, fc.masskernel, kernel_h(fc, g))
    delta_eul = assign.overdens(rho)
    if return_pos:
        return delta_eul, pos
    return delta_eul
