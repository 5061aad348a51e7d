"""Statistical models: Gaussian prior and the four likelihoods.

Parity: /root/reference/barlib/src/hmc/prior/gaussian.cpp and
src/hmc/likelihood/{poissonian,gaussian_independent,lognormal_independent,
gaussian_random_field}.cpp.  All functions return psi = -log p (up to
constants), the reference's energy convention.

Observed data is carried in an ObsData pytree; likelihood selection
(input.par `likelihood` 0..3) is static.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from barcode_tpu.grid.spec import GridSpec
from barcode_tpu.grid import fourier


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ObsData:
    """Observed tracer grid + window + noise + prior spectrum (all arrays of
    grid shape; power in the half-complex layout).

    Mirrors the OBSERVATIONAL struct fields used by the models
    (struct_hamil.h:169-223): nobs, window, noise_sf, signal_PS, rho_c,
    biasP, biasE.
    """

    nobs: Any
    window: Any
    noise: Any
    power: Any  # P(k) on the rfft grid (prior covariance spectrum)
    rho_c: float = 1.0
    biasP: float = 1.0
    biasE: float = 1.0
    delta_min: float = -0.999  # log-normal clip


# ---------------------------------------------------------------------------
# Gaussian prior
# ---------------------------------------------------------------------------

def prior_psi(delta_lag, g: GridSpec, obs: ObsData):
    """psi_prior = 1/2 s . IFFT[(V/N)/P(k) FFT(s)]
    (prior_gaussian_log_prior, gaussian.cpp:20-35)."""
    Sinv_s = fourier.convolve_inv_corr(delta_lag, g, obs.power)
    return 0.5 * jnp.sum(delta_lag * Sinv_s)


def prior_psi_C(delta_C, g: GridSpec, obs: ObsData):
    """psi_prior evaluated from the half-complex spectrum of s via Parseval
    (fourier.inv_corr_quadratic_C) — identical to prior_psi(s) but costs no
    transforms when rfft3(s) is already in hand (the LPT solve needs the
    same spectrum, so make_psi computes it once; round-5 FFT dedupe)."""
    return fourier.inv_corr_quadratic_C(delta_C, g, obs.power)


def prior_grad(delta_lag, g: GridSpec, obs: ObsData):
    """d psi_prior / d s = S^-1 s (gaussian.cpp:15-18)."""
    return fourier.convolve_inv_corr(delta_lag, g, obs.power)


# ---------------------------------------------------------------------------
# Likelihood psi(delta_eul) terms
# ---------------------------------------------------------------------------

def _lambda_powerlaw(delta_x, obs: ObsData):
    """Lambda = w * rho_c * (1 + biasP*delta)^biasE with positivity masks."""
    dens = 1.0 + obs.biasP * delta_x
    dens_safe = jnp.maximum(dens, 1e-30)
    lam = obs.window * obs.rho_c * dens_safe**obs.biasE
    return lam, dens


def poisson_psi(delta_x, obs: ObsData):
    """-log L = sum Lambda - nobs*log(Lambda) over valid cells
    (poissonian.cpp:44-76)."""
    lam, dens = _lambda_powerlaw(delta_x, obs)
    valid = (obs.window > 0.0) & (lam > 0.0)
    term = lam - obs.nobs * jnp.log(jnp.where(valid, lam, 1.0))
    return jnp.sum(jnp.where(valid, term, 0.0))


def gaussian_psi(delta_x, obs: ObsData):
    """-log L = 1/2 sum ((Lambda - nobs)/sigma)^2
    (gaussian_independent.cpp:51-92)."""
    lam, dens = _lambda_powerlaw(delta_x, obs)
    valid = (obs.window > 0.0) & (lam > 0.0)
    resid = (lam - obs.nobs) / obs.noise
    return jnp.sum(jnp.where(valid, 0.5 * resid * resid, 0.0))


def lognormal_psi(delta_x, obs: ObsData):
    """-log L = 1/2 sum ((log rho_c(1+max(delta,delta_min)) - nobs)/sigma)^2
    (lognormal_independent.cpp:93-126)."""
    dclip = jnp.maximum(delta_x, obs.delta_min)
    lam = jnp.log(obs.rho_c * (1.0 + dclip))
    valid = obs.window > 0.0
    resid = (lam - obs.nobs) / obs.noise
    return jnp.sum(jnp.where(valid, 0.5 * resid * resid, 0.0))


def grf_psi(delta_lag, obs: ObsData):
    """GRF likelihood acts on the *Lagrangian* field directly, no dynamics
    (gaussian_random_field.cpp:39-53)."""
    valid = obs.window > 0.0
    resid = (delta_lag - obs.nobs) / obs.noise
    return jnp.sum(jnp.where(valid, 0.5 * resid * resid, 0.0))


def likelihood_psi(likelihood: int, delta_field, obs: ObsData):
    """Dispatch on static likelihood id; `delta_field` is delta_eul for
    0..2 and delta_lag for 3."""
    if likelihood == 0:
        return poisson_psi(delta_field, obs)
    if likelihood == 1:
        return gaussian_psi(delta_field, obs)
    if likelihood == 2:
        return lognormal_psi(delta_field, obs)
    if likelihood == 3:
        return grf_psi(delta_field, obs)
    raise ValueError(f"unknown likelihood {likelihood}")


def partial_f_delta_x(likelihood: int, delta_x, obs: ObsData):
    """d(-log L)/d delta_x, elementwise — the reference's
    partial_f_delta_x_log_like functions, kept for the analytic-adjoint
    cross-check path (calc_h):
      0: (1 - nobs/Lambda) rho_c bE bP (1+bP d)^(bE-1)  (poissonian.cpp:19-35)
      1: (Lambda - nobs)/sigma^2 * rho_c bE bP (...)    (gaussian_independent.cpp:24-43)
      2: (log Lam - nobs)/sigma^2                        (lognormal_independent.cpp:40-55)
    Note the reference's partials are d/d(delta_x) for 0-1 and
    d/d log(1+delta) for 2, with signs folded into its h-assembly; here all
    are plain d psi/d delta_x.
    """
    if likelihood == 0:
        lam, dens = _lambda_powerlaw(delta_x, obs)
        valid = (obs.window > 0.0) & (dens > 0.0)
        out = (1.0 - obs.nobs / jnp.where(lam > 0, lam, 1.0)) * obs.rho_c * obs.biasE * obs.biasP \
            * jnp.maximum(dens, 1e-30) ** (obs.biasE - 1.0)
        return jnp.where(valid, out, 0.0)
    if likelihood == 1:
        lam, dens = _lambda_powerlaw(delta_x, obs)
        valid = (obs.window > 0.0) & (lam > 0.0)
        dlam = obs.window * obs.rho_c * obs.biasE * obs.biasP * jnp.maximum(dens, 1e-30) ** (obs.biasE - 1.0)
        out = (lam - obs.nobs) / (obs.noise * obs.noise) * dlam
        return jnp.where(valid, out, 0.0)
    if likelihood == 2:
        dclip = jnp.maximum(delta_x, obs.delta_min)
        lam = jnp.log(obs.rho_c * (1.0 + dclip))
        valid = obs.window > 0.0
        out = (lam - obs.nobs) / (obs.noise * obs.noise) / (1.0 + dclip)
        out = jnp.where(delta_x > obs.delta_min, out, 0.0)
        return jnp.where(valid, out, 0.0)
    raise ValueError(f"partial_f_delta_x undefined for likelihood {likelihood}")
