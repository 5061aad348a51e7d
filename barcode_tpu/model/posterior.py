"""The target density: psi(delta_lag) = psi_prior + psi_likelihood(forward).

The reference assembles gradients by hand through a chain of adjoint ops
(likelihood_grad_log_like + likelihood_calc_h_SPH, HMC_models.cc:312-471);
here the primary gradient is jax.grad of the actual discrete psi — the exact
adjoint of the exact forward model, which the hand-derived h-term only
approximates (it uses continuous kernel derivatives against a discrete
deposit).  The analytic h-term is reimplemented in model/adjoint.py as a
cross-check and as a parity tool.

Sign conventions: psi = -log posterior (up to constants); HMC minimizes
nothing, it samples exp(-psi).

Reference "Testing" knobs (input.par bottom block), status here:
  * `deltaQ_factor` — kept (the forward model sees deltaQ_factor * s).
  * `grad_psi_prior_factor` / `grad_psi_likeli_factor` / `correct_delta`
    (HMC.cc:164-175, HMC_models.cc:458-470) — kept, as *force* scalings in
    `make_psi_force`: like the reference they scale only the gradient the
    leapfrog integrates, never the energies entering dH (correct_delta
    multiplies the likelihood force by D1).  Defaults (1.0/1.0/False) give
    the exact gradient of psi.
  * `grad_psi_{prior,likeli}_{conjugate,times_i}` (HMC.cc:146-206)
    deliberately corrupt the hand-assembled gradient in Fourier space to
    debug the adjoint; with jax.grad there is no hand-assembled gradient to
    corrupt — N/A by design.
  * the Poisson partial has the opposite sign convention to the Gaussian /
    log-normal partials (poissonian.cpp:19-35 returns +dpsi/ddelta,
    gaussian_independent.cpp:24-43 returns -dpsi/ddelta); autodiff is
    immune to this class of bug.
"""
from __future__ import annotations

import dataclasses

import jax

from barcode_tpu.grid.spec import GridSpec
from barcode_tpu.forward.lag2eul import ForwardConfig, GrowthParams, lag2eul
from barcode_tpu.model import likelihoods
from barcode_tpu.model.likelihoods import ObsData


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Static statistical-model selection (input.par likelihood/prior/sfmodel
    block)."""

    likelihood: int = 1     # 0 poisson, 1 gaussian, 2 lognormal, 3 grf
    prior: int = 0          # 0 gaussian (the only one, like the reference)
    forward: ForwardConfig = ForwardConfig()
    deltaQ_factor: float = 1.0  # test knob: forward model sees deltaQ_factor * s
    # "Testing" force scalings (see module docstring; defaults = exact grad)
    grad_prior_factor: float = 1.0   # input.par grad_psi_prior_factor
    grad_likeli_factor: float = 1.0  # input.par grad_psi_likeli_factor
    correct_delta: bool = False      # x D1 on the likelihood force
    calc_h: int = 3  # reference gradient-assembly variant selector; parsed
                     # for input.par compat.  All variants map to jax.grad
                     # (the exact adjoint); the analytic calc_h=3 h-term
                     # lives in model/adjoint.py as a cross-check.


def make_psi(g: GridSpec, mc: ModelConfig, gp: GrowthParams, obs: ObsData):
    """Return psi(delta_lag) -> (psi_total, aux) — jittable & differentiable.

    aux = (psi_prior, psi_likeli), the per-term energies the reference logs
    to performance_log.txt (HMC.cc:40-60).
    """

    from barcode_tpu.grid import fourier

    def psi(delta_lag):
        # Round-5 FFT dedupe: one rfft3(delta) serves both the prior energy
        # (Parseval form, no irfft either) and the LPT displacement solve —
        # the reference transforms the same field separately in
        # prior_gaussian_log_prior (HMC_help.cc:16-64) and theta2vel
        # (EqSolvers.cc:168-277) every gradient evaluation.
        delta_lag_C = fourier.rfft3(delta_lag)
        psi_prior = likelihoods.prior_psi_C(delta_lag_C, g, obs)
        if mc.likelihood == 3:
            # GRF model bypasses the forward model entirely (HMC.cc:159-162)
            psi_like = likelihoods.grf_psi(delta_lag, obs)
        else:
            # rfft is linear, so the deltaQ_factor test knob commutes with it
            delta_x = lag2eul(mc.deltaQ_factor * delta_lag, g, mc.forward, gp,
                              delta_C=mc.deltaQ_factor * delta_lag_C)
            psi_like = likelihoods.likelihood_psi(mc.likelihood, delta_x, obs)
        return psi_prior + psi_like, (psi_prior, psi_like)

    return psi


def make_psi_value_and_grad(g: GridSpec, mc: ModelConfig, gp: GrowthParams,
                            obs: ObsData):
    """(psi, (psi_prior, psi_likeli)), grad — one fused forward+backward."""
    return jax.value_and_grad(make_psi(g, mc, gp, obs), has_aux=True)


def make_psi_force(g: GridSpec, mc: ModelConfig, gp: GrowthParams,
                   obs: ObsData):
    """Like make_psi_value_and_grad but the gradient is of the *scaled*
    target f_p*prior + f_l*like (the reference's gradient_psi test factors,
    HMC.cc:164-175; correct_delta folds x D1 into f_l, HMC_models.cc:458-470)
    while the returned psi value stays exact — exactly the reference split:
    the leapfrog integrates the scaled force, Metropolis sees true energies.

    With default factors this is make_psi_value_and_grad (no extra cost).
    """
    f_p = float(mc.grad_prior_factor)
    f_l = float(mc.grad_likeli_factor) * (gp.D1 if mc.correct_delta else 1.0)
    if f_p == 1.0 and f_l == 1.0:
        return make_psi_value_and_grad(g, mc, gp, obs)
    psi_fn = make_psi(g, mc, gp, obs)

    def scaled(delta_lag):
        _, (pp, pl) = psi_fn(delta_lag)
        return f_p * pp + f_l * pl, (pp, pl)

    svag = jax.value_and_grad(scaled, has_aux=True)

    def vag(delta_lag):
        (_, (pp, pl)), grad = svag(delta_lag)
        return (pp + pl, (pp, pl)), grad

    return vag
