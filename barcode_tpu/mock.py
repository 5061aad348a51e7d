"""Mock-data generation (the reference's random_test mode).

Parity: setup_random_test (/root/reference/barlib/src/barcoderunner.cc:
42-205): GRF truth -> forward model (optionally RSD) -> window -> observed
tracer field under the chosen noise model, plus the diagnostic dumps.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from barcode_tpu.grid.spec import GridSpec
from barcode_tpu.grid import fourier
from barcode_tpu import random_fields
from barcode_tpu.config import MockConfig
from barcode_tpu.forward.lag2eul import ForwardConfig, GrowthParams, lag2eul
from barcode_tpu.model.likelihoods import ObsData


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class MockData:
    truth_lag: Any
    truth_eul: Any
    obs: ObsData


def make_window(key, window_type: int, delta_eul, g: GridSpec):
    """window_type: 1 all ones; 10 half ones half zeros; 23 ones where
    delta_eul > 3 (barcoderunner.cc:91-113 — N.B. the reference's comment
    says 'zeros where delta_eul <= 3' and the code matches)."""
    if window_type == 1:
        return jnp.ones(g.shape)
    if window_type == 10:
        w = jnp.ones(g.N).at[: g.N // 2].set(0.0)
        return w.reshape(g.shape)
    if window_type == 23:
        return (delta_eul > 3.0).astype(jnp.float32)
    raise ValueError(f"window_type {window_type} is not a valid choice")


def generate(key, g: GridSpec, mock: MockConfig, fc: ForwardConfig,
             gp: GrowthParams, power_rfft, likelihood: int,
             rho_c: float = 1.0, delta_min: float = -0.999,
             resolution_independent: bool = True) -> MockData:
    k_truth, k_noise, k_win = jax.random.split(key, 3)
    if resolution_independent:
        truth = random_fields.grf_resolution_independent(k_truth, g, power_rfft)
    else:
        truth = random_fields.grf(k_truth, g, power_rfft)

    fc_mock = dataclasses.replace(fc, rsd=mock.random_test_rsd)
    d_eul = lag2eul(truth, g, fc_mock, gp)
    window = make_window(k_win, mock.window_type, d_eul, g)

    if mock.data_model == 0:  # linear / additive error (barcoderunner.cc:122-166)
        lam = rho_c * (1.0 + d_eul)
        if likelihood == 0:
            nobs = jax.random.poisson(k_noise, jnp.maximum(lam, 0.0)).astype(jnp.float32)
            noise = jnp.ones(g.shape)
        elif likelihood == 1:
            noise = mock.sigma_min + mock.sigma_fac * lam
            nobs = lam + noise * jax.random.normal(k_noise, g.shape)
            if not mock.negative_obs:
                nobs = jnp.maximum(nobs, 0.0)
        elif likelihood == 3:
            noise = mock.sigma_min + mock.sigma_fac * truth**2
            nobs = truth + noise * jax.random.normal(k_noise, g.shape)
        else:
            raise ValueError("linear data model is incompatible with likelihood "
                             f"{likelihood} (init check, barcoderunner.cc:160-165)")
    elif mock.data_model == 1:  # log-normal / multiplicative (barcoderunner.cc:167-198)
        lam = jnp.log(rho_c * (1.0 + jnp.maximum(d_eul, delta_min)))
        noise = jnp.full(g.shape, mock.sigma_fac)
        nobs = lam + noise * jax.random.normal(k_noise, g.shape)
    else:
        raise ValueError(f"data_model {mock.data_model} is not a valid choice")

    nobs = jnp.where(window > 0, nobs, 0.0)
    obs = ObsData(nobs=nobs, window=window, noise=noise, power=power_rfft,
                  rho_c=rho_c, delta_min=delta_min)
    return MockData(truth_lag=truth, truth_eul=d_eul, obs=obs)


def validate(md: MockData, likelihood: int) -> None:
    """Host-side guard: zero noise inside the window NaNs the Gaussian/GRF
    likelihoods (barcoderunner.cc:190-198).  Kept out of `generate` so that
    function stays fully jittable."""
    import numpy as np

    if likelihood in (1, 3):
        noise = np.asarray(md.obs.noise)
        win = np.asarray(md.obs.window)
        if (noise[win > 0] <= 0.0).any():
            raise ValueError("noise = 0 found inside the window "
                             "(guard of barcoderunner.cc:190-198)")
