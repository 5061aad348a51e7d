"""Adaptive step-size (eps_fac) controllers.

Behavioral port of /root/reference/barlib/src/hmc/leapfrog/time_step.cpp,
fully vectorized so each vmapped chain runs its own controller (the
reference has a single global one; SURVEY.md §5.8 — cross-chain pooling of
the acceptance window is an optional extension in the sampler).

Types (input.par eps_fac_update_type):
  0 constant
  1 power-mean decay toward eps_fac_target every s_eps_total attempts
  2 acceptance-rate window controller (sort-by-eps cumulative average +
    smoothing; :40-104)
  3 type 2 + halve-on-every-rejection until the first acceptance (:137-149)
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from barcode_tpu.config import HMCConfig


def power_mean(x, y, p):
    """(x^p + y^p)/2)^(1/p), geometric mean at p=0 (math_funcs.cc:40-48)."""
    if p == 0:
        return jnp.sqrt(x * y)
    return ((x**p + y**p) / 2.0) ** (1.0 / p)


def _box_smooth(a, w: int):
    """Mean over the clamped window [i-w, i+w] (stl_smooth,
    time_step.hpp:64-76)."""
    n = a.shape[0]
    c = jnp.concatenate([jnp.zeros(1, a.dtype), jnp.cumsum(a)])
    i = jnp.arange(n)
    lo = jnp.maximum(i - w, 0)
    hi = jnp.minimum(i + w + 1, n)
    return (c[hi] - c[lo]) / (hi - lo)


def _downward(eps_fac, acc_flags, eps_table, hc: HMCConfig):
    """The reference's downward search (time_step.cpp:40-104):
    sort acceptance flags by their epsilon, cumulative moving average,
    smooth, find the first crossing below the target acceptance after the
    peak, and take the epsilon at that rank."""
    n_a = hc.N_a_eps_update
    acc_target = (hc.acc_max + hc.acc_min) / 2.0
    alpha = jnp.mean(acc_flags.astype(jnp.float32))

    order = jnp.argsort(eps_table)
    a_sort = acc_flags[order].astype(jnp.float32)
    cma = jnp.cumsum(a_sort) / jnp.arange(1, n_a + 1, dtype=jnp.float32)
    a_sm = _box_smooth(cma, hc.eps_down_smooth)

    ix_max = jnp.argmax(a_sm)
    below = (jnp.arange(n_a) >= ix_max) & (a_sm < acc_target)
    found = jnp.any(below)
    ix_target = jnp.argmax(below)  # first True (valid only if found)
    eps_sorted = eps_table[order]

    peak_ok = jnp.max(a_sm) > acc_target
    # peak_ok & found      -> eps_sorted[ix_target]
    # peak_ok & !found     -> keep (special case message, :69-75)
    # !peak_ok & alpha==0  -> min(eps_table)
    # !peak_ok & alpha>0   -> eps_fac / 3
    candidate = jnp.where(found, eps_sorted[ix_target], eps_fac)
    fallback = jnp.where(alpha == 0.0, jnp.min(eps_table), eps_fac / 3.0)
    return jnp.where(peak_ok, candidate, fallback)


def _acc_rate_update(eps_fac, count_attempts, acc_flags, eps_table,
                     hc: HMCConfig, pool_axis: str | None = None):
    """Type-2 controller body: fires when count_attempts % N_a == 0
    (time_step.cpp:104-135).

    With `pool_axis` (a vmap/shard_map axis name), the (epsilon, accepted)
    window is all-gathered across chains and the controller runs on the
    pooled tables — C chains adapt from C*N_a observations instead of N_a
    (SURVEY.md §5.8: the reference's per-run tables become a cross-chain
    reduction)."""
    fire = (count_attempts % hc.N_a_eps_update == 0) & (count_attempts > 0)
    if pool_axis is not None:
        # pool_axis may mix vmap and shard_map axis names (the sharded
        # sampler pools over ('chains', 'chains_local')); all_gather rejects
        # such tuples, so gather one axis at a time
        axes = (pool_axis if isinstance(pool_axis, (tuple, list))
                else (pool_axis,))
        for ax in axes:
            acc_flags = jax.lax.all_gather(acc_flags, ax).reshape(-1)
            eps_table = jax.lax.all_gather(eps_table, ax).reshape(-1)
        hc = dataclasses.replace(hc, N_a_eps_update=acc_flags.shape[0])
    alpha = jnp.mean(acc_flags.astype(jnp.float32))
    acc_target = (hc.acc_max + hc.acc_min) / 2.0

    down = _downward(eps_fac, acc_flags, eps_table, hc)
    up = eps_fac * hc.eps_up_fac * (alpha / acc_target)
    adjusted = jnp.where(alpha < hc.acc_min, down,
                         jnp.where(alpha > hc.acc_max, up, eps_fac))
    return jnp.where(fire, adjusted, eps_fac)


def update_eps_fac(eps_fac, count_attempts, rejections, got_first_accept,
                   acc_flags, eps_table, hc: HMCConfig, N: int,
                   pool_axis: str | None = None):
    """Dispatch on the static update type (update_eps_fac,
    time_step.cpp:151-185).  Called before each trajectory."""
    t = hc.eps_fac_update_type
    if t == 0:
        return eps_fac
    if t == 1:
        fire = (count_attempts % hc.s_eps_total(N) == 0) & (count_attempts > 0)
        target = hc.eps_fac_target(N)
        return jnp.where(fire, power_mean(eps_fac, target, hc.eps_fac_power), eps_fac)
    if t == 2:
        return _acc_rate_update(eps_fac, count_attempts, acc_flags, eps_table,
                                hc, pool_axis)
    if t == 3:
        fast = (~got_first_accept) & (rejections > 0)
        normal = _acc_rate_update(eps_fac, count_attempts, acc_flags, eps_table,
                                  hc, pool_axis)
        return jnp.where(fast, eps_fac / 2.0, normal)
    raise ValueError(f"unknown eps_fac_update_type {t}")
