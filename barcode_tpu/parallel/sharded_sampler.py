"""Full HMC attempts for chains on a 2-axis ('chains', 'grid') mesh.

The config-5 sampling mode (BASELINE ladder: 256^3+, grids larger than one
chip): every field of every chain is x-slab-sharded over the 'grid' axis
while independent chains run data-parallel over the 'chains' axis.  One
attempt = momenta ~ N(0, M), masked fixed-length leapfrog with the
slab-local posterior gradient (grad *through* the sharded FFT/halo-deposit
pipeline), Metropolis accept — the sharded counterpart of
hmc/sampler.make_attempt (HamiltonianMC loop body, HMC.cc:431-537).

Scope v1: Fourier-space mass (mass_type 1/4 semantics: spectrum `mass_f`),
fixed eps_fac per chain (the adaptive controllers of hmc/adapt.py run on
per-chain scalars and can be applied outside between attempt batches).

RNG: each chain carries one key; slab-local momentum noise folds in the
device index so the full-grid draw is well defined and device-count
independent in distribution (not bitwise).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from barcode_tpu.grid.spec import GridSpec
from barcode_tpu.config import HMCConfig
from barcode_tpu.forward.lag2eul import ForwardConfig, GrowthParams
from barcode_tpu.model.likelihoods import ObsData
from barcode_tpu.parallel import sharded_fft as sf
from barcode_tpu.parallel.sharded_forward import (AXIS, _check_halo,
                                                  _make_psi_local)


def init_chain_state(delta_batch, psi_vals, grad_batch, seeds, eps_fac):
    """State dict for n chains; see make_sharded_attempt for shardings."""
    return {
        "delta": delta_batch,
        "psi": psi_vals,
        "grad": grad_batch,
        "key_data": jax.vmap(
            lambda s: jax.random.key_data(jax.random.key(s)))(seeds),
        "eps_fac": eps_fac,
        "accepted": jnp.zeros(delta_batch.shape[0], jnp.int32),
    }


def shard_chain_state(state, mesh: Mesh):
    cx = NamedSharding(mesh, P("chains", AXIS, None, None))
    c = NamedSharding(mesh, P("chains"))
    cn = NamedSharding(mesh, P("chains", None))
    return {
        "delta": jax.device_put(state["delta"], cx),
        "psi": jax.device_put(state["psi"], c),
        "grad": jax.device_put(state["grad"], cx),
        "key_data": jax.device_put(state["key_data"], cn),
        "eps_fac": jax.device_put(state["eps_fac"], c),
        "accepted": jax.device_put(state["accepted"], c),
    }


def make_sharded_attempt(g: GridSpec, fc: ForwardConfig, gp: GrowthParams,
                         likelihood: int, hc: HMCConfig, mesh: Mesh,
                         halo: int | None = None):
    """attempt(state, obs_sh, mass_f_sh) -> (state', stats) — jitted.

    state: dict from init_chain_state/shard_chain_state; obs_sh from
    sharded_forward.shard_obs_chains; mass_f_sh: half-complex mass spectrum
    in the sharded Fourier layout (power_to_sharded_layout).
    """
    n_dev = mesh.shape[AXIS]
    halo = _check_halo(g, fc, n_dev, halo)
    psi_local = _make_psi_local(g, fc, gp, likelihood, halo, n_dev)
    n_eps_max = int(hc.N_eps_fac)

    def chain_attempt(delta, psi0, grad0, key_data, eps_fac,
                      nobs, window, noise, power_f, mass_f):
        dev = jax.lax.axis_index(AXIS)
        key = jax.random.wrap_key_data(key_data)
        key, k_mom, k_neps, k_eps, k_acc = jax.random.split(key, 5)

        # momenta p ~ N(0, M): slab-local white noise colored by
        # sqrt(mass_f * N / V) (random_fields.grf convention,
        # HMC_momenta.cc:52-54) through the sharded FFT
        w = jax.random.normal(jax.random.fold_in(k_mom, dev), delta.shape)
        amp = jnp.sqrt(mass_f * (g.N / g.vol))
        p0 = sf._irfft3_local(amp * sf._rfft3_local(w, n_dev, AXIS),
                              n_dev, g.N3, AXIS)

        inv_m = jnp.where(mass_f > 0.0,
                          (g.vol / g.N) / jnp.where(mass_f > 0.0, mass_f, 1.0),
                          0.0)

        def minv(p):
            return sf._irfft3_local(inv_m * sf._rfft3_local(p, n_dev, AXIS),
                                    n_dev, g.N3, AXIS)

        def kinetic(p):
            # slab-local partial sum; psum makes it the global 1/2 p M^-1 p
            return jax.lax.psum(0.5 * jnp.sum(p * minv(p)), AXIS)

        vag = jax.value_and_grad(
            lambda d: psi_local(d, nobs, window, noise, power_f))

        Neps = (jax.random.uniform(k_neps) * hc.N_eps_fac).astype(jnp.int32) + 1
        eps = jnp.minimum(jax.random.uniform(k_eps) * eps_fac, 2.0)

        H_i = kinetic(p0) + psi0

        def body(j, carry):
            s, psi, grad, p = carry
            active = j < Neps
            p_half = p - 0.5 * eps * grad
            s_new = s + eps * minv(p_half)
            psi_new, grad_new = vag(s_new)
            p_new = p_half - 0.5 * eps * grad_new
            sel = lambda a, b: jnp.where(active, a, b)
            return (sel(s_new, s), sel(psi_new, psi),
                    sel(grad_new, grad), sel(p_new, p))

        s_f, psi_f, grad_f, p_f = jax.lax.fori_loop(
            0, n_eps_max, body, (delta, psi0, grad0, p0))

        dH = kinetic(p_f) + psi_f - H_i
        u = jax.random.uniform(k_acc)
        finite = jnp.isfinite(dH)
        accept = finite & ((dH < 0.0) | (u < jnp.exp(-jnp.minimum(dH, 80.0))))
        sel = lambda a, b: jnp.where(accept, a, b)
        return (sel(s_f, delta), sel(psi_f, psi0), sel(grad_f, grad0),
                jax.random.key_data(key), accept, dH, eps, Neps)

    def local(delta_b, psi_b, grad_b, kd_b, ef_b,
              nobs, window, noise, power_f, mass_f):
        return jax.vmap(
            lambda d, ps, gr, kd, ef: chain_attempt(
                d, ps, gr, kd, ef, nobs, window, noise, power_f, mass_f)
        )(delta_b, psi_b, grad_b, kd_b, ef_b)

    x_c = P("chains", AXIS, None, None)
    s_c = P("chains")
    shmapped = jax.shard_map(
        local, mesh=mesh,
        in_specs=(x_c, s_c, x_c, P("chains", None), s_c,
                  P(AXIS, None, None), P(AXIS, None, None),
                  P(AXIS, None, None), P(None, AXIS, None),
                  P(None, AXIS, None)),
        out_specs=(x_c, s_c, x_c, P("chains", None), s_c, s_c, s_c, s_c),
        check_vma=False)

    @jax.jit
    def attempt(state, obs: ObsData, mass_f):
        delta, psi, grad, kd, acc_flag, dH, eps, Neps = shmapped(
            state["delta"], state["psi"], state["grad"], state["key_data"],
            state["eps_fac"], obs.nobs, obs.window, obs.noise, obs.power,
            mass_f)
        new_state = {
            "delta": delta, "psi": psi, "grad": grad, "key_data": kd,
            "eps_fac": state["eps_fac"],
            "accepted": state["accepted"] + acc_flag.astype(jnp.int32),
        }
        stats = {"accepted": acc_flag, "dH": dH, "epsilon": eps, "Neps": Neps}
        return new_state, stats

    return attempt
