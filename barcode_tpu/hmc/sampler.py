"""The HMC sampler: one jittable attempt, vmapped over chains, scanned over
attempts.

Parity map (per attempt, HamiltonianMC loop body, HMC.cc:431-537):
  1. adaptive eps_fac update           (update_eps_fac, before trajectory)
  2. draw momenta p ~ N(0, M)
  3. Neps ~ 1 + floor(U * N_eps_fac); eps ~ U * eps_fac, clipped at 2
     (HMC.cc:260-264)
  4. leapfrog kick-drift-kick with M^-1 in Fourier space, gradient
     recomputed each step (HMC.cc:251-369)
  5. dH = [K(p') + psi(s')] - [K(p) + psi(s)]; accept with min(1, e^-dH);
     non-finite dH rejects (the reference's momentum blow-up guard,
     HMC.cc:360-364, becomes a NaN/inf-safe accept)
  6. circular acceptance/epsilon tables + counters

TPU-first design: (psi, grad) of the current signal are cached in ChainState
(saves one forward+adjoint per attempt vs the reference); trajectories are a
masked fixed-length scan so chains stay batched under vmap; all chains run
the controller independently (pool across devices later via pmean).
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from barcode_tpu.grid.spec import GridSpec
from barcode_tpu.config import HMCConfig
from barcode_tpu.forward.lag2eul import GrowthParams
from barcode_tpu.model.likelihoods import ObsData
from barcode_tpu.model.posterior import ModelConfig, make_psi, make_psi_force
from barcode_tpu.hmc import adapt, mass as mass_mod
from barcode_tpu.hmc.state import AttemptStats, ChainState, MassState


def make_init(g: GridSpec, mc: ModelConfig, gp: GrowthParams, hc: HMCConfig):
    """init(key, delta0, obs) -> ChainState (single chain; vmap outside)."""

    def init(key, delta0, obs: ObsData):
        (psi, (pp, pl)), grad = make_psi_force(g, mc, gp, obs)(delta0)
        n_a = hc.N_a_eps_update
        eps0 = jnp.asarray(hc.eps_fac_start(g.N), jnp.float32)
        return ChainState(
            delta=delta0,
            psi=psi, psi_prior=pp, psi_like=pl, grad=grad,
            key=key,
            eps_fac=eps0,
            acc_flags=jnp.zeros(n_a, jnp.int32),
            # pre-filled with eps0 so the downward search never sees zeros
            # (init_par.cc:307-313)
            eps_table=jnp.full(n_a, eps0, jnp.float32),
            count_attempts=jnp.asarray(0, jnp.int32),
            rejections=jnp.asarray(0, jnp.int32),
            accepted=jnp.asarray(0, jnp.int32),
            got_first_accept=jnp.asarray(False),
        )

    return init


# 2-stage minimal-norm (Omelyan/BCSS) splitting coefficient: same formal
# order as leapfrog but ~10x smaller energy-error coefficient, so HMC can
# run ~2x larger steps per gradient at equal acceptance (the higher-order
# integrator strategy of arXiv:1911.02667 for LSS HMC; the reference only
# has plain leapfrog, HMC.cc:251-369).
LAMBDA_MN2 = 0.1931833275037836


def leapfrog(vag, minv, carry0, eps, Neps, n_max: int,
             integrator: str = "leapfrog"):
    """Masked fixed-length symplectic integration (Hamiltonian_EoM,
    HMC.cc:251-369).

    integrator: 'leapfrog' (kick-drift-kick, 1 gradient/step) or
    'minimal_norm_2' (K(le) D(e/2) K((1-2l)e) D(e/2) K(le), 2 gradients/step).
    carry0 = (s, psi, psi_prior, psi_like, grad, p); steps j >= Neps are
    no-ops so vmapped chains with different Neps stay batched.  Exposed at
    module level for the reversibility/energy-scaling tests.
    """

    def body(j, carry):
        s, psi, pp, pl, grad, p = carry
        active = j < Neps
        if integrator == "leapfrog":
            p_half = p - 0.5 * eps * grad
            s_new = s + eps * minv(p_half)
            (psi_new, (pp_new, pl_new)), grad_new = vag(s_new)
            p_new = p_half - 0.5 * eps * grad_new
        elif integrator == "minimal_norm_2":
            lam = LAMBDA_MN2
            p1 = p - lam * eps * grad
            s1 = s + 0.5 * eps * minv(p1)
            (_, (_, _)), g1 = vag(s1)
            p2 = p1 - (1.0 - 2.0 * lam) * eps * g1
            s_new = s1 + 0.5 * eps * minv(p2)
            (psi_new, (pp_new, pl_new)), grad_new = vag(s_new)
            p_new = p2 - lam * eps * grad_new
        else:
            raise ValueError(f"unknown integrator {integrator!r}")
        sel = lambda a, b: jnp.where(active, a, b)
        return (sel(s_new, s), sel(psi_new, psi), sel(pp_new, pp),
                sel(pl_new, pl), sel(grad_new, grad), sel(p_new, p))

    return jax.lax.fori_loop(0, n_max, body, carry0)


def make_attempt(g: GridSpec, mc: ModelConfig, gp: GrowthParams, hc: HMCConfig):
    """attempt(state, obs, mass) -> (state', AttemptStats) — single chain."""
    n_eps_max = int(hc.N_eps_fac)

    def attempt(state: ChainState, obs: ObsData, mass: MassState):
        vag = make_psi_force(g, mc, gp, obs)

        key, k_mom, k_neps, k_eps, k_acc = jax.random.split(state.key, 5)

        # 1. controller (uses tables of *completed* attempts; optionally the
        #    window pooled across the vmapped chain axis)
        eps_fac = adapt.update_eps_fac(
            state.eps_fac, state.count_attempts, state.rejections,
            state.got_first_accept, state.acc_flags, state.eps_table, hc, g.N,
            pool_axis="chains" if hc.pool_adaptation else None)

        # 2. momenta
        p0 = mass_mod.draw_momenta(k_mom, g, hc.mass_type, mass, state.delta.dtype)

        # 3. trajectory length & step size (HMC.cc:260-264)
        Neps = (jax.random.uniform(k_neps) * hc.N_eps_fac).astype(jnp.int32) + 1
        eps = jnp.minimum(jax.random.uniform(k_eps) * eps_fac, 2.0)

        H_kin_i = mass_mod.kinetic(p0, g, hc.mass_type, mass)
        H_i = H_kin_i + state.psi

        # 4. leapfrog, masked fixed-length
        carry0 = (state.delta, state.psi, state.psi_prior, state.psi_like,
                  state.grad, p0)
        minv = lambda p: mass_mod.apply_minv(p, g, hc.mass_type, mass)
        s_f, psi_f, pp_f, pl_f, grad_f, p_f = leapfrog(
            vag, minv, carry0, eps, Neps, n_eps_max,
            integrator=hc.integrator)

        # 5. Metropolis
        H_kin_f = mass_mod.kinetic(p_f, g, hc.mass_type, mass)
        H_f = H_kin_f + psi_f
        dH = H_f - H_i
        if hc.div_dH_by_N:
            dH = dH / g.N
        u = jax.random.uniform(k_acc)
        finite = jnp.isfinite(dH)
        accept = finite & ((dH < 0.0) | (u < jnp.exp(-jnp.minimum(dH, 80.0))))

        sel = lambda a, b: jnp.where(accept, a, b)
        new_state = ChainState(
            delta=sel(s_f, state.delta),
            psi=sel(psi_f, state.psi),
            psi_prior=sel(pp_f, state.psi_prior),
            psi_like=sel(pl_f, state.psi_like),
            grad=sel(grad_f, state.grad),
            key=key,
            eps_fac=eps_fac,
            acc_flags=state.acc_flags.at[state.count_attempts % hc.N_a_eps_update]
                .set(accept.astype(jnp.int32)),
            eps_table=state.eps_table.at[state.count_attempts % hc.N_a_eps_update]
                .set(eps),
            count_attempts=state.count_attempts + 1,
            rejections=state.rejections + (~accept).astype(jnp.int32),
            accepted=state.accepted + accept.astype(jnp.int32),
            got_first_accept=state.got_first_accept | accept,
        )
        stats = AttemptStats(
            accepted=accept,
            epsilon=eps,
            Neps=Neps,
            dH=dH,
            dK=H_kin_f - H_kin_i,
            dE=(pp_f + pl_f) - (state.psi_prior + state.psi_like),
            psi_prior_i=state.psi_prior,
            psi_prior_f=pp_f,
            psi_likeli_i=state.psi_like,
            psi_likeli_f=pl_f,
            H_kin_i=H_kin_i,
            H_kin_f=H_kin_f,
            eps_fac=eps_fac,
            acc_rate_recent=jnp.mean(new_state.acc_flags.astype(jnp.float32)),
        )
        return new_state, stats

    return attempt


def make_sampler(g: GridSpec, mc: ModelConfig, gp: GrowthParams, hc: HMCConfig,
                 n_attempts_per_call: int = 1):
    """Batched sampler: (states, obs, mass) -> (states, stacked stats).

    vmap over the chain axis of `states`; obs/mass broadcast.  The scan
    keeps `n_attempts_per_call` attempts on-device per host round-trip.
    """
    attempt = make_attempt(g, mc, gp, hc)

    def run(states: ChainState, obs: ObsData, mass: MassState):
        def step(carry, _):
            st, stats = jax.vmap(lambda s: attempt(s, obs, mass),
                                 axis_name="chains")(carry)
            return st, stats

        states, stats = jax.lax.scan(step, states, None, length=n_attempts_per_call)
        return states, stats  # stats leaves: [n_attempts, n_chains]

    return jax.jit(run)
