"""Chain-parallel throughput scaling on one chip: vmapped chains at 64^3.

North-star #2 (BASELINE.json) wants samples/s scaling over hosts; with one
real chip in this image, the measurable component is the vmap dimension —
how much of the chip the single-chain workload leaves on the table, i.e.
how close to free extra chains are.  Writes chains_scaling.json:
  {n_chains: {"attempts_per_s": ..., "chain_steps_per_s": total}}

Usage: timeout 3000 python artifacts/chains_scaling.py
"""
import dataclasses
import json
import time
from pathlib import Path
import sys

sys.path.insert(0, str(Path(__file__).parent.parent))

N_GRID = 64
N_EPS = 8
N_ATTEMPTS = 8
CHAINS = [1, 2, 4, 8, 16]


def main():
    import jax
    import jax.numpy as jnp
    from barcode_tpu.config import HMCConfig
    from barcode_tpu.grid.spec import GridSpec
    from barcode_tpu.grid import fourier
    from barcode_tpu import random_fields
    from barcode_tpu.forward.lag2eul import ForwardConfig, GrowthParams, lag2eul
    from barcode_tpu.model.likelihoods import ObsData
    from barcode_tpu.model.posterior import ModelConfig
    from barcode_tpu.hmc import mass as mass_mod, sampler

    g = GridSpec.cube(N_GRID, 200.0)
    gp = GrowthParams(D1=1.0, D2=-3.0 / 7.0, ascale=1.0, cpecvel=52.85,
                      hubble=100.0)
    fc = ForwardConfig(sfmodel=3, masskernel="sph_ft", rsd=True, slength=4.0,
                       pallas_deposit=True, pallas_halo=8)
    mc = ModelConfig(likelihood=1, forward=fc)
    hc = HMCConfig(eps_fac=1e-4, eps_fac_update_type=0, mass_type=1,
                   N_eps_fac=N_EPS, N_a_eps_update=32)

    results = {}
    for nc in CHAINS:
        @jax.jit
        def setup():
            kk = jnp.sqrt(fourier.k_squared(g))
            keq = 0.02
            P = (1e4 * (kk / keq) / (1.0 + (kk / keq) ** 2) ** 1.5)
            P = P.at[0, 0, 0].set(0.0)
            truth = random_fields.grf(jax.random.key(0), g, P)
            d_eul = lag2eul(truth, g, fc, gp)
            nobs = jnp.maximum(
                1.0 + d_eul + jax.random.normal(jax.random.key(1), g.shape), 0.0)
            obs = ObsData(nobs=nobs, window=jnp.ones(g.shape),
                          noise=jnp.ones(g.shape), power=P)
            mass = mass_mod.compute_mass(g, hc.mass_type, P)
            init = sampler.make_init(g, mc, gp, hc)
            keys = jax.random.split(jax.random.key(2), nc)
            state = jax.vmap(lambda k: init(k, truth * 0.5, obs))(keys)
            return state, obs, mass

        state, obs, mass = setup()
        attempt = sampler.make_attempt(g, mc, gp, hc)

        @jax.jit
        def step(state, obs, mass):
            return jax.vmap(lambda s: attempt(s, obs, mass))(state)

        state, _ = step(state, obs, mass)
        float(state.psi[0])
        t0 = time.perf_counter()
        for _ in range(N_ATTEMPTS):
            state, _ = step(state, obs, mass)
        float(state.psi[0])
        dt = time.perf_counter() - t0
        aps = N_ATTEMPTS / dt
        results[nc] = {"attempts_per_s": round(aps, 3),
                       "chain_steps_per_s": round(aps * nc * N_EPS, 2)}
        print(f"chains={nc}: {aps:.3f} attempts/s, "
              f"{aps * nc * N_EPS:.1f} total chain-steps/s", flush=True)

    out = Path(__file__).with_name("chains_scaling.json")
    out.write_text(json.dumps(results, indent=1))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
