"""Round-4 probe: where does multi-chain throughput go at small N?

artifacts/chains_scaling.json (round 2) showed total chain-steps/s at 64^3
degrading 190 -> 166 from 1 -> 16 vmapped chains (~13%).  PLAN.md's open
idea was a chain-as-grid-dim Pallas variant; but jax.vmap of a pallas_call
already lifts the batch into a leading *grid dimension* of one launch, so an
explicit fold could only differ by its padding overhead (junk blocks at the
per-chain halo pads, ~2hx/(N1+2hx) extra compute).  Before building that,
this probe measures WHERE the degradation lives: per-chain-step time of

  dep   : vmapped Pallas TSC deposit alone
  gat   : vmapped Pallas gather-grads alone (force path)
  vag   : full posterior value+grad (kernels + FFT chain + likelihood)
  att   : full HMC attempt (vag * Neps + controller/accept elementwise)

at 32^3 and 64^3 for 1 and 16 chains.  If dep/gat are ~flat per chain while
att degrades, the gap is NOT kernel launch amortization and the fold idea is
ruled out; if dep/gat degrade, the fold is worth building.

Writes probe_r4_chainfold.json.  Usage:
  timeout 3000 python artifacts/probe_r4_chainfold.py
"""
import dataclasses
import json
import time
from pathlib import Path
import sys

sys.path.insert(0, str(Path(__file__).parent.parent))

N_EPS = 8
REPS = 20


def bench_fn(fn, *args):
    out = fn(*args)
    jax_flatten_sync(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    jax_flatten_sync(out)
    return (time.perf_counter() - t0) / REPS


def jax_flatten_sync(out):
    import jax
    leaves = jax.tree_util.tree_leaves(out)
    # device->host transfer of one scalar: the axon relay's
    # block_until_ready has been observed returning early
    float(leaves[0].ravel()[0])


def main():
    import jax
    import jax.numpy as jnp
    from barcode_tpu.config import HMCConfig
    from barcode_tpu.grid.spec import GridSpec
    from barcode_tpu.grid import fourier
    from barcode_tpu import random_fields
    from barcode_tpu.forward.lag2eul import ForwardConfig, GrowthParams, lag2eul
    from barcode_tpu.forward import assign
    from barcode_tpu.model.likelihoods import ObsData
    from barcode_tpu.model.posterior import ModelConfig, make_psi_force
    from barcode_tpu.hmc import mass as mass_mod, sampler

    gp = GrowthParams(D1=1.0, D2=-3.0 / 7.0, ascale=1.0, cpecvel=52.85,
                      hubble=100.0)
    results = {}
    for n_grid, halo in [(32, 8), (64, 8)]:
        g = GridSpec.cube(n_grid, 200.0 * n_grid / 128.0)
        fc = ForwardConfig(sfmodel=3, masskernel="sph_ft", rsd=True,
                           slength=4.0, pallas_deposit=True, pallas_halo=halo)
        mc = ModelConfig(likelihood=1, forward=fc)
        hc = HMCConfig(eps_fac=1e-4, eps_fac_update_type=0, mass_type=1,
                       N_eps_fac=N_EPS, N_a_eps_update=32)

        @jax.jit
        def setup():
            kk = jnp.sqrt(fourier.k_squared(g))
            keq = 0.02
            P = (1e4 * (kk / keq) / (1.0 + (kk / keq) ** 2) ** 1.5)
            P = P.at[0, 0, 0].set(0.0)
            truth = random_fields.grf(jax.random.key(0), g, P)
            d_eul = lag2eul(truth, g, fc, gp)
            nobs = jnp.maximum(
                1.0 + d_eul + jax.random.normal(jax.random.key(1), g.shape),
                0.0)
            obs = ObsData(nobs=nobs, window=jnp.ones(g.shape),
                          noise=jnp.ones(g.shape), power=P)
            mass = mass_mod.compute_mass(g, hc.mass_type, P)
            _, pos = lag2eul(truth, g, fc, gp, return_pos=True)
            return truth, obs, mass, pos

        truth, obs, mass, pos = setup()
        dep = assign.make_tsc_deposit_fast(g, halo=halo)
        vag = make_psi_force(g, mc, gp, obs)
        init = sampler.make_init(g, mc, gp, hc)
        attempt = sampler.make_attempt(g, mc, gp, hc)

        for C in (1, 16):
            key = f"{n_grid}_c{C}"
            sig = jnp.stack([truth * 0.5] * C)
            posb = jnp.stack([pos] * C)

            dep_t = bench_fn(jax.jit(jax.vmap(dep)), posb)
            # force-path gather: grad of sum(deposit) wrt pos (the VJP kernel)
            gat = jax.jit(jax.vmap(jax.grad(lambda p: jnp.sum(dep(p) ** 2))))
            gat_t = bench_fn(gat, posb)
            vag_t = bench_fn(jax.jit(jax.vmap(vag)), sig)

            @jax.jit
            def run_init(keys, s, ob):
                return jax.vmap(lambda k, gu: init(k, gu, ob))(keys, s)
            states = run_init(jax.random.split(jax.random.key(2), C), sig, obs)
            att = jax.jit(lambda st, ob, m: jax.vmap(
                lambda s: attempt(s, ob, m))(st))
            st0 = att(states, obs, mass)[0]
            t0 = time.perf_counter()
            st = st0
            for _ in range(REPS):
                st, _ = att(st, obs, mass)
            float(st.psi[0])
            att_t = (time.perf_counter() - t0) / REPS

            results[key] = {
                "dep_ms_per_chain": round(dep_t * 1e3 / C, 3),
                "gat_ms_per_chain": round(gat_t * 1e3 / C, 3),
                "vag_ms_per_chain": round(vag_t * 1e3 / C, 3),
                "attempt_ms_per_chain": round(att_t * 1e3 / C, 3),
                "chain_steps_per_s": round(C * N_EPS / att_t, 1),
            }
            print(key, results[key], flush=True)

    out = Path(__file__).with_name("probe_r4_chainfold.json")
    out.write_text(json.dumps(results, indent=1))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
