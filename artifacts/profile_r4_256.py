"""Component-level timing of the 256^3 leapfrog step (ladder config 5 scale).

As artifacts/profile_step.py but at 256^3 with the bench auto-halo, to
target the next optimization where the time actually goes (the streamed
deposit fit made the (16,16) block compile here; what dominates now?).

Usage: timeout 3000 python artifacts/profile_r4_256.py
(writes profile_r4_256.json)
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

N_GRID = 256
REPS = 8


def timeit(fn, *args, reps=REPS):
    out = fn(*args)
    jax_sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax_sync(out)
    return (time.perf_counter() - t0) / reps * 1e3  # ms


def jax_sync(tree):
    import jax
    leaf = jax.tree_util.tree_leaves(tree)[0]
    float(leaf.ravel()[0])  # device->host transfer: reliable sync on axon


def main():
    import jax
    import jax.numpy as jnp
    import bench
    from barcode_tpu.grid.spec import GridSpec
    from barcode_tpu.grid import fourier
    from barcode_tpu import random_fields
    from barcode_tpu.forward.lag2eul import ForwardConfig, GrowthParams, lag2eul
    from barcode_tpu.forward import pallas_deposit as pd
    from barcode_tpu.model.likelihoods import ObsData
    from barcode_tpu.model.posterior import ModelConfig, make_psi_force
    from barcode_tpu.hmc import mass as mass_mod

    g = GridSpec.cube(N_GRID, 200.0)
    gp = GrowthParams(D1=1.0, D2=-3.0 / 7.0, ascale=1.0, cpecvel=52.85,
                      hubble=100.0)
    fc0 = ForwardConfig(sfmodel=3, masskernel="sph_ft", rsd=True, slength=4.0)

    @jax.jit
    def setup():
        kk = jnp.sqrt(fourier.k_squared(g))
        keq = 0.02
        P = (1e4 * (kk / keq) / (1.0 + (kk / keq) ** 2) ** 1.5).at[0, 0, 0].set(0.0)
        truth = random_fields.grf(jax.random.key(0), g, P)
        d_eul = lag2eul(truth, g, fc0, gp)
        nobs = jnp.maximum(
            1.0 + d_eul + jax.random.normal(jax.random.key(1), g.shape), 0.0)
        obs = ObsData(nobs=nobs, window=jnp.ones(g.shape),
                      noise=jnp.ones(g.shape), power=P)
        mass = mass_mod.compute_mass(g, 1, P)
        _, pos = lag2eul(truth, g, fc0, gp, return_pos=True)
        return truth, obs, mass, pos, P

    truth, obs, mass, pos, P = setup()
    halo = pd.displacement_bound_cells(truth, g, fc0, gp) - 2  # = bench's +2
    print(f"auto halo: {halo}", flush=True)
    import dataclasses
    fc = dataclasses.replace(fc0, pallas_deposit=True, pallas_halo=halo)
    mc = ModelConfig(likelihood=1, forward=fc)
    r = {"halo": halo}

    vag = jax.jit(lambda s: make_psi_force(g, mc, gp, obs)(s))
    r["full_value_and_grad_ms"] = timeit(vag, truth)

    fwd = jax.jit(lambda s: lag2eul(s, g, fc, gp))
    r["lag2eul_forward_ms"] = timeit(fwd, truth)

    dep = jax.jit(lambda p: pd.tsc_deposit_pallas(p, g, halo=halo,
                                                  block=(16, 16)))
    r["pallas_deposit_16_stream_ms"] = timeit(dep, pos)

    ct = jnp.ones(g.shape) / g.N
    gat = jax.jit(lambda f, p: pd.tsc_gather_grads_pallas(
        f, p, g, halo=halo, block=(8, 8), want_value=False))
    r["pallas_gather_grads_ms"] = timeit(gat, ct, pos)

    gatb = jax.jit(lambda f, p: pd.tsc_gather_grads_pallas(
        f, p, g, halo=halo, block=(8, 8), want_value=False, bf16=True))
    r["pallas_gather_grads_bf16_ms"] = timeit(gatb, ct, pos)

    depb = jax.jit(lambda p: pd.tsc_deposit_pallas(p, g, halo=halo,
                                                   block=(16, 16), bf16=True))
    r["pallas_deposit_bf16_ms"] = timeit(depb, pos)

    prior = jax.jit(lambda s: fourier.convolve_inv_corr(s, g, P))
    r["prior_force_ms"] = timeit(prior, truth)

    minv = jax.jit(lambda p_: mass_mod.apply_minv(p_, g, 1, mass))
    r["mass_inverse_ms"] = timeit(minv, truth)

    fftpair = jax.jit(lambda x: fourier.irfft3(fourier.rfft3(x), g))
    r["fft_pair_ms"] = timeit(fftpair, truth)

    for k, v in r.items():
        print(f"{k}: {v if isinstance(v, (str, int)) else round(v, 2)}",
              flush=True)
    Path(__file__).with_suffix(".json").write_text(
        json.dumps({k: (round(v, 3) if isinstance(v, float) else v)
                    for k, v in r.items()}, indent=1))


if __name__ == "__main__":
    main()
