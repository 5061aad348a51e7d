"""FFT-chain audit (VERDICT r4 next-step #3): count the 3D transforms in
one posterior gradient evaluation, before vs after the round-5 dedupe.

Counts `fft` ops (by kind and shape) in the lowered StableHLO of
jax.value_and_grad(psi) — the exact program XLA compiles — for the
round-4-style composition (independent prior_psi + lag2eul, each taking
its own rfft3(delta)) and the round-5 shared-spectrum make_psi.  Batched
transforms are expanded by their batch factor so the numbers are
N^3-transform equivalents, comparable to the reference's 6-12 FFTs/step
budget (SURVEY.md §3.3, HMC.cc:280-344).

Runs on CPU (counts are backend-independent).  Writes fft_audit.json.
"""
import json
import os
import re
import sys
from pathlib import Path

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import jax

jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax.numpy as jnp

from barcode_tpu.grid.spec import GridSpec
from barcode_tpu.grid import fourier
from barcode_tpu.forward.lag2eul import ForwardConfig, GrowthParams, lag2eul
from barcode_tpu.model import likelihoods, posterior
from barcode_tpu.model.likelihoods import ObsData

N = 64
g = GridSpec.cube(N, 250.0)
gp = GrowthParams(D1=1.0, D2=-3.0 / 7.0, ascale=1.0, cpecvel=52.85,
                  hubble=100.0)


def _walk(jaxpr, per_kind):
    for eqn in jaxpr.eqns:
        if eqn.primitive.name == "fft":
            kind = {0: "FFT", 1: "IFFT", 2: "RFFT", 3: "IRFFT"}.get(
                int(eqn.params["fft_type"].value)
                if hasattr(eqn.params["fft_type"], "value")
                else int(eqn.params["fft_type"]),
                str(eqn.params["fft_type"]))
            lengths = eqn.params["fft_lengths"]
            shape = eqn.invars[0].aval.shape
            batch = 1
            for d in shape[:len(shape) - len(lengths)]:
                batch *= int(d)
            per_kind[kind] = per_kind.get(kind, 0) + batch
        for v in eqn.params.values():
            if hasattr(v, "jaxpr"):       # closed jaxpr (pjit, custom_vjp…)
                _walk(v.jaxpr, per_kind)
            elif isinstance(v, (list, tuple)):
                for w in v:
                    if hasattr(w, "jaxpr"):
                        _walk(w.jaxpr, per_kind)


def count_ffts(psi_fn):
    """Batch-expanded N^3-transform counts of one value_and_grad, by kind,
    from the jaxpr (each rfftn/irfftn is ONE fft primitive there)."""
    vag = jax.value_and_grad(lambda d: psi_fn(d)[0])
    jpr = jax.make_jaxpr(vag)(jnp.zeros(g.shape, jnp.float32))
    per_kind = {}
    _walk(jpr.jaxpr, per_kind)
    return sum(per_kind.values()), per_kind


results = {}
for name, sfmodel, mk in [("2lpt_sphft", 2, "sph_ft"),
                          ("alpt_rsd_sphft", 3, "sph_ft")]:
    fc = ForwardConfig(sfmodel=sfmodel, masskernel=mk,
                       rsd=(sfmodel == 3))
    mc = posterior.ModelConfig(likelihood=1, forward=fc)
    P = jnp.full(g.rshape, 20.0).at[0, 0, 0].set(0.0)
    obs = ObsData(nobs=jnp.ones(g.shape), window=jnp.ones(g.shape),
                  noise=jnp.ones(g.shape), power=P)

    # round-4-style split composition (no shared spectrum, real-space prior)
    def psi_old(d, fc=fc, mc=mc, obs=obs):
        pp = likelihoods.prior_psi(d, g, obs)
        dx = lag2eul(d, g, fc, gp)  # computes its own rfft3(d)
        pl = likelihoods.likelihood_psi(mc.likelihood, dx, obs)
        return pp + pl, (pp, pl)

    psi_new = posterior.make_psi(g, mc, gp, obs)

    n_old, k_old = count_ffts(psi_old)
    n_new, k_new = count_ffts(psi_new)
    results[name] = {
        "split_rounds_1_to_4": {"total_n3_transforms": n_old, **k_old},
        "shared_round_5": {"total_n3_transforms": n_new, **k_new},
        "saved_per_gradient": n_old - n_new,
    }
    print(name, "old:", n_old, k_old, " new:", n_new, k_new, flush=True)

# the per-leapfrog-step budget adds the FS mass-inverse pair (apply_minv)
results["note"] = (
    "per leapfrog step = one gradient evaluation above + 1 rfft/irfft pair "
    "for the FS mass inverse (HMC_help.cc:16-64 equivalent); reference "
    "budget is 6-12 N^3 transforms/step (SURVEY.md section 3.3)")
out = Path(__file__).parent / "fft_audit.json"
out.write_text(json.dumps(results, indent=1))
print("wrote", out)
