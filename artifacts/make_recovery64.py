"""Produce the 64^3 posterior-recovery artifact (BASELINE config 2:
64^3, 2LPT forward model, Gaussian likelihood, inverse-P(k) preconditioner,
8 vmapped chains, WMAP7 CAMB P(k) table, Pallas deposit with auto halo).

Run on the TPU terminal:  python artifacts/make_recovery64.py [minutes]
Writes artifacts/recovery64/{summary.json, spec*.dat, *.prt, performance_log}.

This is the statistical-parity evidence of the reference's random_test mode
(/root/reference/barlib/src/barcoderunner.cc:42-205): the sampler must
recover a known GRF truth — posterior mean correlated with truth, sample
spectra matching the truth spectrum at MC-error level, acceptance inside
[acc_min, acc_max], split R-hat near 1 across independent chains.
"""
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from barcode_tpu.config import HMCConfig, MockConfig, RunConfig
from barcode_tpu.grid.spec import GridSpec
from barcode_tpu.forward.lag2eul import ForwardConfig
from barcode_tpu.model.posterior import ModelConfig
from barcode_tpu.runner import Runner

MINUTES = float(sys.argv[1]) if len(sys.argv) > 1 else 25.0
OUT = Path(__file__).parent / "recovery64"

conf = RunConfig(
    grid=GridSpec.cube(64, 250.0),
    model=ModelConfig(
        likelihood=1,
        forward=ForwardConfig(sfmodel=2, masskernel="sph_ft",
                              pallas_deposit=True, pallas_halo=0,
                              # round 4: auto QUANTILE halo + exact tail —
                              # the converged run doubles as statistical
                              # validation of the tail-split default
                              pallas_tail_k=1024)),
    hmc=HMCConfig(eps_fac_update_type=3, mass_type=1, N_a_eps_update=64),
    mock=MockConfig(random_test=True, sigma_min=1.0),
    n_chains=8,
    N_Gibbs=10**6,
    outnum=200,
    dir=str(OUT),
    fnamePS="/root/reference/data/WMAP7_CAMB.dat",
    # per-chain smoothed-GRF starts: over-dispersed chains -> meaningful R-hat
    initial_guess=3,
    initial_guess_smoothing_scale=20.0,
    seed=42,
)

t0 = time.time()
r = Runner(conf).setup()
print("resolved pallas_halo:", r.conf.model.forward.pallas_halo, flush=True)
truth = np.asarray(r.truth)

budget = MINUTES * 60.0
mean_acc = None
n_snap = 0
warmup_end = t0 + 0.4 * budget
while time.time() - t0 < budget:
    r.run(n_samples=10**6, max_attempts=r.attempt_batch * 4, log=True,
          progress_every=4)
    if time.time() > warmup_end:
        snap = np.asarray(r.states.delta).mean(axis=0)  # mean over chains
        mean_acc = snap if mean_acc is None else mean_acc + snap
        n_snap += 1

post_mean = mean_acc / max(n_snap, 1)
corr = float(np.corrcoef(post_mean.ravel(), truth.ravel())[0, 1])

km, pw, _ = r._spec_jit(jnp.asarray(np.asarray(r.states.delta[0])))
pw = np.asarray(pw)
ts = np.asarray(r._truth_spec)
good = (ts[1:40] > 0) & np.isfinite(pw[1:40])  # skip empty |k| shells
ratio = pw[1:40][good] / ts[1:40][good]
r.checkpoint()  # allow future runs to resume/extend this artifact

d = r.diagnostics()
summary = {
    "config": "64^3 2LPT/Gaussian (BASELINE config 2), 8 chains, WMAP7 P(k), "
              "Pallas deposit (auto quantile halo + tail split)",
    "pallas_halo": r.conf.model.forward.pallas_halo,
    "pallas_tail_k": r.conf.model.forward.pallas_tail_k,
    "posterior_mean_truth_corr": corr,
    "sample_spectrum_over_truth_bins_1_25_mean": float(ratio.mean()),
    "rhat_psi": d.get("rhat_psi"),
    "acc_rate": d["acc_rate"],
    "acc_rate_recent": d["acc_rate_recent"],
    "leapfrog_steps_per_s_8chains_64cube": d["leapfrog_steps_per_s"],
    "accepted_total": int(sum(d["accepted_per_chain"])),
    "snapshots_in_mean": n_snap,
    "wall_minutes": (time.time() - t0) / 60.0,
}
(OUT / "summary.json").write_text(json.dumps(summary, indent=1))
print(json.dumps(summary, indent=1))
