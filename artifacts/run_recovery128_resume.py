"""Resume the 128^3 recovery run (BASELINE config 3) past warmup — the
round-5 companion to run_recovery64_converge.py (VERDICT r4 next-step #1,
second half: "resume recovery128 past warmup the same way").

Restores artifacts/recovery128/checkpoint.npz (round-4 state: 30 min of
warmup, R-hat 527 — admitted warmup snapshot) and keeps sampling in
wall-clock segments with N_eps_fac=32 trajectories (input.par-tunable; see
run_recovery64_converge.py's docstring for why), rewriting summary.json
with error-bar statistics after every segment.

Run on the TPU terminal:
    python artifacts/run_recovery128_resume.py [minutes]
"""
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

if os.environ.get("REC128_CPU"):
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from barcode_tpu.config import HMCConfig, MockConfig, RunConfig
from barcode_tpu.grid.spec import GridSpec
from barcode_tpu.forward.lag2eul import ForwardConfig
from barcode_tpu.model.posterior import ModelConfig
from barcode_tpu.runner import Runner

MINUTES = float(sys.argv[1]) if len(sys.argv) > 1 else 75.0
SEGMENT_S = float(os.environ.get("REC128_SEGMENT_S", 300.0))
OUT = Path(__file__).parent / "recovery128"

conf = RunConfig(
    grid=GridSpec.cube(128, 250.0),
    model=ModelConfig(
        likelihood=1,
        forward=ForwardConfig(sfmodel=3, masskernel="sph_ft", rsd=True,
                              slength=4.0,
                              pallas_deposit=not os.environ.get("REC128_CPU"),
                              pallas_halo=0,  # auto quantile (tail on)
                              pallas_tail_k=1024)),
    # mass_type=3 (likelihood-force preconditioner): the 64^3 round-5
    # study showed the inverse-P mass leaves data-dominated modes stiff
    # (spectrum ratio plateau); type 3 lifted eps ~11x at equal acceptance
    hmc=HMCConfig(eps_fac_update_type=3,
                  mass_type=int(os.environ.get("REC128_MASS", 3)),
                  massnum_burn=2000, massnum_post=4000,
                  N_a_eps_update=64, N_eps_fac=32),
    mock=MockConfig(random_test=True, sigma_min=1.0),
    n_chains=4,
    N_Gibbs=10**6,
    outnum=2000,
    outnum_ps=1000,
    dir=str(OUT),
    fnamePS="/root/reference/data/WMAP7_CAMB.dat",
    initial_guess=3,
    initial_guess_smoothing_scale=20.0,
    seed=7,
)

t0 = time.time()
r = Runner(conf).setup()
print("resolved pallas_halo:", r.conf.model.forward.pallas_halo, flush=True)
if (OUT / "checkpoint.npz").exists():
    r.restore()
    if conf.hmc.mass_type in (2, 3):
        r.mass = r._compute_mass()  # force spectrum from the restored state
    print("resumed from checkpoint.npz (round-4 warmup state)", flush=True)
    # the mass switch invalidates the adapted eps scale; if the restored
    # controller state is degenerate (eps collapsed toward 0 after the
    # switch — observed: 5e-7 with acceptance 0.83 = frozen chains),
    # reset eps to the heuristic start and let the type-3 controller
    # re-adapt under the new mass
    import dataclasses as _dc
    import jax.numpy as _jnp
    eps_now = float(np.asarray(r.states.eps_fac).mean())
    eps0 = conf.hmc.eps_fac_start(r.g.N)
    if eps_now < 0.02 * eps0:
        r.states = _dc.replace(
            r.states,
            eps_fac=_jnp.full_like(r.states.eps_fac, eps0),
            eps_table=_jnp.full_like(r.states.eps_table, eps0))
        print(f"eps reset {eps_now:.3g} -> {eps0:.3g} (degenerate after "
              "mass switch)", flush=True)
truth = np.asarray(r.truth)
ts = np.asarray(r._truth_spec)
spec_all = jax.jit(jax.vmap(r._spec_jit))

budget = MINUTES * 60.0
ratio_rows = []
delta_snaps = {}
nbin_hi = 40
segment = 0
summary = {}
while time.time() - t0 < budget:
    seg_t0 = time.time()
    while time.time() - seg_t0 < SEGMENT_S:
        r.run(n_samples=10**6, max_attempts=r.attempt_batch * 2, log=True,
              progress_every=10**9, dashboard=False)
    segment += 1

    delta = np.asarray(r.states.delta)
    km, pw, _ = spec_all(r.states.delta)
    pw = np.asarray(pw)
    good = ts[1:nbin_hi] > 0
    ratio_rows.append(pw[:, 1:nbin_hi][:, good] / ts[1:nbin_hi][good])
    delta_snaps[segment] = delta.astype(np.float16)

    n = len(ratio_rows)
    half = n // 2
    post_ratio = np.stack(ratio_rows[half:], axis=0)
    per_chain_ratio = post_ratio.mean(axis=(0, 2))
    ratio_mean = float(per_chain_ratio.mean())
    ratio_sem = float(per_chain_ratio.std(ddof=1)
                      / np.sqrt(len(per_chain_ratio)))
    per_bin_ratio = post_ratio.mean(axis=(0, 1))
    per_bin_sem = post_ratio.mean(axis=0).std(axis=0, ddof=1) \
        / np.sqrt(post_ratio.shape[1])

    post_keys = [k for k in sorted(delta_snaps) if k > segment // 2]
    m_all = np.zeros(truth.shape, np.float64)
    m_a = np.zeros(truth.shape, np.float64)
    m_b = np.zeros(truth.shape, np.float64)
    for k in post_keys:
        d64 = delta_snaps[k].astype(np.float64)
        m_all += d64.mean(axis=0)
        m_a += d64[:2].mean(axis=0)
        m_b += d64[2:].mean(axis=0)
    m_all /= len(post_keys)
    m_a /= len(post_keys)
    m_b /= len(post_keys)
    corr_truth = float(np.corrcoef(m_all.ravel(), truth.ravel())[0, 1])
    corr_ab = float(np.corrcoef(m_a.ravel(), m_b.ravel())[0, 1])

    d = r.diagnostics()
    rhat = d.get("rhat_psi", float("inf"))
    summary = {
        "config": "128^3 ALPT+RSD/Gaussian (BASELINE config 3), 4 chains, "
                  "WMAP7 P(k), Pallas deposit (auto quantile halo + tail "
                  "split), N_eps_fac=32; resumed from the round-4 warmup "
                  "checkpoint (30 min) and extended this round",
        "pallas_halo": r.conf.model.forward.pallas_halo,
        "rhat_psi": rhat,
        "ess_psi": d.get("ess_psi"),
        "acc_rate": d.get("acc_rate"),
        "acc_rate_recent": d.get("acc_rate_recent"),
        "leapfrog_steps_per_s_4chains_128cube": d.get("leapfrog_steps_per_s"),
        "accepted_total": int(sum(d.get("accepted_per_chain", [0]))),
        "sample_spectrum_over_truth": {
            "bins": "1..%d (nonempty shells)" % (nbin_hi - 1),
            "mean": ratio_mean,
            "sem_over_4_chains": ratio_sem,
            "per_bin_mean": [float(x) for x in per_bin_ratio],
            "per_bin_sem": [float(x) for x in per_bin_sem],
            "n_snapshots_post_warmup": int(post_ratio.shape[0]),
        },
        "posterior_mean": {
            "corr_with_truth": corr_truth,
            "split_half_corr_chains01_vs_23": corr_ab,
        },
        "segments_this_round": segment,
        "wall_minutes_this_round": (time.time() - t0) / 60.0,
    }
    (OUT / "summary.json").write_text(json.dumps(summary, indent=1))
    r.checkpoint()
    print(f"[seg {segment}] rhat={rhat:.4f} ratio={ratio_mean:.4f}"
          f"+-{ratio_sem:.4f} corr={corr_truth:.4f} ab={corr_ab:.4f} "
          f"wall={(time.time()-t0)/60:.1f}m", flush=True)

print(json.dumps(summary, indent=1))
