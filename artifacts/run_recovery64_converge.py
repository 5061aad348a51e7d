"""Run the 64^3 recovery config (BASELINE config 2) to actual convergence —
the round-5 statistical-parity artifact (VERDICT r4 next-step #1).

Fresh run of the same statistical setup as round 4's recovery64 (64^3,
2LPT forward, Gaussian likelihood, inverse-P(k) mass, 8 over-dispersed
chains, WMAP7 CAMB P(k), Pallas deposit with auto quantile halo + tail),
with ONE sampler-tuning change: N_eps_fac=32 instead of the input.par
default 8.  Trajectory length is a runtime tuning knob of the reference
itself (input.par N_eps_fac; the target distribution is invariant to it) —
the round-4 run at N_eps_fac=8 was random-walk limited (avg trajectory
length << posterior scale), which is why 35 min of sampling left split
R-hat at 1.71.  Longer trajectories decorrelate ~quadratically faster per
gradient in that regime.

Runs in wall-clock segments; after EVERY segment it checkpoints and
rewrites summary.json, so partial evidence survives an abort.  Statistics
reported with MC error bars:
  * split R-hat of the per-chain psi traces (runner machinery),
  * sample-spectrum/truth ratio: per-chain time-averaged ratio over the
    post-warmup half -> 8 independent chain values -> mean +/- sem,
  * posterior-mean/truth correlation + split-half consistency (chains 0-3
    mean vs chains 4-7 mean): if the two half-means agree better with each
    other than with truth, the estimator has converged and the residual
    truth-distance is posterior width, not bias.

Reference: random_test as the de-facto integration fixture
(/root/reference/barlib/src/barcoderunner.cc:42-205); the BASELINE.json
statistical-parity gate.

Run on the TPU terminal:
    python artifacts/run_recovery64_converge.py [minutes] [rhat_stop]
"""
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

if os.environ.get("REC64_CPU"):  # smoke-test on CPU (the axon sitecustomize
    jax.config.update("jax_platforms", "cpu")  # overrides JAX_PLATFORMS)
import jax.numpy as jnp

from barcode_tpu.config import HMCConfig, MockConfig, RunConfig
from barcode_tpu.grid.spec import GridSpec
from barcode_tpu.forward.lag2eul import ForwardConfig
from barcode_tpu.model.posterior import ModelConfig
from barcode_tpu.runner import Runner

MINUTES = float(sys.argv[1]) if len(sys.argv) > 1 else 165.0
RHAT_STOP = float(sys.argv[2]) if len(sys.argv) > 2 else 1.03
SEGMENT_S = float(os.environ.get("REC64_SEGMENT_S", 180.0))
N_GRID = int(os.environ.get("REC64_N", 64))      # smoke-test override
OUT = Path(os.environ.get("REC64_OUT", Path(__file__).parent / "recovery64"))

conf = RunConfig(
    grid=GridSpec.cube(N_GRID, 250.0),
    model=ModelConfig(
        likelihood=1,
        forward=ForwardConfig(sfmodel=2, masskernel="sph_ft",
                              # CPU smoke: interpret-mode Pallas is too slow,
                              # use the XLA deposit (statistics unaffected)
                              pallas_deposit=not os.environ.get("REC64_CPU"),
                              pallas_halo=0,
                              pallas_tail_k=1024)),
    hmc=HMCConfig(eps_fac_update_type=3,
                  # REC64_MASS=3 switches to the likelihood-force
                  # preconditioner (Wang+13 mean force, HMC_mass.cc:145-161)
                  # for the follow-on phase: the inverse-P mass leaves
                  # data-dominated modes stiff (posterior width << prior
                  # width), which slows their mean-drift — exactly what the
                  # flat-0.85 spectrum ratio of the mass-1 phase measures
                  mass_type=int(os.environ.get("REC64_MASS", 1)),
                  massnum_burn=2000, massnum_post=4000,
                  N_a_eps_update=64, N_eps_fac=32),
    mock=MockConfig(random_test=True, sigma_min=1.0),
    n_chains=8,
    N_Gibbs=10**6,
    outnum=2000,     # slim artifact: a handful of field snapshots, not 900
    outnum_ps=500,
    dir=str(OUT),
    fnamePS="/root/reference/data/WMAP7_CAMB.dat",
    initial_guess=3,
    initial_guess_smoothing_scale=20.0,
    seed=42,
)

t0 = time.time()
r = Runner(conf).setup()
print("resolved pallas_halo:", r.conf.model.forward.pallas_halo, flush=True)
if os.environ.get("REC64_RESUME") and (OUT / "checkpoint.npz").exists():
    r.restore()
    if conf.hmc.mass_type in (2, 3):
        r.mass = r._compute_mass()  # force spectrum from the restored state
    print("resumed from checkpoint.npz", flush=True)
truth = np.asarray(r.truth)
ts = np.asarray(r._truth_spec)

spec_all = jax.jit(jax.vmap(r._spec_jit))  # per-chain spectra in one call

budget = MINUTES * 60.0
ratio_rows = []          # per segment: [chains, nbins] sample/truth spectrum ratio
delta_snaps = {}         # segment -> [chains, N,N,N] float16 snapshot (~4 MiB each;
                         # f16 is plenty for posterior-mean correlations)

nbin_hi = 40
segment = 0
while time.time() - t0 < budget:
    seg_t0 = time.time()
    # one wall-clock segment of sampling
    while time.time() - seg_t0 < SEGMENT_S:
        r.run(n_samples=10**6, max_attempts=r.attempt_batch * 8, log=True,
              progress_every=10**9, dashboard=False)
    segment += 1

    # snapshot statistics (all 8 chains)
    delta = np.asarray(r.states.delta)                    # [chains, N,N,N]
    km, pw, _ = spec_all(r.states.delta)
    pw = np.asarray(pw)                                   # [chains, nbin]
    good = ts[1:nbin_hi] > 0
    ratio_rows.append(pw[:, 1:nbin_hi][:, good] / ts[1:nbin_hi][good])
    delta_snaps[segment] = delta.astype(np.float16)

    # recompute post-warmup statistics: use the second half of snapshots
    n = len(ratio_rows)
    half = n // 2
    post_ratio = np.stack(ratio_rows[half:], axis=0)      # [snaps, chains, bins]
    per_chain_ratio = post_ratio.mean(axis=(0, 2))        # [chains]
    ratio_mean = float(per_chain_ratio.mean())
    ratio_sem = float(per_chain_ratio.std(ddof=1) / np.sqrt(len(per_chain_ratio)))
    per_bin_ratio = post_ratio.mean(axis=(0, 1))
    per_bin_sem = post_ratio.mean(axis=0).std(axis=0, ddof=1) / np.sqrt(post_ratio.shape[1])

    # posterior mean over post-warmup snapshots; split-half over chains
    post_keys = [k for k in sorted(delta_snaps) if k > segment // 2]
    m_all = np.zeros(truth.shape, np.float64)
    m_a = np.zeros(truth.shape, np.float64)
    m_b = np.zeros(truth.shape, np.float64)
    for k in post_keys:
        d64 = delta_snaps[k].astype(np.float64)
        m_all += d64.mean(axis=0)
        m_a += d64[:4].mean(axis=0)
        m_b += d64[4:].mean(axis=0)
    m_all /= len(post_keys)
    m_a /= len(post_keys)
    m_b /= len(post_keys)
    corr_truth = float(np.corrcoef(m_all.ravel(), truth.ravel())[0, 1])
    corr_ab = float(np.corrcoef(m_a.ravel(), m_b.ravel())[0, 1])
    corr_a_truth = float(np.corrcoef(m_a.ravel(), truth.ravel())[0, 1])
    corr_b_truth = float(np.corrcoef(m_b.ravel(), truth.ravel())[0, 1])

    d = r.diagnostics()
    rhat = d.get("rhat_psi", float("inf"))
    summary = {
        "config": "64^3 2LPT/Gaussian (BASELINE config 2), 8 chains, WMAP7 "
                  "P(k), Pallas deposit (auto quantile halo + tail split), "
                  "N_eps_fac=32 (input.par-tunable trajectory length; see "
                  "script docstring)",
        "pallas_halo": r.conf.model.forward.pallas_halo,
        "pallas_tail_k": r.conf.model.forward.pallas_tail_k,
        "rhat_psi": rhat,
        "ess_psi": d.get("ess_psi"),
        "ess_psi_per_s": d.get("ess_psi_per_s"),
        "acc_rate": d.get("acc_rate"),
        "acc_rate_recent": d.get("acc_rate_recent"),
        "leapfrog_steps_per_s_8chains_64cube": d.get("leapfrog_steps_per_s"),
        "accepted_total": int(sum(d.get("accepted_per_chain", [0]))),
        "sample_spectrum_over_truth": {
            "bins": "1..%d (nonempty shells)" % (nbin_hi - 1),
            "mean": ratio_mean,
            "sem_over_8_chains": ratio_sem,
            "per_bin_mean": [float(x) for x in per_bin_ratio],
            "per_bin_sem": [float(x) for x in per_bin_sem],
            "n_snapshots_post_warmup": int(post_ratio.shape[0]),
        },
        "posterior_mean": {
            "corr_with_truth": corr_truth,
            "split_half_corr_chains03_vs_47": corr_ab,
            "corr_half_a_truth": corr_a_truth,
            "corr_half_b_truth": corr_b_truth,
        },
        "segments": segment,
        "wall_minutes": (time.time() - t0) / 60.0,
        "converged": bool(np.isfinite(rhat) and rhat < RHAT_STOP),
    }
    (OUT / "summary.json").write_text(json.dumps(summary, indent=1))
    r.checkpoint()
    print(f"[seg {segment}] rhat={rhat:.4f} ratio={ratio_mean:.4f}"
          f"+-{ratio_sem:.4f} corr={corr_truth:.4f} ab={corr_ab:.4f} "
          f"acc={d.get('acc_rate_recent', float('nan')):.3f} "
          f"wall={(time.time()-t0)/60:.1f}m", flush=True)
    if np.isfinite(rhat) and rhat < RHAT_STOP and segment >= 8:
        print("CONVERGED — stopping early")
        break

print(json.dumps(summary, indent=1))
